"""ctypes bindings for the native chemistry kernel (csrc/molkit.cc).

The C++ kernel implements the preprocessing hot path (SMILES -> decoding
route with APD targets) with semantics identical to the pure-Python
implementation; :func:`native_route` returns None when the library is
unavailable or the molecule needs a feature the kernel doesn't cover
(chirality), and callers fall back to Python.

Build (done automatically by ensure_built() when a compiler is present):
    g++ -O3 -shared -fPIC -std=c++17 -o csrc/libmolkit.so csrc/molkit.cc
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from graphinvent_tpu.config import GraphInventConfig

_LIB = None
_LIB_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_SRC_DIR, "libmolkit.so")


def ensure_built() -> Optional[str]:
    if os.path.exists(_LIB_PATH):
        src = os.path.join(_SRC_DIR, "molkit.cc")
        if os.path.exists(src) and os.path.getmtime(src) <= os.path.getmtime(_LIB_PATH):
            return _LIB_PATH
    src = os.path.join(_SRC_DIR, "molkit.cc")
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=300)
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = ensure_built()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mk_route.restype = ctypes.c_int
        lib.mk_route.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int,
        ]
        lib.mk_decode_batch.restype = ctypes.c_int
        lib.mk_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8), ctypes.c_char_p, ctypes.c_int,
        ]
        lib.mk_qed_batch.restype = ctypes.c_int
        lib.mk_qed_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_route(smiles: str, cfg: GraphInventConfig, cap: int = 512
                 ) -> Optional[List[Tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Full decoding route for one SMILES via the C++ kernel.

    Returns the same list of (nodes, edges, apd) triples as
    chem.molgraph.decoding_route, or None when the native path can't handle
    the request (no library, chirality config, random ordering, parse
    failure -- caller decides whether to fall back or skip).
    use_aromatic_bonds is fully supported (un-kekulized type-3 bonds,
    fused-ring valence rule), matching the Python path byte for byte.
    """
    lib = _load()
    if lib is None:
        return None
    if cfg.use_chirality or not cfg.use_canon:
        return None
    M, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
    apd_len = cfg.dim_apd
    nodes = np.zeros((cap, M, Fn), np.int8)
    edges = np.zeros((cap, M, M, E), np.int8)
    apds = np.zeros((cap, apd_len), np.int8)
    charges = (ctypes.c_int * cfg.n_formal_charge)(*cfg.formal_charge)
    if cfg.n_imp_H:
        imp = (ctypes.c_int * cfg.n_imp_H)(*cfg.imp_H)
        n_imp = cfg.n_imp_H
    else:
        imp = (ctypes.c_int * 1)(0)
        n_imp = 0
    n = lib.mk_route(
        smiles.encode(), ";".join(cfg.atom_types).encode(),
        charges, cfg.n_formal_charge, imp, n_imp,
        E, M, 1, 1 if cfg.decoding_route == "bfs" else 0,
        1 if cfg.use_aromatic_bonds else 0,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        apds.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), cap)
    if n <= 0:
        return [] if n == 0 else None
    return [(nodes[r], edges[r], apds[r]) for r in range(n)]


def native_decode_batch(nodes: np.ndarray, edges: np.ndarray,
                        n_nodes: np.ndarray, cfg: GraphInventConfig,
                        n_threads: int = 0
                        ) -> Optional[Tuple[np.ndarray, List[Optional[str]]]]:
    """Batch graph tensors -> (validity [B] int8, canonical SMILES list).

    The generation-side inverse of :func:`native_route` (reference host
    boundary: GraphGenerator.py:659-804): semantics identical to calling
    ``MolGraph.is_valid()`` / ``MolGraph.get_smiles()`` per row, byte for
    byte (tests/test_native.py).  ``None`` in the SMILES list marks an
    unbuildable molecule, exactly like the Python path.  Returns None when
    the native library is unavailable (caller falls back to Python).
    """
    lib = _load()
    if lib is None:
        return None
    B = len(n_nodes)
    M, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
    nodes = np.ascontiguousarray(nodes, dtype=np.int8)
    edges = np.ascontiguousarray(edges, dtype=np.int8)
    if nodes.shape != (B, M, Fn) or edges.shape != (B, M, M, E):
        return None
    n_nodes_c = np.ascontiguousarray(n_nodes, dtype=np.int32)
    charges = (ctypes.c_int * cfg.n_formal_charge)(*cfg.formal_charge)
    if cfg.n_imp_H:
        imp = (ctypes.c_int * cfg.n_imp_H)(*cfg.imp_H)
        n_imp = cfg.n_imp_H
    else:
        imp = (ctypes.c_int * 1)(0)
        n_imp = 0
    n_chir = cfg.n_chirality if cfg.use_chirality else 0
    chir_none = (cfg.chirality.index("None")
                 if n_chir and "None" in cfg.chirality else -1)
    smi_cap = 16 * M + 64
    smiles_buf = ctypes.create_string_buffer(B * smi_cap)
    validity = np.zeros(B, dtype=np.int8)
    r = lib.mk_decode_batch(
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n_nodes_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        B, M, ";".join(cfg.atom_types).encode(),
        charges, cfg.n_formal_charge, imp, n_imp,
        n_chir, chir_none, E, n_threads,
        validity.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        smiles_buf, smi_cap)
    if r != B:
        return None
    raw = smiles_buf.raw
    smiles: List[Optional[str]] = []
    for i in range(B):
        row = raw[i * smi_cap:(i + 1) * smi_cap]
        s = row.split(b"\0", 1)[0]
        smiles.append(s.decode() if s else None)
    # smi_cap truncation guard: a ring-dense graph whose canonical SMILES
    # exceeds 16*M+64 bytes comes back as an empty string while validity
    # stays 1 -- a silent divergence from the Python writer.  Rebuild those
    # rows through the Python path (rare: valence limits make overlong
    # SMILES pathological, so the per-row cost is irrelevant).
    for i in range(B):
        if validity[i] and smiles[i] is None:
            from graphinvent_tpu.chem.molgraph import graph_to_mol
            from graphinvent_tpu.chem.smiles import mol_to_smiles
            mol = graph_to_mol(nodes[i], edges[i], int(n_nodes_c[i]), cfg)
            smiles[i] = mol_to_smiles(mol) if mol is not None else None
    return validity, smiles


def native_qed_batch(nodes: np.ndarray, edges: np.ndarray,
                     n_nodes: np.ndarray, cfg: GraphInventConfig,
                     n_threads: int = 0) -> Optional[np.ndarray]:
    """Batch graph tensors -> QED scores (float64 [B]), identical to
    ``descriptors.qed(graph_to_mol(...))`` per row (unbuildable molecules
    score 0.0).  The RL scoring hot path (reference ScoringFunction.py:
    131-143); measured 1.8 s/step of Python QED at B=500 N=40.  Returns
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    B = len(n_nodes)
    M, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
    nodes = np.ascontiguousarray(nodes, dtype=np.int8)
    edges = np.ascontiguousarray(edges, dtype=np.int8)
    if nodes.shape != (B, M, Fn) or edges.shape != (B, M, M, E):
        return None
    n_nodes_c = np.ascontiguousarray(n_nodes, dtype=np.int32)
    charges = (ctypes.c_int * cfg.n_formal_charge)(*cfg.formal_charge)
    if cfg.n_imp_H:
        imp = (ctypes.c_int * cfg.n_imp_H)(*cfg.imp_H)
        n_imp = cfg.n_imp_H
    else:
        imp = (ctypes.c_int * 1)(0)
        n_imp = 0
    n_chir = cfg.n_chirality if cfg.use_chirality else 0
    chir_none = (cfg.chirality.index("None")
                 if n_chir and "None" in cfg.chirality else -1)
    out = np.zeros(B, dtype=np.float64)
    r = lib.mk_qed_batch(
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n_nodes_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        B, M, ";".join(cfg.atom_types).encode(),
        charges, cfg.n_formal_charge, imp, n_imp,
        n_chir, chir_none, E, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if r != B:
        return None
    return out
