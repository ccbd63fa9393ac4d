"""SMILES -> HDF5 preprocessing.

Rebuilds DataProcesser (DataProcesser.py:19-457): for every molecule, replay
its decoding route and write (nodes, edges, APD) int8 triples to the three
HDF datasets.  Differences by design (SURVEY.md §7):

* duplicate subgraphs within a group are merged by *hashing* the graph
  bytes (O(group)) instead of the reference's O(group^2) pairwise array
  comparison (DataProcesser.py:203-231); first-occurrence order is kept, so
  dataset ordering semantics match;
* the route itself is a single backward truncation sweep per molecule
  (chem/molgraph.py) instead of re-truncating per subgraph index;
* optional ``num_shards``/``shard_index`` produce shard files directly
  (the built-in replacement for the reference's manual split / combine_HDFs
  flow, tools/combine_HDFs.py); ``combine_shards`` merges them.  Sharding is
  reachable from the ``preprocess`` job via config
  ``preprocess_num_shards``/``preprocess_shard_index`` and, under
  multi-host execution, defaults to one shard per process with only
  process 0 combining (reference analogue:
  tools/submit-split-preprocessing-supercloud.py:8-17);
* training-set properties (``train.csv``) are recomputed from the FINISHED
  HDF -- full molecules are exactly the rows whose APD carries a terminate
  count (every decoding route ends at its full graph), so the scan is exact,
  restart-proof, and shard-merge-proof.  (The reference accumulates
  streaming statistics during the pass and silently loses them on restart,
  DataProcesser.py:389-417.)

Restart uses the same ``index.restart`` + ``.h5.chunked`` protocol as the
reference (util.py:387-476, DataProcesser.py:66-135).
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Optional, Tuple

import h5py
import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.chem.molecule import Molecule
from graphinvent_tpu.chem.smiles import mol_from_smiles
from graphinvent_tpu.chem.molgraph import decoding_route, ordered_graph
from graphinvent_tpu.chem.native import native_available, native_route
from graphinvent_tpu.eval.properties import (
    graph_set_properties, merge_ts_properties, write_ts_properties_csv,
)


def read_smiles_file(path: str) -> List[str]:
    """Reads a .smi file; first line may be a header containing 'SMILES'
    (reference: parameters/load.py:10-26)."""
    with open(path) as fh:
        lines = [l.strip() for l in fh if l.strip()]
    if lines and "SMILES" in lines[0]:
        lines = lines[1:]
    return [l.split()[0] for l in lines]


class Preprocessor:
    """Writes ``<name>.h5`` with datasets ``nodes``/``edges``/``APDs``
    (int8), plus ``<name>.csv`` training-set properties when
    ``is_training_set``."""

    def __init__(self, cfg: GraphInventConfig, smi_path: str,
                 is_training_set: bool = False,
                 shard_index: int = 0, num_shards: int = 1) -> None:
        self.cfg = cfg
        self.smi_path = smi_path
        self.is_training_set = is_training_set
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.h5_path = smi_path[:-3] + "h5"
        if num_shards > 1:
            self.h5_path += f".shard{shard_index}"
        self.restart_path = os.path.join(
            os.path.dirname(smi_path) or ".", f"index.restart{shard_index}"
            if num_shards > 1 else "index.restart")

        smiles = read_smiles_file(smi_path)
        self.smiles = smiles[shard_index::num_shards]
        self.rng = random.Random(cfg.seed + shard_index)
        # native C++ route kernel (csrc/molkit.cc); byte-identical to the
        # Python path, used when the config is in its supported envelope
        self.use_native = (native_available() and cfg.use_canon
                           and not cfg.use_chirality)
        if not self.use_native:
            reasons = []
            if not native_available():
                reasons.append("native kernel unavailable")
            if not cfg.use_canon:
                reasons.append("use_canon=False")
            if cfg.use_chirality:
                reasons.append("use_chirality=True")
            print(f"-- Preprocessing {os.path.basename(smi_path)} on the "
                  f"Python route path ({', '.join(reasons)})", flush=True)

    # ------------------------------------------------------------------
    def _molecules(self, start: int = 0) -> Iterator[Tuple[int, Molecule]]:
        for idx in range(start, len(self.smiles)):
            s = self.smiles[idx]
            try:
                mol = mol_from_smiles(
                    s, kekulize_mol=not self.cfg.use_aromatic_bonds)
            except Exception:
                continue   # unparseable: skip (reference skips None mols)
            yield idx, mol

    def count_subgraphs(self) -> int:
        """Total decoding-route length over the set
        (reference: DataProcesser.py:363-387)."""
        total = 0
        for _, mol in self._molecules():
            total += len(mol.bonds) + 2
        return total

    # ------------------------------------------------------------------
    def _routes(self, start: int = 0):
        """Yields (molecule_idx, route, full_nodes, full_edges, n_nodes);
        route is a list of (nodes, edges, apd).  Uses the native kernel when
        possible, Python otherwise; unparseable molecules are skipped."""
        cfg = self.cfg
        for idx in range(start, len(self.smiles)):
            s = self.smiles[idx]
            route = native_route(s, cfg) if self.use_native else None
            if route is None:          # python path / fallback
                try:
                    mol = mol_from_smiles(
                        s, kekulize_mol=not cfg.use_aromatic_bonds)
                    route = list(decoding_route(mol, cfg, rng=self.rng))
                except Exception:
                    continue
            if not route:
                continue
            full_nodes, full_edges, _ = route[0]
            n_nodes = int((np.asarray(full_nodes).sum(axis=1) > 0).sum())
            yield idx, route, full_nodes, full_edges, n_nodes

    # ------------------------------------------------------------------
    def run(self, restart: bool = False) -> str:
        cfg = self.cfg
        chunked = self.h5_path + ".chunked"
        group_size = cfg.batch_size

        dims = {"nodes": cfg.dim_nodes, "edges": cfg.dim_edges,
                "APDs": (cfg.dim_apd,)}
        cap = [max(2 * group_size, 4096)]   # datasets grow on demand

        start_idx, written = 0, 0
        mode = "a" if (restart and os.path.exists(chunked)) else "w"
        with h5py.File(chunked, mode) as hf:
            if mode == "w" or "nodes" not in hf:
                ds = {name: hf.create_dataset(
                    name, (cap[0], *dims[name]), chunks=True, dtype=np.int8,
                    maxshape=(None, *dims[name]))
                    for name in dims}
            else:
                ds = {name: hf[name] for name in dims}
                start_idx, written = self._read_restart()
                cap[0] = ds["nodes"].shape[0]

            group: Dict[bytes, int] = {}
            g_nodes: List[np.ndarray] = []
            g_edges: List[np.ndarray] = []
            g_apds: List[np.ndarray] = []
            last_mol = start_idx

            def flush() -> None:
                nonlocal written, group, g_nodes, g_edges, g_apds
                if not g_nodes:
                    return
                k = len(g_nodes)
                if written + k > cap[0]:
                    cap[0] = max(2 * cap[0], written + k)
                    for name in dims:
                        ds[name].resize((cap[0], *dims[name]))
                ds["nodes"][written:written + k] = np.stack(g_nodes)
                ds["edges"][written:written + k] = np.stack(g_edges)
                # APD counts are accumulated in int16 and clipped into the
                # int8 on-disk format (the loss renormalises targets anyway)
                ds["APDs"][written:written + k] = np.clip(
                    np.stack(g_apds), 0, 127).astype(np.int8)
                written += k
                group, g_nodes, g_edges, g_apds = {}, [], [], []
                self._write_restart(last_mol, written)

            for idx, route, full_nodes, full_edges, n_f in self._routes(start_idx):
                for nodes, edges, apd in route:
                    key = nodes.tobytes() + edges.tobytes()
                    pos = group.get(key)
                    if pos is None:
                        group[key] = len(g_nodes)
                        g_nodes.append(nodes)
                        g_edges.append(edges)
                        g_apds.append(apd.astype(np.int16))
                    else:
                        g_apds[pos] = g_apds[pos] + apd
                # flush only at molecule boundaries: index.restart points at
                # a molecule, so a mid-route flush could strand the tail of
                # a molecule's route on crash (its prefix flushed as done,
                # its remainder only in memory).  Boundary-aligned groups
                # also make restarted runs byte-identical to fresh ones
                # (deterministic group boundaries) and match the reference's
                # molecule-group granularity (DataProcesser.py:82-114).
                last_mol = idx + 1
                if len(g_nodes) >= group_size:
                    flush()
            flush()

            for name in dims:     # trim dedupe savings
                ds[name].resize((written, *dims[name]))

        # resave unchunked (reference: DataProcesser.py:147-165)
        with h5py.File(chunked, "r") as src, h5py.File(self.h5_path, "w") as dst:
            for name in dims:
                dst.create_dataset(name, data=src[name][:], chunks=None,
                                   dtype=np.int8)
        os.remove(chunked)
        if os.path.exists(self.restart_path):
            os.remove(self.restart_path)
        # training-set properties from the finished HDF: exact whether this
        # run was fresh or restarted.  Shard runs skip it -- combine_shards
        # recomputes over the merged file.
        if self.is_training_set and self.num_shards == 1:
            ts, _ = ts_properties_from_hdf(cfg, self.h5_path)
            if ts:
                write_ts_properties_csv(self.smi_path[:-4] + ".csv", ts)
        return self.h5_path

    # ------------------------------------------------------------------
    def _write_restart(self, last_mol: int, dataset_size: int) -> None:
        with open(self.restart_path, "w") as fh:
            fh.write(f"{last_mol}, {dataset_size}")

    def _read_restart(self) -> Tuple[int, int]:
        try:
            with open(self.restart_path) as fh:
                a, b = fh.read().split(",")
            return int(a), int(b)
        except Exception:
            return 0, 0


def ts_properties_from_hdf(cfg: GraphInventConfig, h5_path: str,
                           chunk: int = 8192) -> Tuple[Dict, int]:
    """-> (training-set property dict, n_molecules) computed from a finished
    HDF.  Full molecules are the rows whose APD carries a terminate count
    (apd[-1] >= 1): every molecule's decoding route ends at its full ordered
    graph with a terminate target, and the within-group dedupe *sums* APDs,
    so apd[-1] is exactly the multiplicity of that full graph in the set.
    Streamed in ``chunk``-row slices (ChEMBL-scale files are GB-sized)."""
    parts: List[Dict] = []
    weights: List[int] = []
    with h5py.File(h5_path, "r") as hf:
        apd_ds, node_ds, edge_ds = hf["APDs"], hf["nodes"], hf["edges"]
        n_rows = apd_ds.shape[0]
        for lo in range(0, n_rows, chunk):
            hi = min(lo + chunk, n_rows)
            counts = apd_ds[lo:hi, -1].astype(np.int64)
            sel = np.nonzero(counts > 0)[0]
            if sel.size == 0:
                continue
            nodes = np.repeat(node_ds[lo:hi][sel].astype(np.float32),
                              counts[sel], axis=0)
            edges = np.repeat(edge_ds[lo:hi][sel].astype(np.float32),
                              counts[sel], axis=0)
            n_nodes = (nodes.sum(axis=2) > 0).sum(axis=1)
            parts.append(graph_set_properties(cfg, nodes, edges, n_nodes))
            weights.append(int(nodes.shape[0]))
    return merge_ts_properties(parts, weights), int(sum(weights))


def combine_shards(shard_paths: List[str], out_path: str,
                   cfg: Optional[GraphInventConfig] = None,
                   is_training_set: bool = False,
                   remove_shards: bool = False) -> str:
    """Merges shard HDF files into one (built-in replacement for
    tools/combine_HDFs.py:120-189).  With ``cfg`` and ``is_training_set``,
    also recomputes the training-set property CSV over the merged file
    (replacing the reference's shard-CSV averaging, combine_HDFs.py:76-118,
    with an exact recomputation)."""
    arrays: Dict[str, List[np.ndarray]] = {"nodes": [], "edges": [], "APDs": []}
    for p in shard_paths:
        with h5py.File(p, "r") as hf:
            for name in arrays:
                arrays[name].append(hf[name][:])
    with h5py.File(out_path, "w") as out:
        for name, parts in arrays.items():
            out.create_dataset(name, data=np.concatenate(parts), chunks=None,
                               dtype=np.int8)
    if remove_shards:
        for p in shard_paths:
            os.remove(p)
    if cfg is not None and is_training_set:
        ts, _ = ts_properties_from_hdf(cfg, out_path)
        if ts:
            write_ts_properties_csv(out_path[:-2] + "csv", ts)
    return out_path


def write_preprocessing_params_csv(cfg: GraphInventConfig) -> None:
    """Writes ``preprocessing_params.csv`` into the dataset dir so later
    train/generate/test jobs can cross-check their featurization config
    (reference: util.write_preprocessing_parameters, util.py:493-518)."""
    keys = ("atom_types", "formal_charge", "imp_H", "chirality",
            "max_n_nodes", "use_aromatic_bonds", "use_chirality",
            "use_explicit_H", "ignore_H")
    me = cfg.to_dict()
    path = os.path.join(cfg.dataset_dir, "preprocessing_params.csv")
    with open(path, "w") as fh:
        for key in keys:
            value = me[key]
            if isinstance(value, tuple):
                value = list(value)
            fh.write(f"{key};{value}\n")


def _shard_plan(cfg: GraphInventConfig) -> Tuple[int, List[int], bool]:
    """-> (num_shards, shards this process runs, multihost).

    Single process: ``preprocess_num_shards`` shards run sequentially here
    (then combine), or just ``preprocess_shard_index`` when set -- the
    reference's manual one-shard-per-SLURM-job flow
    (tools/submit-split-preprocessing-supercloud.py:8-17), combined later
    with tools/combine_hdfs.py.  Multi-host: one shard per process by
    default (round-robin if num_shards > processes); process 0 combines."""
    multihost = cfg.num_processes > 1
    if multihost:
        from graphinvent_tpu.parallel.multihost import (
            process_count, process_index,
        )
        n_proc, pid = process_count(), process_index()
        num_shards = cfg.preprocess_num_shards or n_proc
        return num_shards, list(range(pid, num_shards, n_proc)), True
    num_shards = cfg.preprocess_num_shards or 1
    if num_shards > 1 and cfg.preprocess_shard_index >= 0:
        return num_shards, [cfg.preprocess_shard_index], False
    return num_shards, list(range(num_shards)), False


def preprocess_dataset(cfg: GraphInventConfig, restart: bool = False) -> None:
    """Preprocesses valid -> test -> train, matching the reference's order
    and restart inference (Workflow.preprocess_phase, Workflow.py:294-353).
    Honors config ``preprocess_num_shards`` / ``preprocess_shard_index``;
    under multi-host each process takes its own shards and only process 0
    combines + writes ``train.csv`` / ``preprocessing_params.csv``."""
    num_shards, my_shards, multihost = _shard_plan(cfg)
    partial_run = (num_shards > 1 and not multihost
                   and cfg.preprocess_shard_index >= 0)
    paths = [
        (os.path.join(cfg.dataset_dir, "valid.smi"), False),
        (os.path.join(cfg.dataset_dir, "test.smi"), False),
        (os.path.join(cfg.dataset_dir, "train.smi"), True),
    ]
    if not restart:
        for smi, _ in paths:
            h5 = smi[:-3] + "h5"
            if os.path.exists(h5):
                raise OSError(
                    f"{h5} already exists; delete it to re-preprocess "
                    "(reference: Workflow.py:298-309)")

    def barrier(tag: str) -> None:
        if multihost:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(tag)

    for smi, is_train in paths:
        if not os.path.exists(smi):
            continue
        h5 = smi[:-3] + "h5"
        if restart and os.path.exists(h5) and \
                (num_shards > 1 or not os.path.exists(h5 + ".chunked")):
            # finished (and, if sharded, combined) in a previous run; the
            # unsharded check keeps the reference's crash-window semantics
            # (h5 + leftover .chunked => redo, Workflow.py:317-353)
            continue
        print(f"* Preprocessing {smi}"
              + (f" (shards {my_shards} of {num_shards})"
                 if num_shards > 1 else ""), flush=True)
        shard_paths = []
        for shard in my_shards:
            p = Preprocessor(cfg, smi, is_training_set=is_train,
                             shard_index=shard, num_shards=num_shards)
            if restart and os.path.exists(p.h5_path) \
                    and not os.path.exists(p.h5_path + ".chunked"):
                shard_paths.append(p.h5_path)
                continue    # this shard finished in a previous run
            shard_paths.append(p.run(restart=restart))
        barrier(f"preprocess:{os.path.basename(smi)}")
        if num_shards > 1 and not partial_run and _is_primary_process(multihost):
            all_shards = [smi[:-3] + f"h5.shard{i}" for i in range(num_shards)]
            combine_shards(all_shards, h5, cfg=cfg,
                           is_training_set=is_train, remove_shards=True)
        barrier(f"combined:{os.path.basename(smi)}")
    if (not multihost or _is_primary_process(multihost)) and not partial_run:
        write_preprocessing_params_csv(cfg)


def _is_primary_process(multihost: bool) -> bool:
    if not multihost:
        return True
    from graphinvent_tpu.parallel.multihost import is_primary
    return is_primary()
