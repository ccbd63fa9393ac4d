"""Molecular graph featurization, decoding routes, and APD targets.

Rebuilds the semantics of graphinvent/MolecularGraph.py (PreprocessingGraph /
GenerationGraph) on NumPy, with two deliberate efficiency changes:

* the decoding route is produced by a single backward truncation sweep
  (O(route length)) instead of re-truncating from scratch for every subgraph
  index (reference: MolecularGraph.py:691-732, O(route^2));
* node orderings use explicitly sorted containers where the reference
  depended on Python ``set`` iteration order (MolecularGraph.py:352-377).

APD layout (flattened ``[f_add | f_conn | f_term]``) matches
parameters/constants.py:49-95 exactly, so HDF files are interchangeable with
the reference's.
"""

from __future__ import annotations

import random as _random
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.chem.molecule import Atom, Molecule, SanitizeError
from graphinvent_tpu.chem.canon import canonical_ranks


class FeaturizationError(ValueError):
    """Atom/bond outside the configured vocabulary."""


# ==========================================================================
# Featurization (reference: MolecularGraph.py:286-326)
# ==========================================================================

def atom_feature_vector(mol: Molecule, i: int, cfg: GraphInventConfig) -> np.ndarray:
    atom = mol.atoms[i]
    out = np.zeros(cfg.n_node_features, dtype=np.int8)
    try:
        out[cfg.atom_types.index(atom.element)] = 1
    except ValueError:
        raise FeaturizationError(f"atom type {atom.element!r} not in vocabulary")
    try:
        out[cfg.n_atom_types + cfg.formal_charge.index(atom.charge)] = 1
    except ValueError:
        raise FeaturizationError(f"formal charge {atom.charge} not in vocabulary")
    offset = cfg.n_atom_types + cfg.n_formal_charge
    if cfg.n_imp_H:
        n_h = mol.implicit_h(i)
        try:
            out[offset + cfg.imp_H.index(n_h)] = 1
        except ValueError:
            raise FeaturizationError(f"implicit H count {n_h} not in vocabulary")
        offset += cfg.n_imp_H
    if cfg.use_chirality:
        chir = atom.chirality if atom.chirality in cfg.chirality else "None"
        out[offset + cfg.chirality.index(chir)] = 1
    return out


def mol_to_graph(mol: Molecule, cfg: GraphInventConfig,
                 pad: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Molecule -> (node_features [n,Fn], edge_features [n,n,E]) int8 arrays
    (reference: MolecularGraph.py:227-255)."""
    n = mol.n_atoms
    nodes = np.zeros((n, cfg.n_node_features), dtype=np.int8)
    for i in range(n):
        nodes[i] = atom_feature_vector(mol, i, cfg)
    edges = np.zeros((n, n, cfg.n_edge_features), dtype=np.int8)
    for (a, b), t in mol.bonds.items():
        if t >= cfg.n_edge_features:
            raise FeaturizationError(
                f"bond type {t} not representable (n_edge_features="
                f"{cfg.n_edge_features}); kekulize first or enable aromatic bonds")
        edges[a, b, t] = 1
        edges[b, a, t] = 1
    if pad:
        nodes, edges = pad_graph(nodes, edges, cfg.max_n_nodes)
    return nodes, edges


def pad_graph(nodes: np.ndarray, edges: np.ndarray,
              max_n_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    n = nodes.shape[0]
    if n > max_n_nodes:
        raise FeaturizationError(f"graph has {n} nodes > max_n_nodes={max_n_nodes}")
    nodes_p = np.zeros((max_n_nodes, nodes.shape[1]), dtype=nodes.dtype)
    edges_p = np.zeros((max_n_nodes, max_n_nodes, edges.shape[2]), dtype=edges.dtype)
    nodes_p[:n] = nodes
    edges_p[:n, :n] = edges
    return nodes_p, edges_p


def graph_to_mol(nodes: np.ndarray, edges: np.ndarray, n_nodes: int,
                 cfg: GraphInventConfig) -> Optional[Molecule]:
    """Node/edge feature tensors -> Molecule (reference:
    MolecularGraph.py:94-156 and GraphGenerator.py:732-788).  Returns None
    for empty graphs."""
    n_nodes = int(n_nodes)
    if n_nodes <= 0:
        return None
    mol = Molecule()
    for v in range(n_nodes):
        fv = np.asarray(nodes[v])
        nz = np.nonzero(fv)[0]
        if len(nz) < 2:
            return None
        atom_type = cfg.atom_types[int(nz[0])]
        charge = cfg.formal_charge[int(nz[1]) - cfg.n_atom_types]
        atom = Atom(atom_type, charge=charge)
        offset = cfg.n_atom_types + cfg.n_formal_charge
        seg = 2
        if cfg.n_imp_H:
            atom.n_implicit_h = cfg.imp_H[int(nz[seg]) - offset]
            offset += cfg.n_imp_H
            seg += 1
        if cfg.use_chirality:
            atom.chirality = cfg.chirality[int(nz[seg]) - offset]
        mol.add_atom(atom)
    e = np.asarray(edges)[:n_nodes, :n_nodes]
    ii, jj, tt = np.nonzero(e)
    for a, b, t in zip(ii.tolist(), jj.tolist(), tt.tolist()):
        if a < b:
            mol.add_bond(a, b, int(t))
            if int(t) == 3:     # aromatic bond (use_aromatic_bonds mode)
                mol.atoms[a].aromatic = True
                mol.atoms[b].aromatic = True
    return mol


# ==========================================================================
# Node ordering (reference: MolecularGraph.py:328-461)
# ==========================================================================

def _neighbor_lists(edges: np.ndarray, n_nodes: int) -> List[List[int]]:
    adj = edges[:n_nodes, :n_nodes].sum(axis=2)
    return [list(np.nonzero(adj[i])[0]) for i in range(n_nodes)]


def breadth_first_ordering(edges: np.ndarray, n_nodes: int,
                           node_ranking: Sequence[int], node_init: int) -> List[int]:
    """BFS ordering prioritised by ``node_ranking`` (higher rank visited
    first within a frontier).  Reference: MolecularGraph.py:328-379."""
    nbrs = _neighbor_lists(edges, n_nodes)
    visited = [node_init]
    visited_set = {node_init}
    frontier = [node_init]
    while len(visited) < n_nodes:
        next_frontier: List[int] = []
        for node in sorted(frontier):
            new = [v for v in nbrs[node] if v not in visited_set
                   and v not in next_frontier]
            new.sort(key=lambda v: -node_ranking[v])
            next_frontier.extend(new)
        ordered = []
        for v in next_frontier:
            if v not in visited_set:
                visited_set.add(v)
                ordered.append(v)
        visited.extend(ordered)
        frontier = ordered
        if not ordered and len(visited) < n_nodes:
            raise ValueError("disconnected graph in BFS ordering")
    return visited


def depth_first_ordering(edges: np.ndarray, n_nodes: int,
                         node_ranking: Sequence[int], node_init: int) -> List[int]:
    """DFS ordering prioritised by ``node_ranking`` with backtracking
    (reference: MolecularGraph.py:381-433)."""
    nbrs = _neighbor_lists(edges, n_nodes)
    visited = [node_init]
    visited_set = {node_init}
    last = node_init
    while len(visited) < n_nodes:
        new = [v for v in nbrs[last] if v not in visited_set]
        if not new:
            last = visited[visited.index(last) - 1]
            continue
        nxt = max(new, key=lambda v: node_ranking[v])
        visited.append(nxt)
        visited_set.add(nxt)
        last = nxt
    return visited


def reorder_graph(nodes: np.ndarray, edges: np.ndarray,
                  ordering: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    idx = np.asarray(ordering)
    return nodes[idx], edges[np.ix_(idx, idx)]


def ordered_graph(mol: Molecule, cfg: GraphInventConfig,
                  rng: Optional[_random.Random] = None
                  ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Featurize + remap nodes (canonical or random ranking, BFS/DFS route)
    + pad.  Reference: PreprocessingGraph.__init__, MolecularGraph.py:264-284.
    Returns (nodes [M,Fn], edges [M,M,E], n_nodes)."""
    nodes, edges = mol_to_graph(mol, cfg)
    n = mol.n_atoms
    if cfg.use_canon:
        ranking = canonical_ranks(mol)
    else:
        ranking = list(range(n))
        (rng or _random).shuffle(ranking)
    # the reference seeds the traversal at node index ``ranking[0]``
    # (MolecularGraph.py:453-458) -- i.e. the rank of input atom 0 reused as
    # a node index; kept for behavioural parity.
    init = ranking[0] if n > 0 else 0
    if n > 1:
        if cfg.decoding_route == "bfs":
            ordering = breadth_first_ordering(edges, n, ranking, init)
        else:
            ordering = depth_first_ordering(edges, n, ranking, init)
        nodes, edges = reorder_graph(nodes, edges, ordering)
    nodes, edges = pad_graph(nodes, edges, cfg.max_n_nodes)
    return nodes, edges, n


# ==========================================================================
# APD targets + decoding route (reference: MolecularGraph.py:463-732)
# ==========================================================================

def _bonded_to_last(edges: np.ndarray, last: int, n_edge_features: int
                    ) -> List[int]:
    """Nodes bonded to ``last`` in the reference's iteration order: ascending
    node index within each bond type, bond types in order
    (MolecularGraph.py:501-506)."""
    out: List[int] = []
    for t in range(n_edge_features):
        out.extend(np.nonzero(edges[:, last, t])[0].tolist())
    return out


def _nonzero_segment_indices(node_row: np.ndarray, offsets: Sequence[int]) -> List[int]:
    """Per-segment indices of the one-hot node feature row
    (reference: MolecularGraph.py:563-590)."""
    idc = np.nonzero(node_row)[0]
    seg = [int(idc[0])]
    for k, value in enumerate(idc[1:]):
        seg.append(int(value) - offsets[k])
    return seg


def decoding_apd(nodes: np.ndarray, edges: np.ndarray, n_nodes: int,
                 cfg: GraphInventConfig) -> np.ndarray:
    """APD that transforms the graph *minus its last action* into this graph
    (reference: get_decoding_APD, MolecularGraph.py:463-530)."""
    f_add = np.zeros(cfg.dim_f_add, dtype=np.int8)
    f_conn = np.zeros(cfg.dim_f_conn, dtype=np.int8)
    last = n_nodes - 1
    fv_idc = _nonzero_segment_indices(nodes[last], cfg.feature_offsets)
    bonded = _bonded_to_last(edges, last, cfg.n_edge_features)
    if bonded:
        v = bonded[-1]
        bond_type = int(np.nonzero(edges[v, last, :])[0][0])
        if len(bonded) > 1:
            f_conn[v, bond_type] = 1
        else:
            f_add[tuple([v] + fv_idc + [bond_type])] = 1
    else:
        f_add[tuple([0] + fv_idc + [0])] = 1
    return np.concatenate(
        [f_add.ravel(), f_conn.ravel(), np.zeros(1, dtype=np.int8)])


def terminal_apd(cfg: GraphInventConfig) -> np.ndarray:
    """APD indicating termination (reference: MolecularGraph.py:532-555)."""
    apd = np.zeros(cfg.dim_apd, dtype=np.int8)
    apd[-1] = 1
    return apd


def truncate_graph(nodes: np.ndarray, edges: np.ndarray, n_nodes: int,
                   cfg: GraphInventConfig) -> int:
    """Removes the last action from the graph in place; returns new n_nodes
    (reference: truncate_graph, MolecularGraph.py:635-674)."""
    last = n_nodes - 1
    if n_nodes == 1:
        nodes[last, :] = 0
        return 0
    bonded = _bonded_to_last(edges, last, cfg.n_edge_features)
    degree = len(bonded)
    if degree == 1:
        nodes[last, :] = 0
        v = bonded[0]
        edges[v, last, :] = 0
        edges[last, v, :] = 0
        return n_nodes - 1
    v = bonded[-1]
    edges[v, last, :] = 0
    edges[last, v, :] = 0
    return n_nodes


def decoding_route(mol: Molecule, cfg: GraphInventConfig,
                   rng: Optional[_random.Random] = None
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yields (nodes, edges, apd) for every subgraph along the decoding route,
    in the reference's HDF order: full graph + terminate APD first, then
    progressively truncated graphs (reference: DataProcesser.py:197-231 +
    MolecularGraph.py:676-732).  Single backward sweep; arrays are copies."""
    nodes, edges, n_nodes = ordered_graph(mol, cfg, rng=rng)
    yield nodes.copy(), edges.copy(), terminal_apd(cfg)
    route_len = int(edges.sum() // 2) + 2
    n = n_nodes
    for _ in range(route_len - 1):
        apd = decoding_apd(nodes, edges, n, cfg)
        n = truncate_graph(nodes, edges, n, cfg)
        yield nodes.copy(), edges.copy(), apd


def decoding_route_length(mol: Molecule) -> int:
    """Number of subgraphs in the decoding route = n_edges + 2
    (reference: MolecularGraph.py:676-689)."""
    return len(mol.bonds) + 2


class MolGraph:
    """Lightweight container pairing feature tensors with an optional
    Molecule, mirroring GenerationGraph (MolecularGraph.py:783-809)."""

    def __init__(self, cfg: GraphInventConfig, nodes: np.ndarray,
                 edges: np.ndarray, n_nodes: int,
                 molecule: Optional[Molecule] = None) -> None:
        self.cfg = cfg
        self.node_features = nodes
        self.edge_features = edges
        self.n_nodes = int(n_nodes)
        self._molecule = molecule
        self._mol_built = molecule is not None

    @property
    def molecule(self) -> Optional[Molecule]:
        if not self._mol_built:
            try:
                self._molecule = graph_to_mol(
                    self.node_features, self.edge_features, self.n_nodes, self.cfg)
            except Exception:
                self._molecule = None
            self._mol_built = True
        return self._molecule

    def get_smiles(self) -> Optional[str]:
        from graphinvent_tpu.chem.smiles import mol_to_smiles
        mol = self.molecule
        return mol_to_smiles(mol) if mol is not None else None

    def is_valid(self) -> bool:
        mol = self.molecule
        if mol is None:
            return False
        try:
            mol.sanitize()
        except SanitizeError:
            return False
        return True

    def get_n_edges(self) -> int:
        return int(self.edge_features.sum() // 2)
