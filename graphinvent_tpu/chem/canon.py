"""Canonical atom ranking (Morgan / Weisfeiler-Lehman refinement with
deterministic tie-breaking).

Stand-in for rdkit.Chem.CanonicalRankAtoms(mol, breakTies=True) as used by
the reference's node re-mapping step (MolecularGraph.py:435-461).  The exact
ordering differs from RDKit's, but it is deterministic over graph
automorphism, which is all the decoding-route construction and canonical
SMILES writer require.
"""

from __future__ import annotations

from typing import List, Tuple

from graphinvent_tpu.chem.molecule import ATOMIC_NUM, Molecule


def _initial_invariants(mol: Molecule) -> List[Tuple]:
    in_ring = [False] * mol.n_atoms
    for ring in mol.rings():
        for i in ring:
            in_ring[i] = True
    inv = []
    for i, atom in enumerate(mol.atoms):
        inv.append((
            mol.degree(i),
            ATOMIC_NUM.get(atom.element, 0),
            atom.charge,
            mol.implicit_h(i),
            int(in_ring[i]),
            int(atom.aromatic),
        ))
    return inv


def _refine(mol: Molecule, classes: List[int]) -> List[int]:
    """One WL refinement sweep until the partition stabilises."""
    n = mol.n_atoms
    nbrs = [[(mol.bond_type(i, j), j) for j in mol.neighbors(i)] for i in range(n)]
    while True:
        signatures = []
        for i in range(n):
            neigh = sorted((bt, classes[j]) for bt, j in nbrs[i])
            signatures.append((classes[i], tuple(neigh)))
        order = sorted(range(n), key=lambda i: signatures[i])
        new_classes = [0] * n
        rank = 0
        for k, i in enumerate(order):
            if k > 0 and signatures[i] != signatures[order[k - 1]]:
                rank = k
            new_classes[i] = rank
        if new_classes == classes:
            return classes
        classes = new_classes


def canonical_ranks(mol: Molecule) -> List[int]:
    """Returns rank per atom (0 = first in canonical order), all distinct."""
    n = mol.n_atoms
    if n == 0:
        return []
    inv = _initial_invariants(mol)
    order = sorted(range(n), key=lambda i: inv[i])
    classes = [0] * n
    rank = 0
    for k, i in enumerate(order):
        if k > 0 and inv[i] != inv[order[k - 1]]:
            rank = k
        classes[i] = rank
    classes = _refine(mol, classes)

    # break ties deterministically: promote the smallest-index atom of the
    # first tied class and re-refine, until the partition is discrete
    while True:
        counts = {}
        for c in classes:
            counts[c] = counts.get(c, 0) + 1
        tied = sorted(c for c, k in counts.items() if k > 1)
        if not tied:
            break
        target = tied[0]
        chosen = min(i for i in range(n) if classes[i] == target)
        classes = [c + 1 if c > target or (c == target and i != chosen) else c
                   for i, c in enumerate(classes)]
        # keep ranks compact by re-normalising through a refinement sweep
        classes = _refine(mol, classes)

    # normalise to 0..n-1
    order = sorted(range(n), key=lambda i: classes[i])
    ranks = [0] * n
    for pos, i in enumerate(order):
        ranks[i] = pos
    return ranks
