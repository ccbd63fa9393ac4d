"""Egress-free ChEMBL/MOSES proxy: synthesize random drug-like SMILES.

The reference builds its large-scale datasets by downloading ChEMBL / MOSES /
ZINC through TDC and filtering to <= 80 heavy atoms with charges in
{-1, 0, 1} (reference: tools/tdc-create-dataset.py:34-60).  This environment
has no network access, so this tool *generates* molecules instead: random
atom-typed trees grown under the valence model (chem/molecule.py), plus
random ring closures and (optionally) fused kekulé benzene/pyridine rings,
sanitized and canonicalized with the in-repo chemistry kernel.  The output
feeds tools/create_dataset.py, which applies the reference's filters and
splits -- together they are the local stand-in for the MOSES-scale
acceptance campaign (reference: tutorials/5_benchmarking_with_moses.md:1-6).

    python tools/synthesize_smiles.py out.smi --n 5000 \
        --min-atoms 25 --max-atoms 40 [--aromatic] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.chem import Atom, Molecule, mol_to_smiles
from graphinvent_tpu.chem.molecule import allowed_valences

# element draw weights: roughly organic/drug-like composition
ELEMENTS = ["C", "N", "O", "S", "Cl"]
WEIGHTS = [0.72, 0.11, 0.11, 0.04, 0.02]
BOND_ORDERS = [1, 2, 3]
BOND_WEIGHTS = [0.86, 0.12, 0.02]


def _free_valence(mol: Molecule, i: int) -> float:
    a = mol.atoms[i]
    vals = allowed_valences(a.element, a.charge)
    if not vals:
        return 0.0
    return max(vals) - mol.explicit_valence(i)


def _graph_distance(mol: Molecule, a: int, b: int, cap: int = 6) -> int:
    """BFS distance up to ``cap`` (ring-closure filter)."""
    if a == b:
        return 0
    frontier, dist, seen = [a], 0, {a}
    while frontier and dist < cap:
        dist += 1
        nxt = []
        for u in frontier:
            for v in mol.neighbors(u):
                if v == b:
                    return dist
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return cap


def _attach_benzene(mol: Molecule, rng: np.random.Generator,
                    anchor: int) -> None:
    """Fuses a kekulé 6-ring (benzene, or pyridine 20% of the time) to
    ``anchor`` via a single bond; aromaticity is perceived at write time."""
    ring = []
    for k in range(6):
        el = "N" if (k == 1 and rng.random() < 0.2) else "C"
        ring.append(mol.add_atom(Atom(el)))
    # kekulé: alternate double (type 1) / single (type 0) around the cycle
    for k in range(6):
        mol.add_bond(ring[k], ring[(k + 1) % 6], 1 if k % 2 == 0 else 0)
    mol.add_bond(anchor, ring[0], 0)


def random_molecule(rng: np.random.Generator, n_target: int,
                    aromatic: bool = False) -> Molecule:
    mol = Molecule()
    first = rng.choice(len(ELEMENTS), p=WEIGHTS)
    mol.add_atom(Atom(ELEMENTS[int(first)]))
    while mol.n_atoms < n_target:
        # fused aromatic ring (costs 6 atoms) ~15% of growth steps
        if aromatic and mol.n_atoms + 6 <= n_target and rng.random() < 0.15:
            anchors = [i for i in range(mol.n_atoms)
                       if _free_valence(mol, i) >= 1
                       and not mol.atoms[i].aromatic]
            if anchors:
                _attach_benzene(mol, rng,
                                int(anchors[rng.integers(len(anchors))]))
                continue
        anchors = [i for i in range(mol.n_atoms) if _free_valence(mol, i) >= 1]
        if not anchors:
            break
        anchor = int(anchors[rng.integers(len(anchors))])
        el = ELEMENTS[int(rng.choice(len(ELEMENTS), p=WEIGHTS))]
        charge = 0
        if rng.random() < 0.015 and el in ("N", "O"):
            charge = 1 if el == "N" else -1
        order = int(rng.choice(BOND_ORDERS, p=BOND_WEIGHTS))
        max_new = max(allowed_valences(el, charge) or (1,))
        order = min(order, int(_free_valence(mol, anchor)), max_new)
        if el == "Cl":
            order = 1
        if order < 1:
            continue
        j = mol.add_atom(Atom(el, charge=charge))
        mol.add_bond(anchor, j, order - 1)     # bond type index = order - 1
    # random ring closures between distant atoms with spare valence
    for _ in range(int(rng.integers(0, max(2, mol.n_atoms // 10)))):
        cands = [i for i in range(mol.n_atoms) if _free_valence(mol, i) >= 1]
        if len(cands) < 2:
            break
        a, b = rng.choice(len(cands), 2, replace=False)
        a, b = int(cands[a]), int(cands[b])
        if mol.bond_type(a, b) is None and _graph_distance(mol, a, b) >= 3:
            mol.add_bond(a, b, 0)
    return mol


def synthesize(n: int, min_atoms: int, max_atoms: int, seed: int = 0,
               aromatic: bool = False) -> list:
    rng = np.random.default_rng(seed)
    out, seen = [], set()
    attempts = 0
    while len(out) < n and attempts < 50 * n:
        attempts += 1
        n_target = int(rng.integers(min_atoms, max_atoms + 1))
        mol = random_molecule(rng, n_target, aromatic=aromatic)
        if not (min_atoms <= mol.n_atoms <= max_atoms):
            continue
        try:
            mol.sanitize()
        except Exception:
            continue
        smi = mol_to_smiles(mol)
        if smi is None or smi in seen:
            continue
        # round-trip guarantee: the emitted SMILES must parse + sanitize in
        # BOTH preprocessing modes (kekulized and aromatic-bond)
        try:
            from graphinvent_tpu.chem import mol_from_smiles
            mol_from_smiles(smi, kekulize_mol=True)
            mol_from_smiles(smi, kekulize_mol=False)
        except Exception:
            continue
        seen.add(smi)
        out.append(smi)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--min-atoms", type=int, default=25)
    ap.add_argument("--max-atoms", type=int, default=40)
    ap.add_argument("--aromatic", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    smiles = synthesize(args.n, args.min_atoms, args.max_atoms,
                        seed=args.seed, aromatic=args.aromatic)
    with open(args.output, "w") as fh:
        fh.write("SMILES\n")
        for s in smiles:
            fh.write(s + "\n")
    print(f"wrote {len(smiles)} unique molecules to {args.output}")


if __name__ == "__main__":
    main()
