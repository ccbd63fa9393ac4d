"""Dataset statistics for choosing preprocessing parameters.

Replaces the reference's three separate scripts (tools/atom_types.py,
tools/formal_charges.py, tools/max_n_nodes.py) with one:

    python tools/dataset_stats.py path/to/train.smi [more.smi ...]

prints the atom types, formal charges, implicit-H range, and max node count
present, plus a ready-to-paste preprocessing_params.csv block.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.chem import mol_from_smiles
from graphinvent_tpu.data.preprocess import read_smiles_file


def main(paths) -> None:
    atom_types, charges, imp_hs = set(), set(), set()
    max_nodes = 0
    n_ok, n_bad = 0, 0
    for path in paths:
        for smi in read_smiles_file(path):
            try:
                mol = mol_from_smiles(smi)
            except Exception:
                n_bad += 1
                continue
            n_ok += 1
            max_nodes = max(max_nodes, mol.n_atoms)
            for i, atom in enumerate(mol.atoms):
                atom_types.add(atom.element)
                charges.add(atom.charge)
                imp_hs.add(mol.implicit_h(i))
    print(f"# {n_ok} molecules parsed, {n_bad} failed")
    print(f"atom types    : {sorted(atom_types)}")
    print(f"formal charges: {sorted(charges)}")
    print(f"implicit Hs   : {sorted(imp_hs)}")
    print(f"max n nodes   : {max_nodes}")
    print("\n# preprocessing_params.csv:")
    print(f"atom_types;{sorted(atom_types)}")
    print(f"formal_charge;{sorted(charges)}")
    print(f"imp_H;{sorted(imp_hs)}")
    print(f"max_n_nodes;{max_nodes}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: dataset_stats.py <smi file> [...]")
    main(sys.argv[1:])
