"""Dataset creation: filter + split a raw SMILES collection.

Offline counterpart of tools/tdc-create-dataset.py (reference: 34-60, which
downloads ChEMBL/MOSES/ZINC via TDC and filters to <= 80 heavy atoms and
formal charges in {-1, 0, 1}).  This environment has no network access, so
this tool applies the same filters + canonicalisation + train/valid/test
splitting to a local SMILES file:

    python tools/create_dataset.py raw.smi out_dir/ \
        --max-atoms 80 --charges -1 0 1 --valid-frac 0.05 --test-frac 0.05 \
        [--jobs 8]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import random
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.chem import mol_from_smiles, mol_to_smiles
from graphinvent_tpu.data.preprocess import read_smiles_file

_FILTER: tuple = ()           # (max_atoms, frozenset(charges)) in workers


def _filter_one(smi: str):
    """Parse + filter + canonicalize one SMILES; None when rejected.
    Module-level so a multiprocessing pool can run it; results are
    order-independent downstream (sorted-set dedupe), so any worker
    count gives byte-identical splits."""
    max_atoms, charges = _FILTER
    try:
        mol = mol_from_smiles(smi)
    except Exception:
        return None
    if not mol.is_connected():
        return None
    if mol.n_atoms > max_atoms:
        return None
    if any(a.charge not in charges for a in mol.atoms):
        return None
    return mol_to_smiles(mol)


def _pool_init(max_atoms: int, charges: frozenset) -> None:
    global _FILTER
    _FILTER = (max_atoms, charges)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--max-atoms", type=int, default=80)
    ap.add_argument("--charges", type=int, nargs="+", default=[-1, 0, 1])
    ap.add_argument("--valid-frac", type=float, default=0.05)
    ap.add_argument("--test-frac", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jobs", type=int, default=1,
                    help="parser worker processes (the parse+canonicalize "
                         "pass is the wall-clock at >=100k molecules)")
    args = ap.parse_args()

    raw = list(read_smiles_file(args.input))
    n_in = len(raw)
    _pool_init(args.max_atoms, frozenset(args.charges))
    if args.jobs > 1:
        ctx = mp.get_context("fork")
        with ctx.Pool(args.jobs, initializer=_pool_init,
                      initargs=_FILTER) as pool:
            canon = pool.map(_filter_one, raw, chunksize=256)
    else:
        canon = [_filter_one(s) for s in raw]
    keep = sorted({c for c in canon if c})
    random.Random(args.seed).shuffle(keep)

    n = len(keep)
    n_valid = int(n * args.valid_frac)
    n_test = int(n * args.test_frac)
    splits = {
        "valid": keep[:n_valid],
        "test": keep[n_valid:n_valid + n_test],
        "train": keep[n_valid + n_test:],
    }
    os.makedirs(args.out_dir, exist_ok=True)
    for name, rows in splits.items():
        with open(os.path.join(args.out_dir, f"{name}.smi"), "w") as fh:
            fh.write("SMILES\n")
            for s in rows:
                fh.write(s + "\n")
    print(f"{n_in} in -> {n} kept "
          f"(train {len(splits['train'])}, valid {n_valid}, test {n_test})")


if __name__ == "__main__":
    main()
