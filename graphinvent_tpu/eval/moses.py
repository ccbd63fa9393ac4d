"""MOSES-style distribution-learning metrics, computed locally.

The reference's acceptance flow is "train on MOSES, generate 30k, score with
the MOSES metric suite" (reference: tutorials/5_benchmarking_with_moses.md:1-6,
README "Benchmarking"), where the metrics themselves come from the external
``molsets/moses`` package (validity, uniqueness@k, novelty, IntDiv, Filters,
scaffold similarity, property statistics).  That package needs RDKit and a
ChemNet download (FCD), neither of which exists here, so this module
re-implements the computable subset on the in-repo chemistry stack:

* **validity** — fraction of generated SMILES that parse + sanitize
  (``chem.smiles.mol_from_smiles``); the ``[Xx]`` placeholder rows written
  by ``Logger.write_molecules`` for invalid graphs count as invalid.
* **uniqueness@k** — unique fraction among the first k *valid* molecules
  (MOSES definition), plus uniqueness over the full valid set.
* **novelty** — fraction of unique valid generated molecules whose canonical
  SMILES is absent from the training set (both sides canonicalized by the
  same writer, so representation cannot skew membership).
* **IntDiv_p** — 1 - (mean pairwise Tanimoto^p)^(1/p) over Morgan
  fingerprints of (a sample of) the valid set, diagonal included, exactly
  as ``moses.metrics.internal_diversity`` computes it.  The Gram matrix is
  evaluated with jax in row blocks, so on TPU the 10k x 10k case is
  sub-second.
* **scaffold uniqueness / novelty** — Bemis-Murcko frameworks (rings +
  linkers + atoms multiple-bonded directly to the framework, the RDKit
  ``GetScaffoldForMol`` convention) extracted by graph pruning.
* **pass_filters** — fraction of valid molecules with zero structural
  alerts (``chem.descriptors.structural_alerts``, the QED alert list);
  stands in for MOSES "Filters" (whose MCF/PAINS lists are RDKit SMARTS).
* **property W1** — Wasserstein-1 distance between generated and reference
  (test-split) marginals of MW / ALogP / QED / TPSA, computed on matched
  quantile grids; the local analogue of MOSES's property histograms
  (its FCD needs ChemNet and cannot be reproduced offline).

Everything here is deterministic given ``seed`` (sampling for IntDiv and
property marginals uses a seeded Generator).
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from graphinvent_tpu.chem.molecule import Atom, Molecule
from graphinvent_tpu.chem.smiles import mol_from_smiles, mol_to_smiles


# ==========================================================================
# SMILES IO + canonicalization
# ==========================================================================

def read_smi(path: str) -> List[str]:
    """Reads a .smi file (optional ``SMILES`` header line)."""
    out: List[str] = []
    with open(path) as fh:
        for line in fh:
            s = line.strip().split()[0] if line.strip() else ""
            if not s or s == "SMILES":
                continue
            out.append(s)
    return out


def canonicalize(smiles: str) -> Optional[str]:
    """Parse + canonical rewrite; None when the string is not a valid
    molecule.  Both generated and training SMILES go through this exact
    function before any set membership test."""
    if not smiles or smiles == "[Xx]":
        return None
    try:
        mol = mol_from_smiles(smiles)
    except Exception:
        return None
    return mol_to_smiles(mol)


def _canon_worker(smiles: str) -> Optional[str]:
    return canonicalize(smiles)


def canonicalize_all(smiles: Sequence[str], n_jobs: int = 0,
                     chunksize: int = 256) -> List[Optional[str]]:
    """Canonicalize a batch, optionally across processes (the parser is
    pure Python; 8 workers give ~6x on 100k-molecule sets)."""
    if n_jobs and n_jobs > 1 and len(smiles) > 4 * chunksize:
        ctx = mp.get_context("fork")
        with ctx.Pool(n_jobs) as pool:
            return pool.map(_canon_worker, smiles, chunksize=chunksize)
    return [canonicalize(s) for s in smiles]


# ==========================================================================
# Bemis-Murcko scaffolds
# ==========================================================================

def murcko_scaffold(mol: Molecule) -> str:
    """Bemis-Murcko framework: ring atoms + linker atoms, plus atoms
    double/triple-bonded directly to that framework (RDKit
    ``MurckoScaffold.GetScaffoldForMol`` convention).  Returns the
    scaffold's canonical SMILES, or "" for acyclic molecules (MOSES maps
    those to the empty scaffold)."""
    rings = mol.rings()
    if not rings:
        return ""
    ring_atoms = set().union(*map(set, rings))
    adj = {i: set(mol.neighbors(i)) for i in range(mol.n_atoms)}
    keep = set(range(mol.n_atoms))
    # prune terminal non-ring atoms to a fixed point: what survives is
    # exactly rings + ring-ring linker paths (side chains fall off one
    # terminal atom at a time)
    changed = True
    while changed:
        changed = False
        for i in list(keep):
            if i not in ring_atoms and len(adj[i] & keep) <= 1:
                keep.discard(i)
                changed = True
    # re-attach atoms multiple-bonded directly to the framework (=O on a
    # ring carbonyl, exocyclic =N-, etc.) -- bond types 1 (double), 2
    # (triple) in config.BOND_TYPES order
    for i in range(mol.n_atoms):
        if i in keep:
            continue
        for j in adj[i]:
            if j in keep and mol.bond_type(i, j) in (1, 2):
                keep.add(i)
                break
    sub = Molecule()
    remap: Dict[int, int] = {}
    for i in sorted(keep):
        a = mol.atoms[i]
        # an atom that lost substituents must re-derive its implicit-H
        # count from the valence model; untouched atoms keep any explicit
        # override (pyrrole [nH] etc.)
        full_degree = len(adj[i]) == len(adj[i] & keep)
        remap[i] = sub.add_atom(Atom(a.element, a.charge,
                                     a.n_implicit_h if full_degree else None,
                                     "None", a.aromatic, a.isotope))
    for (a, b), t in mol.bonds.items():
        if a in keep and b in keep:
            sub.add_bond(remap[a], remap[b], t)
    return mol_to_smiles(sub) or ""


def _scaffold_worker(smiles: Optional[str]) -> Optional[str]:
    if smiles is None:
        return None
    try:
        return murcko_scaffold(mol_from_smiles(smiles))
    except Exception:
        return None


def scaffolds_all(canon: Sequence[Optional[str]], n_jobs: int = 0,
                  chunksize: int = 256) -> List[Optional[str]]:
    if n_jobs and n_jobs > 1 and len(canon) > 4 * chunksize:
        ctx = mp.get_context("fork")
        with ctx.Pool(n_jobs) as pool:
            return pool.map(_scaffold_worker, canon, chunksize=chunksize)
    return [_scaffold_worker(s) for s in canon]


# ==========================================================================
# Internal diversity (Morgan-Tanimoto Gram matrix, jax-blocked)
# ==========================================================================

def internal_diversity(fps: np.ndarray, p: int = 1,
                       block: int = 2048) -> float:
    """IntDiv_p = 1 - (mean_{i,j} T(f_i, f_j)^p)^(1/p), diagonal included
    (the MOSES ``internal_diversity`` average).  ``fps`` is (n, bits) of
    {0,1}; the Gram matrix runs as jax matmuls in row blocks of ``block``
    so a 10k-molecule set is a few hundred ms on TPU (and tractable on
    CPU: ~2e11 flops at 10k x 2048)."""
    import jax.numpy as jnp

    n = int(fps.shape[0])
    if n == 0:
        return 0.0
    f = jnp.asarray(fps, dtype=jnp.float32)
    counts = f.sum(axis=1)
    total = 0.0
    for s in range(0, n, block):
        blk = f[s:s + block]
        inter = blk @ f.T
        union = counts[s:s + block, None] + counts[None, :] - inter
        t = jnp.where(union > 0, inter / union, 0.0)
        total += float((t ** p).sum())
    mean = total / (n * n)
    return float(1.0 - mean ** (1.0 / p))


# ==========================================================================
# Property marginals
# ==========================================================================

def wasserstein1(a: np.ndarray, b: np.ndarray, n_q: int = 1001) -> float:
    """W1 between two empirical 1-D distributions via matched quantiles."""
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    qs = np.linspace(0.0, 1.0, n_q)
    return float(np.mean(np.abs(np.quantile(a, qs) - np.quantile(b, qs))))


def _property_rows(canon: Sequence[str]) -> np.ndarray:
    """(n, 4) float rows: MW, ALogP, QED, TPSA per canonical SMILES."""
    from graphinvent_tpu.chem.descriptors import (alogp, mol_weight, qed,
                                                  tpsa)
    rows = np.zeros((len(canon), 4))
    for k, s in enumerate(canon):
        try:
            mol = mol_from_smiles(s)
        except Exception:
            continue
        rows[k] = (mol_weight(mol), alogp(mol), qed(mol), tpsa(mol))
    return rows


# ==========================================================================
# The full suite
# ==========================================================================

def compute_metrics(gen_smiles: Sequence[str],
                    train_smiles: Sequence[str],
                    test_smiles: Optional[Sequence[str]] = None,
                    n_jobs: int = 0,
                    n_intdiv: int = 10000,
                    n_props: int = 10000,
                    seed: int = 0) -> Dict[str, float]:
    """MOSES-style metric dict for a generated set against its training
    (and optionally held-out test) set.  IntDiv and the property marginals
    run on seeded samples of at most ``n_intdiv`` / ``n_props`` molecules
    (MOSES computes IntDiv on the full 30k set with a GPU; the cap is a
    wall-clock guard for CPU runs -- set it >= len(gen) to disable)."""
    rng = np.random.default_rng(seed)

    gen_canon = canonicalize_all(gen_smiles, n_jobs)
    valid = [c for c in gen_canon if c is not None]
    n_gen = len(gen_canon)
    out: Dict[str, float] = {
        "n_generated": float(n_gen),
        "validity": len(valid) / n_gen if n_gen else 0.0,
    }
    for k in (1000, 10000):
        head = valid[:k]
        out[f"unique@{k}"] = (len(set(head)) / len(head)) if head else 0.0
    uniq = sorted(set(valid))
    out["uniqueness"] = len(uniq) / len(valid) if valid else 0.0

    train_canon = canonicalize_all(train_smiles, n_jobs)
    train_set = {c for c in train_canon if c is not None}
    out["novelty"] = (sum(1 for c in uniq if c not in train_set) / len(uniq)
                      if uniq else 0.0)

    # scaffolds: generated-unique scaffold pool vs the training pool
    gen_scafs = [s for s in scaffolds_all(uniq, n_jobs) if s is not None]
    train_scaf_set = {s for s in scaffolds_all(sorted(train_set), n_jobs)
                      if s is not None}
    scaf_uniq = set(gen_scafs)
    out["scaffold_uniqueness"] = (len(scaf_uniq) / len(gen_scafs)
                                  if gen_scafs else 0.0)
    out["scaffold_novelty"] = (sum(1 for s in scaf_uniq
                                   if s not in train_scaf_set) / len(scaf_uniq)
                               if scaf_uniq else 0.0)

    # filters: zero QED structural alerts
    from graphinvent_tpu.chem.descriptors import structural_alerts
    n_pass = 0
    props_sample = list(valid)
    if len(props_sample) > n_props:
        props_sample = [props_sample[i] for i in
                        rng.choice(len(props_sample), n_props, replace=False)]
    for s in props_sample:
        try:
            if structural_alerts(mol_from_smiles(s)) == 0:
                n_pass += 1
        except Exception:
            pass
    out["pass_filters"] = n_pass / len(props_sample) if props_sample else 0.0

    # IntDiv over a seeded sample of the valid set
    int_sample = list(valid)
    if len(int_sample) > n_intdiv:
        int_sample = [int_sample[i] for i in
                      rng.choice(len(int_sample), n_intdiv, replace=False)]
    if int_sample:
        from graphinvent_tpu.chem.fingerprint import bulk_fingerprints
        mols = []
        for s in int_sample:
            try:
                mols.append(mol_from_smiles(s))
            except Exception:
                mols.append(None)
        fps = bulk_fingerprints(mols)
        out["int_div_1"] = internal_diversity(fps, p=1)
        out["int_div_2"] = internal_diversity(fps, p=2)
    else:
        out["int_div_1"] = out["int_div_2"] = 0.0

    # property marginals vs the held-out split (train as fallback)
    ref_canon = sorted(train_set)
    if test_smiles is not None:
        test_canon = canonicalize_all(test_smiles, n_jobs)
        ref_canon = sorted({c for c in test_canon if c is not None})
    if len(ref_canon) > n_props:
        ref_canon = [ref_canon[i] for i in
                     rng.choice(len(ref_canon), n_props, replace=False)]
    gen_rows = _property_rows(props_sample)
    ref_rows = _property_rows(ref_canon)
    for col, name in enumerate(("mw", "alogp", "qed", "tpsa")):
        out[f"w1_{name}"] = wasserstein1(gen_rows[:, col], ref_rows[:, col])
    return out
