"""A/B: single-phase sampler vs the two-phase straggler harvest.

The round-5 occupancy study (BASELINE.md, tools/occupancy.py) measured the
sampling loop's tail: at N=80 the while_loop runs ~96 rounds for a mean 58
actions/row (60.4% occupancy), with an amortized two-phase ceiling of
1.26x.  This tool runs the actual scheme (sampling/two_phase.py) against
the plain GraphSampler on the same checkpoint and reports end-to-end
molecules/s for both, plus the straggler statistics that determine the
amortized win.  Run with a TRAINED checkpoint -- random-init rows die in a
few rounds and no tail exists.

    PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_two_phase.py \
        <ckpt> [batch_size] [dtype] [max_atoms] [aromatic] [R] [n_batches]

R defaults to ~p50 of the action-count distribution measured by
tools/occupancy.py (57 at N=80); pass an explicit cap to sweep.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import preset
from graphinvent_tpu.sampling import GraphSampler
from graphinvent_tpu.sampling.two_phase import TwoPhaseSampler
from graphinvent_tpu.utils.checkpoint import load_params_any

DEFAULT_R = {13: 16, 40: 37, 80: 57}    # two-phase caps from the occupancy
                                        # study (BASELINE.md round 5)


def main(ckpt, batch_size=500, dtype="bfloat16", max_atoms=80,
         aromatic=True, R=None, n_batches=6):
    kw = dict(max_n_nodes=max_atoms)
    if aromatic:
        kw.update(use_aromatic_bonds=True,
                  atom_types=["C", "N", "O", "S", "Cl"])
    cfg = preset("GGNN", compute_dtype=dtype, **kw)
    params = jax.tree_util.tree_map(jnp.asarray, load_params_any(cfg, ckpt))
    R = R or DEFAULT_R.get(max_atoms, int(max_atoms * 0.72))
    print(f"B={batch_size} N={max_atoms} dtype={dtype} R={R} "
          f"n_batches={n_batches}")

    key = jax.random.PRNGKey(17)

    def run_single():
        s = GraphSampler(cfg, batch_size)
        t0 = time.time()
        res = [s.sample(params, jax.random.fold_in(key, b), quiet=True)
               for b in range(n_batches)]
        return time.time() - t0, res

    def run_two_phase():
        tp = TwoPhaseSampler(cfg, batch_size, phase1_rounds=R)
        t0 = time.time()
        res, stats = tp.sample_many(params, key, n_batches)
        return time.time() - t0, res, stats

    # warm-up both programs (compile + server program load), then
    # min-of-3: tunnel jitter is comparable to the margin under test
    n_mols = batch_size * n_batches
    best_s, best_t = float("inf"), float("inf")
    stats = None
    for rep in range(4):
        dt_s, res_s = run_single()
        dt_t, res_t, st = run_two_phase()
        if rep == 0:
            term_s = sum(int(r.properly_terminated.sum()) for r in res_s)
            term_t = sum(int(r.properly_terminated.sum()) for r in res_t)
            rounds_s = sum(r.n_rounds for r in res_s)
            print(f"warm-up: single {dt_s:.2f}s ({rounds_s} rounds, "
                  f"{term_s}/{n_mols} term), two-phase {dt_t:.2f}s "
                  f"({term_t}/{n_mols} term)")
            continue
        best_s, best_t = min(best_s, dt_s), min(best_t, dt_t)
        stats = st
    print(f"single-phase : {best_s:6.2f} s  {n_mols/best_s:8.0f} mol/s")
    print(f"two-phase    : {best_t:6.2f} s  {n_mols/best_t:8.0f} mol/s "
          f"({best_s/best_t:.2f}x)")
    print(f"stragglers   : {stats['n_stragglers']}/{n_mols} "
          f"({100*stats['straggler_frac']:.1f}%), "
          f"{stats['n_continuation']} continuation batches")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0],
         int(a[1]) if len(a) > 1 else 500,
         a[2] if len(a) > 2 else "bfloat16",
         int(a[3]) if len(a) > 3 else 80,
         (a[4].lower() in ("1", "true", "aromatic")) if len(a) > 4 else True,
         int(a[5]) if len(a) > 5 else None,
         int(a[6]) if len(a) > 6 else 6)
