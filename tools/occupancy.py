"""Sampler round-occupancy study (round-4 verdict item 7).

The on-device sampler (`sampling/generator.py`) runs its while_loop until
EVERY row of the batch is done, so late rounds pay a full model forward for
mostly-frozen rows (the reference answered the same waste with slot
recycling, GraphGenerator.py:340-465).  This tool measures how much is
actually wasted: a row taking T actions is live in rounds 0..T-1, so the
live-row curve falls straight out of the packed `t_counts` output — no
extra device code.

    python tools/occupancy.py <ckpt> [batch] [dtype] [max_atoms] [aromatic] [batches]

Prints the live-fraction-per-round curve and, for every candidate phase-1
round cap R, the amortized rounds/batch of an (unbiased) two-phase scheme:
phase 1 runs R rounds; rows not done at R are carried over — state, not
resampled molecules, so no distribution bias — and continued in compact
full batches with the remaining budget.  Amortized cost model:

    rounds(R) = R + f(R) * (T_obs - R)        f(R) = live fraction at R

(continuation batches are only ~f(R) full per phase-1 batch, so their
rounds amortize by f(R)).  The printed best-R speedup is the ceiling such
a scheme could reach; whether to build it is decided from this table.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from graphinvent_tpu.config import preset
from graphinvent_tpu.sampling import GraphSampler
from graphinvent_tpu.utils.checkpoint import load_params_any


def occupancy_curve(t_counts: np.ndarray, n_rounds: int) -> np.ndarray:
    """live_fraction[r] = fraction of rows still sampling at round r."""
    r = np.arange(n_rounds)
    return (t_counts[:, None] > r[None, :]).mean(axis=0)


def main(ckpt, batch=1000, dtype="bfloat16", max_atoms=40, aromatic=True,
         batches=3):
    kw = dict(compute_dtype=dtype)
    if max_atoms != 13:
        kw.update(max_n_nodes=max_atoms)
    if aromatic:
        kw.update(use_aromatic_bonds=True)
    cfg = preset("GGNN", **kw)
    params = jax.tree_util.tree_map(jax.numpy.asarray,
                                    load_params_any(cfg, ckpt))
    sampler = GraphSampler(cfg, batch)

    all_t, n_rounds = [], 0
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for k in range(batches):
        res = sampler.sample(params, jax.random.fold_in(key, k), quiet=True)
        all_t.append(res.t_counts)
        n_rounds = max(n_rounds, res.n_rounds)
    wall = time.time() - t0
    t_counts = np.concatenate(all_t)
    live = occupancy_curve(t_counts, n_rounds)

    print(f"N={cfg.max_n_nodes} B={batch} {dtype} aromatic={aromatic} "
          f"({batches} batches, {wall:.1f} s incl. warm-up)")
    print(f"rounds run: {n_rounds}  budget: {cfg.gen_action_budget + 4}")
    print(f"mean actions/graph: {t_counts.mean():.1f}  "
          f"p50/p90/p99/max: {np.percentile(t_counts, 50):.0f}/"
          f"{np.percentile(t_counts, 90):.0f}/"
          f"{np.percentile(t_counts, 99):.0f}/{t_counts.max()}")
    print("\nround  live%   (live rows still forwarding)")
    for r in range(0, n_rounds, max(1, n_rounds // 20)):
        bar = "#" * int(live[r] * 40)
        print(f"{r:5d}  {100*live[r]:5.1f}  {bar}")
    mean_occ = live.mean()
    print(f"\nmean occupancy over the loop: {100*mean_occ:.1f}% "
          f"(1/occupancy = {1/max(mean_occ,1e-9):.2f}x ideal-compaction bound)")

    print("\ntwo-phase (carry-over continuation) amortized model:")
    print("cap R  done%   rounds(R)=R+f(R)*(T-R)   projected speedup")
    best = (n_rounds, None)
    for frac in (0.5, 0.75, 0.9, 0.95, 0.99):
        R = int(np.searchsorted(-live, -(1 - frac)))  # first r with live<=1-frac
        R = min(max(R, 1), n_rounds)
        f = float(live[min(R, n_rounds - 1)])
        amort = R + f * (n_rounds - R)
        if amort < best[0]:
            best = (amort, R)
        print(f"{R:5d}  {100*(1-f):5.1f}  {amort:8.1f}"
              f"                    {n_rounds/amort:.2f}x")
    print(f"\nbest cap R={best[1]}: {n_rounds/best[0]:.2f}x forward-round "
          f"reduction ceiling (excl. carry-over transfer/compaction cost)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0],
         int(a[1]) if len(a) > 1 else 1000,
         a[2] if len(a) > 2 else "bfloat16",
         int(a[3]) if len(a) > 3 else 40,
         (a[4].lower() in ("1", "true", "aromatic")) if len(a) > 4 else True,
         int(a[5]) if len(a) > 5 else 3)
