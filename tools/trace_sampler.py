"""Capture a jax.profiler trace of the sampler's fixed-rounds program and
print the per-op device-time breakdown.

    PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_sampler.py \
        [batch] [dtype] [max_atoms] [aromatic|-] [ckpt] [rounds]

Companion to tools/profile_sampler.py: that tool attributes the loop at
the stage level (infra floor vs model forward vs transfer); this one
opens the device timeline so the forward-bound claim at N=40 (BASELINE
round 4) can be checked against which HLO ops actually run.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import preset
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.sampling.generator import _sample_loop


def categorize(name: str) -> str:
    n = name.lower()
    if "fusion" in n and ("dot" in n or "conv" in n):
        return "matmul-fusion"
    if n.startswith("%dot") or ".dot" in n or n.startswith("dot"):
        return "matmul"
    if "while" in n:
        return "while-overhead"
    if "copy" in n or "bitcast" in n:
        return "copy/layout"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "fusion" in n:
        return "elementwise-fusion"
    if "dynamic" in n:
        return "dynamic-slice/update"
    return "other"


def main(batch=1000, dtype="bfloat16", max_atoms=40, aromatic=True,
         ckpt=None, rounds=16):
    kw = dict(compute_dtype=dtype)
    if max_atoms != 13:
        kw["max_n_nodes"] = max_atoms
    if aromatic:
        kw["use_aromatic_bonds"] = True
    cfg = preset("GGNN", **kw)
    if ckpt:
        from graphinvent_tpu.utils.checkpoint import load_params_any
        params = jax.tree_util.tree_map(jnp.asarray,
                                        load_params_any(cfg, ckpt))
    else:
        params = init_model(cfg, jax.random.PRNGKey(0))
    apply_fn = lambda p, n, e: apply_model(cfg, p, n, e)
    fn = jax.jit(lambda p, k: _sample_loop(cfg, p, k, batch, apply_fn,
                                           fixed_rounds=rounds))
    key = jax.random.PRNGKey(1)
    out = fn(params, key)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]   # value-fetch sync

    logdir = "/tmp/jax-trace-sampler"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(params, key)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane captured (unsupported backend?)")
        return
    from tools.xplane_stats import load
    cat_ms = defaultdict(float)
    op_ms = defaultdict(float)
    wall_ms = 0.0
    async_copy_ms = 0.0
    for _, xs in load(logdir):
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name \
                    and "device" not in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "step" in line.name.lower():
                    continue        # step lines duplicate op events
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, "?")
                    ms = ev.duration_ps / 1e9
                    # umbrella events (whole-program / whole-while spans)
                    # give the wall clock but must not enter the op totals;
                    # wall_ms is simply the sum of jit_ spans over the 3 runs
                    if name.startswith("jit_"):
                        wall_ms += ms
                        continue
                    if name.startswith("%while"):
                        continue
                    # async copy-start spans bracket overlapped DMA; their
                    # durations overlap compute and cannot be summed with it
                    if "copy-start" in name or "copy-done" in name:
                        async_copy_ms += ms
                        continue
                    cat_ms[categorize(name)] += ms
                    op_ms[name] += ms
    total = sum(cat_ms.values())
    n_runs = 3
    print(f"N={cfg.max_n_nodes} B={batch} {dtype} {rounds} rounds x "
          f"{n_runs} runs")
    print(f"program wall     {wall_ms:9.2f} ms "
          f"({wall_ms/n_runs/rounds:7.3f} ms/round)")
    print(f"sync op time     {total:9.2f} ms "
          f"({total/n_runs/rounds:7.3f} ms/round)")
    print(f"async DMA spans  {async_copy_ms:9.2f} ms (overlapped; weight/"
          f"activation HBM<->VMEM staging, NOT additive)")
    print("\nsync ops by category (ms total / per-round / % of sync):")
    for cat, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ms:9.2f} ms  {ms/n_runs/rounds:7.3f} ms/round "
              f"({100*ms/max(total,1e-9):5.1f}%)")
    print("\ntop sync ops:")
    for name, ms in sorted(op_ms.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    dt = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    na = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    ar = len(sys.argv) <= 4 or sys.argv[4] != "-"
    ck = sys.argv[5] if len(sys.argv) > 5 else None
    rd = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    main(bs, dt, na, ar, ck, rd)
