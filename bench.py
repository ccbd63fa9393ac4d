"""Benchmark: GGNN training throughput (edges/s) on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

* metric: edges/s sustained over jitted train steps of the flagship GGNN
  (reference default hyperparameters, GDB-13 shapes, batch 1000) on
  synthetic molecule batches kept on device (no input-pipeline effects).
  50 steps are scanned into one device program -- the same way
  device-resident epochs execute in production.
* vs_baseline: ratio against a reference-style PyTorch implementation
  (dynamic edge lists + per-edge MLPs, tools/torch_baseline.py) run on the
  CPU of this machine -- the reference never published GPU numbers
  (BASELINE.md) and no GPU exists here.  The torch number is cached in
  .bench_torch_baseline.json after the first run.
* mfu / sol_fraction / bound: roofline position of the step -- achieved
  FLOP/s over the chip's peak matmul rate, fraction of the analytic
  speed-of-light step time achieved, and which resource binds
  (tools/roofline.py; the full per-model study is in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_torch_baseline.json")


def torch_baseline_eps() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            return float(json.load(fh)["torch_cpu_edges_per_s"])
    from tools.torch_baseline import run
    eps = run(batch_size=1000, n_steps=3)
    with open(CACHE, "w") as fh:
        json.dump({"torch_cpu_edges_per_s": eps}, fh)
    return eps


def main() -> None:
    from graphinvent_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    from graphinvent_tpu.config import preset
    from tools.roofline import chip_spec, roofline_row

    cfg = preset("GGNN", batch_size=1000, compute_dtype="bfloat16")
    spec = chip_spec(jax.devices()[0])
    # median of 5 timed repeats of the 50-step scanned program, with min/max
    # spread, so round-over-round deltas are attributable (tunneled timings
    # carry ±10% day-level variance, BASELINE.md)
    row = roofline_row(cfg, spec, n_steps=50, n_repeats=5)

    out = {
        "metric": "ggnn_train_edges_per_s",
        "value": round(row["edges_per_s"], 1),
        "unit": "edges/s",
        "vs_baseline": round(row["edges_per_s"] / torch_baseline_eps(), 3),
        "step_ms": round(row["step_time_s"] * 1e3, 3),
        "step_ms_min": round(row["step_time_min_s"] * 1e3, 3),
        "step_ms_max": round(row["step_time_max_s"] * 1e3, 3),
        "n_repeats": row["n_repeats"],
        "flops_per_step": row["flops"],
    }
    if "mfu" in row:
        out.update({
            "mfu": round(row["mfu"], 4),
            # algorithmic-FLOPs MFU: packed one-hot/permutation overhead
            # excluded (== mfu for GGNN, which has no packed path)
            "mfu_algo": round(row["mfu_algo"], 4),
            "sol_fraction": round(row["sol_fraction"], 4),
            "bound": row["bound"],
            "chip": row["chip"],
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
