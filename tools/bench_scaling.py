"""Data-parallel weak-scaling measurement over a device mesh.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py [per_device_batch]

Times the sharded GGNN train step at dp = 1, 2, 4, ... |devices| with a
fixed per-device batch (weak scaling: perfect scaling = flat step time,
edges/s grows linearly).  On real multi-chip hardware this is the
BASELINE.md "edges/s scaling efficiency" measurement; on the virtual CPU
mesh it validates the sharded program and gives an upper-bound sanity
number (CPU "devices" share cores, so virtual efficiencies are
pessimistic).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main(per_device_batch: int = 250) -> None:
    from graphinvent_tpu.config import preset
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.parallel import make_mesh, make_sharded_train_step
    from graphinvent_tpu.train.optim import adam_init, onecycle_for_config
    from tools.torch_baseline import synthetic_batch

    n_dev = len(jax.devices())
    results = []
    dp = 1
    while dp <= n_dev:
        B = per_device_batch * dp
        cfg = preset("GGNN", batch_size=B, dp_devices=dp, mp_devices=1)
        params = init_model(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(cfg, jax.devices()[:dp])
        schedule = onecycle_for_config(cfg, 100)
        step, params, place = make_sharded_train_step(cfg, schedule, mesh,
                                                      params)
        opt_state = adam_init(params)
        nodes, edges, apds = synthetic_batch(B)
        edges_per_batch = float(edges.sum() / 2)
        batch = place({"nodes": nodes, "edges": edges, "apds": apds,
                       "valid": np.ones(B, np.float32)})
        key = jax.random.PRNGKey(1)
        for _ in range(3):      # compile + warm
            params, opt_state, loss = step(params, opt_state, batch, key)
        jax.block_until_ready(loss)
        n_steps = 10
        t0 = time.time()
        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state, batch, key)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / n_steps
        eps = edges_per_batch / dt
        results.append({"dp": dp, "batch": B, "ms_per_step": round(dt * 1e3, 2),
                        "edges_per_s": round(eps, 1)})
        dp *= 2

    base = results[0]["edges_per_s"]
    for r in results:
        r["scaling_efficiency"] = round(r["edges_per_s"] / (base * r["dp"]), 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 250)
