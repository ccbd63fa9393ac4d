"""Benchmark: GGNN training throughput (edges/s) on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* metric: edges/s sustained over jitted train steps of the flagship GGNN
  (reference default hyperparameters, GDB-13 shapes, batch 1000) on
  synthetic molecule batches kept on device (no input-pipeline effects).
* vs_baseline: ratio against a reference-style PyTorch implementation
  (dynamic edge lists + per-edge MLPs, tools/torch_baseline.py) run on the
  CPU of this machine -- the reference never published GPU numbers
  (BASELINE.md) and no GPU exists here.  The torch number is cached in
  .bench_torch_baseline.json after the first run.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    import jax
    import jax.numpy as jnp
    from graphinvent_tpu.config import preset
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.train.optim import adam_init, onecycle_for_config
    from graphinvent_tpu.train.step import make_train_step
    from tools.torch_baseline import synthetic_batch

    import functools

    cfg = preset("GGNN", batch_size=1000, epochs=10,
                 compute_dtype="bfloat16")
    params = init_model(cfg, jax.random.PRNGKey(0))
    opt_state = adam_init(params)
    schedule = onecycle_for_config(cfg, 100)
    step = make_train_step(cfg, schedule)

    nodes_np, edges_np, apds_np = synthetic_batch(cfg.batch_size)
    edges_per_batch = float(edges_np.sum() / 2)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    batch = {
        "nodes": jnp.asarray(nodes_np, dt),
        "edges": jnp.asarray(edges_np, dt),
        "apds": jnp.asarray(apds_np),
        "valid": jnp.ones(cfg.batch_size, jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    # multi-step scan: whole measurement is one device computation (the
    # training loop's device-resident epoch path works the same way)
    from graphinvent_tpu.train.loss import apd_kl_loss
    from graphinvent_tpu.models import apply_model
    from graphinvent_tpu.train.optim import adam_update

    def loss_fn(params, rng):
        logits = apply_model(cfg, params, batch["nodes"], batch["edges"],
                             train=True, rng=rng)
        return apd_kl_loss(logits.astype(jnp.float32), batch["apds"],
                           batch["valid"])

    n_steps = 50

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_steps(params, opt_state, rng):
        def body(carry, i):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, jax.random.fold_in(rng, i))
            lr, beta1 = schedule(opt_state.step)
            params, opt_state = adam_update(grads, opt_state, params, lr,
                                            beta1)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, losses[-1]

    # warmup: compile + one throwaway execution (the first post-compile call
    # pays a large one-time runtime cost on tunneled TPU setups)
    for k in (0, 1):
        params, opt_state, loss = run_steps(params, opt_state,
                                            jax.random.fold_in(key, k))
        jax.block_until_ready(loss)

    t0 = time.time()
    params, opt_state, loss = run_steps(params, opt_state,
                                        jax.random.fold_in(key, 7))
    jax.block_until_ready(loss)
    dt = time.time() - t0
    eps = edges_per_batch * n_steps / dt

    baseline = torch_baseline_eps()
    print(json.dumps({
        "metric": "ggnn_train_edges_per_s",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
