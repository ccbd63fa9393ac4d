"""Breakdown of on-device sampling cost.

    python tools/profile_sampler.py [batch_size] [dtype]

Times each stage separately so device-loop cost is not conflated with
host-side overhead:
  (a) bare model forward (scanned)
  (b) device loop with the model stubbed, forced to run ALL rounds
      (per-round infrastructure cost: decode/apply/record)
  (c) device loop with the real model, forced all rounds (per-round total)
  (d) full sampler stages: device loop / pack / transfer / host decode
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import preset
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.sampling import GraphSampler


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0, out


def main(batch_size=1000, dtype="float32"):
    cfg = preset("GGNN", compute_dtype=dtype)
    params = init_model(cfg, jax.random.PRNGKey(0))
    print(f"batch={batch_size} dtype={dtype}")
    max_rounds = cfg.max_n_nodes * 2 + 4

    # (a) bare forward, scanned x20
    dt_c = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    nodes = jnp.zeros((batch_size, cfg.max_n_nodes, cfg.n_node_features), dt_c)
    edges = jnp.zeros((batch_size, cfg.max_n_nodes, cfg.max_n_nodes,
                       cfg.n_edge_features), dt_c)

    @jax.jit
    def fwd20(p):
        def body(c, _):
            return c + 1e-9 * jnp.sum(apply_model(cfg, p, nodes, edges)), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(20))
        return out

    dt_fwd, _ = timeit(fwd20, params)
    print(f"bare forward                  {dt_fwd/20*1e3:8.2f} ms/round")

    # "never terminate": strongly prefer the first add action so every graph
    # keeps building until the invalid/overflow guard trips at L-1
    def stub_run_all(p, nodes, edges):
        logits = jnp.full((nodes.shape[0], cfg.dim_apd), -30.0, jnp.float32)
        return logits.at[:, 0].set(30.0)

    # (b) loop infrastructure only, all rounds (packed buffer: rounds is
    # the last uint8 column)
    s_stub = GraphSampler(cfg, batch_size, apply_fn=stub_run_all)
    dt_loop, out = timeit(s_stub._jitted, {}, jax.random.PRNGKey(0))
    rounds = int(np.asarray(out[0, -1]))
    print(f"stub loop+pack dispatch       {dt_loop*1e3:8.2f} ms total, "
          f"{rounds} rounds, {dt_loop/max(rounds,1)*1e3:8.2f} ms/round")

    # (c) real model forward cost + forced all-rounds continuation
    def model_plus_force(p, nodes, edges):
        _ = apply_model(cfg, p, nodes, edges)   # real forward cost
        return stub_run_all(p, nodes, edges)
    s_force = GraphSampler(cfg, batch_size, apply_fn=model_plus_force)
    dt_force, out = timeit(s_force._jitted, params, jax.random.PRNGKey(0))
    rounds_f = int(np.asarray(out[0, -1]))
    print(f"model loop+pack dispatch      {dt_force*1e3:8.2f} ms total, "
          f"{rounds_f} rounds, {dt_force/max(rounds_f,1)*1e3:8.2f} ms/round")

    # (d) full sampler stage split (real model, natural termination)
    s = GraphSampler(cfg, batch_size)
    s.sample(params, jax.random.PRNGKey(0), quiet=True)         # compile
    t0 = time.time()
    dev = s._jitted(params, jax.random.PRNGKey(1))
    jax.block_until_ready(dev)
    t1 = time.time()
    host = np.asarray(dev)
    t2 = time.time()
    r = s.sample(params, jax.random.PRNGKey(1), quiet=True)     # total e2e
    t3 = time.time()
    print(f"full: loop+pack               {(t1-t0)*1e3:8.2f} ms "
          f"({int(host[0, -1])} rounds)")
    print(f"full: transfer                {(t2-t1)*1e3:8.2f} ms "
          f"({host.nbytes/1e6:.2f} MB)")
    print(f"full: e2e sample()            {(t3-t2)*1e3:8.2f} ms "
          f"=> host decode ~{(t3-t2-(t2-t0))*1e3:8.2f} ms")
    print(f"molecules/s                   {batch_size/(t3-t2):10.1f}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    dt = sys.argv[2] if len(sys.argv) > 2 else "float32"
    main(bs, dt)
