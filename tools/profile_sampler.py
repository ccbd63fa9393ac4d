"""Breakdown of on-device sampling cost.

    python tools/profile_sampler.py [batch_size] [dtype]

Times (a) a bare model forward, (b) the sampling loop with the model
stubbed out (loop infrastructure: decode/apply/scatter/reset), and (c) the
full sampler, reporting per-round costs.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import preset
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.sampling import GraphSampler


def main(batch_size=1000, dtype="float32"):
    cfg = preset("GGNN", compute_dtype=dtype)
    params = init_model(cfg, jax.random.PRNGKey(0))
    print(f"batch={batch_size} dtype={dtype}")

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

    fwd20(params).block_until_ready()
    t0 = time.time()
    fwd20(params).block_until_ready()
    per_fwd = (time.time() - t0) / 20
    print(f"bare forward           {per_fwd*1e3:8.2f} ms/round")

    # (b) loop infrastructure only (uniform stub logits => quick invalids)
    def stub(params, nodes, edges):
        return jnp.zeros((nodes.shape[0], cfg.dim_apd), jnp.float32)

    s_stub = GraphSampler(cfg, batch_size, apply_fn=stub)
    r = s_stub.sample({}, jax.random.PRNGKey(0), quiet=True)     # compile
    t0 = time.time()
    r = s_stub.sample({}, jax.random.PRNGKey(1), quiet=True)
    stub_total = time.time() - t0
    print(f"stub sampler           {stub_total*1e3:8.2f} ms total, "
          f"{r.n_rounds} rounds, "
          f"{stub_total/max(r.n_rounds,1)*1e3:8.2f} ms/round")

    # (c) full sampler
    s = GraphSampler(cfg, batch_size)
    r = s.sample(params, jax.random.PRNGKey(0), quiet=True)      # compile
    t0 = time.time()
    r = s.sample(params, jax.random.PRNGKey(1), quiet=True)
    full_total = time.time() - t0
    print(f"full sampler           {full_total*1e3:8.2f} ms total, "
          f"{r.n_rounds} rounds, "
          f"{full_total/max(r.n_rounds,1)*1e3:8.2f} ms/round")
    print(f"molecules/s            {batch_size/full_total:10.1f}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    dt = sys.argv[2] if len(sys.argv) > 2 else "float32"
    main(bs, dt)
