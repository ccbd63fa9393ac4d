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


def _sync(out):
    """Value-fetch sync: on the tunneled backend block_until_ready can
    return before the server finishes executing a freshly-loaded program
    (BASELINE.md sampler-roofline note) -- fetch one element instead."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0:1])


def timeit(fn, *args, repeats: int = 5):
    """Min of ``repeats`` timed calls after one warm-up: per-call tunnel
    jitter is +-10-20 ms, comparable to the programs under test, so a
    single-shot timing can rank a cheaper program as slower."""
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best, out


def main(batch_size=1000, dtype="float32", max_atoms=13, aromatic=False,
         checkpoint=None):
    kw = {}
    if max_atoms != 13:
        kw.update(max_n_nodes=max_atoms)
    if aromatic:
        kw.update(use_aromatic_bonds=True)
    cfg = preset("GGNN", compute_dtype=dtype, **kw)
    if checkpoint:
        # trained params: random init terminates in ~4 rounds (near-uniform
        # logits pick invalid actions), so (d)'s e2e numbers would be
        # unrepresentatively fast
        from graphinvent_tpu.utils.checkpoint import load_params_any
        params = jax.tree_util.tree_map(jnp.asarray,
                                        load_params_any(cfg, checkpoint))
    else:
        params = init_model(cfg, jax.random.PRNGKey(0))
    print(f"batch={batch_size} dtype={dtype} N={cfg.max_n_nodes} "
          f"E={cfg.n_edge_features} ckpt={bool(checkpoint)}")
    max_rounds = cfg.max_n_nodes * 2 + 4

    # (a) bare forward, scanned x20.  Inputs are jit ARGUMENTS with random
    # values: zero-constant inputs let XLA constant-fold most of the
    # forward (measured: B=4000 "forward" = B=1000's), and the scan carry
    # keeps each iteration live.
    dt_c = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    nodes = (jax.random.uniform(k1, (batch_size, cfg.max_n_nodes,
                                     cfg.n_node_features)) < 0.2).astype(dt_c)
    edges = (jax.random.uniform(k2, (batch_size, cfg.max_n_nodes,
                                     cfg.max_n_nodes,
                                     cfg.n_edge_features)) < 0.1).astype(dt_c)

    @jax.jit
    def fwd20(p, nodes, edges):
        def body(c, _):
            # carry-dependent input: a loop-invariant forward would be
            # hoisted out of the scan and run once instead of 20 times
            n_in = (nodes.astype(jnp.float32) + c * 1e-30).astype(nodes.dtype)
            out = apply_model(cfg, p, n_in, edges)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(20))
        return out

    dt_fwd, _ = timeit(fwd20, params, nodes, edges)
    print(f"bare forward                  {dt_fwd/20*1e3:8.2f} ms/round")

    # "never terminate": strongly prefer the first add action so every graph
    # keeps building until the invalid/overflow guard trips at L-1
    def stub_run_all(p, nodes, edges):
        logits = jnp.full((nodes.shape[0], cfg.dim_apd), -30.0, jnp.float32)
        return logits.at[:, 0].set(30.0)

    def n_rounds(packed_np):
        # rounds is the last TWO uint8 columns, lo/hi (generator.py
        # _pack_outputs; reading only [-1] reads the hi byte = 0)
        return int(packed_np[0, -2]) | (int(packed_np[0, -1]) << 8)

    # (b) loop infrastructure only, all rounds
    s_stub = GraphSampler(cfg, batch_size, apply_fn=stub_run_all)
    dt_loop, out = timeit(s_stub._jitted, {}, jax.random.PRNGKey(0))
    rounds = n_rounds(np.asarray(out))
    print(f"stub loop+pack dispatch       {dt_loop*1e3:8.2f} ms total, "
          f"{rounds} rounds, {dt_loop/max(rounds,1)*1e3:8.2f} ms/round")

    # (c) real model forward cost + forced all-rounds continuation.  The
    # forward's output must feed the returned logits (at negligible weight)
    # or XLA dead-code-eliminates the whole model and (c) == (b).
    def model_plus_force(p, nodes, edges):
        logits = apply_model(cfg, p, nodes, edges).astype(jnp.float32)
        return stub_run_all(p, nodes, edges) + 1e-30 * logits
    s_force = GraphSampler(cfg, batch_size, apply_fn=model_plus_force)
    dt_force, out = timeit(s_force._jitted, params, jax.random.PRNGKey(0))
    rounds_f = n_rounds(np.asarray(out))
    print(f"model loop+pack dispatch      {dt_force*1e3:8.2f} ms total, "
          f"{rounds_f} rounds, {dt_force/max(rounds_f,1)*1e3:8.2f} ms/round "
          f"(model adds {(dt_force-dt_loop)/max(rounds_f,1)*1e3:.2f} ms/round)")

    # (d) full sampler stage split (real model, natural termination)
    s = GraphSampler(cfg, batch_size)
    s.sample(params, jax.random.PRNGKey(0), quiet=True)         # compile
    dt_loop_full, dev = timeit(s._jitted, params, jax.random.PRNGKey(1))
    t1 = time.time()
    host = np.asarray(dev)
    t2 = time.time()
    r = s.sample(params, jax.random.PRNGKey(1), quiet=True)     # total e2e
    t3 = time.time()
    print(f"full: loop+pack               {dt_loop_full*1e3:8.2f} ms "
          f"({n_rounds(host)} rounds)")
    print(f"full: transfer                {(t2-t1)*1e3:8.2f} ms "
          f"({host.nbytes/1e6:.2f} MB; re-fetch of an already-computed "
          f"buffer = RTT+bandwidth)")
    print(f"full: e2e sample()            {(t3-t2)*1e3:8.2f} ms "
          f"(incl. host unpack+wrap {r.unpack_s*1e3:.2f} ms)")
    print(f"molecules/s                   {batch_size/(t3-t2):10.1f}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    dt = sys.argv[2] if len(sys.argv) > 2 else "float32"
    na = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    ar = len(sys.argv) > 4 and sys.argv[4] == "aromatic"
    ck = sys.argv[5] if len(sys.argv) > 5 else None
    main(bs, dt, na, ar, ck)
