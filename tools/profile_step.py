"""Micro-breakdown of the GGNN step on the local accelerator.

    python tools/profile_step.py [batch_size]

Times (a) full train step, (b) forward only, (c) APD head only, (d) message
passes only, (e) Adam update only -- each as a scanned 30-iteration device
computation so dispatch overhead is amortised.  Guides kernel-optimisation
priorities (Pallas targets).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import preset
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.models.core import gru_cell, stacked_mlp
from graphinvent_tpu.models.readout import global_readout, graph_gather
from graphinvent_tpu.models.mpnn import _prepare, _edge_type_contraction
from graphinvent_tpu.train.loss import apd_kl_loss
from graphinvent_tpu.train.optim import adam_init, adam_update
from tools.torch_baseline import synthetic_batch


ONLY = None      # substring filter over section names (3rd CLI arg)


def timed(name, fn, *args, iters=30):
    if ONLY and ONLY not in name:
        return None
    out = fn(*args)          # compile
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms/iter")
    return dt


def main(batch_size=1000, dtype="bfloat16"):
    cfg = preset("GGNN", batch_size=batch_size, compute_dtype=dtype)
    dt_c = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params = init_model(cfg, jax.random.PRNGKey(0))
    nodes_np, edges_np, apds_np = synthetic_batch(batch_size)
    nodes = jnp.asarray(nodes_np, dt_c)
    edges = jnp.asarray(edges_np, dt_c)
    apds = jnp.asarray(apds_np)
    print(f"batch={batch_size} dtype={dtype}")

    def scan30(body):
        # chain the carry INTO the body's inputs so XLA can't hoist the
        # loop-invariant computation out of the scan
        @jax.jit
        def run(*args):
            def step(c, _):
                out = body(c, *args)
                return jnp.sum(out).astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(30))
            return c
        return run

    # full forward
    timed("forward", scan30(
        lambda c, p: apply_model(cfg, p, nodes + c.astype(dt_c), edges)),
        params)

    # message passes only
    def messages_only(c, p):
        hidden, adjacency, degree, node_mask = _prepare(
            cfg, nodes + c.astype(dt_c), edges)
        for _ in range(cfg.message_passes):
            per_type = stacked_mlp(p["msg_nns"], hidden)
            m = _edge_type_contraction(edges, per_type)
            upd = gru_cell(p["gru"], m, hidden)
            hidden = jnp.where(node_mask[..., None], upd, hidden)
        return hidden
    timed("message passes (x3)", scan30(messages_only), params)

    # APD head only
    hidden0 = jnp.zeros((batch_size, cfg.max_n_nodes,
                         cfg.hidden_node_features), dt_c)
    gemb = jnp.zeros((batch_size, cfg.gather_width), dt_c)
    timed("APD head", scan30(
        lambda c, p: global_readout(p["apd"], hidden0 + c.astype(dt_c),
                                    gemb)), params)

    # gather
    nm = jnp.sum(edges, axis=(2, 3)) != 0
    timed("graph gather", scan30(
        lambda c, p: graph_gather(p["gather"], hidden0 + c.astype(dt_c),
                                  nodes, nm, cfg.big_positive)), params)

    # loss+grad (fwd+bwd)
    def lg(c, p):
        def loss(p):
            out = apply_model(cfg, p, nodes + c.astype(dt_c), edges)
            return apd_kl_loss(out.astype(jnp.float32), apds)
        l, g = jax.value_and_grad(loss)(p)
        return l + jnp.sum(g["gru"]["b_ih"])
    timed("forward+backward", scan30(lg), params)

    # adam only
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    opt = adam_init(params)
    timed("adam update", scan30(
        lambda c, p: adam_update(
            jax.tree_util.tree_map(lambda g: g + c, grads),
            opt, p, 1e-4, 0.9)[0]["gru"]["b_ih"]), params)

if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    dt = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    if len(sys.argv) > 3:
        ONLY = sys.argv[3]
    main(bs, dt)
