"""Differentiable replay of sampled action trajectories.

The reference computes agent/prior likelihoods *inside* its Python sampling
loop with autograd enabled, running two model forwards per round
(GraphGeneratorRL.py:128-172).  The TPU-native design separates concerns:

  1. sampling runs grad-free in the fast ``lax.while_loop``
     (sampling/generator.py) and records each graph's action-id sequence;
  2. :func:`trajectory_loglik` rebuilds the graph states deterministically
     from those actions with a ``lax.scan`` and accumulates the chosen
     actions' log-probabilities -- differentiable w.r.t. the model params.

Because the policy-gradient surrogate loss only needs gradients of
``log p(action | state)`` at the *sampled* actions (Workflow.py:862-898),
this replay gradient is exactly the reference's.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.models import apply_model
from graphinvent_tpu.sampling.actions import (
    apply_actions, decode_actions, select_rows,
)

Params = Any


def trajectory_loglik(cfg: GraphInventConfig, params: Params,
                      actions: jnp.ndarray, t_counts: jnp.ndarray,
                      apply_fn: Optional[Callable] = None) -> jnp.ndarray:
    """actions (B, L) int32 action ids, t_counts (B,) how many are real.
    Returns (B,) sum of log p over each trajectory under ``params``."""
    if apply_fn is None:
        apply_fn = lambda p, n, e: apply_model(cfg, p, n, e)
    B, L = actions.shape
    N, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step(carry, s):
        nodes, edges, n_nodes, acc = carry
        active = s < t_counts
        logits = apply_fn(params, nodes, edges).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=1)
        a = actions[:, s]
        chosen = select_rows(logp, a)      # gather-free (TPU scatter cost)
        acc = acc + jnp.where(active, chosen, 0.0)

        acts = decode_actions(cfg, a, n_nodes, edges)
        acts = acts._replace(is_add=acts.is_add & active,
                             is_conn=acts.is_conn & active)
        nodes, edges, n_nodes = apply_actions(cfg, acts, nodes, edges, n_nodes)
        # graph states are functions of the FIXED action sequence only --
        # they carry no params dependence, so the true gradient is
        # sum_s d/dparams log p(a_s | state_s).  stop_gradient makes that
        # explicit; measured cost zero and gradients bit-identical (XLA
        # already pruned the params-free state chain), kept as intent +
        # regression guard.
        nodes = jax.lax.stop_gradient(nodes)
        edges = jax.lax.stop_gradient(edges)
        return (nodes, edges, n_nodes, acc), None

    init = (jnp.zeros((B, N, Fn), dt), jnp.zeros((B, N, N, E), dt),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32))
    # rematerialise replay steps in the backward pass: without remat the
    # grad-of-scan stores every step's MLP activations -- e.g.
    # f32[L, B, N, 500] per APD-head layer, tens of GB at L=26, B=500 --
    # and OOMs HBM.  Recompute costs ~1/3 extra FLOPs for O(L)-less memory.
    # rl_remat_segment k>1 checkpoints only every k-th carry and lets the
    # backward store activations for k steps at a time (memory ~ k x one
    # step, still O(L)-free); k=1 is the classic per-step remat.  Swept in
    # round 5 (BASELINE.md RL table) -- per-step remat measured fastest at
    # N=40 B=500, the knob stays for other dims/parts.
    seg = max(int(getattr(cfg, "rl_remat_segment", 1)), 1)
    if seg > 1:
        S = -(-L // seg)                       # ceil: pad steps are inert
        idxs = jnp.arange(S * seg).reshape(S, seg)

        def segment(carry, seg_idxs):
            carry, _ = jax.lax.scan(step, carry, seg_idxs)
            return carry, None

        (_, _, _, acc), _ = jax.lax.scan(jax.checkpoint(segment), init, idxs)
    else:
        (_, _, _, acc), _ = jax.lax.scan(jax.checkpoint(step), init,
                                         jnp.arange(L))
    return acc
