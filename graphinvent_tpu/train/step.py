"""Jitted train / validation steps.

One compiled function serves every batch of the run (static shapes from the
fixed-size loader).  Gradient + Adam + OneCycle are fused into a single XLA
program; with a mesh the same step is sharded via NamedSharding on the batch
(see graphinvent_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.models import apply_model
from graphinvent_tpu.train.loss import apd_kl_loss, correct_action_likelihoods
from graphinvent_tpu.train.optim import (
    AdamState, OneCycle, adam_update, onecycle_eval,
)

Params = Any
Batch = Dict[str, jnp.ndarray]


def batch_arrays(cfg: GraphInventConfig, batch: Batch, compute_dtype
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            Optional[jnp.ndarray]]:
    """Decode a batch in either wire format into (nodes, edges, apds, valid).

    Plain format: float32 "nodes"/"edges"/"apds" (device-resident path,
    tests).  Packed format (streamed training, data/loader.py pack_rows):
    bitpacked uint8 "nodes_p"/"edges_p" + int8 "apds" -- 8x/4x smaller
    host->device uploads, unpacked here ON DEVICE inside the jitted step.
    Byte-exact: packbits/unpackbits of 0/1 one-hots round-trips, so the
    streamed loss trajectory equals the unpacked one."""
    if "nodes_p" in batch:
        M, Fn, E = cfg.max_n_nodes, cfg.n_node_features, cfg.n_edge_features
        B = batch["nodes_p"].shape[0]
        nodes = jnp.unpackbits(batch["nodes_p"], axis=1, count=M * Fn
                               ).reshape(B, M, Fn).astype(compute_dtype)
        edges = jnp.unpackbits(batch["edges_p"], axis=1, count=M * M * E
                               ).reshape(B, M, M, E).astype(compute_dtype)
    else:
        nodes = batch["nodes"].astype(compute_dtype)
        edges = batch["edges"].astype(compute_dtype)
    if "apds_i" in batch:
        # sparse APD wire (data/loader.sparse_apds): fixed-width
        # (index, value) slots -> dense targets by scatter-add; padded
        # (0, 0) slots add zero at column 0, so reconstruction is exact
        idx = batch["apds_i"].astype(jnp.int32)
        val = batch["apds_v"].astype(jnp.float32)
        B = idx.shape[0]
        apds = jnp.zeros((B, cfg.dim_apd), jnp.float32)
        apds = apds.at[jnp.arange(B)[:, None], idx].add(val)
    else:
        apds = batch["apds"].astype(jnp.float32)
    return nodes, edges, apds, batch.get("valid")


def make_train_step(cfg: GraphInventConfig, schedule: OneCycle
                    ) -> Callable[[Params, AdamState, Batch, jax.Array],
                                  Tuple[Params, AdamState, jnp.ndarray]]:
    """Returns jitted ``(params, opt_state, batch, rng) ->
    (params, opt_state, loss)``."""

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch, rng):
        nodes, edges, apds, valid = batch_arrays(cfg, batch, compute_dtype)
        logits = apply_model(cfg, params, nodes, edges, train=True, rng=rng)
        return apd_kl_loss(logits.astype(jnp.float32), apds, valid)

    # schedule constants as an input vector, not HLO constants: all epoch
    # counts / LR choices share one compiled program (optim.device_params)
    sched_v = schedule.device_params()
    cycle_momentum = schedule.cycle_momentum

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _train_step(params, opt_state, batch, rng, sched):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        lr, beta1 = onecycle_eval(sched, opt_state.step, cycle_momentum)
        params, opt_state = adam_update(grads, opt_state, params, lr, beta1)
        return params, opt_state, loss

    def train_step(params, opt_state, batch, rng):
        return _train_step(params, opt_state, batch, rng, sched_v)

    return train_step


def make_eval_step(cfg: GraphInventConfig) -> Callable[[Params, Batch], jnp.ndarray]:
    """Returns jitted validation-loss step (no dropout, no grad)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def eval_step(params, batch):
        nodes, edges, apds, valid = batch_arrays(cfg, batch, compute_dtype)
        logits = apply_model(cfg, params, nodes, edges, train=False)
        return apd_kl_loss(logits.astype(jnp.float32), apds, valid)

    def run(params, batch):
        # grad-free forward: the fused inference kernels may serve it
        # (models/fused_enn.fused_gate turns itself off on CPU/mesh)
        from graphinvent_tpu.models.fused_enn import fused_inference
        with fused_inference():
            return eval_step(params, batch)

    return run


def make_likelihood_step(cfg: GraphInventConfig
                         ) -> Callable[[Params, Batch], jnp.ndarray]:
    """Per-row correct-action NLL (for UC-JSD / validation stats;
    reference Analyzer.py:708-778).  Rows with ``valid``==0 return NaN-free
    zero likelihood -> caller filters by the mask."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def nll_step(params, batch):
        nodes, edges, apds, _ = batch_arrays(cfg, batch, compute_dtype)
        logits = apply_model(cfg, params, nodes, edges, train=False)
        p = correct_action_likelihoods(logits.astype(jnp.float32), apds)
        return -jnp.log(jnp.maximum(p, 1e-30))

    def run(params, batch):
        from graphinvent_tpu.models.fused_enn import fused_inference
        with fused_inference():
            return nll_step(params, batch)

    return run
