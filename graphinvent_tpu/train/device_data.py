"""Device-resident dataset + whole-epoch jitted training.

The reference moves every batch host->device inside the epoch loop
(Workflow.py:781-783).  On TPU -- especially through a remote-dispatch
tunnel -- per-step transfers and dispatches dominate for molecule-sized
batches, so here the *entire* preprocessed dataset (int8: nodes + edges +
APDs; gdb13_1K is ~15 MB) is pushed to HBM once and an epoch is ONE device
computation: ``lax.scan`` over shuffled index batches, gathering rows
on-device and casting int8 -> compute dtype inside the step.

Falls back transparently when the dataset exceeds ``max_bytes`` (the
BlockLoader path keeps working for arbitrarily large HDFs).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.data.loader import HDFDataset
from graphinvent_tpu.models import apply_model
from graphinvent_tpu.train.loss import apd_kl_loss, correct_action_likelihoods
from graphinvent_tpu.train.optim import (
    AdamState, OneCycle, adam_update, onecycle_eval,
)

Params = Any


class DeviceDataset:
    """Whole HDF dataset as int8 device arrays.  With a ``mesh`` the arrays
    are replicated across it (workflow.py budgets nbytes_of() against
    cfg.device_data_gb per device), so every device gathers its batch rows
    locally and only the computation shards."""

    def __init__(self, ds: HDFDataset, device=None, mesh=None) -> None:
        self.n_rows = len(ds)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            device = NamedSharding(mesh, PartitionSpec())
        put = functools.partial(jax.device_put, device=device)
        self.nodes = put(jnp.asarray(np.asarray(ds.nodes[:], np.int8)))
        self.edges = put(jnp.asarray(np.asarray(ds.edges[:], np.int8)))
        self.apds = put(jnp.asarray(np.asarray(ds.apds[:], np.int8)))

    @property
    def nbytes(self) -> int:
        return self.nodes.nbytes + self.edges.nbytes + self.apds.nbytes

    @staticmethod
    def nbytes_of(ds: HDFDataset) -> int:
        """int8 device footprint of ``ds`` without loading it."""
        row = (int(np.prod(ds.nodes.shape[1:]))
               + int(np.prod(ds.edges.shape[1:]))
               + int(np.prod(ds.apds.shape[1:])))
        return row * len(ds)


def epoch_permutation(n_rows: int, batch_size: int,
                      rng: np.random.Generator) -> np.ndarray:
    """(n_batches, batch_size) int32 shuffled row ids; remainder rows padded
    with -1 (masked out in the loss)."""
    order = rng.permutation(n_rows).astype(np.int32)
    n_batches = (n_rows + batch_size - 1) // batch_size
    padded = np.full(n_batches * batch_size, -1, np.int32)
    padded[:n_rows] = order
    return padded.reshape(n_batches, batch_size)


def nll_row_batches(n_total: int, max_rows: int, batch_size: int,
                    rng: np.random.Generator) -> np.ndarray:
    """(n_batches, batch_size) int32 row ids for an NLL evaluation pass:
    ``min(n_total, max_rows)`` rows drawn uniformly (without replacement)
    from the WHOLE dataset -- a fresh draw per call, so repeated evaluations
    see the tail too (a fixed leading-rows sample would bias the UC-JSD
    train/valid arms).  Padding slots are -1 (masked in the loss)."""
    n = min(n_total, max_rows)
    order = rng.permutation(n_total)[:n].astype(np.int32)
    n_batches = (n + batch_size - 1) // batch_size
    padded = np.full(n_batches * batch_size, -1, np.int32)
    padded[:n] = order
    return padded.reshape(n_batches, batch_size)


def _gather_batch(nodes: jnp.ndarray, edges: jnp.ndarray, apds: jnp.ndarray,
                  idx: jnp.ndarray, compute_dtype
                  ) -> Dict[str, jnp.ndarray]:
    # constrain() is identity without an ambient mesh; inside a mesh-wrapped
    # epoch fn (make_epoch_*_fn(..., mesh=...)) it shards the batch rows
    # over ``data`` right after the local gather from the replicated dataset
    from graphinvent_tpu.models.annotate import constrain
    safe = jnp.maximum(idx, 0)
    return {
        "nodes": constrain(jnp.take(nodes, safe, axis=0)
                           .astype(compute_dtype), "data"),
        "edges": constrain(jnp.take(edges, safe, axis=0)
                           .astype(compute_dtype), "data"),
        "apds": constrain(jnp.take(apds, safe, axis=0)
                          .astype(jnp.float32), "data"),
        "valid": constrain((idx >= 0).astype(jnp.float32), "data"),
    }


def _mesh_wrap(fn, mesh):
    """Runs ``fn`` inside the edge_sharding context so the batch/activation
    sharding constraints are live while the jit traces (first call)."""
    if mesh is None:
        return fn
    from graphinvent_tpu.models.annotate import edge_sharding

    def wrapped(*args):
        with edge_sharding(mesh):
            return fn(*args)
    return wrapped


def make_epoch_train_fn(cfg: GraphInventConfig, schedule: OneCycle,
                        data: DeviceDataset, mesh=None) -> Callable:
    """Returns jitted ``(params, opt_state, perm, rng) ->
    (params, opt_state, mean_loss)`` -- a full epoch in one device call.
    With ``mesh``, every batch shards over ``data`` (and node/pair axes
    over ``graph``) via the constraints in _gather_batch / the model
    forwards; params/opt must be pre-placed (parallel.place_training_state).

    The dataset arrays enter the jit as ARGUMENTS, never as closure
    captures: a closed-over jax.Array is embedded in the HLO as a
    constant, and on remote-dispatch backends the whole dataset would
    ride inside every compile request (a 500 MB ChEMBL-scale set
    overflows the axon tunnel's request limit with HTTP 413)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch, rng):
        logits = apply_model(cfg, params, batch["nodes"], batch["edges"],
                             train=True, rng=rng)
        return apd_kl_loss(logits.astype(jnp.float32), batch["apds"],
                           batch["valid"])

    # schedule constants enter as an ARGUMENT too (OneCycle.device_params):
    # baked into the HLO they would force a fresh multi-minute compile for
    # every distinct epochs / init_lr choice
    sched_v = schedule.device_params()
    cycle_momentum = schedule.cycle_momentum

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, d_nodes, d_edges, d_apds, perm, rng,
                 sched):
        def step(carry, idx):
            params, opt_state = carry
            batch = _gather_batch(d_nodes, d_edges, d_apds, idx,
                                  compute_dtype)
            step_rng = jax.random.fold_in(rng, opt_state.step)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_rng)
            lr, beta1 = onecycle_eval(sched, opt_state.step, cycle_momentum)
            params, opt_state = adam_update(grads, opt_state, params, lr, beta1)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), perm)
        return params, opt_state, jnp.mean(losses)

    def run(params, opt_state, perm, rng):
        return epoch_fn(params, opt_state, data.nodes, data.edges,
                        data.apds, perm, rng, sched_v)

    return _mesh_wrap(run, mesh)


def make_epoch_eval_fn(cfg: GraphInventConfig, data: DeviceDataset,
                       mesh=None) -> Callable:
    """Returns jitted ``(params, perm) -> mean_loss`` over index batches."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def eval_fn(params, d_nodes, d_edges, d_apds, perm):
        def step(_, idx):
            batch = _gather_batch(d_nodes, d_edges, d_apds, idx,
                                  compute_dtype)
            logits = apply_model(cfg, params, batch["nodes"], batch["edges"])
            loss = apd_kl_loss(logits.astype(jnp.float32), batch["apds"],
                               batch["valid"])
            return None, loss

        _, losses = jax.lax.scan(step, None, perm)
        return jnp.mean(losses)

    def run(params, perm):
        # grad-free: fused inference kernels allowed (gate self-disables
        # on CPU / under a mesh)
        from graphinvent_tpu.models.fused_enn import fused_inference
        with fused_inference():
            return eval_fn(params, data.nodes, data.edges, data.apds, perm)

    return _mesh_wrap(run, mesh)


def make_epoch_nll_fn(cfg: GraphInventConfig, data: DeviceDataset,
                      mesh=None) -> Callable:
    """Returns jitted ``(params, perm) -> (nlls, valid)`` flattened over the
    scanned batches (correct-action NLL per row)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def nll_fn(params, d_nodes, d_edges, d_apds, perm):
        def step(_, idx):
            batch = _gather_batch(d_nodes, d_edges, d_apds, idx,
                                  compute_dtype)
            logits = apply_model(cfg, params, batch["nodes"], batch["edges"])
            p = correct_action_likelihoods(logits.astype(jnp.float32),
                                           batch["apds"])
            return None, (-jnp.log(jnp.maximum(p, 1e-30)), batch["valid"])

        _, (nlls, valid) = jax.lax.scan(step, None, perm)
        return nlls.reshape(-1), valid.reshape(-1)

    def run(params, perm):
        from graphinvent_tpu.models.fused_enn import fused_inference
        with fused_inference():
            return nll_fn(params, data.nodes, data.edges, data.apds, perm)

    return _mesh_wrap(run, mesh)
