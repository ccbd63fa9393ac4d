"""Device mesh + sharded training step.

The reference is strictly single-device (SURVEY.md §2.2: no
DistributedDataParallel, no collectives anywhere; scale-out = independent
SLURM jobs).  Here parallelism is first-class:

* mesh axes ``("data", "model")``: batches shard over ``data`` (gradient
  all-reduce compiles to a psum over ICI); the APD head's wide MLPs --
  fAddNet2 is the dominant matmul (gnn/modules.py:214-219; for GDB-13:
  13*45+100 -> 500 -> 13*45 per graph) -- shard their hidden/output
  dimensions over ``model`` (tensor parallelism);
* everything is expressed with ``NamedSharding`` constraints on one jitted
  step; XLA inserts the collectives (scaling-book recipe: pick a mesh,
  annotate, let the compiler do the comms).

Edge partitioning over a ``graph`` axis (the sequence-parallel analogue for
the (B, N, N, E) edge tensor) lives in parallel/graph_shard.py.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.train.loss import apd_kl_loss
from graphinvent_tpu.train.optim import (
    AdamState, OneCycle, adam_update, onecycle_eval,
)
from graphinvent_tpu.models import apply_model

Params = Any


def make_mesh(cfg: GraphInventConfig,
              devices: Optional[list] = None) -> Mesh:
    """3-axis mesh ``(data, model, graph)``.

    ``graph`` is the edge-partitioning axis (the sequence-parallel analogue
    for the (B, N, N, E) edge tensor, SURVEY.md §2.2): activations with a
    node/neighbor axis carry ``with_sharding_constraint`` hints over it (see
    models/annotate.py) so XLA partitions the per-edge-type message
    contraction into local partials + a reduce-scatter."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.mp_devices)
    gp = max(1, cfg.graph_devices)
    dp = cfg.dp_devices if cfg.dp_devices > 0 else n // (mp * gp)
    if dp * mp * gp != n:
        raise ValueError(f"dp({dp}) * mp({mp}) * graph({gp}) != n_devices({n})")
    dev_array = np.asarray(devices).reshape(dp, mp, gp)
    return Mesh(dev_array, axis_names=("data", "model", "graph"))


# --------------------------------------------------------------------------
# sharding rules
# --------------------------------------------------------------------------

def batch_spec(keys=("nodes", "edges", "apds", "valid")) -> Dict[str, P]:
    """Every batch entry is row-major -> shard axis 0 over ``data``.  Works
    for both wire formats (plain float32 and the bitpacked "nodes_p"/
    "edges_p" streamed format, data/loader.py pack_rows)."""
    return {k: P("data") for k in keys}


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
    spec = batch_spec()
    return {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
            for k, v in batch.items()}


def _apd_head_spec(path: Tuple, leaf) -> P:
    """Tensor-parallel layout for the APD head's tier-2 MLPs: split every
    hidden layer's rows (output features) over ``model``; the preceding
    layer's activations are replicated, the matmul output is sharded, and
    XLA all-gathers only at the (small) final logits."""
    keys = [getattr(p, "key", getattr(p, "name", None)) or str(p) for p in path]
    in_head = any(k in ("f_add_2", "f_conn_2") for k in keys)
    if not in_head:
        return P()
    if keys and keys[-1] == "w" and leaf.ndim == 2:
        return P("model", None)
    if keys and keys[-1] == "b" and leaf.ndim == 1:
        return P("model")
    return P()


def param_specs(params: Params, tensor_parallel: bool = True) -> Params:
    if not tensor_parallel:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(_apd_head_spec, params)


def shard_params(mesh: Mesh, params: Params,
                 tensor_parallel: Optional[bool] = None) -> Params:
    if tensor_parallel is None:
        tensor_parallel = mesh.shape["model"] > 1
    specs = param_specs(params, tensor_parallel)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def _shardable_head(params: Params, mesh: Mesh) -> bool:
    """TP sharding of the head requires layer widths divisible by the model
    axis; fall back to replicated otherwise.  Multi-host runs keep params
    replicated so every host holds full copies for checkpointing and local
    evaluation (parallel/multihost.py:to_host)."""
    mp = mesh.shape["model"]
    if mp == 1 or jax.process_count() > 1:
        return False
    ok = [True]

    def check(path, leaf):
        spec = _apd_head_spec(path, leaf)
        if spec and spec[0] == "model" and leaf.shape[0] % mp != 0:
            ok[0] = False
        return leaf

    jax.tree_util.tree_map_with_path(check, params)
    return ok[0]


def place_training_state(mesh: Mesh, params: Params,
                         opt_state: Optional[AdamState]
                         ) -> Tuple[Params, Optional[AdamState]]:
    """Places params + Adam state on the mesh for the device-resident epoch
    path (train/device_data.py): TP head sharding when the head widths
    divide the ``model`` axis, everything else replicated; Adam moments
    mirror the param shardings."""
    tp = _shardable_head(params, mesh)
    specs = param_specs(params, tp)
    placed = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(jnp.asarray(p), NamedSharding(mesh, s)),
        params, specs)
    if opt_state is None:
        return placed, None
    repl = NamedSharding(mesh, P())
    moment_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs)
    put = lambda t: jax.tree_util.tree_map(
        lambda x, sh: jax.device_put(jnp.asarray(x), sh),
        t, moment_shardings)
    opt_state = AdamState(step=jax.device_put(jnp.asarray(opt_state.step), repl),
                          mu=put(opt_state.mu), nu=put(opt_state.nu))
    return placed, opt_state


# --------------------------------------------------------------------------
# sharded train step
# --------------------------------------------------------------------------

def make_sharded_train_step(cfg: GraphInventConfig, schedule: OneCycle,
                            mesh: Mesh, params: Params
                            ) -> Tuple[Callable, Params, Callable]:
    """Returns (train_step, sharded_params, place_batch).

    The step is an ordinary jit with in/out shardings; batch sharded over
    ``data``, selected head params over ``model``, everything else
    replicated.  Gradient reduction and TP collectives are inserted by XLA.

    When the mesh's ``graph`` axis is non-trivial the step traces inside an
    ``edge_sharding`` context, activating the with_sharding_constraint hints
    in the model forwards (models/annotate.py): hidden states and messages
    shard their node axis, packed edge memories their edge axis.  Inputs
    stay data-sharded (graph resharding happens on the first constrained
    activation), so no divisibility requirement is imposed on the batch.
    """
    from graphinvent_tpu.models.annotate import edge_sharding
    tp = _shardable_head(params, mesh)
    pspecs = param_specs(params, tp)
    p_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs)
    # the batch position takes None (inherit the argument's committed
    # sharding): place_batch commits every key -- either wire format,
    # plain or bitpacked -- to P("data"), so one compiled step per format
    # serves without hard-coding the key set here
    row_sharding = NamedSharding(mesh, P("data"))
    opt_shardings = AdamState(
        step=NamedSharding(mesh, P()),
        mu=p_shardings, nu=p_shardings)
    rng_sharding = NamedSharding(mesh, P())
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch, rng):
        from graphinvent_tpu.train.step import batch_arrays
        nodes, edges, apds, valid = batch_arrays(cfg, batch, compute_dtype)
        logits = apply_model(cfg, params, nodes, edges, train=True, rng=rng)
        return apd_kl_loss(logits.astype(jnp.float32), apds, valid)

    # schedule constants as a replicated input vector, not HLO constants:
    # all epoch counts / LR choices share one compiled program
    sched_v = schedule.device_params()
    cycle_momentum = schedule.cycle_momentum

    @functools.partial(
        jax.jit,
        in_shardings=(p_shardings, opt_shardings, None, rng_sharding,
                      NamedSharding(mesh, P())),
        out_shardings=(p_shardings, opt_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0, 1))
    def _train_step(params, opt_state, batch, rng, sched):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        lr, beta1 = onecycle_eval(sched, opt_state.step, cycle_momentum)
        params, opt_state = adam_update(grads, opt_state, params, lr, beta1)
        return params, opt_state, loss

    def train_step(params, opt_state, batch, rng):
        # the context only matters while the jit traces (first call); after
        # that it's a no-op wrapper
        with edge_sharding(mesh):
            return _train_step(params, opt_state, batch, rng, sched_v)

    sharded_params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(jnp.asarray(p), s), params, p_shardings)

    def place_batch(batch):
        return {k: jax.device_put(jnp.asarray(v), row_sharding)
                for k, v in batch.items()}

    return train_step, sharded_params, place_batch


def make_sharded_nll_step(cfg: GraphInventConfig, mesh: Mesh, params: Params
                          ) -> Tuple[Callable, Params, Callable]:
    """Per-row correct-action NLL sharded over the mesh, for mesh-native
    ``test`` jobs (train/step.py:make_likelihood_step semantics: rows with
    valid==0 give garbage the caller masks away).  Same sharding rules as
    the train step: batch over ``data``, TP head when widths divide, graph
    -axis activation hints while tracing.  Returns
    (nll_step, sharded_params, place_batch)."""
    from graphinvent_tpu.models.annotate import edge_sharding
    from graphinvent_tpu.train.loss import correct_action_likelihoods
    tp = _shardable_head(params, mesh)
    pspecs = param_specs(params, tp)
    p_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs)
    row_sharding = NamedSharding(mesh, P("data"))
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @functools.partial(
        jax.jit,
        in_shardings=(p_shardings, None),
        out_shardings=NamedSharding(mesh, P("data")))
    def _nll(params, batch):
        from graphinvent_tpu.train.step import batch_arrays
        nodes, edges, apds, _ = batch_arrays(cfg, batch, compute_dtype)
        logits = apply_model(cfg, params, nodes, edges, train=False)
        p = correct_action_likelihoods(logits.astype(jnp.float32), apds)
        return -jnp.log(jnp.maximum(p, 1e-30))

    def nll_step(params, batch):
        with edge_sharding(mesh):
            return _nll(params, batch)

    sharded_params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(jnp.asarray(p), s), params, p_shardings)

    def place_batch(batch):
        return {k: jax.device_put(jnp.asarray(v), row_sharding)
                for k, v in batch.items()}

    return nll_step, sharded_params, place_batch
