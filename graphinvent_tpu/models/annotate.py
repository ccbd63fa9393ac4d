"""Activation-sharding annotations for edge-partitioned (graph-axis) runs.

The sequence-parallel analogue for this workload (SURVEY.md §2.2): the
reference's scaling axis is graph size -- its edge tensor grows as N^2
(reference parameters/load.py:53 sizes it, gnn/summation_mpnn.py:106-144
contracts it).  Here the *neighbor* axis of the dense (B, N, N, E) edge
tensor and the node axis of every hidden state shard across the mesh's
``graph`` axis; XLA's SPMD partitioner turns the message contraction into a
local partial contraction + reduce-scatter over ICI, so both FLOPs and
activation memory scale 1/shards (scaling-book recipe: annotate, let the
compiler place the collectives).

Mechanics: model forwards call :func:`constrain` at the few points where
propagation needs a hint (hidden states, messages, packed edge memories).
Outside an :func:`edge_sharding` context -- i.e. for every single-device or
purely data-parallel jit -- ``constrain`` is an identity, so samplers and
single-chip training trace exactly as before.  The context only needs to be
active while the enclosing jit *traces*; `make_sharded_train_step` wraps its
returned step so every call (hence the first, tracing, call) runs inside it.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def _active_mesh() -> Optional[Mesh]:
    stack = getattr(_state, "stack", None)
    return stack[-1] if stack else None


@contextmanager
def edge_sharding(mesh: Mesh):
    """Enables graph-axis activation constraints while tracing under it."""
    stack = getattr(_state, "stack", None)
    if stack is None:
        stack = _state.stack = []
    stack.append(mesh)
    try:
        yield
    finally:
        stack.pop()


def graph_axis_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh if mesh is not None else _active_mesh()
    if mesh is None:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("graph", 1)


def constrain(x: jax.Array, *spec) -> jax.Array:
    """``with_sharding_constraint`` against the ambient edge-sharding mesh;
    identity when no mesh is active (single-device jits trace unchanged).
    With a mesh whose ``graph`` axis is trivial the constraints still
    matter: they carry the ``data`` axis through device-resident epoch
    programs whose inputs have no input-sharding to propagate from
    (train/device_data.py)."""
    mesh = _active_mesh()
    if mesh is None:
        return x
    spec = tuple(s if s != "graph" or graph_axis_size(mesh) > 1 else None
                 for s in spec)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


# Canonical specs used by the model forwards -------------------------------

def node_axis(x: jax.Array) -> jax.Array:
    """(B, N, ...) activations: batch over ``data``, nodes over ``graph``."""
    return constrain(x, "data", "graph")


def edge_axis(x: jax.Array) -> jax.Array:
    """(B, E_cap, ...) packed-edge activations: edges over ``graph``."""
    return constrain(x, "data", "graph")


def per_type_node_axis(x: jax.Array) -> jax.Array:
    """(E, B, N, ...) per-edge-type node activations."""
    return constrain(x, None, "data", "graph")


def pair_axis(x: jax.Array) -> jax.Array:
    """(B, N, N, ...) dense node-pair activations (attention energies, EMN
    edge memories): the *neighbor* (second node) axis shards over ``graph``
    -- the N^2 tensor the reference materialises whole
    (gnn/summation_mpnn.py:106-144, parameters/load.py:53)."""
    return constrain(x, "data", None, "graph")
