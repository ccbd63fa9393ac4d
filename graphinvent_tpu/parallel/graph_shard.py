"""Edge-partitioned graph sharding -- the sequence-parallel analogue.

The reference has no sequence dimension; its scaling axis is graph size
(SURVEY.md §2.2): the (B, N, N, E) edge tensor grows as N^2.  This module
shards the *neighbor* axis of that tensor across the ``graph`` mesh axis:
each device holds the adjacency columns A[:, :, j_shard] and the node
states h[:, j_shard]; it computes the partial messages

    m_partial[b, i] = sum_e A_e[b, i, j_shard] @ f_e(h[b, j_shard])

and a ``psum`` over the ``graph`` axis yields exact full messages.  The
per-edge-type MLP f_e runs on the local node shard only, so both FLOPs and
activation memory scale 1/shards; the collective moves (B, N, M) messages
per pass, which overlaps with the next type's aggregation under XLA's
scheduler.  This is the all-to-all/psum halo-exchange design promised in
BASELINE.json, expressed with shard_map.

Role: the *production* edge-partitioned training mode is the
annotation-based path (``graph_devices=G`` -> models/annotate.py +
parallel/mesh.py), where the same partitioning is induced by
with_sharding_constraint hints and XLA's SPMD partitioner -- gradients
included.  This module keeps the collectives explicit as a cross-check
oracle: tests/test_parallel.py asserts both paths equal the dense
replicated forward.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.models.core import gru_cell, mlp, stacked_mlp
from graphinvent_tpu.models.readout import graph_gather, global_readout

Params = Any


def ggnn_forward_edge_sharded(cfg: GraphInventConfig, mesh: Mesh,
                              params: Params, nodes: jnp.ndarray,
                              edges: jnp.ndarray) -> jnp.ndarray:
    """GGNN forward with message passing sharded over mesh axis ``graph``.

    nodes (B, N, Fn), edges (B, N, N, E) are passed in replicated; inside
    the shard_map each device works on its neighbor-column shard.  N must be
    divisible by the axis size (pad max_n_nodes accordingly).
    """
    n_shards = mesh.shape["graph"]
    N = cfg.max_n_nodes
    if N % n_shards != 0:
        raise ValueError(f"max_n_nodes={N} not divisible by graph axis "
                         f"{n_shards}")

    def message_pass(local_edges, local_hidden, params):
        # local_edges (B, N, N/s, E); local_hidden (B, N/s, H)
        per_type = stacked_mlp(params["msg_nns"], local_hidden)  # (E,B,N/s,M)
        partial = jnp.einsum("bije,ebjm->bim", local_edges, per_type,
                             preferred_element_type=jnp.float32
                             ).astype(local_hidden.dtype)  # (B, N, M)
        return jax.lax.psum(partial, axis_name="graph")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None, "graph", None), P(), P()),
        out_specs=P(None, "graph", None))
    def sharded_passes(edges_sh, nodes_rep, params_rep):
        # hidden starts as padded input nodes; each device keeps its own
        # node shard for the local MLP work and the GRU update
        B = nodes_rep.shape[0]
        dt = nodes_rep.dtype
        idx = jax.lax.axis_index("graph")
        shard = N // n_shards
        hidden_full = jnp.zeros((B, N, cfg.hidden_node_features), dt)
        hidden_full = hidden_full.at[:, :, :cfg.n_node_features].set(nodes_rep)
        local_hidden = jax.lax.dynamic_slice_in_dim(
            hidden_full, idx * shard, shard, axis=1)        # (B, N/s, H)
        adjacency = jnp.sum(edges_sh, axis=3)               # (B, N, N/s)
        local_degree = jax.lax.psum(
            jnp.sum(adjacency, axis=2), axis_name="graph")  # (B, N)
        local_mask = jax.lax.dynamic_slice_in_dim(
            local_degree, idx * shard, shard, axis=1) != 0  # (B, N/s)

        for _ in range(cfg.message_passes):
            messages = message_pass(edges_sh, local_hidden, params_rep)
            local_msgs = jax.lax.dynamic_slice_in_dim(
                messages, idx * shard, shard, axis=1)       # (B, N/s, M)
            updated = gru_cell(params_rep["gru"], local_msgs, local_hidden)
            local_hidden = jnp.where(local_mask[..., None], updated,
                                     local_hidden)
        return local_hidden

    hidden = sharded_passes(edges, nodes, params)           # (B, N, H) resharded
    adjacency = jnp.sum(edges, axis=3)
    node_mask = jnp.sum(adjacency, axis=-1) != 0
    graph_emb = graph_gather(params["gather"], hidden, nodes, node_mask,
                             cfg.big_positive)
    return global_readout(params["apd"], hidden, graph_emb)
