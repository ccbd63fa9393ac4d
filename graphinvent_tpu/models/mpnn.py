"""The six MPNN variants, re-designed for TPU as dense batched contractions.

Reference models: graphinvent/gnn/mpnn.py (MNN:16, S2V:77, AttS2V:142,
GGNN:229, AttGGNN:306, EMN:401) running on the engines in
gnn/{summation,aggregation,edge}_mpnn.py.

Design (TPU-first, not a translation):

* The reference extracts dynamic edge lists with ``nonzero()`` and runs
  per-edge MLPs + a dense 0/1 summation matmul (summation_mpnn.py:106-141).
  Here every model is expressed over the static padded tensors directly:
  per-edge-type MLPs are applied to all node states ``Y_e = f_e(H)`` and
  messages are adjacency contractions ``m = sum_e A_e @ Y_e`` -- pure batched
  matmuls with static shapes, which XLA maps straight onto the MXU.  For
  one-hot edge features this is mathematically identical to the reference's
  gather/scatter formulation (bias terms are masked by the adjacency exactly
  as the reference masks them, gnn/mpnn.py:290-294).

* Nodes with degree 0 are never GRU-updated (the reference only updates
  nodes appearing in its edge list, summation_mpnn.py:109,143-144); we mask
  the update instead.

* The EMN's edge-memory attention over incoming edges is computed with a
  factored softmax (running numerator/denominator with the reverse-edge term
  subtracted) so no (B,N,N,N,D) tensor is ever materialised.

All ``apply`` functions take ``(cfg, params, nodes, edges)`` with
nodes (B,N,Fn) float, edges (B,N,N,E) float and return APD logits
(B, dim_apd).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import GraphInventConfig
from graphinvent_tpu.models.annotate import (
    edge_axis, node_axis, pair_axis, per_type_node_axis,
)
from graphinvent_tpu.models.core import (
    Params, alpha_dropout, gru_cell, init_gru_cell, init_mlp,
    init_stacked_mlp, mlp, stacked_mlp,
)
from graphinvent_tpu.models.readout import (
    graph_gather, global_readout, init_graph_gather, init_global_readout,
    init_set2vec, set2vec,
)


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _prepare(cfg: GraphInventConfig, nodes: jnp.ndarray, edges: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (hidden0 (B,N,H), adjacency (B,N,N), degree (B,N), node_mask (B,N))."""
    dt = nodes.dtype
    adjacency = jnp.sum(edges, axis=3)
    degree = jnp.sum(adjacency, axis=-1)
    node_mask = degree != 0
    B, N, Fn = nodes.shape
    hidden = jnp.zeros((B, N, cfg.hidden_node_features), dt)
    hidden = hidden.at[:, :, :Fn].set(nodes)
    # under an edge_sharding mesh (graph axis > 1) the node axis shards
    # here; every subsequent per-node op stays local to its shard
    return node_axis(hidden), adjacency, degree, node_mask


def _masked_update(gru_params: Params, messages: jnp.ndarray,
                   hidden: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """GRU update applied only to nodes with degree >= 1."""
    updated = gru_cell(gru_params, messages, hidden)
    return node_axis(jnp.where(node_mask[..., None], updated, hidden))


def _edge_type_contraction(edges: jnp.ndarray, per_type: jnp.ndarray
                           ) -> jnp.ndarray:
    """m_i = sum_e sum_j edges[b,i,j,e] * per_type[e,b,j,m] as one einsum.

    Under edge sharding, per_type is node-sharded on j (the graph axis):
    XLA computes per-device partial sums over the local j-shard and the
    node_axis constraint on the output turns the combine into a
    reduce-scatter -- the halo exchange of SURVEY.md §2.2, compiler-placed."""
    out = jnp.einsum("bije,ebjm->bim", edges, per_type,
                     preferred_element_type=jnp.float32).astype(per_type.dtype)
    return node_axis(out)


def _readout_keys(rng: Optional[jax.Array], n: int):
    return jax.random.split(rng, n) if rng is not None else [None] * n


def _enn_stack(cfg: GraphInventConfig, params: Params, hidden: jnp.ndarray,
               dropout_p: float, train: bool, key) -> jnp.ndarray:
    """Stacked per-edge-type MLP tower: the fused Pallas kernel on the
    single-device TPU inference path (the sampler's HBM-bound hot spot,
    BASELINE.md round 5), XLA's stacked einsum everywhere else (training
    needs dropout + autodiff; meshes need the SPMD partitioner)."""
    from graphinvent_tpu.models.fused_enn import fused_gate, fused_stacked_mlp
    if cfg.fused_inference_enn and fused_gate(train, dropout_p):
        return fused_stacked_mlp(params, hidden)
    return stacked_mlp(params, hidden, dropout_p, train, key)


def _mlp_inf(cfg: GraphInventConfig, params: Params, x: jnp.ndarray,
             dropout_p: float, train: bool, key) -> jnp.ndarray:
    """Plain-MLP twin of :func:`_enn_stack` (E=1 fused kernel on the
    single-device TPU inference path): used for the EMN's per-edge-memory
    nets, which have the same per-layer HBM-intermediate pattern."""
    from graphinvent_tpu.models.fused_enn import fused_gate, fused_mlp
    if cfg.fused_inference_enn and fused_gate(train, dropout_p):
        return fused_mlp(params, x)
    return mlp(params, x, dropout_p, train, key)


# --------------------------------------------------------------------------
# MNN (reference gnn/mpnn.py:16-74)
# --------------------------------------------------------------------------

def init_mnn(cfg: GraphInventConfig, key: jax.Array) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    stdev = 1.0 / math.sqrt(cfg.hidden_node_features)
    message_weights = jax.random.uniform(
        k1, (cfg.message_size, cfg.hidden_node_features, cfg.n_edge_features),
        jnp.float32, -stdev, stdev)
    return {
        "message_weights": message_weights,
        "gru": init_gru_cell(k2, cfg.message_size, cfg.hidden_node_features),
        "apd": init_global_readout(
            k3, cfg.len_f_add_per_node, cfg.len_f_conn_per_node, 1,
            cfg.mlp1_depth, cfg.mlp1_hidden_dim,
            cfg.mlp2_depth, cfg.mlp2_hidden_dim,
            graph_emb_size=cfg.hidden_node_features,
            max_n_nodes=cfg.max_n_nodes,
            node_emb_size=cfg.hidden_node_features),
    }


def apply_mnn(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
              edges: jnp.ndarray, train: bool = False,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    W = params["message_weights"].astype(hidden.dtype)   # (M, H, E)
    for _ in range(cfg.message_passes):
        # per edge type e: Y_e = H @ W[:,:,e]^T  -> (E, B, N, M)
        per_type = per_type_node_axis(
            jnp.einsum("bnh,mhe->ebnm", hidden, W,
                       preferred_element_type=jnp.float32
                       ).astype(hidden.dtype))
        messages = _edge_type_contraction(edges, per_type)
        hidden = _masked_update(params["gru"], messages, hidden, node_mask)
    graph_emb = jnp.sum(hidden, axis=1)   # (reference mpnn.py:70-74)
    return global_readout(params["apd"], hidden, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train, rng)


# --------------------------------------------------------------------------
# S2V (reference gnn/mpnn.py:77-139)
# --------------------------------------------------------------------------

def init_s2v(cfg: GraphInventConfig, key: jax.Array) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "enn": init_mlp(k1, cfg.n_edge_features,
                        [cfg.enn_hidden_dim] * cfg.enn_depth,
                        cfg.hidden_node_features * cfg.message_size),
        "gru": init_gru_cell(k2, cfg.message_size, cfg.hidden_node_features),
        "s2v": init_set2vec(k3, cfg.n_node_features, cfg.hidden_node_features,
                            cfg.s2v_memory_size),
        "apd": init_global_readout(
            k4, cfg.len_f_add_per_node, cfg.len_f_conn_per_node, 1,
            cfg.mlp1_depth, cfg.mlp1_hidden_dim,
            cfg.mlp2_depth, cfg.mlp2_hidden_dim,
            graph_emb_size=cfg.s2v_memory_size * 2,
            max_n_nodes=cfg.max_n_nodes,
            node_emb_size=cfg.hidden_node_features),
    }


def _enn_matrices(cfg: GraphInventConfig, enn_params: Params,
                  dtype, train: bool, rng) -> jnp.ndarray:
    """Evaluates the edge-network MLP on the E one-hot edge feature vectors
    once per forward: (E, message_size, hidden).  Because edge features are
    one-hot, this is exactly the reference's per-edge ``enn(edges)``
    (gnn/mpnn.py:124-127) without the per-edge replication."""
    eye = jnp.eye(cfg.n_edge_features, dtype=dtype)
    out = mlp(enn_params, eye, cfg.enn_dropout_p, train, rng)
    return out.reshape(cfg.n_edge_features, cfg.message_size,
                       cfg.hidden_node_features)


def apply_s2v(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
              edges: jnp.ndarray, train: bool = False,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    keys = _readout_keys(rng, 3)
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    M = _enn_matrices(cfg, params["enn"], hidden.dtype, train, keys[0])
    for _ in range(cfg.message_passes):
        per_type = per_type_node_axis(
            jnp.einsum("bnh,emh->ebnm", hidden, M,
                       preferred_element_type=jnp.float32
                       ).astype(hidden.dtype))
        messages = _edge_type_contraction(edges, per_type)
        hidden = _masked_update(params["gru"], messages, hidden, node_mask)
    graph_emb = set2vec(params["s2v"], hidden, nodes, node_mask,
                        cfg.s2v_lstm_computations, cfg.s2v_memory_size,
                        cfg.big_negative)
    return global_readout(params["apd"], hidden, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train, keys[2])


# --------------------------------------------------------------------------
# AttS2V (reference gnn/mpnn.py:142-226)
# --------------------------------------------------------------------------

def init_atts2v(cfg: GraphInventConfig, key: jax.Array) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "enn": init_mlp(k1, cfg.n_edge_features,
                        [cfg.enn_hidden_dim] * cfg.enn_depth,
                        cfg.hidden_node_features * cfg.message_size),
        "att_enn": init_mlp(k2,
                            cfg.hidden_node_features + cfg.n_edge_features,
                            [cfg.att_hidden_dim] * cfg.att_depth,
                            cfg.message_size),
        "gru": init_gru_cell(k3, cfg.message_size, cfg.hidden_node_features),
        "s2v": init_set2vec(k4, cfg.n_node_features, cfg.hidden_node_features,
                            cfg.s2v_memory_size),
        "apd": init_global_readout(
            k5, cfg.len_f_add_per_node, cfg.len_f_conn_per_node, 1,
            cfg.mlp1_depth, cfg.mlp1_hidden_dim,
            cfg.mlp2_depth, cfg.mlp2_hidden_dim,
            graph_emb_size=cfg.s2v_memory_size * 2,
            max_n_nodes=cfg.max_n_nodes,
            node_emb_size=cfg.hidden_node_features),
    }


def _att_enn_stack(cfg: GraphInventConfig, att_params: Params,
                   hidden: jnp.ndarray, dropout_p: float, train: bool,
                   rng: Optional[jax.Array]) -> jnp.ndarray:
    """``att_enn([onehot_e, h])`` for every edge type e as ONE stacked
    evaluation -> (E, B, N, M).

    The type one-hot enters only the first layer, where it is exactly a
    per-type first-layer bias (column e of the first weight matrix): the
    (B,N,H)->(B,N,H1) matmul runs ONCE instead of E times, and the
    remaining layers -- shared weights -- run on the stacked (E,B,N,·)
    batch as plain bigger matmuls.  Equal to the per-type loop the
    reference runs (gnn/mpnn.py:209-212) up to float reassociation."""
    E = cfg.n_edge_features
    layers = att_params["layers"]
    dt = hidden.dtype
    w0 = layers[0]["w"].astype(dt)              # (H1, E + H): onehot cols first
    z = hidden @ w0[:, E:].T                    # (B, N, H1)
    bias = w0[:, :E].T + layers[0]["b"].astype(dt)          # (E, H1)
    y = jax.nn.selu(z[None] + bias[:, None, None, :])       # (E, B, N, H1)
    if train and dropout_p > 0.0 and rng is not None:
        keys = jax.random.split(rng, len(layers))
    else:
        keys = [None] * len(layers)
    if keys[0] is not None:
        y = alpha_dropout(keys[0], y, dropout_p)
    for lp, k in zip(layers[1:], keys[1:]):
        y = jax.nn.selu(y @ lp["w"].T.astype(dt) + lp["b"].astype(dt))
        if k is not None:
            y = alpha_dropout(k, y, dropout_p)
    return y


def apply_atts2v(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
                 edges: jnp.ndarray, train: bool = False,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    keys = _readout_keys(rng, 4)
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    dt = hidden.dtype
    M = _enn_matrices(cfg, params["enn"], dt, train, keys[0])
    E = cfg.n_edge_features
    adj_mask = adjacency != 0            # (B,N,N)
    packed = cfg.emn_packed and _emn_edge_capacity(cfg) < cfg.max_n_nodes ** 2
    packing = _pack_edges(edges, _emn_edge_capacity(cfg)) if packed else None
    for _ in range(cfg.message_passes):
        # message terms per edge type (gnn/mpnn.py:202-207)
        per_type = jnp.einsum("bnh,emh->ebnm", hidden, M,
                              preferred_element_type=jnp.float32).astype(dt)
        # attention energies: att_enn([onehot_e, h_j]) per type, then pick
        # the edge's type via the adjacency (gnn/mpnn.py:209-212); the
        # per-type loop is folded into one stacked evaluation
        att_stack = _att_enn_stack(cfg, params["att_enn"], hidden,
                                   cfg.att_dropout_p, train, keys[1])
        if packed:
            messages = _packed_attention_messages(cfg, packing,
                                                  per_type, att_stack)
        else:
            msg_terms = pair_axis(
                jnp.einsum("bije,ebjm->bijm", edges, per_type,
                           preferred_element_type=jnp.float32).astype(dt))
            energies = pair_axis(
                jnp.einsum("bije,ebjm->bijm", edges, att_stack,
                           preferred_element_type=jnp.float32).astype(dt))
            energy_mask = (1.0 - adj_mask.astype(dt)) * cfg.big_negative
            weights = jax.nn.softmax(
                energies + energy_mask[..., None], axis=2)
            messages = jnp.sum(weights * msg_terms, axis=2)
        hidden = _masked_update(params["gru"], messages, hidden, node_mask)
    graph_emb = set2vec(params["s2v"], hidden, nodes, node_mask,
                        cfg.s2v_lstm_computations, cfg.s2v_memory_size,
                        cfg.big_negative)
    return global_readout(params["apd"], hidden, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train, keys[3])


# --------------------------------------------------------------------------
# GGNN (reference gnn/mpnn.py:229-303)
# --------------------------------------------------------------------------

def init_ggnn(cfg: GraphInventConfig, key: jax.Array) -> Params:
    keys = jax.random.split(key, cfg.n_edge_features + 3)
    msg_nns = init_stacked_mlp(keys[0], cfg.n_edge_features,
                               cfg.hidden_node_features,
                               [cfg.enn_hidden_dim] * cfg.enn_depth,
                               cfg.message_size)
    return {
        "msg_nns": msg_nns,
        "gru": init_gru_cell(keys[-3], cfg.message_size,
                             cfg.hidden_node_features),
        "gather": init_graph_gather(
            keys[-2], cfg.n_node_features, cfg.hidden_node_features,
            cfg.gather_width, cfg.gather_att_depth, cfg.gather_att_hidden_dim,
            cfg.gather_emb_depth, cfg.gather_emb_hidden_dim),
        "apd": init_global_readout(
            keys[-1], cfg.len_f_add_per_node, cfg.len_f_conn_per_node, 1,
            cfg.mlp1_depth, cfg.mlp1_hidden_dim,
            cfg.mlp2_depth, cfg.mlp2_hidden_dim,
            graph_emb_size=cfg.gather_width,
            max_n_nodes=cfg.max_n_nodes,
            node_emb_size=cfg.hidden_node_features),
    }


def apply_ggnn(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
               edges: jnp.ndarray, train: bool = False,
               rng: Optional[jax.Array] = None) -> jnp.ndarray:
    keys = _readout_keys(rng, 3)
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    for _ in range(cfg.message_passes):
        per_type = per_type_node_axis(
            _enn_stack(cfg, params["msg_nns"], hidden, cfg.enn_dropout_p,
                       train, keys[0]))                    # (E, B, N, M)
        messages = _edge_type_contraction(edges, per_type)
        hidden = _masked_update(params["gru"], messages, hidden, node_mask)
    from graphinvent_tpu.models.fused_enn import fused_gate
    fused = cfg.fused_inference_enn and fused_gate(
        train, cfg.gather_att_dropout_p, cfg.gather_emb_dropout_p,
        cfg.mlp1_dropout_p, cfg.mlp2_dropout_p)
    graph_emb = graph_gather(params["gather"], hidden, nodes, node_mask,
                             cfg.big_positive, cfg.gather_att_dropout_p,
                             cfg.gather_emb_dropout_p, train, keys[1],
                             fused=fused)
    return global_readout(params["apd"], hidden, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train,
                          keys[2], fused=fused)


# --------------------------------------------------------------------------
# AttGGNN (reference gnn/mpnn.py:306-398)
# --------------------------------------------------------------------------

def init_attggnn(cfg: GraphInventConfig, key: jax.Array) -> Params:
    E = cfg.n_edge_features
    keys = jax.random.split(key, 5)
    msg_nns = init_stacked_mlp(keys[0], E, cfg.hidden_node_features,
                               [cfg.msg_hidden_dim] * cfg.msg_depth,
                               cfg.message_size)
    att_nns = init_stacked_mlp(keys[1], E, cfg.hidden_node_features,
                               [cfg.att_hidden_dim] * cfg.att_depth,
                               cfg.message_size)
    return {
        "msg_nns": msg_nns,
        "att_nns": att_nns,
        "gru": init_gru_cell(keys[-3], cfg.message_size,
                             cfg.hidden_node_features),
        "gather": init_graph_gather(
            keys[-2], cfg.n_node_features, cfg.hidden_node_features,
            cfg.gather_width, cfg.gather_att_depth, cfg.gather_att_hidden_dim,
            cfg.gather_emb_depth, cfg.gather_emb_hidden_dim),
        "apd": init_global_readout(
            keys[-1], cfg.len_f_add_per_node, cfg.len_f_conn_per_node, 1,
            cfg.mlp1_depth, cfg.mlp1_hidden_dim,
            cfg.mlp2_depth, cfg.mlp2_hidden_dim,
            graph_emb_size=cfg.gather_width,
            max_n_nodes=cfg.max_n_nodes,
            node_emb_size=cfg.hidden_node_features),
    }


def apply_attggnn(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
                  edges: jnp.ndarray, train: bool = False,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    keys = _readout_keys(rng, 4)
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    dt = hidden.dtype
    adj_mask = adjacency != 0
    packed = cfg.emn_packed and _emn_edge_capacity(cfg) < cfg.max_n_nodes ** 2
    packing = _pack_edges(edges, _emn_edge_capacity(cfg)) if packed else None
    for _ in range(cfg.message_passes):
        emb_per_type = _enn_stack(cfg, params["msg_nns"], hidden,
                                  cfg.msg_dropout_p, train, keys[0])
        att_per_type = _enn_stack(cfg, params["att_nns"], hidden,
                                  cfg.att_dropout_p, train, keys[1])
        if packed:
            messages = _packed_attention_messages(cfg, packing,
                                                  emb_per_type, att_per_type)
        else:
            embedding = pair_axis(
                jnp.einsum("bije,ebjm->bijm", edges, emb_per_type,
                           preferred_element_type=jnp.float32).astype(dt))
            energies = pair_axis(
                jnp.einsum("bije,ebjm->bijm", edges, att_per_type,
                           preferred_element_type=jnp.float32).astype(dt))
            energy_mask = (1.0 - adj_mask.astype(dt)) * cfg.big_positive
            attention = jax.nn.softmax(
                energies - energy_mask[..., None], axis=2)
            messages = jnp.sum(attention * embedding, axis=2)
        hidden = _masked_update(params["gru"], messages, hidden, node_mask)
    graph_emb = graph_gather(params["gather"], hidden, nodes, node_mask,
                             cfg.big_positive, cfg.gather_att_dropout_p,
                             cfg.gather_emb_dropout_p, train, keys[2])
    return global_readout(params["apd"], hidden, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train, keys[3])


# --------------------------------------------------------------------------
# EMN (reference gnn/mpnn.py:401-494 + gnn/edge_mpnn.py:82-192)
# --------------------------------------------------------------------------

def init_emn(cfg: GraphInventConfig, key: jax.Array) -> Params:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    D = cfg.edge_emb_size
    return {
        "embedding_nn": init_mlp(
            k1, cfg.n_node_features * 2 + cfg.n_edge_features,
            [cfg.edge_emb_hidden_dim] * cfg.edge_emb_depth, D),
        "emb_msg_nn": init_mlp(k2, D, [cfg.msg_hidden_dim] * cfg.msg_depth, D),
        "att_msg_nn": init_mlp(k3, D, [cfg.att_hidden_dim] * cfg.att_depth, D),
        "gru": init_gru_cell(k4, D, D),
        "gather": init_graph_gather(k5, D, D, cfg.gather_width,
                                    cfg.gather_att_depth,
                                    cfg.gather_att_hidden_dim,
                                    cfg.gather_emb_depth,
                                    cfg.gather_emb_hidden_dim),
        "apd": init_global_readout(
            k6, cfg.len_f_add_per_node, cfg.len_f_conn_per_node, 1,
            cfg.mlp1_depth, cfg.mlp1_hidden_dim,
            cfg.mlp2_depth, cfg.mlp2_hidden_dim,
            graph_emb_size=cfg.gather_width,
            max_n_nodes=cfg.max_n_nodes,
            node_emb_size=D),
    }


def _max_valence(cfg: GraphInventConfig) -> int:
    """Largest allowed total valence over the config's chemistry
    (atom_types x formal_charge) -- the per-atom bound on bond-order sum,
    hence on degree.  Derived from the same valence model the sampler and
    preprocessing enforce (chem/molecule.py allowed_valences)."""
    from graphinvent_tpu.chem.molecule import allowed_valences
    best = 1
    for el in cfg.atom_types:
        for q in cfg.formal_charge:
            vals = allowed_valences(el, q)
            if vals:
                best = max(best, max(vals))
    return best


def _emn_edge_capacity(cfg: GraphInventConfig) -> int:
    """Static bound on directed edges per graph.  Every atom's bond-order
    sum is capped by its allowed valence, so with V = max valence over the
    config's chemistry, bonds <= V*N/2 and directed edges <= V*N (rounded
    up to a multiple of 8 for TPU lane alignment).  The sampler is tighter
    still (<= 2 actions per node => < 4N directed edges)."""
    n = cfg.max_n_nodes
    v = _max_valence(cfg)
    cap = ((v * n + 7) // 8) * 8
    return min(n * n, cap)


def _pack_edges(edges: jnp.ndarray, E_cap: int):
    """Packs the real directed edges (row-major (i,j)) of a dense
    (B,N,N,E) tensor into E_cap slots.  Returns (src, dst, valid,
    type_onehot, src_onehot, dst_onehot); see apply_emn_packed for the
    capacity argument."""
    B, N, _, E = edges.shape
    dt = edges.dtype
    adj_flat = (jnp.sum(edges, axis=3) != 0).reshape(B, N * N)
    order = jnp.argsort(~adj_flat, axis=1, stable=True)
    sel = order[:, :E_cap]
    valid = jnp.take_along_axis(adj_flat, sel, axis=1)
    valid_f = valid.astype(dt)[..., None]
    src = sel // N
    dst = sel % N
    type_oh = jnp.take_along_axis(edges.reshape(B, N * N, E),
                                  sel[..., None], axis=1)      # (B,E_cap,E)
    src_oh = jax.nn.one_hot(src, N, dtype=dt) * valid_f
    dst_oh = jax.nn.one_hot(dst, N, dtype=dt) * valid_f
    return src, dst, valid, type_oh, src_oh, dst_oh


def _packed_attention_messages(cfg: GraphInventConfig, packing,
                               emb_per_type: jnp.ndarray,
                               att_per_type: jnp.ndarray) -> jnp.ndarray:
    """Attention-aggregated messages over a packed edge list.

    Dense equivalent (apply_attggnn / apply_atts2v loop bodies):
        embedding[b,i,j,m] = sum_e edges[b,i,j,e] * emb_per_type[e,b,j,m]
        energies likewise; attention = softmax_j(energies + mask)
        messages[b,i,m]   = sum_j attention * embedding
    Here each real edge (i,j) selects its type's per-node value at j by
    gather+type-contraction, and the softmax over j becomes exp /
    segment-sum grouped by i via one-hot matmuls.  The softmax stabiliser
    is per-(b,m) (it cancels exactly in the ratio); isolated nodes get zero
    messages, as the dense path's fully-masked softmax does after the GRU
    node mask.

    Numerical bound: with a per-(b,m) stabiliser, an edge whose energy sits
    more than ~88 (f32) / ~11 (bf16 exp input, but exp here runs in the
    compute dtype where ln(max)/~88 still holds for f32 accumulation) below
    the batch-channel max underflows exp to 0; the dense path's
    per-destination-row softmax would keep it.  Energies are MLP outputs
    over tanh-bounded inputs and observed ranges are O(10); a per-destination
    segment-max would need a (B,E_cap,N,M) intermediate (~1.3 GB at ChEMBL
    dims), so the cheap stabiliser is used and the bound documented here."""
    E, B, N, M = emb_per_type.shape
    dt = emb_per_type.dtype
    src, dst, valid, type_oh, src_oh, dst_oh = packing
    E_cap = src.shape[1]
    valid_f = valid.astype(dt)[..., None]

    def select(per_type):      # (E,B,N,M) -> (B,E_cap,M) at (type, dst)
        # row selection as a one-hot batched matmul: take_along_axis
        # gathers lower to layout-dependent slice loops on TPU (12 ms/step
        # observed for AttS2V); the matmul rides the MXU regardless
        out = jnp.zeros((B, E_cap, M), dt)
        for t in range(E):
            rows = jnp.einsum("ben,bnm->bem", dst_oh, per_type[t],
                              preferred_element_type=jnp.float32).astype(dt)
            out = out + type_oh[:, :, t, None].astype(dt) * rows
        return out

    att_sel = edge_axis(select(att_per_type))
    emb_sel = edge_axis(select(emb_per_type))

    neg_inf = jnp.asarray(cfg.big_negative, dt)
    masked = jnp.where(valid[..., None], att_sel, neg_inf)
    m = jnp.max(masked, axis=1)                              # (B,M)
    m = jnp.where(m > 0.5 * neg_inf, m, 0.0)
    exp_e = jnp.exp(att_sel - m[:, None, :]) * valid_f       # (B,E_cap,M)

    S = jnp.einsum("ben,bem->bnm", src_oh, exp_e,
                   preferred_element_type=jnp.float32)
    T = jnp.einsum("ben,bem->bnm", src_oh, exp_e * emb_sel,
                   preferred_element_type=jnp.float32)
    # double-where: mask BOTH operands before dividing (clamping alone
    # still propagates NaN through the division's VJP at S == 0 lanes --
    # nodes with no incident edges)
    p = S > 0
    T_safe = jnp.where(p, T, 0.0)
    S_safe = jnp.where(p, jnp.maximum(S, 1e-30), 1.0)
    return node_axis((T_safe / S_safe).astype(dt))


def apply_emn(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
              edges: jnp.ndarray, train: bool = False,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """EMN forward: packed-edge formulation when it saves work (the dense
    (B,N,N,·) layout evaluates the per-edge MLPs on every node pair while
    only ~15% are real edges at N=13, far fewer at ChEMBL sizes), dense
    otherwise or when cfg.emn_packed is off."""
    if cfg.emn_packed and _emn_edge_capacity(cfg) < cfg.max_n_nodes ** 2:
        return apply_emn_packed(cfg, params, nodes, edges, train, rng)
    return apply_emn_dense(cfg, params, nodes, edges, train, rng)


def apply_emn_packed(cfg: GraphInventConfig, params: Params,
                     nodes: jnp.ndarray, edges: jnp.ndarray,
                     train: bool = False,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """EMN forward over a fixed-capacity packed edge list (SURVEY.md §7
    design delta 1 applied to the edge-memory model).

    Real directed edges (row-major (i,j) order) are packed into E_cap
    slots via a stable argsort of the flat adjacency mask; all segment
    reductions are one-hot batched matmuls (MXU) and the reverse-edge
    lookup is a gather through the inverse packing permutation -- no
    scatters in the pass.  Numerically this matches apply_emn_dense up to
    f32 rounding (the softmax stabiliser is per-(b,d) instead of
    per-(b,i,d); it cancels exactly in the attention ratio).  With
    dropout enabled the mask draws differ from the dense path (different
    row layout); dropout defaults to 0 as in the reference."""
    keys = _readout_keys(rng, 5)
    B, N, Fn = nodes.shape
    dt = nodes.dtype
    D = cfg.edge_emb_size
    E = cfg.n_edge_features
    E_cap = _emn_edge_capacity(cfg)
    NN = N * N

    adjacency = jnp.sum(edges, axis=3)                 # (B,N,N)
    adj_flat = (adjacency != 0).reshape(B, NN)
    node_mask = jnp.sum(adjacency, axis=-1) != 0

    # pack: stable argsort puts real edges (row-major) in the first slots
    order = jnp.argsort(~adj_flat, axis=1, stable=True)
    sel = order[:, :E_cap]                             # (B,E_cap) flat (i,j)
    valid = jnp.take_along_axis(adj_flat, sel, axis=1) # (B,E_cap)
    valid_f = valid.astype(dt)[..., None]              # (B,E_cap,1)
    src = sel // N                                     # edge i -> j: i
    dst = sel % N                                      # j
    # inverse permutation: flat (i,j) -> packed slot (for the reverse edge)
    pos = jnp.zeros((B, NN), jnp.int32).at[
        jnp.arange(B)[:, None], sel].set(
        jnp.arange(E_cap, dtype=jnp.int32)[None, :])
    rev_idx = jnp.take_along_axis(pos, dst * N + src, axis=1)  # (B,E_cap)
    # reverse-edge lookup as a permutation matmul: take_along_axis on the
    # (B, E_cap, D) memories lowers to serial dynamic-slice loops on TPU;
    # a one-hot (E_cap x E_cap) contraction rides the MXU (~1 GFLOP at
    # reference dims vs the measured multi-ms gather)
    rev_oh = jax.nn.one_hot(rev_idx, E_cap, dtype=dt) * valid_f  # (B,Ec,Ec)

    def at_rev(per_edge):            # (B,E_cap,D) -> value at reverse edge
        return jnp.einsum("bef,bfd->bed", rev_oh, per_edge,
                          preferred_element_type=jnp.float32).astype(dt)

    # one-hot incidence (zeroed for padding slots): segment sums as matmuls
    src_oh = (jax.nn.one_hot(src, N, dtype=dt) * valid_f)      # (B,E_cap,N)
    dst_oh = (jax.nn.one_hot(dst, N, dtype=dt) * valid_f)

    # static edge embeddings on packed slots only
    x_s = jnp.take_along_axis(nodes, src[..., None], axis=1)   # (B,E_cap,Fn)
    x_t = jnp.take_along_axis(nodes, dst[..., None], axis=1)
    e_feat = jnp.take_along_axis(edges.reshape(B, NN, E), sel[..., None],
                                 axis=1)
    cat = jnp.concatenate([x_s, x_t, e_feat], axis=-1)
    E_emb = edge_axis(jnp.tanh(_mlp_inf(cfg, params["embedding_nn"], cat,
                                        cfg.edge_emb_dropout_p, train,
                                        keys[0])) * valid_f)

    att_self = _mlp_inf(cfg, params["att_msg_nn"], E_emb, cfg.att_dropout_p,
                   train, keys[1])                     # (B,E_cap,D)
    emb_self = _mlp_inf(cfg, params["emb_msg_nn"], E_emb, cfg.msg_dropout_p,
                   train, keys[2])

    memories = edge_axis(jnp.zeros((B, E_cap, D), dt))
    neg_inf = jnp.asarray(cfg.big_negative, dt)

    def contract(inc, val):          # (B,E_cap,N),(B,E_cap,D) -> (B,N,D)
        return node_axis(jnp.einsum("ben,bed->bnd", inc, val,
                                    preferred_element_type=jnp.float32
                                    ).astype(dt))

    def at_src(per_node):            # (B,N,D) -> (B,E_cap,D)
        return edge_axis(jnp.einsum("ben,bnd->bed", src_oh, per_node,
                                    preferred_element_type=jnp.float32
                                    ).astype(dt))

    for _ in range(cfg.message_passes):
        att_mem = _mlp_inf(cfg, params["att_msg_nn"], memories, cfg.att_dropout_p,
                      train, keys[1])
        emb_mem = _mlp_inf(cfg, params["emb_msg_nn"], memories, cfg.msg_dropout_p,
                      train, keys[2])

        # per-(b,d) stabiliser over every relevant energy (cancels exactly)
        masked_mem = jnp.where(valid[..., None], att_mem, neg_inf)
        masked_self = jnp.where(valid[..., None], att_self, neg_inf)
        m = jnp.maximum(jnp.max(masked_mem, axis=1),
                        jnp.max(masked_self, axis=1))            # (B,D)
        m = jnp.where(m > 0.5 * neg_inf, m, 0.0)

        exp_mem = jnp.exp(att_mem - m[:, None, :]) * valid_f     # (B,E_cap,D)
        S = contract(dst_oh, exp_mem)                            # (B,N,D)
        T = contract(dst_oh, exp_mem * emb_mem)
        S_at = at_src(S)                                         # (B,E_cap,D)
        T_at = at_src(T)

        exp_rev = at_rev(exp_mem)
        emb_rev = at_rev(emb_mem)

        exp_self = jnp.exp(att_self - m[:, None, :]) * valid_f
        Z = exp_self + S_at - exp_rev
        numer = exp_self * emb_self + T_at - exp_rev * emb_rev
        Z_safe = jnp.where(valid[..., None], jnp.maximum(Z, 1e-30), 1.0)
        numer_safe = jnp.where(valid[..., None], numer, 0.0)
        message = numer_safe / Z_safe

        # gru_cell maps over leading dims; applying it on (B, E_cap, D)
        # directly keeps the edge axis shardable (a reshape to (B*E_cap, D)
        # would merge the graph-sharded axis into batch)
        new_mem = gru_cell(params["gru"], message, jnp.zeros((B, E_cap, D), dt))
        memories = edge_axis(new_mem * valid_f)

    graph_sets = node_axis(contract(src_oh, memories))           # (B,N,D)

    graph_emb = graph_gather(params["gather"], graph_sets, graph_sets,
                             node_mask, cfg.big_positive,
                             cfg.gather_att_dropout_p,
                             cfg.gather_emb_dropout_p, train, keys[3])
    return global_readout(params["apd"], graph_sets, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train, keys[4])


def apply_emn_dense(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
                    edges: jnp.ndarray, train: bool = False,
                    rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """EMN forward with a factored incoming-edge attention.

    For directed edge (i,j), the incoming set is {M[k,i] : adj(k,i), k != j}
    plus a self slot holding the edge's static embedding E_ij
    (edge_mpnn.py:109-174).  The per-channel softmax over that set is
    computed from running sums S (denominator) and T (numerator) over all k
    adjacent to i, subtracting the k=j (reverse edge) contribution -- exact,
    with no N^3 intermediate."""
    keys = _readout_keys(rng, 5)
    B, N, Fn = nodes.shape
    dt = nodes.dtype
    D = cfg.edge_emb_size
    adjacency = jnp.sum(edges, axis=3)                # (B,N,N)
    adj = adjacency != 0
    adj_f = adj.astype(dt)
    node_mask = jnp.sum(adjacency, axis=-1) != 0

    # static per-edge embeddings E_ij = tanh(embedding_nn([x_i, x_j, e_ij]))
    # (gnn/mpnn.py:466-469); masked to existing edges
    x_i = jnp.broadcast_to(nodes[:, :, None, :], (B, N, N, Fn))
    x_j = jnp.broadcast_to(nodes[:, None, :, :], (B, N, N, Fn))
    cat = jnp.concatenate([x_i, x_j, edges], axis=-1)
    E_emb = jnp.tanh(mlp(params["embedding_nn"], cat,
                         cfg.edge_emb_dropout_p, train, keys[0]))
    E_emb = pair_axis(E_emb * adj_f[..., None])

    att_self = _mlp_inf(cfg, params["att_msg_nn"], E_emb, cfg.att_dropout_p,
                   train, keys[1])                    # (B,N,N,D)
    emb_self = _mlp_inf(cfg, params["emb_msg_nn"], E_emb, cfg.msg_dropout_p,
                   train, keys[2])

    memories = pair_axis(jnp.zeros((B, N, N, D), dt))
    neg_inf = jnp.asarray(cfg.big_negative, dt)

    for _ in range(cfg.message_passes):
        att_mem = _mlp_inf(cfg, params["att_msg_nn"], memories, cfg.att_dropout_p,
                      train, keys[1])                  # (B,N,N,D): att(M[k,i]) at [k,i]
        emb_mem = _mlp_inf(cfg, params["emb_msg_nn"], memories, cfg.msg_dropout_p,
                      train, keys[2])
        # transpose to index by (i, k): attT[b,i,k,d] = att(M[k,i])
        attT = jnp.swapaxes(att_mem, 1, 2)
        embT = jnp.swapaxes(emb_mem, 1, 2)
        adjT = jnp.swapaxes(adj_f, 1, 2)               # adjT[b,i,k] = adj(k,i)

        # j-independent stabiliser m[b,i,d] >= every relevant energy
        masked_attT = jnp.where(adjT[..., None] > 0, attT, neg_inf)
        m_incoming = jnp.max(masked_attT, axis=2)      # (B,N,D)
        masked_self = jnp.where(adj[..., None], att_self, neg_inf)
        m_self = jnp.max(masked_self, axis=2)          # (B,N,D)
        m = jnp.maximum(m_incoming, m_self)
        # nodes with no edges at all would give m = -inf-ish; neutralise so
        # the (fully masked, later discarded) rows stay finite
        m = jnp.where(m > 0.5 * neg_inf, m, 0.0)

        exp_in = adjT[..., None] * jnp.exp(masked_attT - m[:, :, None, :])
        S = jnp.sum(exp_in, axis=2)                    # (B,N,D)
        T = jnp.sum(exp_in * embT, axis=2)             # (B,N,D)

        exp_self = jnp.exp(att_self - m[:, :, None, :]) * adj_f[..., None]
        # reverse-edge term to subtract: k = j slot
        exp_rev = exp_in                               # (B,N,N,D) indexed [i,k]
        Z = exp_self + S[:, :, None, :] - exp_rev
        numer = exp_self * emb_self + T[:, :, None, :] - exp_rev * embT
        # double-where: mask both operands BEFORE dividing so the untaken
        # branch can't overflow f32 and poison the backward pass with 0*inf
        edge_m = adj[..., None]
        Z_safe = jnp.where(edge_m, jnp.maximum(Z, 1e-30), 1.0)
        numer_safe = jnp.where(edge_m, numer, 0.0)
        message = numer_safe / Z_safe

        new_mem = gru_cell(params["gru"], message,
                           jnp.zeros((B, N, N, D), dt))
        memories = pair_axis(new_mem * adj_f[..., None])

    # node representations: sum of outgoing-edge memories
    # (edge_mpnn.py:176-189: node i collects memories of edges (i, j))
    graph_sets = node_axis(jnp.sum(memories, axis=2))  # (B,N,D)

    graph_emb = graph_gather(params["gather"], graph_sets, graph_sets,
                             node_mask, cfg.big_positive,
                             cfg.gather_att_dropout_p,
                             cfg.gather_emb_dropout_p, train, keys[3])
    return global_readout(params["apd"], graph_sets, graph_emb,
                          cfg.mlp1_dropout_p, cfg.mlp2_dropout_p, train, keys[4])


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

MODEL_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {
    "MNN": (init_mnn, apply_mnn),
    "S2V": (init_s2v, apply_s2v),
    "AttS2V": (init_atts2v, apply_atts2v),
    "GGNN": (init_ggnn, apply_ggnn),
    "AttGGNN": (init_attggnn, apply_attggnn),
    "EMN": (init_emn, apply_emn),
}


def init_model(cfg: GraphInventConfig, key: jax.Array) -> Params:
    return MODEL_REGISTRY[cfg.model][0](cfg, key)


def apply_model(cfg: GraphInventConfig, params: Params, nodes: jnp.ndarray,
                edges: jnp.ndarray, train: bool = False,
                rng: Optional[jax.Array] = None) -> jnp.ndarray:
    return MODEL_REGISTRY[cfg.model][1](cfg, params, nodes, edges, train, rng)
