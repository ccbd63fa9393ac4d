"""Graph readouts and the tiered APD head.

Dense batched re-implementations of the reference's readout modules
(gnn/modules.py): GraphGather (12-52), Set2Vec (55-108, with the
ctor/self.C latent bug fixed as planned in SURVEY.md §7), and GlobalReadout
(173-281).  Everything is expressed as batched matmuls over (B, N, ...)
tensors so XLA tiles it onto the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from graphinvent_tpu.models.core import (
    Params, init_linear, init_mlp, init_lstm_cell, linear, lstm_cell, mlp,
)


# --------------------------------------------------------------------------
# GraphGather (attention readout; reference gnn/modules.py:12-52)
# --------------------------------------------------------------------------

def init_graph_gather(key: jax.Array, node_features: int,
                      hidden_node_features: int, out_features: int,
                      att_depth: int, att_hidden_dim: int,
                      emb_depth: int, emb_hidden_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "att_nn": init_mlp(k1, node_features + hidden_node_features,
                           [att_hidden_dim] * att_depth, out_features),
        "emb_nn": init_mlp(k2, hidden_node_features,
                           [emb_hidden_dim] * emb_depth, out_features),
    }


def _mlp(params, x, dropout_p, train, rng, fused):
    """Inference-path dispatch: the fused Pallas kernel when the caller's
    gate (models/fused_enn.fused_gate) allowed it, XLA's mlp otherwise."""
    if fused:
        from graphinvent_tpu.models.fused_enn import fused_mlp
        return fused_mlp(params, x)
    return mlp(params, x, dropout_p, train, rng)


def graph_gather(params: Params, hidden_nodes: jnp.ndarray,
                 input_nodes: jnp.ndarray, node_mask: jnp.ndarray,
                 big_positive: float, att_dropout_p: float = 0.0,
                 emb_dropout_p: float = 0.0, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 fused: bool = False) -> jnp.ndarray:
    """hidden_nodes (B,N,H), input_nodes (B,N,Fn), node_mask (B,N) -> (B,G).

    Note the mask semantics: a node participates iff it has degree >= 1
    (reference node_mask = adjacency.sum(-1) != 0, summation_mpnn.py:146);
    softmax over the node axis per output channel."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    cat = jnp.concatenate([hidden_nodes, input_nodes], axis=2)
    energy_mask = (1.0 - node_mask.astype(cat.dtype)) * big_positive
    energies = _mlp(params["att_nn"], cat, att_dropout_p, train, r1, fused) \
        - energy_mask[..., None]
    attention = jax.nn.softmax(energies, axis=1)
    embedding = _mlp(params["emb_nn"], hidden_nodes, emb_dropout_p, train,
                     r2, fused)
    return jnp.sum(attention * embedding, axis=1)


# --------------------------------------------------------------------------
# Set2Vec (LSTM-attention readout; reference gnn/modules.py:55-108)
# --------------------------------------------------------------------------

def init_set2vec(key: jax.Array, node_features: int,
                 hidden_node_features: int, memory_size: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        # reference uses a default-init torch Linear here (modules.py:69-73)
        "embedding": init_linear(k1, node_features + hidden_node_features,
                                 memory_size, xavier=False),
        "lstm": init_lstm_cell(k2, memory_size, memory_size),
    }


def set2vec(params: Params, hidden_nodes: jnp.ndarray,
            input_nodes: jnp.ndarray, node_mask: jnp.ndarray,
            lstm_computations: int, memory_size: int,
            big_negative: float) -> jnp.ndarray:
    """-> (B, 2*memory_size).  Fixes the reference's undefined ``self.C``
    (gnn/modules.py:89): the energy mask uses big_negative directly."""
    B = hidden_nodes.shape[0]
    dt = hidden_nodes.dtype
    energy_mask = (1.0 - node_mask.astype(dt)) * big_negative
    cat = jnp.concatenate([hidden_nodes, input_nodes], axis=2)
    memory = linear(params["embedding"], cat)              # (B, N, mem)

    lstm_input = jnp.zeros((B, memory_size), dt)
    hidden_state = jnp.zeros((B, memory_size), dt)
    cell_state = jnp.zeros((B, memory_size), dt)
    query = hidden_state
    read = lstm_input
    for _ in range(lstm_computations):
        query, cell_state = lstm_cell(params["lstm"], lstm_input,
                                      hidden_state, cell_state)
        energies = jnp.sum(query[:, None, :] * memory, axis=-1)   # (B, N)
        attention = jax.nn.softmax(energies + energy_mask, axis=1)
        read = jnp.sum(attention[..., None] * memory, axis=1)     # (B, mem)
        hidden_state = query
        lstm_input = read
    return jnp.concatenate([query, read], axis=1)


# --------------------------------------------------------------------------
# GlobalReadout: tiered APD head (reference gnn/modules.py:173-281)
# --------------------------------------------------------------------------

def init_global_readout(key: jax.Array, f_add_elems: int, f_conn_elems: int,
                        f_term_elems: int, mlp1_depth: int, mlp1_hidden_dim: int,
                        mlp2_depth: int, mlp2_hidden_dim: int,
                        graph_emb_size: int, max_n_nodes: int,
                        node_emb_size: int) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "f_add_1": init_mlp(k1, node_emb_size,
                            [mlp1_hidden_dim] * mlp1_depth, f_add_elems),
        "f_conn_1": init_mlp(k2, node_emb_size,
                             [mlp1_hidden_dim] * mlp1_depth, f_conn_elems),
        "f_add_2": init_mlp(k3, max_n_nodes * f_add_elems + graph_emb_size,
                            [mlp2_hidden_dim] * mlp2_depth,
                            f_add_elems * max_n_nodes),
        "f_conn_2": init_mlp(k4, max_n_nodes * f_conn_elems + graph_emb_size,
                             [mlp2_hidden_dim] * mlp2_depth,
                             f_conn_elems * max_n_nodes),
        "f_term_2": init_mlp(k5, graph_emb_size,
                             [mlp2_hidden_dim] * mlp2_depth, f_term_elems),
    }


def global_readout(params: Params, node_level_output: jnp.ndarray,
                   graph_embedding: jnp.ndarray, mlp1_dropout_p: float = 0.0,
                   mlp2_dropout_p: float = 0.0, train: bool = False,
                   rng: Optional[jax.Array] = None,
                   fused: bool = False) -> jnp.ndarray:
    """node_level_output (B,N,H), graph_embedding (B,G) -> APD logits
    (B, N*f_add_elems + N*f_conn_elems + 1).  No final activation
    (softmax/log-softmax applied by the loss/sampler, as in the reference)."""
    B, N, _ = node_level_output.shape
    keys = jax.random.split(rng, 5) if rng is not None else [None] * 5
    f_add_1 = _mlp(params["f_add_1"], node_level_output,
                   mlp1_dropout_p, train, keys[0], fused).reshape(B, -1)
    f_conn_1 = _mlp(params["f_conn_1"], node_level_output,
                    mlp1_dropout_p, train, keys[1], fused).reshape(B, -1)
    f_add_2 = _mlp(params["f_add_2"],
                   jnp.concatenate([f_add_1, graph_embedding], axis=1),
                   mlp2_dropout_p, train, keys[2], fused)
    f_conn_2 = _mlp(params["f_conn_2"],
                    jnp.concatenate([f_conn_1, graph_embedding], axis=1),
                    mlp2_dropout_p, train, keys[3], fused)
    f_term_2 = _mlp(params["f_term_2"], graph_embedding,
                    mlp2_dropout_p, train, keys[4], fused)
    return jnp.concatenate([f_add_2, f_conn_2, f_term_2], axis=1)
