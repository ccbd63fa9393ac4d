"""Vectorized APD action decoding + invalid-action detection.

Rebuilds GraphGenerator.get_actions / get_invalid_actions
(GraphGenerator.py:467-657) as pure array ops over the whole batch so the
sampling loop can live inside ``jax.lax.while_loop``.

TPU note: no gathers or scatters with per-row index vectors appear anywhere
here -- XLA lowers those to serial update loops on TPU (~100 us per row).
All indexed reads/writes are expressed as one-hot contractions instead,
which stay on the VPU/MXU.

The seven invalidity classes (GraphGenerator.py:599-646):
  1. add to a node index >= n_nodes (non-empty graph)
  2. add to node != 0 on an empty graph
  3. add when the graph already has max_n_nodes
  4. connect to a node index >= n_nodes
  5. connect on an empty graph
  6. connect creating a self-loop
  7. connect duplicating an existing edge (any bond type)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import GraphInventConfig


def onehot(idx: jnp.ndarray, size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) int -> (B, size) one-hot without gather/scatter."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], size), 1)
    return (iota == idx[:, None]).astype(dtype)


def select_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values (B, K), idx (B,) -> (B,) values[b, idx[b]] via one-hot dot."""
    oh = onehot(idx, values.shape[1], values.dtype)
    return jnp.sum(values * oh, axis=1)


class DecodedActions(NamedTuple):
    is_add: jnp.ndarray        # (B,) bool
    is_conn: jnp.ndarray       # (B,) bool
    is_term: jnp.ndarray       # (B,) bool
    invalid: jnp.ndarray       # (B,) bool
    # "add" fields (defined where is_add)
    add_to: jnp.ndarray        # (B,) node the new atom bonds to
    atom_type: jnp.ndarray     # (B,)
    charge: jnp.ndarray        # (B,)
    imp_h: jnp.ndarray         # (B,)  (0 when not using implicit H)
    chiral: jnp.ndarray        # (B,)  (0 when not using chirality)
    add_bond_type: jnp.ndarray # (B,)
    bond_from: jnp.ndarray     # (B,) index of the new atom (== n_nodes)
    # "connect" fields (defined where is_conn)
    conn_to: jnp.ndarray       # (B,)
    conn_bond_type: jnp.ndarray# (B,)
    conn_from: jnp.ndarray     # (B,) last appended atom (== n_nodes - 1)


def decode_actions(cfg: GraphInventConfig, action_idx: jnp.ndarray,
                   n_nodes: jnp.ndarray, edges: jnp.ndarray
                   ) -> DecodedActions:
    """action_idx (B,) int sampled from the flat APD; n_nodes (B,) int;
    edges (B,N,N,E) float 0/1."""
    B = action_idx.shape[0]
    len_f_add = cfg.len_f_add
    len_f_conn = cfg.len_f_conn
    dims_add = cfg.dim_f_add          # e.g. (N, A, C, [H], [Ch], E)
    N = cfg.max_n_nodes

    is_term = action_idx == (len_f_add + len_f_conn)
    is_add = action_idx < len_f_add
    is_conn = (~is_add) & (~is_term)

    # ---- unravel the add block (node-major order == APD layout) ----------
    a = jnp.where(is_add, action_idx, 0)
    add_fields = []
    rem = a
    stride = len_f_add
    for d in dims_add:
        stride = stride // d
        add_fields.append(rem // stride)
        rem = rem % stride
    # add_fields: [v, atom_type, charge, (imp_h), (chiral), bond_type]
    add_to = add_fields[0]
    atom_type = add_fields[1]
    charge = add_fields[2]
    nxt = 3
    if cfg.n_imp_H:
        imp_h = add_fields[nxt]
        nxt += 1
    else:
        imp_h = jnp.zeros(B, a.dtype)
    if cfg.use_chirality:
        chiral = add_fields[nxt]
        nxt += 1
    else:
        chiral = jnp.zeros(B, a.dtype)
    add_bond_type = add_fields[-1]
    bond_from = n_nodes.astype(a.dtype)           # new atom index

    # ---- unravel the connect block ---------------------------------------
    c = jnp.where(is_conn, action_idx - len_f_add, 0)
    conn_to = c // cfg.n_edge_features
    conn_bond_type = c % cfg.n_edge_features
    conn_from = n_nodes.astype(c.dtype) - 1       # last appended atom

    # ---- the seven invalidity classes ------------------------------------
    empty = n_nodes == 0
    inv_add = is_add & (~empty) & (add_to >= n_nodes)
    inv_add_empty = is_add & empty & (add_to != 0)
    inv_madd = is_add & (bond_from >= N)
    inv_conn = is_conn & (conn_to >= n_nodes)
    inv_conn_empty = is_conn & empty
    inv_sconn = is_conn & (conn_to == conn_from)
    # duplicate edge: adjacency[b, conn_to, conn_from] >= 1 read without a
    # gather -- contract with one-hot row/col selectors
    adjacency = jnp.sum(edges, axis=-1)           # (B,N,N)
    oh_to = onehot(jnp.clip(conn_to, 0, N - 1), N, adjacency.dtype)
    oh_from = onehot(jnp.clip(conn_from, 0, N - 1), N, adjacency.dtype)
    existing = jnp.einsum("bij,bi,bj->b", adjacency, oh_to, oh_from) >= 1
    inv_dconn = is_conn & existing

    invalid = (inv_add | inv_add_empty | inv_madd | inv_conn
               | inv_conn_empty | inv_sconn | inv_dconn)

    return DecodedActions(
        is_add=is_add, is_conn=is_conn, is_term=is_term, invalid=invalid,
        add_to=add_to, atom_type=atom_type, charge=charge, imp_h=imp_h,
        chiral=chiral, add_bond_type=add_bond_type, bond_from=bond_from,
        conn_to=conn_to, conn_bond_type=conn_bond_type, conn_from=conn_from)


def apply_actions(cfg: GraphInventConfig, acts: DecodedActions,
                  nodes: jnp.ndarray, edges: jnp.ndarray,
                  n_nodes: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Applies add/connect actions via one-hot outer products (no scatters).

    Mirrors GraphGenerator.apply_actions (GraphGenerator.py:211-338):
    actions are applied to *every* graph that sampled add/conn, including
    invalid ones -- those are reset right after by the caller.  Indices are
    clamped so invalid actions cannot write out of bounds (the reference
    zeroes the offending index instead, GraphGenerator.py:568)."""
    B = nodes.shape[0]
    N = cfg.max_n_nodes
    Fn = cfg.n_node_features
    dt = nodes.dtype

    add_m = acts.is_add.astype(dt)
    row_oh = onehot(jnp.clip(acts.bond_from, 0, N - 1), N, dt)    # (B, N)

    # ---- add: node features as sum of one-hot feature columns ------------
    feat_cols = [acts.atom_type, cfg.n_atom_types + acts.charge]
    off = cfg.n_atom_types + cfg.n_formal_charge
    if cfg.n_imp_H:
        feat_cols.append(off + acts.imp_h)
        off += cfg.n_imp_H
    if cfg.use_chirality:
        feat_cols.append(off + acts.chiral)
    col_oh = sum(onehot(c, Fn, dt) for c in feat_cols)            # (B, Fn)
    nodes = nodes + add_m[:, None, None] * row_oh[:, :, None] * col_oh[:, None, :]

    # ---- add: bond to the existing graph (skip on empty graphs) ----------
    bond_m = (acts.is_add & (n_nodes > 0)).astype(dt)
    v_oh = onehot(jnp.clip(acts.add_to, 0, N - 1), N, dt)
    t_oh = onehot(acts.add_bond_type, cfg.n_edge_features, dt)
    add_edge = (bond_m[:, None, None, None]
                * v_oh[:, :, None, None] * row_oh[:, None, :, None]
                * t_oh[:, None, None, :])
    edges = edges + add_edge + jnp.swapaxes(add_edge, 1, 2)

    # ---- connect ----------------------------------------------------------
    conn_m = acts.is_conn.astype(dt)
    cf_oh = onehot(jnp.clip(acts.conn_from, 0, N - 1), N, dt)
    ct_oh = onehot(jnp.clip(acts.conn_to, 0, N - 1), N, dt)
    tb_oh = onehot(acts.conn_bond_type, cfg.n_edge_features, dt)
    conn_edge = (conn_m[:, None, None, None]
                 * cf_oh[:, :, None, None] * ct_oh[:, None, :, None]
                 * tb_oh[:, None, None, :])
    edges = edges + conn_edge + jnp.swapaxes(conn_edge, 1, 2)

    n_nodes = n_nodes + acts.is_add.astype(n_nodes.dtype)
    # duplicate writes can push a cell past 1 only for invalid actions,
    # which are reset/discarded immediately; clamp for safety
    edges = jnp.minimum(edges, 1.0)
    nodes = jnp.minimum(nodes, 1.0)
    return nodes, edges, n_nodes
