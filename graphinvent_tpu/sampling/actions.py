"""Vectorized APD action decoding + invalid-action detection.

Rebuilds GraphGenerator.get_actions / get_invalid_actions
(GraphGenerator.py:467-657) as pure array ops over the whole batch so the
sampling loop can live inside ``jax.lax.while_loop``.

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
    adjacency = jnp.sum(edges, axis=-1)           # (B,N,N)
    conn_to_c = jnp.clip(conn_to, 0, N - 1)
    conn_from_c = jnp.clip(conn_from, 0, N - 1)
    existing = adjacency[jnp.arange(B), conn_to_c, conn_from_c] >= 1
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
    """Applies add/connect actions in place (functional .at updates).

    Mirrors GraphGenerator.apply_actions (GraphGenerator.py:211-338):
    actions are applied to *every* graph that sampled add/conn, including
    invalid ones -- those are reset right after by the caller.  Indices are
    clamped so invalid actions cannot write out of bounds (the reference
    zeroes the offending index instead, GraphGenerator.py:568)."""
    B = nodes.shape[0]
    N = cfg.max_n_nodes
    batch = jnp.arange(B)
    dt = nodes.dtype

    # ---- add: node features ------------------------------------------------
    row = jnp.clip(acts.bond_from, 0, N - 1)
    add_m = acts.is_add
    feat_cols = [acts.atom_type,
                 cfg.n_atom_types + acts.charge]
    off = cfg.n_atom_types + cfg.n_formal_charge
    if cfg.n_imp_H:
        feat_cols.append(off + acts.imp_h)
        off += cfg.n_imp_H
    if cfg.use_chirality:
        feat_cols.append(off + acts.chiral)
    for col in feat_cols:
        nodes = nodes.at[batch, row, col].add(
            jnp.where(add_m, 1.0, 0.0).astype(dt))
    # (``add`` not ``set``: masked rows add 0.0 -- no-op without a select)

    # ---- add: bond to the existing graph (skip on empty graphs) ----------
    bond_m = add_m & (n_nodes > 0)
    v = jnp.clip(acts.add_to, 0, N - 1)
    t = acts.add_bond_type
    one = jnp.where(bond_m, 1.0, 0.0).astype(dt)
    edges = edges.at[batch, v, row, t].add(one)
    edges = edges.at[batch, row, v, t].add(one)

    # ---- connect ----------------------------------------------------------
    conn_m = acts.is_conn
    cf = jnp.clip(acts.conn_from, 0, N - 1)
    ct = jnp.clip(acts.conn_to, 0, N - 1)
    tb = acts.conn_bond_type
    onec = jnp.where(conn_m, 1.0, 0.0).astype(dt)
    edges = edges.at[batch, cf, ct, tb].add(onec)
    edges = edges.at[batch, ct, cf, tb].add(onec)

    n_nodes = n_nodes + jnp.where(add_m, 1, 0).astype(n_nodes.dtype)
    # duplicate writes can push a cell past 1 only for invalid actions,
    # which are reset immediately; clamp for safety
    edges = jnp.minimum(edges, 1.0)
    nodes = jnp.minimum(nodes, 1.0)
    return nodes, edges, n_nodes
