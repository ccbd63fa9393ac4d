"""Fused GGNN message-pass Pallas kernel.

One kernel evaluates, for a tile of graphs held in VMEM:

    per-type message MLP (all layers)  ->  adjacency contraction
    ->  GRU cell  ->  degree-masked update

i.e. the entire body of one message-passing round
(reference: gnn/summation_mpnn.py:128-144 + gnn/mpnn.py:284-297) without
intermediate HBM round-trips.  The XLA path lowers the same math to ~20
separate HBM-to-HBM kernels per pass; fusing keeps the (TB*N, enn_hidden)
activations in VMEM end-to-end.

Weights are passed as stacked (E, O, I) tensors (models/core.init_stacked_mlp
layout) and stay resident in VMEM across the whole grid.  Numerical parity
with the unfused path is enforced by tests/test_pallas.py; the kernel is
used for the inference/sampling forward (no custom VJP yet -- training
takes the XLA path).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphinvent_tpu.config import GraphInventConfig

Params = Any


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _selu(x: jnp.ndarray) -> jnp.ndarray:
    """SELU via exp in float32 (jax.nn.selu lowers to expm1, and bf16
    transcendentals hit Pallas TPU lowering bugs); input must be f32."""
    scale = 1.0507009873554805
    alpha = 1.6732632423543772
    return scale * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def fused_message_pass(cfg: GraphInventConfig, params: Params,
                       hidden: jnp.ndarray, edges: jnp.ndarray,
                       node_mask: jnp.ndarray, tile_b: int = 64,
                       interpret: bool = False) -> jnp.ndarray:
    """One GGNN message-passing round, fused.

    hidden (B, N, H), edges (B, N, N, E), node_mask (B, N) -> (B, N, H).
    B must be a multiple of ``tile_b`` (caller pads the batch).
    """
    B, N, H = hidden.shape
    E = cfg.n_edge_features
    M = cfg.message_size
    # Mosaic can only merge/split the (TB, N) dims of a vector reshape when N
    # is sublane-aligned; pad N to 16 (bf16 sublane tile).  Padded rows have
    # zero mask and zero adjacency, so they are inert.
    N_pad = _round_up(N, 16)
    if N_pad != N:
        dn = N_pad - N
        hidden = jnp.pad(hidden, ((0, 0), (0, dn), (0, 0)))
        edges = jnp.pad(edges, ((0, 0), (0, dn), (0, dn), (0, 0)))
        node_mask = jnp.pad(node_mask, ((0, 0), (0, dn)))
    N_orig, N = N, N_pad
    # pad B so any tile size works (padded graphs are all-zero => inert)
    B_orig, B_pad = B, _round_up(B, tile_b)
    if B_pad != B:
        db = B_pad - B
        hidden = jnp.pad(hidden, ((0, db), (0, 0), (0, 0)))
        edges = jnp.pad(edges, ((0, db), (0, 0), (0, 0), (0, 0)))
        node_mask = jnp.pad(node_mask, ((0, db), (0, 0)))
        B = B_pad
    if tile_b % 8 != 0 and tile_b != B:
        raise ValueError(f"tile_b {tile_b} must be a multiple of 8 "
                         "(TPU sublane tiling of the (tile_b, N) mask block)")

    # Weights ride the MXU in the model dtype (bf16 inputs -> full-rate
    # matmuls with f32 accumulation); biases stay f32 for the add.
    wdt = hidden.dtype
    layer_ws = [lp["w"].astype(wdt)
                for lp in params["msg_nns"]["layers"]]           # (E, O, I)
    layer_bs = [lp["b"].astype(jnp.float32)
                for lp in params["msg_nns"]["layers"]]           # (E, O)
    n_layers = len(layer_ws)
    gru = {"w_ih": params["gru"]["w_ih"].astype(wdt),
           "w_hh": params["gru"]["w_hh"].astype(wdt),
           "b_ih": params["gru"]["b_ih"].astype(jnp.float32),
           "b_hh": params["gru"]["b_hh"].astype(jnp.float32)}

    def kernel(h_ref, e_ref, mask_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        gih_ref, ghh_ref, gbi_ref, gbh_ref, out_ref = refs[2 * n_layers:]

        h = h_ref[:]                       # (TB, N, H)
        e = e_ref[:]                       # (TB, N, N, E)
        dt = h.dtype
        x2 = h.reshape(tile_b * N, H)

        # per-edge-type MLP towers, all layers in VMEM.  Dot inputs stay in
        # the model dtype (bf16 feeds the MXU); accumulation and all
        # elementwise math run in f32 (bf16 transcendentals do not lower).
        msgs = jnp.zeros((tile_b, N, M), jnp.float32)
        for et in range(E):
            y = x2
            for l in range(n_layers):
                w = w_refs[l][et]          # (O, I)
                b = b_refs[l][et]
                y = _selu(
                    jnp.dot(y, w.T, preferred_element_type=jnp.float32)
                    + b.astype(jnp.float32)).astype(dt)
            y = y.reshape(tile_b, N, M)
            adj_e = e[:, :, :, et]         # (TB, N, N)
            # adjacency contraction as a batched dot (graph dim = batch dim)
            part = jax.lax.dot_general(
                adj_e, y, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            msgs = msgs + part

        # GRU (torch gate order [r, z, n]); gates in f32 end-to-end
        m2 = msgs.astype(dt).reshape(tile_b * N, M)
        gi = jnp.dot(m2, gih_ref[:].T,
                     preferred_element_type=jnp.float32) \
            + gbi_ref[:].astype(jnp.float32)
        gh = jnp.dot(x2, ghh_ref[:].T,
                     preferred_element_type=jnp.float32) \
            + gbh_ref[:].astype(jnp.float32)
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        new_h = ((1.0 - z) * n + z * x2.astype(jnp.float32)) \
            .astype(dt).reshape(tile_b, N, H)

        mask = mask_ref[:]
        out_ref[:] = jnp.where(mask[..., None] != 0, new_h, h)

    grid = (B // tile_b,)
    tile = lambda *shape: pl.BlockSpec(
        (tile_b, *shape), lambda i: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: tuple([0] * arr.ndim), memory_space=pltpu.VMEM)

    in_specs = [tile(N, H), tile(N, N, E), tile(N)]
    operands: List[jnp.ndarray] = [hidden, edges,
                                   node_mask.astype(jnp.int32)]
    for w in layer_ws:
        in_specs.append(full(w))
        operands.append(w)
    for b in layer_bs:
        in_specs.append(full(b))
        operands.append(b)
    for g in (gru["w_ih"], gru["w_hh"], gru["b_ih"], gru["b_hh"]):
        in_specs.append(full(g))
        operands.append(g)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, H), hidden.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=tile(N, H),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)
    return out[:B_orig, :N_orig]


def ggnn_forward_fused(cfg: GraphInventConfig, params: Params,
                       nodes: jnp.ndarray, edges: jnp.ndarray,
                       tile_b: int = 64, interpret: bool = False
                       ) -> jnp.ndarray:
    """Full GGNN forward using the fused message-pass kernel; readout stays
    on the XLA path (it is a handful of large dense matmuls already)."""
    from graphinvent_tpu.models.mpnn import _prepare
    from graphinvent_tpu.models.readout import global_readout, graph_gather

    B = nodes.shape[0]
    pad = (-B) % tile_b
    if pad:
        nodes = jnp.concatenate(
            [nodes, jnp.zeros((pad,) + nodes.shape[1:], nodes.dtype)])
        edges = jnp.concatenate(
            [edges, jnp.zeros((pad,) + edges.shape[1:], edges.dtype)])
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    for _ in range(cfg.message_passes):
        hidden = fused_message_pass(cfg, params, hidden, edges, node_mask,
                                    tile_b=tile_b, interpret=interpret)
    graph_emb = graph_gather(params["gather"], hidden, nodes, node_mask,
                             cfg.big_positive)
    out = global_readout(params["apd"], hidden, graph_emb)
    return out[:B] if pad else out
