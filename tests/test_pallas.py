"""Parity tests for the fused Pallas message-pass kernel (interpret mode on
CPU; compiled-mode benchmarks run on real TPU via tools/profile_step.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphinvent_tpu.config import preset, test_config as tiny_config
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.ops.pallas_message import (
    fused_message_pass, ggnn_forward_fused,
)


def _batch(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    nodes = np.zeros((B, cfg.max_n_nodes, cfg.n_node_features), np.float32)
    edges = np.zeros((B, cfg.max_n_nodes, cfg.max_n_nodes,
                      cfg.n_edge_features), np.float32)
    for b in range(B):
        n = int(rng.integers(1, cfg.max_n_nodes + 1))
        for i in range(n):
            nodes[b, i, int(rng.integers(0, cfg.n_atom_types))] = 1
            nodes[b, i, cfg.n_atom_types + 1] = 1
        for i in range(n - 1):
            t = int(rng.integers(0, cfg.n_edge_features))
            edges[b, i, i + 1, t] = edges[b, i + 1, i, t] = 1
    return jnp.asarray(nodes), jnp.asarray(edges)


def test_fused_forward_matches_xla_full_dims():
    cfg = preset("GGNN")
    params = init_model(cfg, jax.random.PRNGKey(0))
    nodes, edges = _batch(cfg, 32)
    ref = apply_model(cfg, params, nodes, edges)
    fused = ggnn_forward_fused(cfg, params, nodes, edges, tile_b=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)


def test_fused_pass_handles_empty_and_single_graphs():
    cfg = tiny_config("GGNN")
    params = init_model(cfg, jax.random.PRNGKey(1))
    B = 8
    nodes = jnp.zeros((B, cfg.max_n_nodes, cfg.n_node_features))
    edges = jnp.zeros((B, cfg.max_n_nodes, cfg.max_n_nodes,
                       cfg.n_edge_features))
    # one single-atom graph
    nodes = nodes.at[0, 0, 0].set(1.0)
    ref = apply_model(cfg, params, nodes, edges)
    fused = ggnn_forward_fused(cfg, params, nodes, edges, tile_b=8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)


def test_fused_pass_pads_ragged_batches():
    cfg = tiny_config("GGNN")
    params = init_model(cfg, jax.random.PRNGKey(2))
    nodes, edges = _batch(cfg, 5)       # not a multiple of tile_b
    ref = apply_model(cfg, params, nodes, edges)
    fused = ggnn_forward_fused(cfg, params, nodes, edges, tile_b=8,
                               interpret=True)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)
