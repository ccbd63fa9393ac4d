import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphinvent_tpu.chem import mol_from_smiles
from graphinvent_tpu.chem.molgraph import ordered_graph
from graphinvent_tpu.config import test_config as tiny_config
from graphinvent_tpu.models import MODEL_REGISTRY, apply_model, init_model

SMILES = ["CC1C2N1CC1=C2CC=C1", "C", "CC", "OC1=CC=CC1"]


def _batch(cfg):
    graphs = [ordered_graph(mol_from_smiles(s), cfg) for s in SMILES]
    nodes = jnp.asarray(np.stack([g[0] for g in graphs]), jnp.float32)
    edges = jnp.asarray(np.stack([g[1] for g in graphs]), jnp.float32)
    # append an all-empty graph (no dummy-graph hack needed, SURVEY.md §7)
    nodes = jnp.concatenate([nodes, jnp.zeros_like(nodes[:1])])
    edges = jnp.concatenate([edges, jnp.zeros_like(edges[:1])])
    return nodes, edges


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shape_and_finite(name):
    cfg = tiny_config(name)
    params = init_model(cfg, jax.random.PRNGKey(0))
    nodes, edges = _batch(cfg)
    out = apply_model(cfg, params, nodes, edges)
    assert out.shape == (nodes.shape[0], cfg.dim_apd)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_gradients_finite(name):
    cfg = tiny_config(name)
    params = init_model(cfg, jax.random.PRNGKey(0))
    nodes, edges = _batch(cfg)

    def loss(p):
        out = apply_model(cfg, p, nodes, edges)
        return jnp.sum(jax.nn.log_softmax(out, axis=1) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # at least most leaves receive gradient signal
    nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.5


def test_isolated_nodes_not_updated():
    """Nodes with degree 0 must keep their (padded) input state through
    message passing (reference: summation_mpnn.py:109,143-144)."""
    cfg = tiny_config("GGNN", message_passes=3)
    params = init_model(cfg, jax.random.PRNGKey(0))
    from graphinvent_tpu.models.mpnn import _prepare, _masked_update
    nodes, edges = _batch(cfg)
    hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
    # the single-atom molecule "C" is sample index 1: its node 0 has degree 0
    assert not bool(node_mask[1, 0])
    msg = jnp.ones((nodes.shape[0], cfg.max_n_nodes, cfg.message_size))
    h2 = _masked_update(params["gru"], msg, hidden, node_mask)
    np.testing.assert_allclose(np.asarray(h2[1, 0]), np.asarray(hidden[1, 0]))
    assert not np.allclose(np.asarray(h2[0, 0]), np.asarray(hidden[0, 0]))


def test_batch_independence():
    """Each graph's APD must not depend on other graphs in the batch."""
    cfg = tiny_config("GGNN")
    params = init_model(cfg, jax.random.PRNGKey(0))
    nodes, edges = _batch(cfg)
    full = apply_model(cfg, params, nodes, edges)
    solo = apply_model(cfg, params, nodes[:1], edges[:1])
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(solo[0]),
                               rtol=2e-4, atol=2e-5)


def test_permutation_covariance_of_messages():
    """Relabeling graph nodes permutes node-level outputs consistently:
    graph-level embedding (gather) must be invariant."""
    from graphinvent_tpu.models.mpnn import _prepare
    from graphinvent_tpu.models.readout import graph_gather
    cfg = tiny_config("GGNN", message_passes=2)
    params = init_model(cfg, jax.random.PRNGKey(1))
    m = mol_from_smiles("OC1=CC=CC1")
    nodes_np, edges_np, n = ordered_graph(m, cfg)
    perm = np.random.default_rng(0).permutation(n).tolist() + \
        list(range(n, cfg.max_n_nodes))
    nodes_p = nodes_np[perm]
    edges_p = edges_np[np.ix_(perm, perm)]

    def graph_emb(nodes_np, edges_np):
        nodes = jnp.asarray(nodes_np, jnp.float32)[None]
        edges = jnp.asarray(edges_np, jnp.float32)[None]
        hidden, adjacency, degree, node_mask = _prepare(cfg, nodes, edges)
        from graphinvent_tpu.models.mpnn import apply_ggnn
        # use the full forward's graph embedding via gather on input state
        return graph_gather(params["gather"], hidden, nodes, node_mask,
                            cfg.big_positive)

    a = np.asarray(graph_emb(nodes_np, edges_np))
    b = np.asarray(graph_emb(nodes_p, edges_p))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_emn_packed_matches_dense():
    """The packed-edge EMN formulation is exactly the dense one (up to f32
    rounding from the coarser softmax stabiliser)."""
    import dataclasses
    import numpy as np
    import jax
    from graphinvent_tpu.config import test_config as tiny_config
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.models.mpnn import (
        _emn_edge_capacity, apply_emn_dense, apply_emn_packed,
    )

    cfg = tiny_config("EMN")
    # the packed path must actually be selectable for this config
    assert _emn_edge_capacity(cfg) < cfg.max_n_nodes ** 2
    params = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B, N = 16, cfg.max_n_nodes
    nodes = np.zeros((B, N, cfg.n_node_features), np.float32)
    edges = np.zeros((B, N, N, cfg.n_edge_features), np.float32)
    for b in range(B):
        n = int(rng.integers(0, N + 1))        # include empty graphs
        for i in range(n):
            nodes[b, i, int(rng.integers(0, cfg.n_atom_types))] = 1
            nodes[b, i, cfg.n_atom_types] = 1
        for i in range(n - 1):                 # chain
            t = int(rng.integers(0, cfg.n_edge_features))
            edges[b, i, i + 1, t] = edges[b, i + 1, i, t] = 1
        if n >= 3 and rng.random() < 0.7:      # ring-closing edge
            t = int(rng.integers(0, cfg.n_edge_features))
            edges[b, 0, n - 1, t] = edges[b, n - 1, 0, t] = 1
    dense = np.asarray(apply_emn_dense(cfg, params, nodes, edges))
    packed = np.asarray(apply_emn_packed(cfg, params, nodes, edges))
    np.testing.assert_allclose(packed, dense, rtol=2e-4, atol=2e-4)


def test_attention_packed_matches_dense():
    """AttGGNN / AttS2V packed attention messages == dense softmax path."""
    import numpy as np
    import jax
    from graphinvent_tpu.config import preset
    from graphinvent_tpu.models import apply_model, init_model

    rng = np.random.default_rng(7)
    for model in ("AttGGNN", "AttS2V"):
        cfg_p = preset(model)                       # N=13: packed active
        cfg_d = preset(model, emn_packed=False)
        assert cfg_p.emn_packed and not cfg_d.emn_packed
        params = init_model(cfg_p, jax.random.PRNGKey(0))
        B, N = 8, cfg_p.max_n_nodes
        nodes = np.zeros((B, N, cfg_p.n_node_features), np.float32)
        edges = np.zeros((B, N, N, cfg_p.n_edge_features), np.float32)
        for b in range(B):
            n = int(rng.integers(0, N + 1))
            for i in range(n):
                nodes[b, i, int(rng.integers(0, cfg_p.n_atom_types))] = 1
                nodes[b, i, cfg_p.n_atom_types] = 1
            for i in range(n - 1):
                t = int(rng.integers(0, cfg_p.n_edge_features))
                edges[b, i, i + 1, t] = edges[b, i + 1, 0 + i, t] = 1
            if n >= 4:
                t = int(rng.integers(0, cfg_p.n_edge_features))
                edges[b, 0, n - 1, t] = edges[b, n - 1, 0, t] = 1
        dense = np.asarray(apply_model(cfg_d, params, nodes, edges))
        packed = np.asarray(apply_model(cfg_p, params, nodes, edges))
        np.testing.assert_allclose(packed, dense, rtol=3e-4, atol=3e-4,
                                   err_msg=model)


def test_packed_matches_dense_chembl_scale():
    """Packed == dense at ChEMBL-scale graphs (N=80, the reference's
    tdc-create-dataset.py:44 atom cap) for every model with a packed path.

    The summation engines (MNN/S2V/GGNN) intentionally have NO packed path:
    their per-edge work is a pure type contraction (E*N^2*M FLOPs dense)
    with no per-pair MLP, and a packed edge list of capacity V*N would cost
    E_cap*N*M = V*N^2*M > E*N^2*M (max valence V=4-6 exceeds E=3 bond
    types) -- packing is a strict pessimization there at every N.  See
    docs/9 and BASELINE.md for the measured N-scaling table."""
    import numpy as np
    import jax
    from graphinvent_tpu.config import preset
    from graphinvent_tpu.models import apply_model, init_model
    from graphinvent_tpu.models.mpnn import _emn_edge_capacity
    from tools.roofline import synthetic_batch

    for model in ("EMN", "AttGGNN", "AttS2V"):
        cfg_p = preset(model, max_n_nodes=80, compute_dtype="float32")
        cfg_d = cfg_p.replace(emn_packed=False)
        # the packed path must engage at this scale (E_cap << N^2)
        assert _emn_edge_capacity(cfg_p) < 80 * 80 // 4
        params = init_model(cfg_p, jax.random.PRNGKey(1))
        nodes, edges, _ = synthetic_batch(cfg_p, batch_size=3, seed=11)
        dense = np.asarray(apply_model(cfg_d, params, nodes, edges))
        packed = np.asarray(apply_model(cfg_p, params, nodes, edges))
        np.testing.assert_allclose(packed, dense, rtol=3e-4, atol=3e-4,
                                   err_msg=model)


def test_fused_enn_matches_stacked():
    """The Pallas fused ENN kernel (interpret mode on CPU) must match the
    XLA stacked_mlp bit-for-bit in f32, including on a row count that does
    not divide the tile (the non-divisible grid pads reads / drops writes)."""
    import jax
    import jax.numpy as jnp
    from graphinvent_tpu.models.core import init_stacked_mlp, stacked_mlp
    from graphinvent_tpu.models.fused_enn import fused_mlp, fused_stacked_mlp

    params = init_stacked_mlp(jax.random.PRNGKey(0), 4, 100, [250] * 2, 100)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 13, 100),
                          jnp.float32) * 0.5            # 91 rows: 91 % 64 != 0
    ref = np.asarray(stacked_mlp(params, x))
    got = np.asarray(fused_stacked_mlp(params, x, tile=64, interpret=True))
    assert got.shape == ref.shape == (4, 7, 13, 100)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    # E=1 wrapper used for the readout / EMN nets, incl. a 2D (B, I) input
    from graphinvent_tpu.models.core import init_mlp, mlp
    p1 = init_mlp(jax.random.PRNGKey(2), 60, [120] * 2, 30)
    for shape in ((7, 13, 60), (91, 60)):
        y = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float32)
        r = np.asarray(mlp(p1, y))
        g = np.asarray(fused_mlp(p1, y, tile=64, interpret=True))
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5)


def test_fused_gate_off_on_cpu():
    """CPU runs (every CI test) must take the XLA path: the gate requires
    the opt-in fused_inference() context (only the grad-free sampler
    enables it -- the RL replay differentiates train=False forwards), a
    real TPU backend, eval mode, zero dropout and no ambient mesh."""
    from graphinvent_tpu.models.fused_enn import fused_gate, fused_inference
    assert not fused_gate(False)          # outside the context -> off
    with fused_inference():
        assert not fused_gate(False)      # cpu backend -> off
        assert not fused_gate(True)       # train -> off regardless
        # dropout_ps are ignored (dropout is inert at train=False); on a
        # TPU this call WOULD fuse -- here the cpu backend gates it off
        assert not fused_gate(False, 0.5)
    assert not fused_gate(False)
