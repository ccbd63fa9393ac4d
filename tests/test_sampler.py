import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphinvent_tpu.config import test_config as tiny_config
from graphinvent_tpu.models import init_model
from graphinvent_tpu.sampling import GraphSampler
from graphinvent_tpu.sampling.actions import decode_actions, apply_actions


def _cfg():
    return tiny_config("GGNN")


def _decode(cfg, action, n_nodes, edges=None):
    if edges is None:
        edges = jnp.zeros((1, cfg.max_n_nodes, cfg.max_n_nodes,
                           cfg.n_edge_features))
    return decode_actions(cfg, jnp.asarray([action]),
                          jnp.asarray([n_nodes]), edges)


def _add_index(cfg, v, a, c, b):
    """Flat APD index of add(v, atom_type=a, charge=c, bond=b)."""
    dims = cfg.dim_f_add
    idx = 0
    for val, d in zip((v, a, c, b), dims):
        idx = idx * d + val
    return idx


def _conn_index(cfg, v, b):
    return cfg.len_f_add + v * cfg.n_edge_features + b


class TestDecode:
    def test_terminate(self):
        cfg = _cfg()
        acts = _decode(cfg, cfg.dim_apd - 1, 3)
        assert bool(acts.is_term[0]) and not bool(acts.invalid[0])

    def test_valid_add(self):
        cfg = _cfg()
        acts = _decode(cfg, _add_index(cfg, 1, 2, 1, 0), 2)
        assert bool(acts.is_add[0]) and not bool(acts.invalid[0])
        assert int(acts.add_to[0]) == 1
        assert int(acts.atom_type[0]) == 2
        assert int(acts.charge[0]) == 1
        assert int(acts.add_bond_type[0]) == 0
        assert int(acts.bond_from[0]) == 2

    def test_add_to_nonexistent_node_invalid(self):
        cfg = _cfg()
        acts = _decode(cfg, _add_index(cfg, 5, 0, 1, 0), 2)
        assert bool(acts.invalid[0])

    def test_add_to_empty_graph(self):
        cfg = _cfg()
        ok = _decode(cfg, _add_index(cfg, 0, 0, 1, 0), 0)
        assert not bool(ok.invalid[0])
        bad = _decode(cfg, _add_index(cfg, 1, 0, 1, 0), 0)
        assert bool(bad.invalid[0])

    def test_add_beyond_max_nodes_invalid(self):
        cfg = _cfg()
        acts = _decode(cfg, _add_index(cfg, 0, 0, 1, 0), cfg.max_n_nodes)
        assert bool(acts.invalid[0])

    def test_connect_to_nonexistent_invalid(self):
        cfg = _cfg()
        acts = _decode(cfg, _conn_index(cfg, 7, 0), 3)
        assert bool(acts.invalid[0])

    def test_connect_on_empty_invalid(self):
        cfg = _cfg()
        acts = _decode(cfg, _conn_index(cfg, 0, 0), 0)
        assert bool(acts.invalid[0])

    def test_connect_self_loop_invalid(self):
        cfg = _cfg()
        acts = _decode(cfg, _conn_index(cfg, 2, 0), 3)  # conn_from == 2
        assert bool(acts.invalid[0])

    def test_connect_duplicate_edge_invalid(self):
        cfg = _cfg()
        edges = np.zeros((1, cfg.max_n_nodes, cfg.max_n_nodes,
                          cfg.n_edge_features), np.float32)
        edges[0, 0, 2, 1] = edges[0, 2, 0, 1] = 1   # existing bond 0-2
        acts = _decode(cfg, _conn_index(cfg, 0, 0), 3, jnp.asarray(edges))
        assert bool(acts.invalid[0])      # conn_from=2, conn_to=0 duplicates

    def test_valid_connect(self):
        cfg = _cfg()
        acts = _decode(cfg, _conn_index(cfg, 0, 1), 3)
        assert bool(acts.is_conn[0]) and not bool(acts.invalid[0])
        assert int(acts.conn_to[0]) == 0
        assert int(acts.conn_bond_type[0]) == 1
        assert int(acts.conn_from[0]) == 2


class TestApply:
    def test_add_to_empty_graph(self):
        cfg = _cfg()
        acts = _decode(cfg, _add_index(cfg, 0, 1, 1, 0), 0)
        nodes = jnp.zeros((1, cfg.max_n_nodes, cfg.n_node_features))
        edges = jnp.zeros((1, cfg.max_n_nodes, cfg.max_n_nodes,
                           cfg.n_edge_features))
        nodes, edges, n = apply_actions(cfg, acts, nodes, edges,
                                        jnp.asarray([0]))
        assert int(n[0]) == 1
        assert float(nodes[0, 0, 1]) == 1.0            # atom type 1
        assert float(nodes[0, 0, cfg.n_atom_types + 1]) == 1.0
        assert float(edges.sum()) == 0.0               # no dummy self-edge

    def test_add_with_bond(self):
        cfg = _cfg()
        nodes = jnp.zeros((1, cfg.max_n_nodes, cfg.n_node_features))
        nodes = nodes.at[0, 0, 0].set(1.0).at[0, 0, cfg.n_atom_types + 1].set(1.0)
        edges = jnp.zeros((1, cfg.max_n_nodes, cfg.max_n_nodes,
                           cfg.n_edge_features))
        acts = _decode(cfg, _add_index(cfg, 0, 0, 1, 2), 1)
        nodes, edges, n = apply_actions(cfg, acts, nodes, edges,
                                        jnp.asarray([1]))
        assert int(n[0]) == 2
        assert float(edges[0, 0, 1, 2]) == 1.0
        assert float(edges[0, 1, 0, 2]) == 1.0

    def test_connect(self):
        cfg = _cfg()
        nodes = jnp.zeros((1, cfg.max_n_nodes, cfg.n_node_features))
        edges = jnp.zeros((1, cfg.max_n_nodes, cfg.max_n_nodes,
                           cfg.n_edge_features))
        acts = _decode(cfg, _conn_index(cfg, 0, 1), 3)
        nodes, edges, n = apply_actions(cfg, acts, nodes, edges,
                                        jnp.asarray([3]))
        assert int(n[0]) == 3
        assert float(edges[0, 2, 0, 1]) == 1.0
        assert float(edges[0, 0, 2, 1]) == 1.0


def test_sampler_end_to_end():
    cfg = _cfg()
    params = init_model(cfg, jax.random.PRNGKey(0))
    sampler = GraphSampler(cfg, batch_size=8)
    res = sampler.sample(params, jax.random.PRNGKey(1), quiet=True)
    assert len(res.graphs) == 8
    assert res.properly_terminated.shape == (8,)
    assert np.isfinite(res.action_nlls).all()
    assert (res.action_nlls >= 0).all()
    assert res.actions.shape[0] == 8
    assert (res.t_counts >= 1).all()


def test_sampler_data_parallel_mesh_matches_single_device():
    """Rollouts sharded over the 8-device ``data`` axis produce the same
    molecules as the unsharded sampler (rows are independent, so the
    partition must be exact)."""
    from graphinvent_tpu.parallel import make_mesh

    cfg = _cfg().replace(dp_devices=8)
    params = init_model(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    plain = GraphSampler(cfg, batch_size=8).sample(params, key, quiet=True)
    mesh = make_mesh(cfg)
    sharded = GraphSampler(cfg, batch_size=8, mesh=mesh).sample(
        params, key, quiet=True)

    np.testing.assert_array_equal(plain.actions, sharded.actions)
    np.testing.assert_array_equal(plain.properly_terminated,
                                  sharded.properly_terminated)
    np.testing.assert_allclose(plain.final_loglikelihoods,
                               sharded.final_loglikelihoods, rtol=1e-5)
    for a, b in zip(plain.graphs, sharded.graphs):
        np.testing.assert_array_equal(a.node_features, b.node_features)


def test_sampler_respects_action_distribution():
    """A model whose APD puts everything on 'terminate' must produce empty,
    properly-terminated graphs."""
    cfg = _cfg()

    def apply_fn(params, nodes, edges):
        B = nodes.shape[0]
        logits = jnp.full((B, cfg.dim_apd), -30.0)
        return logits.at[:, -1].set(30.0)

    sampler = GraphSampler(cfg, batch_size=4, apply_fn=apply_fn)
    res = sampler.sample({}, jax.random.PRNGKey(0), quiet=True)
    assert res.properly_terminated.sum() == 4
    assert all(g.n_nodes == 0 for g in res.graphs)
    assert res.n_rounds == 1


def test_sampler_replay_loglik_consistency():
    """Replaying the recorded actions under the same params must reproduce
    the sampler's accumulated log-likelihoods."""
    from graphinvent_tpu.sampling.replay import trajectory_loglik
    cfg = _cfg()
    params = init_model(cfg, jax.random.PRNGKey(0))
    sampler = GraphSampler(cfg, batch_size=6)
    res = sampler.sample(params, jax.random.PRNGKey(5), quiet=True)
    replay = np.asarray(trajectory_loglik(
        cfg, params, jnp.asarray(res.actions), jnp.asarray(res.t_counts)))
    np.testing.assert_allclose(replay, res.final_loglikelihoods,
                               rtol=1e-4, atol=1e-4)


def test_gen_action_budget_knob():
    """gen_max_actions resizes the per-graph action budget (VERDICT weak #8:
    a b-bond molecule needs b+2 actions; the reference's fixed 2*max_n_nodes
    buffer clips chemistry denser than ~2 bonds/atom.  Measured: all 3009
    GDB-13 1K molecules need <= 20 of the default 26, see config.py)."""
    import jax
    import numpy as np
    from graphinvent_tpu.config import test_config as tiny_config
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.sampling import GraphSampler

    cfg = tiny_config("GGNN", gen_max_actions=40)
    assert cfg.gen_action_budget == 40
    params = init_model(cfg, jax.random.PRNGKey(0))
    res = GraphSampler(cfg, 8).sample(params, jax.random.PRNGKey(1),
                                      quiet=True)
    assert res.actions.shape == (8, 40)
    assert np.all(res.t_counts <= 40)
    # default: the reference's sizing
    assert tiny_config("GGNN").gen_action_budget \
        == 2 * tiny_config("GGNN").max_n_nodes


def test_pack_unpack_roundtrip_exact():
    """_pack_outputs -> _decode_packed is byte-exact for every field,
    including the bit-packed node/edge tensors (round 4) and the two-byte
    t/rounds counters -- pins the buffer layout that GraphSampler.finish
    and tools/profile_sampler.py both parse."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphinvent_tpu.config import test_config as tiny_config
    from graphinvent_tpu.sampling.generator import GraphSampler, _pack_outputs

    cfg = tiny_config("GGNN")
    B, N = 16, cfg.max_n_nodes
    Fn, E, L = cfg.n_node_features, cfg.n_edge_features, cfg.gen_action_budget
    rng = np.random.default_rng(3)
    nodes = (rng.random((B, N, Fn)) < 0.3).astype(np.uint8)
    edges = (rng.random((B, N, N, E)) < 0.15).astype(np.uint8)
    n_nodes = rng.integers(0, N + 1, B).astype(np.int32)
    ll = rng.normal(size=(B, L)).astype(np.float32)
    acts = rng.integers(0, 60000, (B, L)).astype(np.int32)
    term = rng.integers(0, 2, B).astype(np.uint8)
    done = rng.integers(0, 2, B).astype(np.uint8)
    t = rng.integers(0, 700, B).astype(np.int32)   # > 255: exercises hi byte
    rounds = jnp.asarray(517, jnp.int32)

    packed = np.asarray(_pack_outputs(
        jnp.asarray(nodes), jnp.asarray(edges), jnp.asarray(n_nodes),
        jnp.asarray(ll), jnp.asarray(acts), jnp.asarray(term),
        jnp.asarray(done), jnp.asarray(t), rounds))

    s = GraphSampler(cfg, B)
    res = s._decode_packed(packed, elapsed=0.0, quiet=True)
    for i in range(B):
        np.testing.assert_array_equal(res.graphs[i].node_features,
                                      nodes[i].astype(np.float32))
        np.testing.assert_array_equal(res.graphs[i].edge_features,
                                      edges[i].astype(np.float32))
        assert res.graphs[i].n_nodes == int(n_nodes[i])
    np.testing.assert_array_equal(res.t_counts, t)
    np.testing.assert_array_equal(res.actions, acts)
    np.testing.assert_array_equal(res.properly_terminated, term)
    np.testing.assert_array_equal(res.done, done)
    # the two-phase module's offset table must track this layout exactly
    # (a field added to _pack_outputs without updating _row_layout would
    # resume continuation rows from shifted garbage)
    from graphinvent_tpu.sampling.two_phase import _row_layout
    assert _row_layout(cfg)["row_bytes"] == packed.shape[1]
    np.testing.assert_allclose(res.final_loglikelihoods, ll.sum(axis=1),
                               rtol=1e-6)
    assert res.n_rounds == 517


class TestTwoPhase:
    """Two-phase straggler harvest (sampling/two_phase.py): phase-1-capped
    rollout + compacted continuation must reproduce the single-phase
    sampler's semantics (round-5 occupancy study)."""

    def test_uncapped_two_phase_is_byte_identical_to_single_phase(self):
        # with the cap at max_rounds the phase-1 program IS the single
        # -phase program (same RNG sequence), and no straggler exists
        # (overflow invalidation bounds every row before max_rounds)
        from graphinvent_tpu.sampling.two_phase import TwoPhaseSampler

        cfg = _cfg()
        params = init_model(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(7)
        single = np.asarray(GraphSampler(cfg, 8)._jitted(
            params, jax.random.fold_in(key, 0)))
        tp = TwoPhaseSampler(cfg, 8, phase1_rounds=cfg.gen_action_budget + 4)
        results, stats = tp.sample_many(params, key, n_batches=1)
        assert stats["n_stragglers"] == 0
        assert stats["n_continuation"] == 0
        got = np.asarray(tp._p1(params, jax.random.fold_in(key, 0)))
        np.testing.assert_array_equal(got, single)
        assert all(bool(d) for d in results[0].done)

    def test_forced_continuation_completes_all_rows(self):
        # an "always add to node 0" stub builds every row for exactly
        # max_n_nodes rounds (then the over-full add invalidates), so a
        # 2-round cap strands ALL rows and the deterministic actions make
        # the two-phase result comparable field-by-field to single-phase
        from graphinvent_tpu.sampling.two_phase import TwoPhaseSampler

        cfg = _cfg()

        def always_add(params, nodes, edges):
            logits = jnp.full((nodes.shape[0], cfg.dim_apd), -30.0,
                              jnp.float32)
            return logits.at[:, 0].set(30.0)

        key = jax.random.PRNGKey(3)
        B, n_batches, R = 6, 2, 2
        tp = TwoPhaseSampler(cfg, B, phase1_rounds=R, apply_fn=always_add)
        results, stats = tp.sample_many({}, key, n_batches=n_batches)
        assert stats["n_stragglers"] == n_batches * B      # everyone straggles
        assert stats["n_continuation"] == 2                # 12 rows, B=6
        assert len(results) == n_batches
        L = cfg.gen_action_budget
        for b, res in enumerate(results):
            ref = GraphSampler(cfg, B, apply_fn=always_add).sample(
                {}, jax.random.fold_in(key, b), quiet=True)
            assert len(res.graphs) == B
            assert all(bool(d) for d in res.done)          # all completed
            assert (res.t_counts <= L).all()
            np.testing.assert_array_equal(res.t_counts, ref.t_counts)
            np.testing.assert_array_equal(res.actions, ref.actions)
            np.testing.assert_array_equal(res.properly_terminated,
                                          ref.properly_terminated)
            np.testing.assert_allclose(res.final_loglikelihoods,
                                       ref.final_loglikelihoods, rtol=1e-6)
            for g, h in zip(res.graphs, ref.graphs):
                np.testing.assert_array_equal(g.node_features,
                                              h.node_features)
                np.testing.assert_array_equal(g.edge_features,
                                              h.edge_features)

    def test_real_model_stragglers_complete(self):
        # real (untrained) model, cap 1: rows whose first sampled action is
        # a valid add keep building past the cap and exercise the
        # continuation path with non-deterministic state
        from graphinvent_tpu.sampling.two_phase import TwoPhaseSampler

        cfg = _cfg()
        params = init_model(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(5)
        B = 32
        tp = TwoPhaseSampler(cfg, B, phase1_rounds=1)
        results, stats = tp.sample_many(params, key, n_batches=1)
        assert stats["n_stragglers"] > 0
        res = results[0]
        assert all(bool(d) for d in res.done)
        # continued rows took more actions than the cap
        assert int(res.t_counts.max()) > 1

    def test_phase1_complete_rows_unchanged_by_continuation(self):
        from graphinvent_tpu.sampling.two_phase import TwoPhaseSampler

        cfg = _cfg()
        params = init_model(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(11)
        B, R = 8, 4
        tp = TwoPhaseSampler(cfg, B, phase1_rounds=R)
        raw = np.asarray(tp._p1(params, jax.random.fold_in(key, 0)))
        d0, _ = tp._off["done"]
        results, _ = tp.sample_many(params, key, n_batches=1)
        ref = GraphSampler(cfg, B).sample(params, jax.random.fold_in(key, 0),
                                          quiet=True)
        for i in np.nonzero(raw[:, d0] == 1)[0]:
            # finished inside the cap: final state must equal single-phase
            assert results[0].t_counts[i] == ref.t_counts[i]
            np.testing.assert_array_equal(results[0].actions[i],
                                          ref.actions[i])
            np.testing.assert_allclose(results[0].final_loglikelihoods[i],
                                       ref.final_loglikelihoods[i], rtol=1e-6)
