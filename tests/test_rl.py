import os

import numpy as np
import pytest

from graphinvent_tpu.config import test_config as tiny_config


def test_scoring_function_target_size():
    from graphinvent_tpu.eval.scoring import ScoringFunction
    from graphinvent_tpu.chem.molgraph import MolGraph
    cfg = tiny_config("GGNN", score_components=("target_size=5",),
                      score_thresholds=(0.0,), score_type="binary",
                      qsar_models={})
    sf = ScoringFunction(cfg)

    class G:
        def __init__(self, n):
            self.n_nodes = n
    graphs = [G(5), G(13), G(1)]
    ones = np.ones(3)
    scores = sf.compute_score(graphs, ones, ones, ones)
    assert scores[0] == 1.0            # exactly target size -> above 0.0
    assert scores[1] == 0.0            # max distance -> 1 - 8/8 = 0


def test_scoring_masks_invalid_and_duplicates():
    from graphinvent_tpu.eval.scoring import ScoringFunction
    cfg = tiny_config("GGNN", score_components=("target_size=5",),
                      score_thresholds=(0.0,), score_type="binary",
                      qsar_models={})
    sf = ScoringFunction(cfg)

    class G:
        n_nodes = 5
    graphs = [G(), G(), G()]
    scores = sf.compute_score(graphs, np.array([1, 1, 0]),
                              np.array([1, 0, 1]), np.array([1, 1, 1]))
    assert list(scores) == [1.0, 0.0, 0.0]


def test_qed_scoring_on_graphs():
    from graphinvent_tpu.eval.scoring import ScoringFunction
    from graphinvent_tpu.chem import mol_from_smiles
    from graphinvent_tpu.chem.molgraph import MolGraph, ordered_graph
    cfg = tiny_config("GGNN", score_components=("QED",),
                      score_thresholds=(0.5,), score_type="continuous",
                      qsar_models={})
    sf = ScoringFunction(cfg)
    m = mol_from_smiles("CCO")
    nodes, edges, n = ordered_graph(m, cfg)
    g = MolGraph(cfg, nodes, edges, n)
    ones = np.ones(1)
    scores = sf.compute_score([g], ones, ones, ones)
    assert 0.0 < scores[0] < 1.0


def test_rl_learning_steps(tmp_path):
    """Two RL fine-tuning steps end-to-end on a tiny model."""
    import jax
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.utils.checkpoint import save_checkpoint
    from graphinvent_tpu.workflow import Workflow

    data_dir = str(tmp_path / "data") + "/"
    job_dir = str(tmp_path / "job") + "/"
    pre_dir = str(tmp_path / "pre") + "/"
    os.makedirs(data_dir)
    os.makedirs(pre_dir)
    with open(os.path.join(data_dir, "train.smi"), "w") as fh:
        fh.write("SMILES\nCC\nCCC\nCCO\n")

    cfg = tiny_config(
        "GGNN", dataset_dir=data_dir, job_dir=job_dir,
        pretrained_model_dir=pre_dir, job_type="fine-tune",
        batch_size=8, epochs=2, sample_every=1, sigma=4.0, alpha=0.5,
        score_components=("target_size=3",), score_thresholds=(0.0,),
        score_type="binary", qsar_models={})

    params = init_model(cfg, jax.random.PRNGKey(0))
    save_checkpoint(os.path.join(pre_dir, "model_restart_0.ckpt"),
                    params, None, 0)

    Workflow(cfg).run()
    assert os.path.exists(os.path.join(job_dir, "fine-tuning.log"))
    log = open(os.path.join(job_dir, "fine-tuning.log")).read()
    assert "Step" in log


def test_rl_grad_dp_mesh_matches_single_device():
    """The sharded replay-gradient step (trajectories over ``data``) must
    equal the single-device step on fixed trajectories (round-2 verdict
    item 3: RL fine-tuning on the mesh)."""
    import jax
    import jax.numpy as jnp
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.parallel import make_mesh
    from graphinvent_tpu.rl.workflow_rl import _make_rl_grad

    cfg = tiny_config("GGNN", job_type="fine-tune", batch_size=8,
                      dp_devices=8, score_components=("target_size=5",),
                      score_thresholds=(0.0,))
    params = init_model(cfg, jax.random.PRNGKey(0))
    B, L = cfg.batch_size, cfg.gen_action_budget
    rng = np.random.default_rng(0)
    mk = lambda: (jnp.asarray(rng.integers(0, cfg.dim_apd, (B, L)),
                              jnp.int32),
                  jnp.asarray(rng.integers(1, 5, (B,)), jnp.int32),
                  jnp.asarray(rng.normal(size=B), jnp.float32),
                  jnp.asarray(rng.integers(0, 2, (B,)), jnp.float32))
    args_a, args_b = mk(), mk()
    alpha = jnp.asarray(0.5, jnp.float32)

    loss1, grads1 = _make_rl_grad(cfg)(params, *args_a, *args_b, alpha)
    mesh = make_mesh(cfg)
    loss8, grads8 = _make_rl_grad(cfg, mesh)(params, *args_a, *args_b, alpha)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads1),
                    jax.tree_util.tree_leaves(jax.device_get(grads8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_rl_learning_steps_dp_mesh(tmp_path):
    """fine-tune job end-to-end with dp_devices=8: sampler rollouts and the
    replay gradient run data-parallel over the 8-device mesh."""
    import jax
    from graphinvent_tpu.models import init_model
    from graphinvent_tpu.utils.checkpoint import save_checkpoint
    from graphinvent_tpu.workflow import Workflow

    data_dir = str(tmp_path / "data") + "/"
    job_dir = str(tmp_path / "job") + "/"
    pre_dir = str(tmp_path / "pre") + "/"
    os.makedirs(data_dir)
    os.makedirs(pre_dir)
    with open(os.path.join(data_dir, "train.smi"), "w") as fh:
        fh.write("SMILES\nCC\nCCC\nCCO\n")

    cfg = tiny_config(
        "GGNN", dataset_dir=data_dir, job_dir=job_dir,
        pretrained_model_dir=pre_dir, job_type="fine-tune",
        batch_size=8, epochs=2, sample_every=1, sigma=4.0, alpha=0.5,
        score_components=("target_size=3",), score_thresholds=(0.0,),
        score_type="binary", qsar_models={}, dp_devices=8)

    params = init_model(cfg, jax.random.PRNGKey(0))
    save_checkpoint(os.path.join(pre_dir, "model_restart_0.ckpt"),
                    params, None, 0)

    Workflow(cfg).run()
    log = open(os.path.join(job_dir, "fine-tuning.log")).read()
    assert "Step" in log
    conv = open(os.path.join(job_dir, "convergence.log")).read()
    assert len(conv.splitlines()) >= 3


def test_fingerprint_properties():
    from graphinvent_tpu.chem import mol_from_smiles
    from graphinvent_tpu.chem.fingerprint import morgan_fingerprint, tanimoto
    a = morgan_fingerprint(mol_from_smiles("CCO"))
    b = morgan_fingerprint(mol_from_smiles("OCC"))   # same molecule
    c = morgan_fingerprint(mol_from_smiles("c1ccccc1"))
    assert np.array_equal(a, b)
    assert tanimoto(a, b) == 1.0
    assert tanimoto(a, c) < 0.5
    assert a.sum() > 0


def test_fingerprint_representation_invariant():
    """The fingerprint of a molecule must not depend on whether it arrived
    kekulized (SMILES parse / kekulé-mode graphs) or aromatic-typed
    (use_aromatic_bonds graphs): a QSAR model trained on parsed SMILES
    scored aromatic-mode generated molecules near 0 before the
    aromatic-normalization fix (round 4)."""
    from graphinvent_tpu.chem import mol_from_smiles
    from graphinvent_tpu.chem.fingerprint import morgan_fingerprint
    from graphinvent_tpu.chem.molgraph import graph_to_mol, ordered_graph
    from graphinvent_tpu.config import preset

    cfg_ar = preset("GGNN", use_aromatic_bonds=True)
    # no [nH]: with ignore_H the graph features don't carry explicit H
    # counts, so pyrrole-type NH does not roundtrip (documented lossiness
    # of the featurization, not of the fingerprint)
    for smi in ("c1ccccc1", "Cc1ccncc1", "c1ccsc1", "Oc1ccccc1C"):
        kek = morgan_fingerprint(mol_from_smiles(smi))           # kekulized
        arom = morgan_fingerprint(mol_from_smiles(smi, kekulize_mol=False))
        nodes, edges, n = ordered_graph(
            mol_from_smiles(smi, kekulize_mol=False), cfg_ar)
        via_graph = morgan_fingerprint(graph_to_mol(nodes, edges, n, cfg_ar))
        assert np.array_equal(kek, arom), smi
        assert np.array_equal(kek, via_graph), smi


def test_scoring_raises_on_missing_qsar_model():
    """A configured activity component whose model file is absent must fail
    at construction, not silently zero the reward (reference hard-loads the
    pickle at startup, parameters/constants.py:250-256)."""
    from graphinvent_tpu.eval.scoring import ScoringFunction
    cfg = tiny_config("GGNN", score_components=("drd2_activity",),
                      score_thresholds=(0.5,), score_type="binary",
                      qsar_models={"drd2_activity": "/nonexistent/model.pkl"})
    with pytest.raises(FileNotFoundError):
        ScoringFunction(cfg)
    # ... and a component with no qsar_models entry at all fails too
    cfg2 = tiny_config("GGNN", score_components=("drd2_activity",),
                       score_thresholds=(0.5,), score_type="binary",
                       qsar_models={})
    with pytest.raises(FileNotFoundError):
        ScoringFunction(cfg2)


def test_config_rejects_degenerate_target_size():
    """target_size == max_n_nodes makes 1 - |n-t|/(max-t) divide by zero --
    the reference accepts it unguarded (ScoringFunction.py:111-129) and a
    real round-4 run with it scored 0.0 throughout (docs/7:82-87)."""
    with pytest.raises(ValueError, match="target_size"):
        tiny_config("GGNN", job_type="fine-tune",
                    score_components=("target_size=13",),
                    score_thresholds=(0.0,), score_type="binary")
    with pytest.raises(ValueError, match="target_size"):
        tiny_config("GGNN", job_type="fine-tune",
                    score_components=("target_size=0",),
                    score_thresholds=(0.0,), score_type="binary")
    with pytest.raises(ValueError, match="malformed"):
        tiny_config("GGNN", job_type="fine-tune",
                    score_components=("target_size=big",),
                    score_thresholds=(0.0,), score_type="binary")
    # in-range still fine
    tiny_config("GGNN", job_type="fine-tune",
                score_components=("target_size=12",),
                score_thresholds=(0.0,), score_type="binary")
    # non-fine-tune jobs keep the reference-mirroring defaults (which
    # include the degenerate target_size=13) without tripping the guard
    tiny_config("GGNN", score_components=("target_size=13",),
                score_thresholds=(0.0,), score_type="binary")
    # ...but ScoringFunction itself still refuses to SCORE with it
    from graphinvent_tpu.eval.scoring import ScoringFunction
    sf = ScoringFunction(tiny_config(
        "GGNN", score_components=("target_size=13",),
        score_thresholds=(0.0,), score_type="binary", qsar_models={}))

    class G:
        n_nodes = 5
    with pytest.raises(ValueError, match="target_size"):
        sf.compute_score([G()], np.ones(1), np.ones(1), np.ones(1))


class _BrokenQSARModel:
    # module level so pickle can round-trip it
    def predict_proba(self, X):
        raise ValueError("X has 1024 features, expected 2048")


def test_scoring_raises_on_qsar_predict_failure(tmp_path):
    """A QSAR model that blows up on predict_proba (e.g. fingerprint
    dimension mismatch) must raise, not silently zero the activity reward
    (the round-4 aromatic-fingerprint bug's silent-zero signature)."""
    import pickle
    from graphinvent_tpu.eval.scoring import ScoringFunction
    from graphinvent_tpu.chem.smiles import mol_from_smiles

    path = tmp_path / "broken.pkl"
    with open(path, "wb") as fh:
        pickle.dump(_BrokenQSARModel(), fh)
    cfg = tiny_config("GGNN", score_components=("drd2_activity",),
                      score_thresholds=(0.5,), score_type="binary",
                      qsar_models={"drd2_activity": str(path)})
    sf = ScoringFunction(cfg)

    class G:
        n_nodes = 3
        molecule = mol_from_smiles("CCO")
    ones = np.ones(2)
    with pytest.raises(RuntimeError, match="drd2_activity"):
        sf.compute_score([G(), G()], ones, ones, ones)


def test_collapse_warning_fires(capsys):
    """learning_phase's uniqueness-collapse alarm: below-threshold batch
    uniqueness prints a loud warning (the round-3 collapse went unnoticed
    because nothing watched this signal)."""
    from graphinvent_tpu.rl.workflow_rl import (
        COLLAPSE_UNIQUENESS_THRESHOLD, _warn_on_collapse)

    class NullLogger:
        def tb_scalar(self, *a, **k):
            pass

    collapsed = np.zeros(100, np.int8)
    collapsed[:2] = 1                    # 2% unique: the measured collapse
    frac = _warn_on_collapse(NullLogger(), 7, collapsed, primary=True)
    assert frac == pytest.approx(0.02)
    out = capsys.readouterr()
    assert "WARNING" in out.err and "uniqueness" in out.err
    assert "step 7" in out.err

    healthy = np.ones(100, np.int8)
    healthy[:5] = 0
    frac = _warn_on_collapse(NullLogger(), 8, healthy, primary=True)
    assert frac == pytest.approx(0.95)
    out = capsys.readouterr()
    assert "WARNING" not in out.err
    assert COLLAPSE_UNIQUENESS_THRESHOLD == 0.5
