"""Reference PyTorch checkpoint import (utils/torch_import.py).

Builds state dicts with the reference's exact key layout
(gnn/modules.py MLP -> Sequential [Linear, SELU, AlphaDropout] => linears
at seq.0/3/6/..., reference Workflow saves plain state_dicts) and checks
every tensor lands in the right pytree slot.
"""

import numpy as np
import jax
import pytest

from graphinvent_tpu.config import test_config as tiny_config
from graphinvent_tpu.models import apply_model, init_model
from graphinvent_tpu.utils.torch_import import (
    load_torch_checkpoint, params_from_torch_state_dict,
)


def _mlp_sd(sd, prefix, template, tag):
    """Fills reference-style keys for one MLP; each tensor gets a unique
    fingerprint value derived from ``tag`` and its position."""
    for l, lp in enumerate(template["layers"]):
        sd[f"{prefix}.seq.{3 * l}.weight"] = np.full(
            lp["w"].shape, tag + l, np.float32)
        sd[f"{prefix}.seq.{3 * l}.bias"] = np.full(
            lp["b"].shape, tag + l + 0.5, np.float32)


def _cell_sd(sd, prefix, template, tag):
    sd[f"{prefix}.weight_ih"] = np.full(template["w_ih"].shape, tag, np.float32)
    sd[f"{prefix}.weight_hh"] = np.full(template["w_hh"].shape, tag + 1, np.float32)
    sd[f"{prefix}.bias_ih"] = np.full(template["b_ih"].shape, tag + 2, np.float32)
    sd[f"{prefix}.bias_hh"] = np.full(template["b_hh"].shape, tag + 3, np.float32)


def _stacked_sd(sd, prefix, template, tag):
    """Per-edge-type MLPs: stacked (E, O, I) template -> E separate refs."""
    E = template["layers"][0]["w"].shape[0]
    for e in range(E):
        for l, lp in enumerate(template["layers"]):
            sd[f"{prefix}.{e}.seq.{3 * l}.weight"] = np.full(
                lp["w"].shape[1:], tag + 10 * e + l, np.float32)
            sd[f"{prefix}.{e}.seq.{3 * l}.bias"] = np.full(
                lp["b"].shape[1:], tag + 10 * e + l + 0.5, np.float32)


def _apd_sd(sd, template, tag=500.0):
    for i, (ours, ref) in enumerate([
            ("f_add_1", "fAddNet1"), ("f_conn_1", "fConnNet1"),
            ("f_add_2", "fAddNet2"), ("f_conn_2", "fConnNet2"),
            ("f_term_2", "fTermNet2")]):
        _mlp_sd(sd, f"APDReadout.{ref}", template[ours], tag + 10 * i)


def _ggnn_state_dict(template):
    sd = {}
    _stacked_sd(sd, "msg_nns", template["msg_nns"], 100.0)
    _cell_sd(sd, "gru", template["gru"], 200.0)
    _mlp_sd(sd, "gather.att_nn", template["gather"]["att_nn"], 300.0)
    _mlp_sd(sd, "gather.emb_nn", template["gather"]["emb_nn"], 400.0)
    _apd_sd(sd, template["apd"])
    return sd


def test_ggnn_import_places_every_tensor():
    cfg = tiny_config("GGNN")
    template = init_model(cfg, jax.random.PRNGKey(0))
    sd = _ggnn_state_dict(template)
    params = params_from_torch_state_dict(cfg, sd)

    # stacked per-edge-type MLPs: layer l, edge type e
    w = params["msg_nns"]["layers"][1]["w"]
    for e in range(w.shape[0]):
        assert np.all(w[e] == 100.0 + 10 * e + 1)
        assert np.all(params["msg_nns"]["layers"][1]["b"][e]
                      == 100.0 + 10 * e + 1.5)
    assert np.all(params["gru"]["w_ih"] == 200.0)
    assert np.all(params["gru"]["b_hh"] == 203.0)
    assert np.all(params["gather"]["att_nn"]["layers"][0]["w"] == 300.0)
    assert np.all(params["gather"]["emb_nn"]["layers"][0]["b"] == 400.5)
    assert np.all(params["apd"]["f_conn_1"]["layers"][0]["w"] == 510.0)
    assert np.all(params["apd"]["f_term_2"]["layers"][0]["w"] == 540.0)

    # tree structure identical to a native init
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(template))


def test_import_validates_shapes():
    cfg = tiny_config("GGNN")
    template = init_model(cfg, jax.random.PRNGKey(0))
    sd = _ggnn_state_dict(template)
    sd["gru.weight_ih"] = np.zeros((3, 3), np.float32)     # wrong shape
    with pytest.raises(ValueError, match="shape mismatch"):
        params_from_torch_state_dict(cfg, sd)


def test_import_missing_keys():
    cfg = tiny_config("GGNN")
    with pytest.raises(KeyError):
        params_from_torch_state_dict(cfg, {"gru.weight_ih": np.zeros((3, 3))})


def test_s2v_and_emn_import():
    for model in ("S2V", "EMN", "AttGGNN", "AttS2V", "MNN"):
        cfg = tiny_config(model)
        template = init_model(cfg, jax.random.PRNGKey(0))
        sd = {}
        if model == "MNN":
            sd["message_weights"] = np.full(
                template["message_weights"].shape, 7.0, np.float32)
        if model in ("S2V", "AttS2V"):
            _mlp_sd(sd, "enn", template["enn"], 10.0)
            emb = template["s2v"]["embedding"]
            sd["s2v.embedding_matrix.weight"] = np.full(
                emb["w"].shape, 20.0, np.float32)
            sd["s2v.embedding_matrix.bias"] = np.full(
                emb["b"].shape, 21.0, np.float32)
            _cell_sd(sd, "s2v.lstm", template["s2v"]["lstm"], 30.0)
        if model == "AttS2V":
            _mlp_sd(sd, "att_enn", template["att_enn"], 40.0)
        if model in ("AttGGNN",):
            _stacked_sd(sd, "msg_nns", template["msg_nns"], 50.0)
            _stacked_sd(sd, "att_nns", template["att_nns"], 60.0)
        if model == "EMN":
            _mlp_sd(sd, "embedding_nn", template["embedding_nn"], 70.0)
            _mlp_sd(sd, "emb_msg_nn", template["emb_msg_nn"], 80.0)
            _mlp_sd(sd, "att_msg_nn", template["att_msg_nn"], 90.0)
        if model in ("EMN", "AttGGNN"):
            _mlp_sd(sd, "gather.att_nn", template["gather"]["att_nn"], 95.0)
            _mlp_sd(sd, "gather.emb_nn", template["gather"]["emb_nn"], 96.0)
        _cell_sd(sd, "gru", template["gru"], 99.0)
        _apd_sd(sd, template["apd"])
        params = params_from_torch_state_dict(cfg, sd)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(template)), model
        if model in ("S2V", "AttS2V"):
            assert np.all(params["s2v"]["lstm"]["w_hh"] == 31.0)
        if model == "EMN":
            assert np.all(params["att_msg_nn"]["layers"][0]["w"] == 90.0)


def test_pth_file_roundtrip_and_forward(tmp_path):
    """A .pth file written by torch.save(state_dict) loads and the imported
    params drive a model forward to finite logits."""
    torch = pytest.importorskip("torch")
    cfg = tiny_config("GGNN")
    template = init_model(cfg, jax.random.PRNGKey(0))
    sd = {k: torch.tensor(v) for k, v in _ggnn_state_dict(template).items()}
    # overwrite with small random values so the forward is well-conditioned
    g = torch.Generator().manual_seed(0)
    sd = {k: torch.rand(v.shape, generator=g) * 0.1 - 0.05
          for k, v in sd.items()}
    path = str(tmp_path / "model_restart_5.pth")
    torch.save(sd, path)

    params = load_torch_checkpoint(cfg, path)
    B, N = 4, cfg.max_n_nodes
    nodes = np.zeros((B, N, cfg.n_node_features), np.float32)
    edges = np.zeros((B, N, N, cfg.n_edge_features), np.float32)
    nodes[:, 0, 0] = 1
    nodes[:, 1, 1] = 1
    edges[:, 0, 1, 0] = edges[:, 1, 0, 0] = 1
    out = apply_model(cfg, params, nodes, edges)
    assert np.all(np.isfinite(np.asarray(out)))
    assert out.shape == (B, cfg.dim_apd)


def test_latest_checkpoint_finds_pth(tmp_path):
    from graphinvent_tpu.utils.checkpoint import latest_checkpoint
    (tmp_path / "model_restart_10.pth").write_bytes(b"x")
    path, epoch = latest_checkpoint(str(tmp_path))
    assert epoch == 10 and path.endswith(".pth")
    # native file of the same epoch wins
    (tmp_path / "model_restart_10.ckpt").write_bytes(b"x")
    path, epoch = latest_checkpoint(str(tmp_path))
    assert epoch == 10 and path.endswith(".ckpt")


def test_v1_whole_module_import_without_reference(tmp_path):
    """A v1.0 checkpoint (whole nn.Module pickled, reference util.py:828-850)
    loads even when the class's package is NOT importable: the stub
    unpickler reconstructs the state_dict from torch's pickle layout."""
    torch = pytest.importorskip("torch")
    import sys
    import types

    cfg = tiny_config("MNN")
    template = init_model(cfg, jax.random.PRNGKey(0))

    def torch_mlp(tmpl):
        wrap = torch.nn.Module()
        seq = torch.nn.Sequential()
        for l, lp in enumerate(tmpl["layers"]):
            lin = torch.nn.Linear(lp["w"].shape[1], lp["w"].shape[0])
            with torch.no_grad():
                lin.weight.fill_(float(l) + 0.25)
                lin.bias.fill_(float(l) + 0.75)
            seq.append(lin)
            seq.append(torch.nn.SELU())
            seq.append(torch.nn.AlphaDropout())
        wrap.seq = seq
        return wrap

    # fake "reference" package that will be unimportable at load time
    fake = types.ModuleType("fake_reference_gnn")

    class FakeMNN(torch.nn.Module):
        pass
    FakeMNN.__module__ = "fake_reference_gnn"
    FakeMNN.__qualname__ = "FakeMNN"
    fake.FakeMNN = FakeMNN
    sys.modules["fake_reference_gnn"] = fake
    try:
        m = FakeMNN()
        m.message_weights = torch.nn.Parameter(
            torch.arange(np.prod(template["message_weights"].shape),
                         dtype=torch.float32
                         ).reshape(template["message_weights"].shape))
        m.gru = torch.nn.GRUCell(cfg.message_size, cfg.hidden_node_features)
        apd = torch.nn.Module()
        for ours, ref in [("f_add_1", "fAddNet1"), ("f_conn_1", "fConnNet1"),
                          ("f_add_2", "fAddNet2"), ("f_conn_2", "fConnNet2"),
                          ("f_term_2", "fTermNet2")]:
            setattr(apd, ref, torch_mlp(template["apd"][ours]))
        m.APDReadout = apd
        path = str(tmp_path / "model_restart_0.pth")
        torch.save(m, path)
        expected_gru_ih = m.gru.weight_ih.detach().numpy().copy()
    finally:
        del sys.modules["fake_reference_gnn"]

    params = load_torch_checkpoint(cfg, path)   # FakeMNN is not importable
    np.testing.assert_array_equal(
        np.asarray(params["message_weights"]).ravel(),
        np.arange(np.prod(template["message_weights"].shape), dtype=np.float32))
    np.testing.assert_array_equal(params["gru"]["w_ih"], expected_gru_ih)
    assert np.all(params["apd"]["f_add_1"]["layers"][1]["w"] == 1.25)
