"""Numerical parity against PyTorch.

BASELINE.md requires per-layer activation parity with the reference.  The
reference itself cannot run here (no RDKit), so parity is established
against (a) torch's own cells/losses with copied weights, and (b) a
reference-style torch GGNN (dynamic edge lists + per-edge MLPs + summation
matmul, tools/torch_baseline.py) -- proving the dense adjacency-contraction
formulation is numerically identical to the reference's gather/scatter one.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from graphinvent_tpu.models.core import (
    gru_cell, init_gru_cell, init_lstm_cell, init_mlp, lstm_cell, mlp,
)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_gru_cell_matches_torch():
    key = jax.random.PRNGKey(0)
    p = init_gru_cell(key, 7, 5)
    cell = torch.nn.GRUCell(7, 5)
    with torch.no_grad():
        cell.weight_ih.copy_(_t(p["w_ih"]))
        cell.weight_hh.copy_(_t(p["w_hh"]))
        cell.bias_ih.copy_(_t(p["b_ih"]))
        cell.bias_hh.copy_(_t(p["b_hh"]))
    x = np.random.default_rng(0).normal(size=(3, 7)).astype(np.float32)
    h = np.random.default_rng(1).normal(size=(3, 5)).astype(np.float32)
    ours = np.asarray(gru_cell(p, jnp.asarray(x), jnp.asarray(h)))
    theirs = cell(_t(x), _t(h)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_lstm_cell_matches_torch():
    key = jax.random.PRNGKey(0)
    p = init_lstm_cell(key, 6, 4)
    cell = torch.nn.LSTMCell(6, 4)
    with torch.no_grad():
        cell.weight_ih.copy_(_t(p["w_ih"]))
        cell.weight_hh.copy_(_t(p["w_hh"]))
        cell.bias_ih.copy_(_t(p["b_ih"]))
        cell.bias_hh.copy_(_t(p["b_hh"]))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 6)).astype(np.float32)
    h = rng.normal(size=(3, 4)).astype(np.float32)
    c = rng.normal(size=(3, 4)).astype(np.float32)
    h2, c2 = lstm_cell(p, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    th2, tc2 = cell(_t(x), (_t(h), _t(c)))
    np.testing.assert_allclose(np.asarray(h2), th2.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), tc2.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_selu_mlp_matches_torch():
    p = init_mlp(jax.random.PRNGKey(0), 5, [8, 8], 3)
    layers = []
    for lp in p["layers"]:
        lin = torch.nn.Linear(lp["w"].shape[1], lp["w"].shape[0])
        with torch.no_grad():
            lin.weight.copy_(_t(lp["w"]))
            lin.bias.copy_(_t(lp["b"]))
        layers += [lin, torch.nn.SELU()]
    seq = torch.nn.Sequential(*layers)
    x = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    ours = np.asarray(mlp(p, jnp.asarray(x)))
    theirs = seq(_t(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_kl_loss_matches_torch():
    from graphinvent_tpu.train.loss import apd_kl_loss
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 11)).astype(np.float32)
    targets = rng.integers(0, 3, size=(6, 11)).astype(np.float32)
    targets[0] = 0
    targets[0, 4] = 1.0
    ours = float(apd_kl_loss(jnp.asarray(logits), jnp.asarray(targets)))
    t_target = _t(targets) / _t(targets).sum(1, keepdim=True)
    crit = torch.nn.KLDivLoss(reduction="batchmean")
    theirs = float(crit(torch.log_softmax(_t(logits), dim=1), t_target))
    assert abs(ours - theirs) < 1e-5


def test_onecycle_matches_torch():
    from graphinvent_tpu.train.optim import OneCycle
    total = 50
    sched = OneCycle(max_lr=1e-3, total_steps=total)
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-3, total_steps=total)
    for step in range(total):
        lr, b1 = sched(jnp.asarray(step))
        torch_lr = opt.param_groups[0]["lr"]
        torch_b1 = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(lr), torch_lr, rtol=1e-5)
        np.testing.assert_allclose(float(b1), torch_b1, rtol=1e-5)
        opt.step()
        tsched.step()


def test_adam_matches_torch():
    from graphinvent_tpu.train.optim import adam_init, adam_update
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)
    tw = torch.nn.Parameter(_t(w0))
    topt = torch.optim.Adam([tw], lr=1e-3)
    for i in range(5):
        g = rng.normal(size=(4, 3)).astype(np.float32)
        params, state = adam_update({"w": jnp.asarray(g)}, state, params,
                                    lr=1e-3, beta1=0.9)
        topt.zero_grad()
        tw.grad = _t(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# full-model parity: dense formulation vs reference-style edge-list torch
# --------------------------------------------------------------------------

def _copy_mlp(dst: torch.nn.Sequential, src) -> None:
    linears = [m for m in dst if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(src["layers"])
    for lin, lp in zip(linears, src["layers"]):
        with torch.no_grad():
            lin.weight.copy_(_t(lp["w"]))
            lin.bias.copy_(_t(lp["b"]))


def test_ggnn_dense_matches_edge_list_torch():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.torch_baseline import TorchGGNN, synthetic_batch
    from graphinvent_tpu.config import preset
    from graphinvent_tpu.models import apply_model, init_model

    cfg = preset("GGNN")            # full reference dims
    params = init_model(cfg, jax.random.PRNGKey(42))

    tm = TorchGGNN()
    for e in range(3):
        per_type = {"layers": [{"w": lp["w"][e], "b": lp["b"][e]}
                               for lp in params["msg_nns"]["layers"]]}
        _copy_mlp(tm.msg_nns[e], per_type)
    with torch.no_grad():
        tm.gru.weight_ih.copy_(_t(params["gru"]["w_ih"]))
        tm.gru.weight_hh.copy_(_t(params["gru"]["w_hh"]))
        tm.gru.bias_ih.copy_(_t(params["gru"]["b_ih"]))
        tm.gru.bias_hh.copy_(_t(params["gru"]["b_hh"]))
    _copy_mlp(tm.gather_att, params["gather"]["att_nn"])
    _copy_mlp(tm.gather_emb, params["gather"]["emb_nn"])
    _copy_mlp(tm.f_add1, params["apd"]["f_add_1"])
    _copy_mlp(tm.f_conn1, params["apd"]["f_conn_1"])
    _copy_mlp(tm.f_add2, params["apd"]["f_add_2"])
    _copy_mlp(tm.f_conn2, params["apd"]["f_conn_2"])
    _copy_mlp(tm.f_term2, params["apd"]["f_term_2"])

    nodes_np, edges_np, _ = synthetic_batch(4, seed=3)
    ours = np.asarray(apply_model(cfg, params, jnp.asarray(nodes_np),
                                  jnp.asarray(edges_np)))
    with torch.no_grad():
        theirs = tm(_t(nodes_np), _t(edges_np)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
