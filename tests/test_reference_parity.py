"""End-to-end reference-artifact parity (BASELINE.md "GDB-13 1K NLL" row).

Chain exercised: reference-built HDF (data/pre-training/gdb13_1K-debug,
written by the reference's own DataProcesser) -> reference-format ``.pth``
checkpoint -> our import (utils/torch_import.py) -> the test-job NLL path
(train/step.py:make_likelihood_step) vs an in-repo PyTorch oracle
implementing the reference's forward/NLL semantics
(reference: Workflow.py:413-439 testing_phase + Analyzer.py:708-778).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from graphinvent_tpu.config import preset

DEBUG_DIR = "/root/reference/data/pre-training/gdb13_1K-debug"


def _reference_state_dict(tm) -> dict:
    """TorchGGNN parameters renamed to the reference's exact state_dict
    layout (gnn/mpnn.py GGNN: msg_nns ModuleList, gru, gather GraphGather,
    APDReadout GlobalReadout; reference MLPs are Sequential
    [Linear, SELU, AlphaDropout] -> linears at seq.0/3/6/...)."""
    sd = {}

    def put_mlp(module, prefix):
        linear_idx = 0
        for layer in module:
            if isinstance(layer, torch.nn.Linear):
                sd[f"{prefix}.seq.{3 * linear_idx}.weight"] = layer.weight.detach()
                sd[f"{prefix}.seq.{3 * linear_idx}.bias"] = layer.bias.detach()
                linear_idx += 1

    for e, m in enumerate(tm.msg_nns):
        put_mlp(m, f"msg_nns.{e}")
    sd["gru.weight_ih"] = tm.gru.weight_ih.detach()
    sd["gru.weight_hh"] = tm.gru.weight_hh.detach()
    sd["gru.bias_ih"] = tm.gru.bias_ih.detach()
    sd["gru.bias_hh"] = tm.gru.bias_hh.detach()
    put_mlp(tm.gather_att, "gather.att_nn")
    put_mlp(tm.gather_emb, "gather.emb_nn")
    put_mlp(tm.f_add1, "APDReadout.fAddNet1")
    put_mlp(tm.f_conn1, "APDReadout.fConnNet1")
    put_mlp(tm.f_add2, "APDReadout.fAddNet2")
    put_mlp(tm.f_conn2, "APDReadout.fConnNet2")
    put_mlp(tm.f_term2, "APDReadout.fTermNet2")
    return sd


@pytest.mark.skipif(not os.path.isdir(DEBUG_DIR),
                    reason="reference debug dataset not present")
def test_gdb13_debug_nll_matches_torch_oracle(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.torch_baseline import TorchGGNN
    from graphinvent_tpu.train.step import make_likelihood_step
    from graphinvent_tpu.utils.checkpoint import load_params_any

    cfg = preset("GGNN", dataset_dir=DEBUG_DIR + "/",
                 compute_dtype="float32")

    # reference-format checkpoint -> our params
    torch.manual_seed(0)
    tm = TorchGGNN().eval()
    pth = tmp_path / "model_restart_0.pth"
    torch.save(_reference_state_dict(tm), str(pth))
    params = load_params_any(cfg, str(pth))

    # reference-built HDF rows (written by the reference's DataProcesser)
    with h5py.File(os.path.join(DEBUG_DIR, "test.h5"), "r") as fh:
        nodes = np.asarray(fh["nodes"][:64], np.float32)
        edges = np.asarray(fh["edges"][:64], np.float32)
        apds = np.asarray(fh["APDs"][:64], np.float32)
    assert nodes.shape[1:] == (cfg.max_n_nodes, cfg.n_node_features)
    assert apds.shape[1] == cfg.dim_apd

    # ours: the test job's NLL path
    nll_step = make_likelihood_step(cfg)
    ours = np.asarray(nll_step(params, {"nodes": jnp.asarray(nodes),
                                        "edges": jnp.asarray(edges),
                                        "apds": jnp.asarray(apds)}))

    # torch oracle: softmax(APD) -> mass on the correct action(s) -> -log
    # (Analyzer.py:754-766 semantics; targets renormalised as in training)
    with torch.no_grad():
        logits = tm(torch.from_numpy(nodes), torch.from_numpy(edges))
        probs = torch.softmax(logits, dim=1)
        t = torch.from_numpy(apds)
        t = t / t.sum(dim=1, keepdim=True).clamp(min=1e-30)
        theirs = -torch.log((t * probs).sum(dim=1).clamp(min=1e-30))
    theirs = theirs.numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
    # the headline number for BASELINE.md: mean NLL agreement
    assert abs(float(ours.mean()) - float(theirs.mean())) < 1e-4
