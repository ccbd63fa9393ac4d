import os

import pytest

from graphinvent_tpu.config import test_config as tiny_config
from graphinvent_tpu.workflow import Workflow

SMILES = ["CC", "CCC", "CCO", "CC(C)C", "C1CC1", "OC1CC1", "NCCN", "CC#N"]


def test_training_over_mesh(tmp_path):
    """Full training job sharded over the 8-device CPU mesh (dp=4, mp=2)."""
    data_dir = str(tmp_path / "data") + "/"
    job_dir = str(tmp_path / "out") + "/"
    os.makedirs(data_dir)
    for split in ("train", "valid"):
        with open(os.path.join(data_dir, f"{split}.smi"), "w") as fh:
            fh.write("SMILES\n" + "\n".join(SMILES) + "\n")
    cfg = tiny_config("GGNN", dataset_dir=data_dir, job_dir=job_dir,
                      batch_size=8, block_size=64, epochs=2, n_samples=8,
                      sample_every=10,         # skip sampling eval
                      dp_devices=4, mp_devices=2, mlp2_hidden_dim=32)
    Workflow(cfg.replace(job_type="preprocess")).run()
    Workflow(cfg.replace(job_type="train")).run()
    log = open(os.path.join(job_dir, "convergence.log")).read()
    assert log.count("\n") >= 3


def _losses(job_dir):
    rows = open(os.path.join(job_dir, "convergence.log")).read().splitlines()
    return [tuple(float(x) for x in r.split(", ")[2:4]) for r in rows[1:]]


def test_device_resident_sharded_epoch_matches_single(tmp_path):
    """The mesh-sharded device-resident epoch path (dataset replicated,
    batches constrained over ``data``, one lax.scan per epoch) produces the
    same losses as the plain single-device path -- dp must change where the
    work runs, not what is computed."""
    data_dir = str(tmp_path / "data") + "/"
    os.makedirs(data_dir)
    for split in ("train", "valid"):
        with open(os.path.join(data_dir, f"{split}.smi"), "w") as fh:
            fh.write("SMILES\n" + "\n".join(SMILES) + "\n")
    base = tiny_config("GGNN", dataset_dir=data_dir, batch_size=8,
                       block_size=64, epochs=2, n_samples=8,
                       sample_every=10, job_dir=str(tmp_path / "p") + "/")
    Workflow(base.replace(job_type="preprocess")).run()

    jobs = {"single": dict(),
            "dp8": dict(dp_devices=8),
            "dp4mp2": dict(dp_devices=4, mp_devices=2, mlp2_hidden_dim=32)}
    losses = {}
    for name, kw in jobs.items():
        job_dir = str(tmp_path / name) + "/"
        cfg = base.replace(job_type="train", job_dir=job_dir, **kw)
        Workflow(cfg).run()
        losses[name] = _losses(job_dir)
    import numpy as np
    np.testing.assert_allclose(losses["dp8"], losses["single"],
                               rtol=2e-4, atol=2e-5)
    # mp run has a different (divisible) head width -> its own single-dev ref
    ref_dir = str(tmp_path / "ref_mp") + "/"
    Workflow(base.replace(job_type="train", job_dir=ref_dir,
                          mlp2_hidden_dim=32)).run()
    np.testing.assert_allclose(losses["dp4mp2"], _losses(ref_dir),
                               rtol=2e-4, atol=2e-5)
