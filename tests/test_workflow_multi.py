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
