"""End-to-end test of the campaign driver (tools/campaign_chembl.py).

Runs a miniature campaign -- synthesize -> sharded preprocess -> train ->
generate -> test -- through the tool's own stage logic in --in-process
mode on CPU, so the whole reference-acceptance flow (BASELINE.md rounds
3-4) is guarded by CI, not just by manual TPU runs.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_in_process_campaign_end_to_end(tmp_path, monkeypatch):
    import campaign_chembl as camp

    root = str(tmp_path / "mini")
    argv = ["campaign_chembl.py", "--root", root,
            "--n", "60", "--min-atoms", "6", "--max-atoms", "12",
            "--shards", "2", "--epochs", "1", "--batch-size", "8",
            "--n-generate", "8", "--in-process", "--stage", "all"]
    monkeypatch.setattr(sys, "argv", argv)
    camp.main()

    data = os.path.join(root, "data")
    jobs = os.path.join(root, "jobs", "train-ggnn")
    # sharded preprocess combined into the final HDFs + train.csv
    for split in ("train", "valid", "test"):
        assert os.path.exists(os.path.join(data, f"{split}.h5")), split
    assert os.path.exists(os.path.join(data, "train.csv"))
    # train stage: checkpoint + convergence log
    assert os.path.exists(os.path.join(jobs, "model_restart_1.ckpt"))
    assert os.path.exists(os.path.join(jobs, "convergence.log"))
    # generate stage: .smi outputs
    gen = os.path.join(jobs, "generation")
    assert any(f.endswith(".smi") for f in os.listdir(gen))
    # test stage: scores in validation.log
    val = open(os.path.join(jobs, "validation.log")).read()
    assert "Test" in val
    # resume logic: a second invocation skips completed stages quickly
    camp.main()
