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
    # score stage (round 5): MOSES-style metrics written next to the ckpts
    import json
    metrics = json.load(open(os.path.join(jobs, "moses_metrics.json")))
    for key in ("validity", "novelty", "int_div_1", "scaffold_novelty"):
        assert 0.0 <= metrics[key] <= 1.0, key
    # resume logic: a second invocation skips completed stages quickly
    camp.main()


def test_create_dataset_jobs_deterministic(tmp_path, monkeypatch):
    """--jobs N must produce byte-identical splits to --jobs 1 (the
    dedupe/sort/shuffle downstream is order-independent)."""
    import subprocess

    raw = tmp_path / "raw.smi"
    raw.write_text("SMILES\n" + "\n".join(
        ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCCC", "CCOC", "CCS",
         "c1ccncc1", "CC(C)C", "CCCl"]) + "\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    outs = {}
    for jobs in (1, 3):
        out = tmp_path / f"j{jobs}"
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "create_dataset.py"),
             str(raw), str(out), "--max-atoms", "12", "--jobs", str(jobs)],
            env=env, check=True, capture_output=True)
        outs[jobs] = {p: (out / p).read_text()
                      for p in ("train.smi", "valid.smi", "test.smi")}
    assert outs[1] == outs[3]


def test_submit_pipeline_runs_stages_in_one_process(tmp_path, monkeypatch):
    """tools/submit.py --pipeline runs multiple stages in ONE process over
    one job dir (round-4 verdict item 8: the per-process server program
    load, 38-350 s/stage on the tunnel, should be paid once per pipeline)."""
    import submit as submit_tool

    data_dir = str(tmp_path / "data") + "/"
    os.makedirs(data_dir)
    smiles = ["CC", "CCC", "CCO", "CC(C)C", "C1CC1", "OC1CC1", "NCCN",
              "CC#N"]
    for split in ("train", "valid", "test"):
        with open(os.path.join(data_dir, f"{split}.smi"), "w") as fh:
            fh.write("SMILES\n")
            for s in smiles:
                fh.write(s + "\n")

    job_dir = str(tmp_path / "job") + "/"
    argv = ["submit.py", "--job-dir", job_dir,
            "--pipeline", "preprocess,train,generate",
            "--dataset-dir", data_dir, "--model", "GGNN",
            "--set", "epochs=1", "--set", "batch_size=8",
            "--set", "block_size=64", "--set", "n_samples=8",
            "--set", "sample_every=99", "--set", "generation_epoch=1",
            "--set", "mlp1_depth=2", "--set", "mlp1_hidden_dim=24",
            "--set", "mlp2_depth=2", "--set", "mlp2_hidden_dim=24",
            "--set", "enn_depth=2", "--set", "enn_hidden_dim=12",
            "--set", "hidden_node_features=16", "--set", "message_size=16",
            "--set", "message_passes=2", "--set", "gather_width=10",
            "--set", "gather_att_depth=2", "--set", "gather_att_hidden_dim=12",
            "--set", "gather_emb_depth=2", "--set", "gather_emb_hidden_dim=12",
            "--set", "compute_dtype=float32"]
    monkeypatch.setattr(sys, "argv", argv)
    submit_tool.main()

    # preprocess stage wrote the HDFs; train wrote the checkpoint;
    # generate (same process, same job dir) wrote .smi files
    for split in ("train", "valid", "test"):
        assert os.path.exists(os.path.join(data_dir, f"{split}.h5")), split
    assert os.path.exists(os.path.join(job_dir, "model_restart_1.ckpt"))
    gen = os.path.join(job_dir, "generation")
    assert any(f.endswith(".smi") for f in os.listdir(gen))

    # unknown stages are rejected up front
    monkeypatch.setattr(sys, "argv", ["submit.py", "--job-dir", job_dir,
                                      "--pipeline", "train,deploy",
                                      "--dataset-dir", data_dir])
    with pytest.raises(SystemExit, match="deploy"):
        submit_tool.main()
