"""ChEMBL-scale acceptance campaign, end to end, one command.

The reference's acceptance test is "train on MOSES, generate 30k, evaluate"
(reference: tutorials/5_benchmarking_with_moses.md:1-6) with datasets built
by tools/tdc-create-dataset.py (<= 80 heavy atoms, charges {-1,0,1}).  This
environment has no network access, so the campaign synthesizes a ChEMBL-
proxy dataset locally (tools/synthesize_smiles.py) and then runs the exact
job flow a MOSES campaign would: sharded preprocess -> combine -> train ->
generate 30k -> test.  Every stage is an ordinary job of this framework --
nothing here is special-cased for the campaign.

    python tools/campaign_chembl.py --root /tmp/chembl40 \
        [--n 6000] [--min-atoms 25] [--max-atoms 40] [--shards 4] \
        [--epochs 40] [--model GGNN] [--n-generate 30000] [--stage all]

Stages: data, preprocess, train, generate, test, score.  data/preprocess/
train/generate skip automatically when their outputs already exist
(dataset splits, train.h5, the final checkpoint, the last generation
batch), so an interrupted campaign resumes; test and score always re-run
(cheap relative to train/generate, and their outputs -- validation.log
scores and moses_metrics.json -- are the campaign's final artifacts).
Results land in <root>/jobs/train-<model>/ (generation.log, test .log,
checkpoints) -- the numbers recorded in BASELINE.md "Round 3".
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPU_ENV = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
TPU_ENV = {"PYTHONPATH": f"/root/.axon_site:{REPO}"
           if os.path.isdir("/root/.axon_site") else REPO}


def run(cmd: list, env_extra: dict, tag: str) -> float:
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.time()
    print(f"== [{tag}] {' '.join(map(str, cmd))}", flush=True)
    subprocess.run([str(c) for c in cmd], env=env, check=True)
    dt = time.time() - t0
    print(f"== [{tag}] done in {dt:.1f} s", flush=True)
    return dt


def dataset_overrides(args) -> list:
    return [
        "--set", 'atom_types=["C","N","O","S","Cl"]',
        "--set", "formal_charge=[-1,0,1]",
        "--set", f"max_n_nodes={args.max_atoms}",
        "--set", "use_aromatic_bonds=True",
        # N=80 datasets overflow the default 6 GB device budget into the
        # streamed path, whose per-batch host->device upload costs ~0.65 s
        # through the ~50 MB/s tunnel (32 MB/batch) -- device-resident
        # epochs upload once instead (measured: >230 s/epoch -> ~12 s)
        "--set", f"device_data_gb={args.device_data_gb}",
    ]


def stage_data(args) -> None:
    data = os.path.join(args.root, "data")
    raw = os.path.join(args.root, "raw.smi")
    if os.path.exists(os.path.join(data, "train.smi")):
        print("== [data] train.smi exists, skipping", flush=True)
        return
    run([sys.executable, f"{REPO}/tools/synthesize_smiles.py", raw,
         "--n", args.n, "--min-atoms", args.min_atoms,
         "--max-atoms", args.max_atoms, "--aromatic", "--seed", args.seed],
        CPU_ENV, "data")
    run([sys.executable, f"{REPO}/tools/create_dataset.py", raw, data,
         "--max-atoms", args.max_atoms, "--charges", "-1", "0", "1",
         "--valid-frac", "0.05", "--test-frac", "0.05", "--jobs", "8"],
        CPU_ENV, "data")


def stage_preprocess(args) -> None:
    data = os.path.join(args.root, "data")
    if os.path.exists(os.path.join(data, "train.h5")):
        print("== [preprocess] train.h5 exists, skipping", flush=True)
        return
    # one OS process per shard -- the reference's split/merge SLURM flow
    # (submit-split-preprocessing-supercloud.py) as plain config
    procs = []
    env = dict(os.environ)
    env.update(CPU_ENV)
    for k in range(args.shards):
        cmd = [sys.executable, f"{REPO}/tools/submit.py",
               "--job-dir", os.path.join(args.root, "jobs", f"pre{k}"),
               "--job-type", "preprocess", "--dataset-dir", data + "/",
               "--model", args.model,
               *dataset_overrides(args),
               "--set", f"preprocess_num_shards={args.shards}",
               "--set", f"preprocess_shard_index={k}"]
        procs.append(subprocess.Popen(cmd, env=env))
    failed = False
    for p in procs:
        failed |= p.wait() != 0
    if failed:
        # every sibling has been waited on above -- nothing left running to
        # race a re-run on the shard files
        raise RuntimeError("preprocess shard failed")
    for split in ("train", "valid", "test"):
        shards = [os.path.join(data, f"{split}.h5.shard{k}")
                  for k in range(args.shards)]
        run([sys.executable, f"{REPO}/tools/combine_hdfs.py",
             os.path.join(data, f"{split}.h5"), *shards,
             "--job-dir", os.path.join(args.root, "jobs", "pre0")],
            CPU_ENV, "combine")


def job(args, name: str, job_type: str, *extra) -> None:
    if args.in_process:
        return job_in_process(args, name, job_type, *extra)
    run([sys.executable, f"{REPO}/tools/submit.py",
         "--job-dir", os.path.join(args.root, "jobs", name),
         "--job-type", job_type,
         "--dataset-dir", os.path.join(args.root, "data") + "/",
         "--model", args.model, *dataset_overrides(args),
         "--set", f"batch_size={args.batch_size}",
         "--set", "compute_dtype=bfloat16", *extra], TPU_ENV, job_type)


def job_in_process(args, name: str, job_type: str, *extra) -> None:
    """Run a device stage inside the campaign process itself.

    Per-process server-side program warm-up is 1-9 min on the tunneled TPU
    (docs/9 "Compile / cold-start"); launching train/generate/test as three
    processes re-pays it each time.  In-process, later stages reuse the
    process's jit/program caches (round-3 verdict weak #7).  Requires the
    campaign to be launched with the TPU PYTHONPATH when a tunnel is used
    (same env TPU_ENV would give the subprocess).
    """
    from graphinvent_tpu.config import GraphInventConfig
    from graphinvent_tpu.workflow import Workflow

    overrides = {"job_type": job_type,
                 "dataset_dir": os.path.join(args.root, "data") + "/",
                 "job_dir": os.path.join(args.root, "jobs", name) + "/",
                 "model": args.model,
                 "batch_size": args.batch_size,
                 "compute_dtype": "bfloat16"}
    kv = dataset_overrides(args) + list(extra)
    for i in range(0, len(kv), 2):
        assert kv[i] == "--set"
        key, _, value = kv[i + 1].partition("=")
        overrides[key] = GraphInventConfig._parse_value(value)
    cfg = GraphInventConfig.from_overrides(overrides)
    os.makedirs(cfg.job_dir, exist_ok=True)
    cfg.write_csv(os.path.join(cfg.job_dir, "input.csv"))
    t0 = time.time()
    print(f"== [{job_type}] in-process -> {cfg.job_dir}", flush=True)
    Workflow(cfg).run()
    print(f"== [{job_type}] done in {time.time()-t0:.1f} s", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/chembl40")
    ap.add_argument("--n", type=int, default=6000)
    ap.add_argument("--min-atoms", type=int, default=25)
    ap.add_argument("--max-atoms", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--model", default="GGNN")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--n-generate", type=int, default=30000)
    ap.add_argument("--stage", default="all",
                    choices=["all", "data", "preprocess", "train",
                             "generate", "test", "score"])
    ap.add_argument("--device-data-gb", type=float, default=6.0,
                    help="HBM budget for device-resident epochs (raise for "
                         "N=80 datasets; v5e has 16 GB)")
    ap.add_argument("--in-process", action="store_true",
                    help="run train/generate/test inside this process "
                         "(pays the per-process TPU program warm-up once; "
                         "launch with the TPU PYTHONPATH)")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)

    stages = ([args.stage] if args.stage != "all"
              else ["data", "preprocess", "train", "generate", "test",
                    "score"])
    train_dir = f"train-{args.model.lower()}"
    final_ckpt = os.path.join(args.root, "jobs", train_dir,
                              f"model_restart_{args.epochs}.ckpt")
    for st in stages:
        if st == "data":
            stage_data(args)
        elif st == "preprocess":
            stage_preprocess(args)
        elif st == "train":
            if os.path.exists(final_ckpt):
                print(f"== [train] {final_ckpt} exists, skipping", flush=True)
                continue
            job(args, train_dir, "train",
                "--set", f"epochs={args.epochs}",
                "--set", "sample_every=10", "--set", "n_samples=2000")
        elif st == "generate":
            # last batch index by ceiling division: n_generate that isn't a
            # batch_size multiple still runs a final partial batch
            last = (args.n_generate + args.batch_size - 1) // args.batch_size - 1
            done = os.path.join(args.root, "jobs", train_dir, "generation",
                                f"epoch_{args.epochs}_gen{last}.smi")
            if os.path.exists(done):
                print("== [generate] last batch exists, skipping", flush=True)
                continue
            job(args, train_dir, "generate",
                "--set", f"generation_epoch={args.epochs}",
                "--set", f"n_samples={args.n_generate}")
        elif st == "test":
            # always re-run: cheap relative to train/generate, and its scores
            # are the campaign's final artifact
            job(args, train_dir, "test",
                "--set", f"generation_epoch={args.epochs}")
        elif st == "score":
            # MOSES-style suite over the full 30k generated set (round 5);
            # CPU-only, runs after the device stages
            gen_glob = os.path.join(args.root, "jobs", train_dir,
                                    "generation",
                                    f"epoch_{args.epochs}_gen*.smi")
            data = os.path.join(args.root, "data")
            run([sys.executable, f"{REPO}/tools/moses_metrics.py", gen_glob,
                 "--train", os.path.join(data, "train.smi"),
                 "--test", os.path.join(data, "test.smi"),
                 "--jobs", "8",
                 "--out", os.path.join(args.root, "jobs", train_dir,
                                       "moses_metrics.json")],
                CPU_ENV, "score")
    print("== campaign complete", flush=True)


if __name__ == "__main__":
    main()
