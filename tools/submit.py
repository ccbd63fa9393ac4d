"""Job submission helper.

Replaces the reference's submit-pre-training.py / submit-fine-tuning.py /
submit-*-supercloud.py (which write a per-job input.csv then either exec
main.py or sbatch a SLURM script): writes the input.csv into the job dir
and runs the job directly or emits a SLURM batch file.

    python tools/submit.py --job-dir jobs/my-run --job-type train \
        --dataset-dir data/pre-training/gdb13_1K/ --model GGNN \
        [--set epochs=400 --set batch_size=1000] [--slurm out.sh]

``--pipeline preprocess,train,generate,test`` runs several stages in ONE
process over the same job dir (the reference chains separate main.py
processes, submit-pre-training.py:76-203).  On tunneled TPU setups each
process pays a 38-350 s server-side program load per compiled program
(docs/9 "Compile / cold-start"); in-process, later stages reuse the
process's jit/program caches, so the cost is paid once per pipeline
instead of once per stage — the generalization of
``campaign_chembl.py --in-process`` for ordinary jobs.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.config import GraphInventConfig

STAGES = ("preprocess", "train", "generate", "test", "fine-tune")


def run_pipeline(cfg: GraphInventConfig, stages) -> None:
    """All stages share the job dir (checkpoints written by ``train`` are
    what ``generate``/``test`` load), exactly like running main.py N times
    — minus N-1 process warm-ups."""
    from graphinvent_tpu.workflow import Workflow
    # validate EVERY stage's config up front: an invalid later stage (e.g.
    # fine-tune with the degenerate default target_size) must fail before
    # hours of earlier stages run, not after
    stage_cfgs = {stage: cfg.replace(job_type=stage) for stage in stages}
    for stage in stages:
        stage_cfg = stage_cfgs[stage]
        # leave the running stage's input.csv behind for restart/debugging
        stage_cfg.write_csv(os.path.join(cfg.job_dir, "input.csv"))
        t0 = time.time()
        print(f"== pipeline stage [{stage}] -> {cfg.job_dir}", flush=True)
        Workflow(stage_cfg).run()
        print(f"== [{stage}] done in {time.time() - t0:.1f} s", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job-dir", required=True)
    ap.add_argument("--job-type", default="train")
    ap.add_argument("--pipeline", default=None,
                    help="comma-separated stages to run in ONE process, "
                         "e.g. preprocess,train,generate,test "
                         "(overrides --job-type)")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--model", default="GGNN")
    ap.add_argument("--set", action="append", default=[],
                    help="key=value config override (repeatable)")
    ap.add_argument("--slurm", default=None,
                    help="write a SLURM script here instead of running")
    ap.add_argument("--time", default="1-00:00:00")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    stages = None
    if args.pipeline:
        stages = [s.strip() for s in args.pipeline.split(",") if s.strip()]
        unknown = [s for s in stages if s not in STAGES]
        if unknown:
            raise SystemExit(f"unknown pipeline stage(s) {unknown}; "
                             f"choose from {STAGES}")

    overrides = {"job_type": stages[0] if stages else args.job_type,
                 "dataset_dir": args.dataset_dir, "model": args.model}
    for kv in args.set:
        key, _, value = kv.partition("=")
        overrides[key] = GraphInventConfig._parse_value(value)
    cfg = GraphInventConfig.from_overrides(overrides)

    job_dir = args.job_dir if args.job_dir.endswith("/") else args.job_dir + "/"
    os.makedirs(job_dir, exist_ok=True)
    cfg = cfg.replace(job_dir=job_dir)
    cfg.write_csv(os.path.join(job_dir, "input.csv"))
    print(f"wrote {job_dir}input.csv")

    if stages:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--job-dir", job_dir, "--pipeline", args.pipeline,
               "--dataset-dir", args.dataset_dir, "--model", args.model]
        for kv in args.set:
            cmd += ["--set", kv]
    else:
        cmd = [sys.executable, "-m", "graphinvent_tpu.main",
               "--job-dir", job_dir]
    if args.slurm:
        with open(args.slurm, "w") as fh:
            fh.write("#!/bin/bash\n"
                     f"#SBATCH --job-name=graphinvent-{cfg.job_type}\n"
                     f"#SBATCH --time={args.time}\n"
                     "#SBATCH --nodes=1\n\n"
                     + " ".join(cmd) + "\n")
        print(f"wrote {args.slurm}; submit with: sbatch {args.slurm}")
    elif not args.dry_run:
        if stages:
            run_pipeline(cfg, stages)
        else:
            raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
