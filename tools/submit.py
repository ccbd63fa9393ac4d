"""Job submission helper.

Replaces the reference's submit-pre-training.py / submit-fine-tuning.py /
submit-*-supercloud.py (which write a per-job input.csv then either exec
main.py or sbatch a SLURM script): writes the input.csv into the job dir
and runs the job directly or emits a SLURM batch file.

    python tools/submit.py --job-dir jobs/my-run --job-type train \
        --dataset-dir data/pre-training/gdb13_1K/ --model GGNN \
        [--set epochs=400 --set batch_size=1000] [--slurm out.sh]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.config import GraphInventConfig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job-dir", required=True)
    ap.add_argument("--job-type", default="train")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--model", default="GGNN")
    ap.add_argument("--set", action="append", default=[],
                    help="key=value config override (repeatable)")
    ap.add_argument("--slurm", default=None,
                    help="write a SLURM script here instead of running")
    ap.add_argument("--time", default="1-00:00:00")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    overrides = {"job_type": args.job_type, "dataset_dir": args.dataset_dir,
                 "model": args.model}
    for kv in args.set:
        key, _, value = kv.partition("=")
        overrides[key] = GraphInventConfig._parse_value(value)
    cfg = GraphInventConfig.from_overrides(overrides)

    job_dir = args.job_dir if args.job_dir.endswith("/") else args.job_dir + "/"
    os.makedirs(job_dir, exist_ok=True)
    cfg.replace(job_dir=job_dir).write_csv(os.path.join(job_dir, "input.csv"))
    print(f"wrote {job_dir}input.csv")

    cmd = [sys.executable, "-m", "graphinvent_tpu.main", "--job-dir", job_dir]
    if args.slurm:
        with open(args.slurm, "w") as fh:
            fh.write("#!/bin/bash\n"
                     f"#SBATCH --job-name=graphinvent-{cfg.job_type}\n"
                     f"#SBATCH --time={args.time}\n"
                     "#SBATCH --nodes=1\n\n"
                     + " ".join(cmd) + "\n")
        print(f"wrote {args.slurm}; submit with: sbatch {args.slurm}")
    elif not args.dry_run:
        raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
