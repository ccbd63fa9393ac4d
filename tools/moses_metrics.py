"""Score generated molecules with the local MOSES-style metric suite.

The reference's benchmark chapter says "evaluate the generated set with the
MOSES suite" (reference: tutorials/5_benchmarking_with_moses.md:1-6) and
leaves the scoring to the external molsets/moses package.  This tool is the
offline equivalent on the in-repo chemistry stack (graphinvent_tpu/eval/
moses.py): validity, uniqueness@1k/@10k, novelty, Bemis-Murcko scaffold
uniqueness/novelty, IntDiv1/2, structural-alert pass rate, and W1 property
distances vs the held-out split.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/moses_metrics.py \
        jobs/train-ggnn/generation/epoch_GEN20_gen*.smi \
        --train data/train.smi [--test data/test.smi] \
        [--jobs 8] [--n-intdiv 10000] [--out metrics.json]

Prints a table and ONE final JSON line (for BASELINE.md bookkeeping).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.eval.moses import compute_metrics, read_smi


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("generated", nargs="+",
                    help=".smi files (globs ok) of generated molecules")
    ap.add_argument("--train", required=True, help="training-set .smi")
    ap.add_argument("--test", default=None, help="held-out .smi for the "
                    "property-W1 reference (defaults to --train)")
    ap.add_argument("--jobs", type=int, default=8)
    ap.add_argument("--n-intdiv", type=int, default=10000)
    ap.add_argument("--n-props", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    gen = []
    for pat in args.generated:
        paths = sorted(glob.glob(pat)) or [pat]
        for p in paths:
            gen.extend(read_smi(p))
    train = read_smi(args.train)
    test = read_smi(args.test) if args.test else None
    print(f"generated={len(gen)} train={len(train)} "
          f"test={len(test) if test is not None else 0}", flush=True)

    t0 = time.time()
    metrics = compute_metrics(gen, train, test, n_jobs=args.jobs,
                              n_intdiv=args.n_intdiv, n_props=args.n_props,
                              seed=args.seed)
    metrics["wall_s"] = round(time.time() - t0, 1)
    for k, v in metrics.items():
        print(f"  {k:22s} {v:.4f}" if isinstance(v, float) else
              f"  {k:22s} {v}")
    # NaN (empty gen/ref marginals) is not valid JSON -- write null
    clean = {k: (None if isinstance(v, float) and v != v else
                 round(v, 4) if isinstance(v, float) else v)
             for k, v in metrics.items()}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(clean, fh, indent=1)
    print(json.dumps(clean))


if __name__ == "__main__":
    main()
