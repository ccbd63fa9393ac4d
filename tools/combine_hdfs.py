"""CLI for merging sharded preprocessing outputs.

Replaces tools/combine_HDFs.py (reference: 120-189): shard files are
produced natively by the preprocess job (``preprocess_num_shards`` /
``preprocess_shard_index``, see docs/6); this merges them.  With
``--job-dir`` (a job dir whose input.csv holds the preprocessing config),
the training-set property CSV is recomputed exactly over the merged file
-- the built-in replacement for the reference's weight-averaged shard CSVs
(combine_HDFs.py:76-118).

    python tools/combine_hdfs.py out.h5 in1.h5 in2.h5 ... [--job-dir jobs/pre]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.data.preprocess import combine_shards

if __name__ == "__main__":
    args = sys.argv[1:]
    cfg = None
    if "--job-dir" in args:
        i = args.index("--job-dir")
        from graphinvent_tpu.config import GraphInventConfig
        cfg = GraphInventConfig.from_job_dir(args[i + 1])
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        sys.exit("usage: combine_hdfs.py <out.h5> <shard.h5> [...] "
                 "[--job-dir <dir>]")
    import os
    is_train = os.path.basename(args[0]) == "train.h5"
    out = combine_shards(args[1:], args[0], cfg=cfg, is_training_set=is_train)
    print(f"wrote {out}")
    if cfg is not None and is_train:
        # per-job shard runs skip the params CSV (preprocess.py partial_run);
        # the merge step is the single point that completes the dataset, so
        # write it here or later jobs silently lose the cross-check
        from graphinvent_tpu.data.preprocess import (
            write_preprocessing_params_csv,
        )
        write_preprocessing_params_csv(cfg)
