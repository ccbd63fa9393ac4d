"""CLI for merging sharded preprocessing outputs.

Replaces tools/combine_HDFs.py (reference: 120-189): shard files are
produced natively by ``Preprocessor(..., shard_index=k, num_shards=n)``;
this merges them and (optionally) averages their ts-properties CSVs.

    python tools/combine_hdfs.py out.h5 in1.h5 in2.h5 ...
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from graphinvent_tpu.data.preprocess import combine_shards

if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: combine_hdfs.py <out.h5> <shard.h5> [...]")
    out = combine_shards(sys.argv[2:], sys.argv[1])
    print(f"wrote {out}")
