"""Join an xplane trace with a compiled-HLO dump and aggregate device time
by (source_file:line, op kind).

    python tools/xplane_by_source.py /tmp/jax-trace /tmp/train_step.hlo [top_k]

The HLO text provides op -> metadata (source line); the trace provides
op -> device time.  This answers "which Python lines cost what".
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.xplane_stats import load


def parse_hlo_metadata(path: str):
    """op name -> 'file:line (op_name scope)'."""
    meta = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?: source_file=\"([^\"]*)\" source_line=(\d+))?")
    with open(path) as fh:
        for line in fh:
            m = pat.search(line)
            if not m:
                continue
            name, scope, sfile, sline = m.groups()
            if sfile:
                short = "/".join(sfile.rsplit("/", 2)[-2:])
                meta[name] = f"{short}:{sline}"
            else:
                meta[name] = scope[:60]
    return meta


def main(trace_dir: str, hlo_path: str, top_k: int = 40) -> None:
    meta = parse_hlo_metadata(hlo_path)
    totals = defaultdict(float)
    counts = defaultdict(int)
    n_steps = 0
    for _, xs in load(trace_dir):
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name == "Steps":
                    n_steps = max(n_steps, len(line.events))
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, "?")
                    op = name.split(" ")[0].lstrip("%")
                    key = meta.get(op)
                    if key is None:
                        # strip .clone suffixes and retry
                        key = meta.get(op.split(".clone")[0], "<unattributed>")
                    totals[key] += ev.duration_ps / 1e9
                    counts[key] += 1
    total = sum(totals.values())
    n_steps = n_steps or 1
    print(f"total device time {total:.3f} ms over {n_steps} steps "
          f"=> {total/n_steps:.3f} ms/step")
    for key, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"  {ms/n_steps*1e3:9.1f} us/step  x{counts[key]//n_steps:<5d} "
              f"{key}")


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_step.hlo",
         int(sys.argv[3]) if len(sys.argv) > 3 else 40)
