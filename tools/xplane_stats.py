"""Parse a jax.profiler xplane.pb and print per-op device-time totals.

    python tools/xplane_stats.py /tmp/jax-trace [top_k]

Aggregates event durations per event name on every device plane (planes
whose name contains 'TPU' or 'Device'), per line.  Used to find where the
train-step time actually goes (tools/trace_step.py captures the trace).
"""

from __future__ import annotations

import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path_or_dir: str):
    files = glob.glob(f"{path_or_dir}/**/*.xplane.pb", recursive=True) \
        if not path_or_dir.endswith(".pb") else [path_or_dir]
    spaces = []
    for f in sorted(files):
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        spaces.append((f, xs))
    return spaces


def main(path: str, top_k: int = 40) -> None:
    for fname, xs in load(path):
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name \
                    and "device" not in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                totals = defaultdict(float)
                counts = defaultdict(int)
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps / 1e9   # -> ms
                    counts[name] += 1
                if not totals:
                    continue
                tot = sum(totals.values())
                print(f"\n== plane {plane.name!r} line {line.name!r} "
                      f"total {tot:.3f} ms over {sum(counts.values())} events")
                for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[
                        :top_k]:
                    print(f"  {ms:9.3f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace",
         int(sys.argv[2]) if len(sys.argv) > 2 else 40)
