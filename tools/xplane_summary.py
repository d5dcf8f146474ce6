"""Per-HLO-op device-time summary from a jax.profiler xplane trace.

Complements the `-p/--profile_training` flag (training/loop.py writes an
xplane trace dir + a host-side section table; reference train.py:145-148
prints torch.profiler key averages): this digs into DEVICE time per
compiled op — the tool that located the flat-image-table and G-cond wins
(RESULTS.md round 2).

Usage: python tools/xplane_summary.py <trace_dir> [top_n]
  <trace_dir> is the directory passed to jax.profiler.trace / the
  `profile/` dir a `-p` run prints.

Parses the raw xplane protobuf via the tensorflow package bundled in this
environment; prints total duration x count per op name, largest first.
"""

import glob
import sys
from collections import defaultdict


def summarize(trace_dir: str, top_n: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    sp = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        sp.ParseFromString(f.read())
    out = []
    for plane in sp.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        md = plane.event_metadata
        agg = defaultdict(lambda: [0, 0])  # name -> [total_ps, count]
        for line in plane.lines:
            for ev in line.events:
                a = agg[md[ev.metadata_id].name]
                a[0] += ev.duration_ps
                a[1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
        out.append((plane.name, rows))
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    trace_dir = argv[0]
    top_n = int(argv[1]) if len(argv) > 1 else 25
    for plane_name, rows in summarize(trace_dir, top_n):
        print(f"== {plane_name} ==")
        for name, (ps, n) in rows:
            print(f"  {ps / 1e9:8.2f} ms x {n:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
