#!/usr/bin/env python
"""Print the top XLA ops (by total device time) from a jax.profiler trace
directory — the op-level view that found the serialized dynamic-slice
gather loops in local BA (solvers/ba.py block_n rationale).

Usage:
  python scripts/prof_ops.py /tmp/jaxtrace [top_n]
"""
import collections
import glob
import sys


def top_ops(trace_dir, top_n=30):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        from tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(files)[-1], "rb").read())
    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9   # ms
                cnt[name] += 1
        for name, t in tot.most_common(top_n):
            rows.append((t, cnt[name], name))
    return rows


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    for t, c, name in top_ops(d, n):
        print(f"{t:9.2f}ms x{c:7d}  {name[:110]}")
