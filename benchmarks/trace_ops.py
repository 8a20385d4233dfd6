#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace directory.

Parses the perfetto-style trace.json.gz the TPU profiler writes alongside
the xplane proto, sums durations of complete events on TensorCore tracks,
and prints a per-op ms/frame table (assumes 8 traced frames by default).

Usage: python benchmarks/trace_ops.py /tmp/gsprof2 [n_frames] [top]
"""

import gzip
import json
import glob
import sys
from collections import Counter


def load(outdir):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace.json.gz under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main():
    outdir = sys.argv[1]
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 45
    data = load(outdir)
    events = data["traceEvents"]
    # Identify TensorCore process/thread ids (XLA op tracks).
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid"), e["name"])
            names[key] = e["args"].get("name", "")
    core_pids = {pid for (pid, tid, kind), v in names.items()
                 if kind == "process_name" and ("TPU" in v or "Core" in v or "/device" in v)}
    agg, cnt = Counter(), Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if core_pids and pid not in core_pids:
            continue
        tname = names.get((pid, e.get("tid"), "thread_name"), "")
        if "step" in tname.lower():
            continue  # step track double-counts
        dur = float(e.get("dur", 0.0))
        agg[e["name"]] += dur
        cnt[e["name"]] += 1
        total += dur
    print(f"tracks: {sorted({names.get((p, t, 'thread_name'), '') for (p, t, k) in names if k == 'thread_name' and p in core_pids})}")
    print(f"device op time: {total/1e3:.1f} ms total -> {total/1e3/n_frames:.2f} ms/frame")
    print(f"{'op':64s} {'ms/frame':>9s} {'count':>6s}")
    for name, d in agg.most_common(top):
        print(f"{name[:64]:64s} {d/1e3/n_frames:9.3f} {cnt[name]:6d}")


if __name__ == "__main__":
    main()
