#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace directory.

Parses the perfetto-style trace.json.gz the TPU profiler writes alongside
the xplane proto. Leaf XLA ops carry `args.long_name` (full HLO with
shapes) and `args.hlo_category`; control-flow wrappers (while/body
regions) nest their children, so only leaf categories are aggregated —
EXCEPT custom-calls (the Pallas kernels), which are leaves themselves.

Usage: python benchmarks/trace_ops.py <tracedir> [n_frames] [top]
"""

import gzip
import json
import glob
import sys
from collections import Counter

SKIP_CATS = {"while", "conditional", ""}


def load(outdir):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace.json.gz under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main():
    outdir = sys.argv[1]
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    data = load(outdir)
    events = data["traceEvents"]
    agg, cnt, meta, cat_agg = Counter(), Counter(), {}, Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None or cat in SKIP_CATS:
            continue
        # jit_run / module wrappers have no category; region wrappers are
        # skipped above. "fusion" names may repeat across frames.
        name = e["name"]
        dur = float(e.get("dur", 0.0))
        agg[name] += dur
        cnt[name] += 1
        cat_agg[cat] += dur
        total += dur
        if name not in meta:
            ln = args.get("long_name", "")
            meta[name] = (cat, ln[:160])
    print(f"leaf device op time: {total/1e3:.1f} ms -> "
          f"{total/1e3/n_frames:.2f} ms/frame")
    print("\nby category (ms/frame):")
    for c, d in cat_agg.most_common():
        print(f"  {c:28s} {d/1e3/n_frames:8.3f}")
    print(f"\n{'op':28s} {'ms/fr':>7s} {'cnt':>4s}  what")
    for name, d in agg.most_common(top):
        cat, ln = meta[name]
        print(f"{name[:28]:28s} {d/1e3/n_frames:7.3f} {cnt[name]:4d}  "
              f"[{cat}] {ln[:110]}")


if __name__ == "__main__":
    main()
