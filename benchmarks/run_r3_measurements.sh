#!/bin/bash
# Round-3 measurement batch: run sequentially (ONE TPU process at a time).
# Usage: bash benchmarks/run_r3_measurements.sh [phase...]
# Phases: micro stages stages_noslab ablate prep
set -u
cd "$(dirname "$0")/.."
# stages_v4 first: one number decides the default kernel for bench.py
phases="${@:-stages_v4 stages micro stages_noslab ablate prep}"

run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 1800 "$@" 2>&1 | grep -v "xla_bridge" | tail -25
  echo "=== $name exit=$? ==="
}

for p in $phases; do
  case "$p" in
    micro)        run micro python benchmarks/micro_sortgather.py ;;
    stages)       run stages python benchmarks/bench_v3.py ;;
    stages_v4)    GS_KERNEL=v4 run stages_v4 python benchmarks/bench_v3.py ;;
    stages_noslab) GS_SLAB_U=0 run stages_noslab python benchmarks/bench_v3.py ;;
    ablate_v4)    GS_KERNEL=v4 run ablate_v4 python benchmarks/ablate_r3.py \
                    "" "noloop" "eval,cums,corr,bigx,pend,emit,bigpre" ;;
    ablate)       run ablate python benchmarks/ablate_r3.py "" "noloop" \
                    "noloop,nobigdma,bigpre" \
                    "eval,cums,corr,bigx,pend,emit,bigpre" ;;
    prep)         run prep python benchmarks/bench_prep.py ;;
  esac
done
