#!/bin/bash
# Pre-warm the persistent compile cache with the exact programs bench.py's
# stages will run, so the driver's end-of-round bench pays no cold Mosaic
# compiles (cold: 3-15 min/stage through the remote-compile service; warm:
# <1 min).  Cache keys include jitted functions' source lines — run this
# AFTER the last edit to any pipeline-touching file.
#
# Usage: tools/warm_bench_cache.sh [stages...]   (default: bench.py's list)
set -u
cd "$(dirname "$0")/.."
STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(xla tiled_signed tiled_odd)
fi
for mode in "${STAGES[@]}"; do
  echo "=== warm $mode start $(date +%T) ==="
  VUKE_BENCH_SECONDS=3 timeout 1500 python -m vuke_tpu._bench_stage "$mode"
  echo "=== warm $mode rc=$? end $(date +%T) ==="
done
