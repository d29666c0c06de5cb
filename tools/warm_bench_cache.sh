#!/bin/bash
# Warm the persistent compile cache for the EXACT programs the driver's
# benchmark (python bench.py, 1500s budget) will run.
#
# This is the LAST act of a round, after the final commit: the cache keys
# on the jitted computations, so any later commit touching the pipeline
# voids the warm (docs/KERNELS.md "Measurement discipline"; round 3's
# driver bench ran fully cold for exactly this reason).  Since
# ecc/pallas_inv.py the cold compiles are ~30s each, so this is a safety
# net rather than a survival requirement — but a warmed cache still takes
# minutes off the driver's window and removes the remote-compile-service
# variance (observed 3-35 min queue delays after killed compiles).
#
# Also never KILL a stage mid-compile right before the driver runs: the
# orphaned remote compile keeps the service busy and the driver's own
# compiles queue behind it (.claude/skills/verify/SKILL.md gotchas).
set -e
cd "$(dirname "$0")/.."

# usage: warm_bench_cache.sh [stage ...]   (default: every driver stage)
stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(xla tiled_odd tiled_seq tiled_signed)

for mode in "${stages[@]}"; do
  if [ "$mode" = xla ]; then
    batch=262144           # bench.py pins the insurance stage to 2^18
  else
    batch="${VUKE_BENCH_BATCH:-524288}"
  fi
  echo "[warm] $mode @ $batch" >&2
  VUKE_BENCH_BATCH=$batch VUKE_BENCH_SECONDS=2 \
    timeout 1800 python -m vuke_tpu._bench_stage "$mode" \
    || echo "[warm] $mode FAILED (continuing)" >&2
done
echo "[warm] done — do not commit pipeline-touching changes after this" >&2
