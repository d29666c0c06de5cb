#!/bin/bash
cd /root/repo
for mode in tiled tiled_signed; do
  echo "=== $mode start $(date +%T) ==="
  timeout 1200 python -m vuke_tpu._bench_stage $mode > /root/repo/.bench_logs/$mode.json 2> /root/repo/.bench_logs/$mode.err
  echo "=== $mode rc=$? end $(date +%T) ==="
done
echo DONE
