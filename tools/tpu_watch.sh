#!/bin/bash
# Poll the axon tunnel; when it comes back, run the queued TPU validation
# train once, serially (single shared chip).  Holds /tmp/vuke_tpu_busy.lock
# while JAX processes run — nothing else may start one.
# Logs: /tmp/tpu_watch.log (driver), /tmp/smul13_odd.log, /tmp/profile.log,
# /tmp/bench_staged.log, /tmp/tpu_suite.log.
set -u
cd /root/repo
log() { echo "[tpu_watch] $* ($(date +%H:%M:%S))" >> /tmp/tpu_watch.log; }

for i in $(seq 1 1080); do
    if timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; then
        log "tunnel open"
        sleep 20
        touch /tmp/vuke_tpu_busy.lock
        timeout 2700 python tools/bench_smul13.py 17 10 i8 odd \
            > /tmp/smul13_odd.log 2>&1
        log "bench_smul13 rc=$?"
        timeout 3600 python tools/profile_tiled.py 18 --prefix \
            > /tmp/profile.log 2>&1
        log "profile_tiled rc=$?"
        VUKE_BENCH_BUDGET_S=2400 timeout 2700 python bench.py \
            > /tmp/bench_staged.log 2>&1
        log "bench.py rc=$?"
        timeout 5400 python -m pytest tests/ -q > /tmp/tpu_suite.log 2>&1
        log "pytest rc=$?"
        rm -f /tmp/vuke_tpu_busy.lock
        log "train done"
        exit 0
    fi
    sleep 20
done
log "gave up after 6h"
exit 1
