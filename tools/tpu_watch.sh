#!/bin/bash
# Poll the axon tunnel; when it comes back, run the queued kernel
# measurement once.  Creates /tmp/vuke_tpu_busy.lock while a JAX process
# is running (single shared chip — nothing else may start one).
set -u
cd /root/repo
for i in $(seq 1 720); do
    if timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; then
        echo "[tpu_watch] tunnel open at $(date)" | tee -a /tmp/tpu_watch.log
        sleep 20
        touch /tmp/vuke_tpu_busy.lock
        timeout 2700 python tools/bench_smul13.py 17 10 i8 odd \
            > /tmp/smul13_odd.log 2>&1
        rc=$?
        rm -f /tmp/vuke_tpu_busy.lock
        echo "[tpu_watch] bench_smul13 rc=$rc at $(date)" | tee -a /tmp/tpu_watch.log
        exit $rc
    fi
    sleep 20
done
echo "[tpu_watch] gave up after 4h" | tee -a /tmp/tpu_watch.log
exit 1
