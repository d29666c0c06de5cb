#!/usr/bin/env python
"""On-chip batch-scaling sweep for docs/SCALING.md.

Measures the fused derive rate at a ladder of batch sizes on the real
backend, one subprocess per size (the TPU is a single shared device; a
fresh process per point also isolates compile state).  Uses the XLA-staged
pipeline by default (VUKE_BENCH_STAGE_MODE) — XLA programs hit the
persistent compile cache, so reruns are cheap; pass ``tiled`` to sweep the
Pallas pipeline when the compile service is healthy.

Usage: python tools/batch_sweep.py [mode] [log2_batches...]
       (defaults: xla 14 15 16 17 18)
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    args = sys.argv[1:]
    mode = args[0] if args and not args[0].isdigit() else "xla"
    log2s = [int(a) for a in args if a.isdigit()] or [14, 15, 16, 17, 18]

    results = []
    for lg in log2s:
        batch = 1 << lg
        print(f"[sweep] mode={mode} batch=2^{lg}...", file=sys.stderr, flush=True)
        env = dict(os.environ, VUKE_BENCH_BATCH=str(batch),
                   VUKE_BENCH_SECONDS="5")
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "vuke_tpu._bench_stage", mode],
                cwd=_REPO, env=env, timeout=1500, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"[sweep] batch=2^{lg} timed out", file=sys.stderr, flush=True)
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                r = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        else:
            sys.stderr.write(proc.stderr[-2000:])
            continue
        r["log2_batch"] = lg
        results.append(r)
        print(json.dumps({k: r[k] for k in
                          ("log2_batch", "derivations_per_sec", "mode")}),
              flush=True)

    if results:
        base = results[0]["derivations_per_sec"] / (1 << results[0]["log2_batch"])
        print("\nbatch  M/s    per-seed-slot efficiency vs smallest", flush=True)
        for r in results:
            per = r["derivations_per_sec"] / (1 << r["log2_batch"])
            print(f"2^{r['log2_batch']}  {r['derivations_per_sec']/1e6:6.2f}  "
                  f"{per/base:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
