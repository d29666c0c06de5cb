#!/usr/bin/env python
"""Scaling-efficiency probe (BASELINE.md: "scaling measured at 1 chip,
1 host, >=2 hosts").

Runs the north-star derive benchmark (vuke_tpu.benchmark.bench_derive,
which shards the seed lattice over a 1-D "seeds" mesh via shard_map) at a
sweep of device counts and reports per-count throughput plus weak-scaling
efficiency vs the single-device rate.

On a real TPU slice the device counts come from the runtime (run under
the pod launcher; each host sees its local chips and bench_derive's
psum rides ICI).  On a chip-less box, ``--cpu`` forks one subprocess per
count with a virtual CPU mesh (--xla_force_host_platform_device_count=k).
That validates the sharding/collective structure end-to-end, but the
efficiency numbers are NOT hardware-meaningful: k virtual devices share
the same host cores, so ideal weak scaling shows as flat total
throughput, not k-times.

Usage:
  python tools/scaling_probe.py --cpu [counts...]   # default 1 2 4 8
  python tools/scaling_probe.py                     # real backend, all devices
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PER_DEVICE_BATCH = 1 << 12


def _child(n_dev: int):
    # pinned ISA: without it the persistent-cache entries embed tuning
    # pseudo-features and silently recompile (see tests/conftest.py)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
        + " --xla_cpu_max_isa=AVX2"
        # -O1 codegen: LLVM -O3 pathologically slow on PRNG+reduce fusions
        # (see tests/conftest.py); rates here validate structure, not
        # hardware peak, so compile speed wins
        + " --xla_backend_optimization_level=1")
    from vuke_tpu._cache import enable_compile_cache
    enable_compile_cache()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vuke_tpu.benchmark import bench_derive
    r = bench_derive(batch=n_dev * PER_DEVICE_BATCH, warmup_s=1.0,
                     measure_s=3.0)
    print(json.dumps(r), flush=True)


def main():
    if "--child" in sys.argv:
        _child(int(sys.argv[-1]))
        return
    cpu = "--cpu" in sys.argv
    counts = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4, 8]

    results = []
    if cpu:
        for k in counts:
            print(f"[scaling] {k} virtual CPU device(s)...", file=sys.stderr,
                  flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(k)],
                capture_output=True, text=True, cwd=_REPO, timeout=3600)
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            try:
                results.append(json.loads(line))
            except (json.JSONDecodeError, ValueError):
                sys.stderr.write(proc.stderr[-2000:])
                print(f"[scaling] count {k} failed (rc={proc.returncode})",
                      file=sys.stderr, flush=True)
    else:
        from vuke_tpu.benchmark import bench_derive
        import jax
        results.append(bench_derive(
            batch=len(jax.devices()) * PER_DEVICE_BATCH * 64))

    if not results:
        sys.exit(1)
    if cpu:
        # k virtual devices share the same host cores: ideal weak scaling
        # is FLAT total throughput, so report totals vs the 1-device total
        base = results[0]["derivations_per_sec"]
        print(f"{'devices':>8} {'batch':>10} {'deriv/s':>10} {'vs 1-dev total':>15}")
        for r in results:
            print(f"{r['devices']:>8} {r['batch']:>10} "
                  f"{r['derivations_per_sec']:>10.0f} "
                  f"{r['derivations_per_sec'] / base:>14.2f}x")
    else:
        base = results[0]["derivations_per_sec"] / results[0]["devices"]
        print(f"{'devices':>8} {'batch':>10} {'Mderiv/s':>10} {'weak-eff':>9}")
        for r in results:
            eff = r["derivations_per_sec"] / (base * r["devices"])
            print(f"{r['devices']:>8} {r['batch']:>10} "
                  f"{r['derivations_per_sec'] / 1e6:>10.3f} {eff:>8.1%}")
    print(json.dumps({"metric": "derive_weak_scaling",
                      "results": [
                          {"devices": r["devices"],
                           "derivations_per_sec": r["derivations_per_sec"]}
                          for r in results]}))


if __name__ == "__main__":
    main()
