#!/usr/bin/env python
"""Driver benchmark: fused seed->pubkey->hash160 derivation rate on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north-star target of
100M derivations/sec on a v5p-8 (scaled here to whatever chips are local).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vuke_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


# Peak bf16 TFLOP/s per chip, used to scale the v5p-8 north-star target to
# whatever hardware the driver actually runs on (public TPU spec sheets).
_PEAK_TFLOPS = {
    "v3": 123.0, "v4": 275.0, "v5 lite": 197.0, "v5e": 197.0,
    "v5p": 459.0, "v5": 459.0, "v6e": 918.0, "v6 lite": 918.0,
}
_V5P8_PEAK = 4 * 459.0  # v5p-8 = 4 dual-core chips


def _local_peak_tflops():
    import jax
    total = 0.0
    for d in jax.devices():
        kind = getattr(d, "device_kind", "").lower()
        per_chip = 197.0  # conservative default (v5e)
        for name, tf in sorted(_PEAK_TFLOPS.items(), key=lambda kv: -len(kv[0])):
            if name in kind:
                per_chip = tf
                break
        total += per_chip
    return total or 197.0


def main():
    # 2^18 beats 2^20 on the v5e (5.82M/s vs 5.58M/s) and more than halves
    # the uncached fused-pipeline compile (total wall 9.5 min vs 20 min).
    batch = int(os.environ.get("VUKE_BENCH_BATCH", 1 << 18))
    measure_s = float(os.environ.get("VUKE_BENCH_SECONDS", 10.0))
    from vuke_tpu.benchmark import bench_derive
    r = bench_derive(batch=batch, warmup_s=3.0, measure_s=measure_s,
                     inv_chunk=int(os.environ.get("VUKE_BENCH_INV_CHUNK", 256)))
    value = r["derivations_per_sec"]
    # BASELINE.json north star: >=100M derivations/s on a v5p-8.  The driver
    # runs this on whatever chips are local (here: one v5e), so the target is
    # scaled by peak-compute ratio to keep vs_baseline hardware-comparable.
    baseline = 100e6 * _local_peak_tflops() / _V5P8_PEAK
    print(json.dumps({
        "metric": "seed_to_hash160_derivations_per_sec",
        "value": value,
        "unit": "derivations/s",
        "vs_baseline": value / baseline,
        "baseline_note": f"100M/s v5p-8 target scaled to local peak "
                         f"({_local_peak_tflops():.0f} TF vs {_V5P8_PEAK:.0f} TF)",
    }))


if __name__ == "__main__":
    main()
