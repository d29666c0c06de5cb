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


def main():
    batch = int(os.environ.get("VUKE_BENCH_BATCH", 1 << 20))
    measure_s = float(os.environ.get("VUKE_BENCH_SECONDS", 10.0))
    from vuke_tpu.benchmark import bench_derive
    r = bench_derive(batch=batch, warmup_s=3.0, measure_s=measure_s,
                     inv_chunk=int(os.environ.get("VUKE_BENCH_INV_CHUNK", 256)))
    value = r["derivations_per_sec"]
    baseline = 100e6  # BASELINE.json: >=100M derivations/s target (v5p-8)
    print(json.dumps({
        "metric": "seed_to_hash160_derivations_per_sec",
        "value": value,
        "unit": "derivations/s",
        "vs_baseline": value / baseline,
    }))


if __name__ == "__main__":
    main()
