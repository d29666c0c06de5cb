"""Single benchmark stage, run as a subprocess by bench.py.

Prints ONE JSON line to stdout with the measured rate plus the device kind;
progress goes to stderr.  Run separately per stage so a hung/slow compile
(Mosaic compiles are minutes-long and uncached on this backend) can be
killed by the parent without losing earlier stages' numbers.
"""

import json
import os
import sys
import time


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
    batch = int(os.environ.get("VUKE_BENCH_BATCH", 1 << 19))
    measure_s = float(os.environ.get("VUKE_BENCH_SECONDS", 10.0))
    from vuke_tpu._cache import enable_compile_cache

    enable_compile_cache()
    if mode == "xla":
        os.environ["VUKE_BENCH_TILED"] = "0"
        os.environ["VUKE_TPU_PALLAS"] = "0"
    elif mode == "pallas":
        # Pallas kernels for keygen/smul/hash, standard layout pipeline
        os.environ["VUKE_BENCH_TILED"] = "0"
    elif mode == "tiled":
        # library-default digit recoding
        os.environ["VUKE_BENCH_TILED"] = "1"
    elif mode == "tiled_signed":
        # the round-2-measured 10.44M/s signed-digit kernel
        os.environ["VUKE_BENCH_TILED"] = "1"
        os.environ["VUKE_TPU_DIGITS"] = "signed"
    elif mode == "tiled_odd":
        # zero-free odd-digit windows + high-first reduce
        os.environ["VUKE_BENCH_TILED"] = "1"
        os.environ["VUKE_TPU_DIGITS"] = "odd"
    elif mode == "tiled_seq":
        # sequential-scan workload: incremental point-add per key
        # (reported as its own metric, never as the headline best)
        os.environ["VUKE_TPU_DIGITS"] = "odd"

    t0 = time.time()
    print(f"[stage {mode}] importing jax...", file=sys.stderr, flush=True)
    import jax

    dev = jax.devices()[0]
    print(f"[stage {mode}] device: {dev.device_kind} ({dev.platform}); "
          f"compiling batch={batch}...", file=sys.stderr, flush=True)

    if mode == "tiled_seq":
        from vuke_tpu.benchmark import bench_sequential

        r = bench_sequential(batch=batch, warmup_s=3.0, measure_s=measure_s)
    else:
        from vuke_tpu.benchmark import bench_derive

        r = bench_derive(batch=batch, warmup_s=3.0, measure_s=measure_s,
                         inv_chunk=int(os.environ.get("VUKE_BENCH_INV_CHUNK", 256)))
    r["mode"] = mode
    r["device_kind"] = getattr(dev, "device_kind", "unknown")
    r["n_devices"] = len(jax.devices())
    r["total_secs"] = time.time() - t0
    print(f"[stage {mode}] {r['derivations_per_sec']/1e6:.2f} M/s "
          f"(total {r['total_secs']:.0f}s)", file=sys.stderr, flush=True)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
