#!/usr/bin/env python
"""On-chip sweep rates for every reverse-analyzer family (VERDICT r4 #4).

Measures steady-state seeds/s of the device sweep programs the analyzers
dispatch (analyze/analyzers.py): milksad exact, lcg x4 variants, the
xorshift cascade family, mt64 cascade, and sha256_chain iterated/indexed.
Writes one JSON line per family to stdout and a combined artifact to
.bench_logs/sweep_rates.json; docs/SCALING.md carries the table.

Usage: python tools/bench_sweeps.py [--quick]
NOTE: single shared TPU — never run concurrently with another JAX process.
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vuke_tpu._cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from vuke_tpu.analyze import sweeps
from vuke_tpu.cores import lcg as lcg_core, xorshift as xs_core
from vuke_tpu.cores.mt19937 import milksad_key_words, mt19937_64_outputs


def _force(r):
    # axon: block_until_ready is a no-op — fetching the 1-byte scalar is
    # the only reliable completion barrier (docs/KERNELS.md discipline)
    return bool(np.asarray(r["found"]))


def measure_family(name, make_prog, batch, target_words=None,
                   measure_s=6.0, tries=3):
    """measure() with halve-batch-and-retry on device OOM (the mt64
    cascade's 312-word state scan at 2^24 lanes exceeds HBM temp space)."""
    for _ in range(tries):
        try:
            return measure(name, make_prog(batch), target_words,
                           measure_s=measure_s)
        except Exception as e:
            print(f"# {name}: batch {batch} failed ({type(e).__name__}); "
                  f"halving", file=sys.stderr, flush=True)
            batch //= 2
    return measure(name, make_prog(batch), target_words, measure_s=measure_s)


def measure(name, prog, target_words=None, min_batches=3, measure_s=6.0):
    """Warm (compile) + steady-state rate of prog.run_batch."""
    t0 = time.time()
    _force(prog.run_batch(0, prog.batch, target_words))
    compile_s = time.time() - t0
    # steady state: pipelined batches, stop on wall clock
    t0 = time.time()
    n = 0
    pending = []
    pos = 0
    while time.time() - t0 < measure_s or n < min_batches:
        pending.append(prog.run_batch(pos, prog.batch, target_words))
        pos += prog.batch
        if len(pending) > 2:
            _force(pending.pop(0))
            n += 1
    for p in pending:
        _force(p)
        n += 1
    dt = time.time() - t0
    rate = n * prog.batch / dt
    out = {"family": name, "seeds_per_sec": rate, "batch": prog.batch,
           "batches": n, "measure_s": round(dt, 2),
           "compile_or_warm_s": round(compile_s, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    quick = "--quick" in sys.argv
    measure_s = 3.0 if quick else 6.0
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr,
          flush=True)
    results = []
    # 2^26 reaches the VPU compute bound for 1-key streams (the 2^20
    # default was dispatch-latency-bound at ~36M/s: ~30ms per host
    # round-trip through the axon tunnel regardless of batch);
    # cascade/chain families carry n_keys/depth x the memory, so they
    # run at 2^24 / 2^20.
    B = 1 << 26
    BC = 1 << 24

    # milksad exact (the r4 marquee — sanity anchor for this table)
    prog = sweeps.SweepProgram(lambda hi, lo, n: milksad_key_words(lo, n_keys=n),
                               "exact", batch=B)
    results.append(measure("milksad:exact", prog,
                           jnp.zeros(8, dtype=jnp.uint32), measure_s=measure_s))

    # lcg per variant, exact, BE (analyze/lcg.rs:36-130 workload)
    for v in lcg_core.ALL_VARIANTS:
        def ks(hi, lo, n, _v=v):
            return lcg_core.lcg_key_words(lo, _v, True)[:, None, :]
        prog = sweeps.SweepProgram(ks, "exact", batch=B)
        results.append(measure(f"lcg:{v.name}:exact", prog,
                               jnp.zeros(8, dtype=jnp.uint32),
                               measure_s=measure_s))

    # xorshift cascade (2^64 space is cascade-gated in the reference;
    # cascade of two masked targets exercises the production compare)
    cascade = [(32, (1 << 31) | 0x1234), (32, (1 << 31) | 0x5678)]
    for vname in xs_core.VARIANT_NAMES:
        prog = sweeps.SweepProgram(xs_core.KEYSTREAM_FNS[vname], "cascade",
                                   cascade=cascade, batch=BC)
        results.append(measure(f"xorshift:{vname}:cascade", prog,
                               measure_s=measure_s))

    # mt64 cascade (README.md:493 quotes ~850K seeds/s on CPU); the
    # MT19937-64 state scan carries ~312 words/lane, so it starts smaller
    from vuke_tpu.analyze.analyzers import Mt64Analyzer
    results.append(measure_family(
        "mt64:cascade",
        lambda b: sweeps.SweepProgram(Mt64Analyzer._keystream, "cascade",
                                      cascade=cascade, batch=b),
        1 << 22, measure_s=measure_s))

    # sha256_chain iterated + indexed, depth 10 (GPU-accelerated in the
    # reference, analyze/sha256_chain.rs:491+)
    for variant in ("iterated", "indexed:be"):
        prog = sweeps.ChainSweepProgram(variant, 10, "exact", batch=1 << 20)
        results.append(measure(f"sha256_chain:{variant}:d10", prog,
                               jnp.zeros(8, dtype=jnp.uint32),
                               measure_s=measure_s))

    os.makedirs(".bench_logs", exist_ok=True)
    artifact = {"device": dev.device_kind, "results": results}
    with open(".bench_logs/sweep_rates.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("# wrote .bench_logs/sweep_rates.json", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
