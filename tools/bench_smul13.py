#!/usr/bin/env python
"""Head-to-head: 13-bit-limb vs 16-bit-limb Pallas scalar-mul on the TPU.

Validates bit-exactness of the 13-bit kernel against the host oracle
(first lanes are adversarial scalars), then times both kernels steady
state at the same batch.

Usage: python tools/bench_smul13.py [batch_log2=17] [wbits=8]
NOTE: single shared TPU — never run concurrently with another JAX process.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vuke_tpu._cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from vuke_tpu.ecc import ref


def interesting_scalars(n):
    ks = [1, 2, 3, 255, 256, 257, ref.N - 1, ref.N - 2,
          (1 << 255) + 12345, 0xDEADBEEF, 1 << 128, 1 << 64]
    rng = np.random.RandomState(7)
    while len(ks) < n:
        ks.append(int.from_bytes(rng.bytes(32), "big") % (ref.N - 1) + 1)
    return ks[:n]


def digits_of(ks):
    return jnp.asarray(
        np.array([[(k >> (8 * w)) & 0xFF for w in range(32)] for k in ks],
                 dtype=np.uint32))


def check_lanes(name, ks, X, Y, ZZ, ZZZ, lanes):
    X, Y, ZZ, ZZZ = (np.asarray(a) for a in (X, Y, ZZ, ZZZ))

    def val(a, j):
        return sum(int(a[j, i]) << (16 * i) for i in range(16))

    for j in lanes:
        ex, ey = ref.point_mul(ks[j])
        zz, zzz = val(ZZ, j) % ref.P, val(ZZZ, j) % ref.P
        gx = val(X, j) * pow(zz, ref.P - 2, ref.P) % ref.P
        gy = val(Y, j) * pow(zzz, ref.P - 2, ref.P) % ref.P
        assert gx == ex and gy == ey, f"{name} MISMATCH lane {j} k={hex(ks[j])}"
    print(f"[{name}] exactness ok on {len(lanes)} lanes", flush=True)


def bench(name, fn, digits, iters=20):
    t0 = time.time()
    out = fn(digits)
    np.asarray(out[0][:1])
    compile_s = time.time() - t0
    for _ in range(3):
        out = fn(digits)
    np.asarray(out[0][:1, :1])
    t0 = time.time()
    for _ in range(iters):
        out = fn(digits)
    np.asarray(out[0][:1, :1])
    dt = (time.time() - t0) / iters
    n = digits.shape[0]
    print(f"[{name}] {dt*1e3:8.2f} ms/iter  {n/dt/1e6:6.2f} M smul/s  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt, out


def digits_w(ks, wbits):
    windows = -(-256 // wbits)
    mask = (1 << wbits) - 1
    return jnp.asarray(
        np.array([[(k >> (wbits * w)) & mask for w in range(windows)]
                  for k in ks], dtype=np.uint32))


def main():
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    wbits = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lookup = sys.argv[3] if len(sys.argv) > 3 else "i8"
    signed = False
    if len(sys.argv) > 4:
        signed = {"signed": True, "odd": "odd"}.get(sys.argv[4], False)
    n = 1 << log2
    print(f"device: {jax.devices()[0].device_kind}, batch {n}, "
          f"wbits {wbits}, lookup {lookup}, signed {signed}", flush=True)
    ks = interesting_scalars(n)

    from vuke_tpu.ecc.pallas_smul13 import (odd_encode_rows,
                                            scalar_mul_zz_pallas13,
                                            signed_encode)
    from vuke_tpu.ecc.pallas_smul import scalar_mul_zz_pallas

    f13 = jax.jit(lambda d: scalar_mul_zz_pallas13(d, wbits=wbits,
                                                   lookup=lookup,
                                                   signed=signed))
    print(f"compiling 13-bit kernel (wbits={wbits}, {lookup}, "
          f"signed={signed})...", flush=True)
    if signed == "odd":
        words = np.array([[(k >> (32 * (7 - i))) & 0xFFFFFFFF
                           for i in range(8)] for k in ks], dtype=np.uint32)
        digs = jnp.stack(
            odd_encode_rows([jnp.asarray(words[:, i]) for i in range(8)],
                            wbits), axis=-1)
    else:
        du = digits_w(ks, wbits)
        if signed:
            digs = jnp.stack(
                signed_encode([du[:, w] for w in range(du.shape[1])],
                              wbits), axis=-1)
        else:
            digs = du
    dt13, out13 = bench("smul13", f13, digs)
    check_lanes("smul13", ks, *out13, lanes=list(range(12)) + [100, n - 1])

    if os.environ.get("VUKE_BENCH_SKIP16"):
        return
    f16 = jax.jit(scalar_mul_zz_pallas)
    print("compiling 16-bit kernel...", flush=True)
    dt16, out16 = bench("smul16", f16, digits_of(ks))

    # The kernels produce different-but-valid (ZZ, ZZZ) representatives
    # (the 13-bit high-first reduce folds in a different order), so
    # cross-checking is affine-level only — covered by the oracle check
    # above; here just confirm the 16-bit kernel against a few lanes too.
    check_lanes("smul16", ks, *out16, lanes=[0, 1, n - 1])
    print(f"speedup 13-bit vs 16-bit: {dt16 / dt13:.3f}x", flush=True)


if __name__ == "__main__":
    main()
