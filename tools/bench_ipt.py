#!/usr/bin/env python
"""TPU ladder for the ipt (tiles-per-grid-step) scalar-mul knob.

Runs the w10/odd/i8 production kernel at each requested ipt, checks
bit-exactness across ipt settings plus oracle lanes, and prints
ms/2^log2.  Usage: python tools/bench_ipt.py [log2=17] [ipts=1,2,4]
NOTE: single shared TPU — never run concurrently with another JAX process.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vuke_tpu._cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from vuke_tpu.ecc import ref
from vuke_tpu.ecc import pallas_smul13 as ps


def main():
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    ipts = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,2,4").split(",")]
    n = 1 << log2
    wbits = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    lookup = sys.argv[4] if len(sys.argv) > 4 else "i8"
    windows = ps._n_windows(wbits)
    print(f"device: {jax.devices()[0].device_kind}, batch 2^{log2}, "
          f"w{wbits}/odd/i8, ipts {ipts}", flush=True)

    ks = [1, 2, 3, 255, 257, ref.N - 1, ref.N - 2, (1 << 255) + 12345]
    rng = np.random.RandomState(7)
    while len(ks) < n:
        ks.append(int.from_bytes(rng.bytes(32), "big") % (ref.N - 1) + 1)
    words = np.array([[(k >> (32 * (7 - i))) & 0xFFFFFFFF for i in range(8)]
                      for k in ks], dtype=np.uint32)
    digs = jnp.stack(ps.odd_encode_rows(
        [jnp.asarray(words[:, i]) for i in range(8)], wbits), axis=0)
    digs_t = digs.reshape(windows, n // 1024, 8, 128)
    table = jnp.asarray({"i8": ps._table13_i8, "bf16": ps._table13_bf16,
                         "f32": ps._table13_f32}[lookup](wbits, "odd"))

    outs = {}
    for ipt in ipts:
        call = ps._smul13_call(n, 1024, wbits, False, lookup, "odd", False,
                               None, ipt)
        t0 = time.time()
        out = call(digs_t, table)
        np.asarray(out[0][:1, :1, :1, :1])
        compile_s = time.time() - t0
        for _ in range(3):
            out = call(digs_t, table)
        np.asarray(out[0][:1, :1, :1, :1])
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out = call(digs_t, table)
        np.asarray(out[0][:1, :1, :1, :1])
        dt = (time.time() - t0) / iters
        print(f"[ipt={ipt}] {dt*1e3:8.2f} ms  {n/dt/1e6:6.2f} M smul/s  "
              f"(compile {compile_s:.0f}s)", flush=True)
        outs[ipt] = tuple(np.asarray(a) for a in out)

    base = outs[ipts[0]]
    for ipt in ipts[1:]:
        for a, b in zip(base, outs[ipt]):
            assert np.array_equal(a, b), f"ipt={ipt} differs from ipt={ipts[0]}"
    print("cross-ipt bit-exactness OK", flush=True)

    X, Y, ZZ, ZZZ = base

    def val(arr, lane):
        j, r, c = lane // 1024, (lane % 1024) // 128, lane % 128
        return sum(int(arr[i, j, r, c]) << (16 * i) for i in range(16))

    for lane in list(range(8)) + [100, n - 1]:
        ex, ey = ref.point_mul(ks[lane])
        zz, zzz = val(ZZ, lane) % ref.P, val(ZZZ, lane) % ref.P
        gx = val(X, lane) * pow(zz, ref.P - 2, ref.P) % ref.P
        gy = val(Y, lane) * pow(zzz, ref.P - 2, ref.P) % ref.P
        assert gx == ex and gy == ey, f"oracle mismatch lane {lane}"
    print("oracle lanes OK", flush=True)


if __name__ == "__main__":
    main()
