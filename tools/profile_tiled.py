#!/usr/bin/env python
"""Stage-by-stage timing of the tiled derive pipeline on the real TPU.

Times each fused sub-program (MT19937 keygen, normalize+digits, Pallas
scalar-mul, batch inversion + affine, hash160) separately and the full
pipeline, so kernel work targets the actual bottleneck instead of guesses.

Usage: python tools/profile_tiled.py [batch_log2=18]
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


def timeit(name, fn, *args, iters=30):
    t0 = time.time()
    r = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
    compile_s = time.time() - t0
    # warm
    for _ in range(3):
        r = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
    t0 = time.time()
    outs = []
    for _ in range(iters):
        outs.append(fn(*args))
        if len(outs) > 2:
            jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1],
                                   outs.pop(0))
    for o in outs:
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], o)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms  ({compile_s:6.1f}s compile)",
          flush=True)
    return dt


def main():
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log2
    nb = n // 1024
    print(f"device: {jax.devices()[0].device_kind}, batch {n} ({nb} tiles)",
          flush=True)

    from vuke_tpu.cores.pallas_kernels import _mt_call, _hash160_call
    from vuke_tpu.ecc.pallas_smul import _smul_call, _table_f32, _mul_t
    from vuke_tpu.ecc import tiled

    seeds = jnp.asarray(np.arange(n, dtype=np.uint32)).reshape(nb, 8, 128)
    rng = np.random.default_rng(0)

    # stage 1: MT19937 keygen
    mt = jax.jit(lambda s: _mt_call(n)(s))
    t_mt = timeit("mt19937 keygen", mt, seeds)
    kw_t = mt(seeds)

    # stage 2: normalize + digits
    nd = jax.jit(lambda kw: tiled._digits_t(tiled._normalize_words_t(kw)))
    t_nd = timeit("normalize+digits", nd, kw_t)
    digits_t = nd(kw_t)

    # stage 3: Pallas scalar-mul
    table = jnp.asarray(_table_f32())
    sm = jax.jit(lambda d, t: _smul_call(n, 1024)(d, t))
    t_sm = timeit("pallas scalar-mul", sm, digits_t, table)
    X, Y, ZZ, ZZZ = sm(digits_t, table)

    # stage 4: inversion + affine + normalize
    def inv_affine(X, Y, ZZ, ZZZ):
        rowsof = lambda a: [a[i] for i in range(16)]
        T = _mul_t(rowsof(ZZ), rowsof(ZZZ))
        iT = tiled._batch_inverse_tiles(jnp.stack(T, axis=0))
        iT_rows = rowsof(iT)
        x = _mul_t(_mul_t(rowsof(X), iT_rows), rowsof(ZZZ))
        y = _mul_t(_mul_t(rowsof(Y), iT_rows), rowsof(ZZ))
        x = tiled._fe_normalize_rows(x)
        y = tiled._fe_normalize_rows(y)
        return jnp.stack(x), jnp.stack(y)

    ia = jax.jit(inv_affine)
    t_ia = timeit("inversion+affine", ia, X, Y, ZZ, ZZZ)
    xs, ys = ia(X, Y, ZZ, ZZZ)

    # stage 5: hash160
    def hashes(x, y):
        xw_t = tiled._limbs_to_words_t([x[i] for i in range(16)])
        yw_t = tiled._limbs_to_words_t([y[i] for i in range(16)])
        y_odd = y[0] & np.uint32(1)
        return _hash160_call(n)(xw_t, yw_t, y_odd)

    hs = jax.jit(hashes)
    t_h = timeit("hash160 (c+u)", hs, xs, ys)

    # full pipeline
    full = jax.jit(lambda s: tiled.derive_hash160s_tiled(s.reshape(-1))["frag_c"][0].sum())
    t_full = timeit("FULL tiled pipeline", full, seeds, iters=10)

    parts = t_mt + t_nd + t_sm + t_ia + t_h
    print(f"\nsum of stages {parts*1e3:.2f} ms vs full {t_full*1e3:.2f} ms")
    print(f"rate: {n / t_full / 1e6:.2f} M derivations/s")
    for name, t in [("mt", t_mt), ("norm+digits", t_nd), ("smul", t_sm),
                    ("inv+affine", t_ia), ("hash160", t_h)]:
        print(f"  {name:12s} {100 * t / parts:5.1f}% of stage sum")


if __name__ == "__main__":
    main()
