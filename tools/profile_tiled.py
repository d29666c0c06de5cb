#!/usr/bin/env python
"""Stage-by-stage timing of the tiled derive pipeline on the real TPU.

Times each fused sub-program (MT19937 keygen, normalize+digits, Pallas
scalar-mul, batch inversion + affine, hash160) separately and the full
pipeline, so kernel work targets the actual bottleneck instead of guesses.

Per-stage dispatch on the axon backend adds fixed RPC latency, so the
separate-stage numbers overstate small stages; `--prefix` mode instead
jits cumulative prefixes of the pipeline and reports increments (true
in-jit shares, at the cost of one compile per prefix).

Usage: python tools/profile_tiled.py [batch_log2=18] [--prefix]
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
    """Times device execution via a 4-byte scalar fetch of the LAST result.

    On the axon backend block_until_ready is effectively a no-op and
    np.asarray of a full output round-trips megabytes through the tunnel;
    executions queue in order, so fetching one tiny scalar after N queued
    calls measures N executions plus one RPC.  ``fn`` must return a scalar
    (reduce in-graph)."""
    t0 = time.time()
    np.asarray(fn(*args))
    compile_s = time.time() - t0
    for _ in range(3):
        r = fn(*args)
    np.asarray(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms  ({compile_s:6.1f}s compile)",
          flush=True)
    return dt



def _summed(f):
    """Wrap a stage fn so it returns a uint32 scalar (see timeit)."""
    import jax.numpy as jnp

    def g(*a):
        leaves = jax.tree_util.tree_leaves(f(*a))
        tot = jnp.zeros((), jnp.uint32)
        for x in leaves:
            tot = tot + jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)
        return tot
    return jax.jit(g)

def prefix_main(log2):
    """Cumulative-prefix timing: jit(stages 1..k) for each k, report deltas."""
    n = 1 << log2
    nb = n // 1024
    print(f"device: {jax.devices()[0].device_kind}, batch {n} ({nb} tiles), "
          f"prefix mode", flush=True)

    from vuke_tpu.cores.pallas_kernels import _mt_call, _hash160_call
    from vuke_tpu.ecc.pallas_smul import _mul_t
    from vuke_tpu.ecc import tiled

    wbits = tiled.window_bits()
    use13 = tiled.use_smul13()
    print(f"smul13={use13} wbits={wbits}", flush=True)

    def upto(k):
        def fn(seeds):
            kw_t = _mt_call(n)(seeds)
            if k == 1:
                return jnp.sum(kw_t, dtype=jnp.uint32)
            norm_t = tiled._normalize_words_t(kw_t)
            signed = tiled.signed_digits() if use13 else False
            digits_t = tiled._digits_t(norm_t, wbits if use13 else 8, signed)
            if k == 2:
                return jnp.sum(digits_t, dtype=jnp.uint32)
            if use13:
                from vuke_tpu.ecc.pallas_smul13 import (_smul13_call,
                                                        _table13_f32,
                                                        _table13_i8)
                lookup = tiled.lookup_mode()
                table = jnp.asarray(_table13_i8(wbits, signed)
                                    if lookup == "i8"
                                    else _table13_f32(wbits, signed))
                X, Y, ZZ, ZZZ = _smul13_call(n, 1024, wbits, lookup=lookup,
                                             signed=signed)(digits_t, table)
            else:
                from vuke_tpu.ecc.pallas_smul import _smul_call, _table_f32
                table = jnp.asarray(_table_f32())
                X, Y, ZZ, ZZZ = _smul_call(n, 1024)(digits_t, table)
            if k == 3:
                return (jnp.sum(X, dtype=jnp.uint32)
                        + jnp.sum(Y, dtype=jnp.uint32)
                        + jnp.sum(ZZ, dtype=jnp.uint32)
                        + jnp.sum(ZZZ, dtype=jnp.uint32))
            rowsof = lambda a: [a[i] for i in range(16)]
            T = _mul_t(rowsof(ZZ), rowsof(ZZZ))
            iT = tiled._batch_inverse_tiles(jnp.stack(T, axis=0))
            iT_rows = rowsof(iT)
            x = _mul_t(_mul_t(rowsof(X), iT_rows), rowsof(ZZZ))
            y = _mul_t(_mul_t(rowsof(Y), iT_rows), rowsof(ZZ))
            x = tiled._fe_normalize_rows(x)
            y = tiled._fe_normalize_rows(y)
            if k == 4:
                return (jnp.sum(jnp.stack(x), dtype=jnp.uint32)
                        + jnp.sum(jnp.stack(y), dtype=jnp.uint32))
            xw_t = tiled._limbs_to_words_t(x)
            yw_t = tiled._limbs_to_words_t(y)
            y_odd = y[0] & np.uint32(1)
            hc, hu = _hash160_call(n)(xw_t, yw_t, y_odd)
            return (jnp.sum(hc, dtype=jnp.uint32)
                    + jnp.sum(hu, dtype=jnp.uint32))
        return jax.jit(fn)

    seeds = jnp.asarray(np.arange(n, dtype=np.uint32)).reshape(nb, 8, 128)
    names = ["mt19937", "+norm/digits", "+scalar-mul", "+inv/affine",
             "+hash160"]
    prev = 0.0
    for k, name in enumerate(names, start=1):
        t = timeit(f"prefix {k} ({name})", upto(k), seeds,
                   iters=10 if k >= 3 else 30)
        print(f"    stage delta: {(t - prev)*1e3:9.2f} ms", flush=True)
        prev = t
    print(f"rate: {n / prev / 1e6:.2f} M derivations/s", flush=True)


def main():
    if "--prefix" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("-")]
        prefix_main(int(args[0]) if args else 18)
        return
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
    t_mt = timeit("mt19937 keygen", _summed(mt), seeds)
    kw_t = mt(seeds)

    # stage 2: normalize + digits
    nd = jax.jit(lambda kw: tiled._digits_t(tiled._normalize_words_t(kw)))
    t_nd = timeit("normalize+digits", _summed(nd), kw_t)
    digits_t = nd(kw_t)

    # stage 3: Pallas scalar-mul
    table = jnp.asarray(_table_f32())
    sm = jax.jit(lambda d, t: _smul_call(n, 1024)(d, t))
    t_sm = timeit("pallas scalar-mul", _summed(sm), digits_t, table)
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
    t_ia = timeit("inversion+affine", _summed(ia), X, Y, ZZ, ZZZ)
    xs, ys = ia(X, Y, ZZ, ZZZ)

    # stage 5: hash160
    def hashes(x, y):
        xw_t = tiled._limbs_to_words_t([x[i] for i in range(16)])
        yw_t = tiled._limbs_to_words_t([y[i] for i in range(16)])
        y_odd = y[0] & np.uint32(1)
        return _hash160_call(n)(xw_t, yw_t, y_odd)

    hs = jax.jit(hashes)
    t_h = timeit("hash160 (c+u)", _summed(hs), xs, ys)

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
