#!/usr/bin/env python
"""VPU throughput probe: measured ops/s for the op mixes the ECC kernel uses.

The field-mul kernel is VPU-bound; whether further wins need op-count cuts
or better scheduling depends on the real per-op throughput of u32
mul/add/shift (and whether f32 mul is faster than u32 mul) on this chip.
Each probe runs a long dependent-free chain of ops on (8, 128) tiles inside
a Pallas fori_loop and reports achieved lane-ops/s.

NOTE: single shared TPU — do not run concurrently with another JAX process.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vuke_tpu._cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 32768        # fori_loop iterations
CHAINS = 8          # independent chains (hide latency)
INNER = 16          # ops per chain per iteration


def make_kernel(op, dtype):
    def kernel(x_ref, o_ref):
        init = tuple(x_ref[i] for i in range(CHAINS))

        def body(i, accs):
            outs = []
            for c, a in enumerate(accs):
                v = a
                for k in range(INNER):
                    v = op(v, a)
                outs.append(v)
            return tuple(outs)

        accs = jax.lax.fori_loop(0, REPS, body, init)
        acc = accs[0]
        for a in accs[1:]:
            if dtype == jnp.float32:
                acc = acc + a
            else:
                acc = acc ^ a if dtype == jnp.uint32 else acc + a
        o_ref[0] = acc

    return kernel


def probe(name, op, dtype, ops_per=1):
    x = jnp.asarray(
        np.random.default_rng(0).integers(1, 1000, size=(CHAINS, 8, 128)))
    x = x.astype(dtype)
    call = pl.pallas_call(
        make_kernel(op, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), dtype),
    )
    f = jax.jit(call)
    np.asarray(f(x))  # compile+warm
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        r = f(x)
    np.asarray(r)
    dt = (time.time() - t0) / iters
    total_ops = REPS * CHAINS * INNER * 8 * 128 * ops_per
    print(f"{name:24s} {total_ops / dt / 1e12:7.3f} T lane-ops/s "
          f"({dt*1e6:8.1f} us)", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    M16 = np.uint32(0xFFFF)
    probe("u32 add", lambda v, a: v + a, jnp.uint32)
    probe("u32 mul", lambda v, a: v * a, jnp.uint32)
    probe("u32 and", lambda v, a: v & a, jnp.uint32)
    probe("u32 shr16", lambda v, a: v >> np.uint32(16), jnp.uint32)
    probe("u32 mul+and+shr+2add", lambda v, a: ((v * a) & M16) + ((v * a) >> np.uint32(16)) + a,
          jnp.uint32, ops_per=5)
    probe("f32 mul", lambda v, a: v * a, jnp.float32)
    probe("f32 fma", lambda v, a: v * a + a, jnp.float32)
    probe("i32 select", lambda v, a: jnp.where(v > a, v, a), jnp.uint32)


if __name__ == "__main__":
    main()
