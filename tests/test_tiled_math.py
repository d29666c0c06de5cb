"""13-bit batch-inversion / affine-stage math (tiled.py).

Unlike test_smul13_math (pure numpy), these helpers use lax.scan /
fori_loop, so they run as real jitted JAX.  Marked slow: the CPU LLVM
pipeline takes >9 minutes to compile the 255-squaring Fermat chain that
the TPU compiles in under a minute — run them in the default (TPU) tier.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vuke_tpu.ecc import ref, tiled
from vuke_tpu.ecc.pallas_smul13 import L13, _rows13_to16

pytestmark = pytest.mark.slow


def _to13_lanes(vals, shape):
    """list of ints (len == prod(shape)) -> (20, *shape) uint32 rows."""
    flat = np.zeros((L13, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(L13):
            flat[i, j] = (v >> (13 * i)) & 0x1FFF
    return jnp.asarray(flat.reshape((L13,) + shape))


def _from13_lane(arr, j):
    flat = np.asarray(arr).reshape(L13, -1)
    return sum(int(flat[i, j]) << (13 * i) for i in range(L13))


def test_batch_inverse_tiles13_matches_fermat():
    rng = np.random.RandomState(3)
    nb = 2
    n = nb * 8 * 128
    vals = [int.from_bytes(rng.bytes(32), "big") % ref.P or 1
            for _ in range(n)]
    z = _to13_lanes(vals, (nb, 8, 128))
    inv = jax.jit(tiled._batch_inverse_tiles13)(z)
    for j in (0, 1, 7, 128, 1023, 1024, n - 1):
        got = _from13_lane(inv, j) % ref.P
        assert got == pow(vals[j], ref.P - 2, ref.P), j


def test_rows13_to16_after_inverse():
    rng = np.random.RandomState(4)
    vals = [int.from_bytes(rng.bytes(32), "big") % ref.P or 1
            for _ in range(1024)]
    z = _to13_lanes(vals, (1, 8, 128))
    inv = jax.jit(tiled._batch_inverse_tiles13)(z)
    rows16 = jax.jit(lambda a: jnp.stack(
        _rows13_to16([a[i] for i in range(L13)])))(inv)
    r = np.asarray(rows16).reshape(16, -1)
    for j in (0, 511, 1023):
        got = sum(int(r[i, j]) << (16 * i) for i in range(16))
        assert got % ref.P == pow(vals[j], ref.P - 2, ref.P)
        assert got < 1 << 256
