"""Pallas TPU kernel: fused fixed-base scalar multiplication.

The XLA-staged scalar-mul (ecc/point.py) is HBM-bound: every field-mul
materializes (N,16)-limb intermediates between fused regions.  This kernel
keeps the whole 32-window mixed-addition chain VMEM-resident for a tile of
seeds and uses the MXU for table lookups (one-hot dot — exact, since
exactly one term per row is nonzero and 16-bit limb values are f32-exact).

Layout: limb-major (16, T) tiles — each limb row is a (T,)-lane vector, so
field ops are straight VPU work with no gathers.  The table ships as
(32, 256, 32) f32 (x||y limbs) and lives in VMEM (1 MB).

Falls back transparently to the XLA path on backends without Mosaic.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ref
from .point import WINDOWS, TABLE_SIZE, fixed_base_table

TILE = 1024  # 8 sublanes x 128 lanes per limb row — full VPU utilization


@functools.lru_cache(maxsize=1)
def _table_f32() -> np.ndarray:
    """(32, 256, 32) float32: x limbs 0..15, y limbs 16..31 per entry."""
    t = fixed_base_table()  # (32, 256, 2, 16) uint32
    return t.reshape(WINDOWS, TABLE_SIZE, 32).astype(np.float32)


_M16 = np.uint32(0xFFFF)
_C977 = np.uint32(977)


def _carry_rows(cols):
    """Carry-propagate a list of uint32 row vectors into 16-bit limbs."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        t = c + carry
        out.append(t & _M16)
        carry = t >> np.uint32(16)
    return out, carry


def _reduce_rows(cols32):
    """Reduce 32 carried 16-bit rows (512-bit) mod p -> 16 rows.

    Same folding as field._reduce_512, restated over row lists."""
    lo = cols32[:16]
    hi = cols32[16:]
    cols = list(lo) + [jnp.zeros_like(lo[0]), jnp.zeros_like(lo[0])]
    for i in range(16):
        p = hi[i] * _C977
        cols[i] = cols[i] + (p & _M16)
        cols[i + 1] = cols[i + 1] + (p >> np.uint32(16))
        cols[i + 2] = cols[i + 2] + hi[i]
    limbs, carry = _carry_rows(cols)
    hi2 = [limbs[16], limbs[17], carry]
    cols = list(limbs[:16]) + [jnp.zeros_like(limbs[0])]
    for i, h in enumerate(hi2):
        p = h * _C977
        cols[i] = cols[i] + (p & _M16)
        cols[i + 1] = cols[i + 1] + (p >> np.uint32(16))
        cols[i + 2] = cols[i + 2] + h
    limbs, carry = _carry_rows(cols)
    hi3 = limbs[16] + (carry << np.uint32(16))
    limbs = limbs[:16]
    for _ in range(2):
        p = hi3 * _C977
        limbs[0] = limbs[0] + (p & _M16)
        limbs[1] = limbs[1] + (p >> np.uint32(16))
        limbs[2] = limbs[2] + hi3
        limbs, hi3 = _carry_rows(limbs)
    return limbs[:16]


def _mul_t(a, b):
    """Field mul of limb-row lists: a, b are lists of 16 (T,) uint32 rows."""
    cols = [None] * 32
    for i in range(16):
        ai = a[i]
        for j in range(16):
            p = ai * b[j]
            lo = p & _M16
            hi = p >> np.uint32(16)
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    carried, _ = _carry_rows(cols)
    return _reduce_rows(carried)


def _add_t(a, b):
    cols = [a[i] + b[i] for i in range(16)]
    limbs, carry = _carry_rows(cols)
    for _ in range(2):
        p = carry * _C977
        limbs[0] = limbs[0] + (p & _M16)
        limbs[1] = limbs[1] + (p >> np.uint32(16))
        limbs[2] = limbs[2] + carry
        limbs, carry = _carry_rows(limbs)
    return limbs[:16]


_FOURP_LIMBS = [np.uint32((4 * ref.P >> (16 * i)) & 0xFFFF) for i in range(17)]


def _neg_t(b):
    out = []
    borrow = jnp.zeros_like(b[0])
    for i in range(16):
        t = _FOURP_LIMBS[i] - b[i] - borrow
        out.append(t & _M16)
        borrow = (t >> np.uint32(16)) & np.uint32(1)
    hi = _FOURP_LIMBS[16] - borrow
    cols = list(out) + [jnp.zeros_like(out[0])]
    p = hi * _C977
    cols[0] = cols[0] + (p & _M16)
    cols[1] = cols[1] + (p >> np.uint32(16))
    cols[2] = cols[2] + hi
    limbs, carry = _carry_rows(cols)
    hi3 = limbs[16] + (carry << np.uint32(16))
    limbs = limbs[:16]
    for _ in range(2):
        p = hi3 * _C977
        limbs[0] = limbs[0] + (p & _M16)
        limbs[1] = limbs[1] + (p >> np.uint32(16))
        limbs[2] = limbs[2] + hi3
        limbs, hi3 = _carry_rows(limbs)
    return limbs[:16]


def _sub_t(a, b):
    return _add_t(a, _neg_t(b))


def _select_t(cond, a, b):
    """cond: (T,) bool; a, b: limb-row lists."""
    return [jnp.where(cond, a[i], b[i]) for i in range(16)]


def _smul_kernel(digits_ref, table_ref, x_ref, y_ref, zz_ref, zzz_ref):
    """digits_ref: (32, 1, 8, 128) uint32 block; table (32, 256, 32) f32;
    outputs: (16, 1, 8, 128) uint32 blocks X, Y, ZZ (=Z^2), ZZZ (=Z^3).

    The 32-window loop is a ``fori_loop`` (compiled once) carrying the
    Jacobian accumulator as (16, 8, 128) tiles; every limb row is a full
    (8, 128) VPU tile (8x better sublane utilization than (1, T) rows).
    Table lookups run on the MXU as 8 per-sublane-group one-hot dots.
    """
    from jax.experimental import pallas as pl

    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (TABLE_SIZE, 128), 0)

    def rows(arr):
        return [arr[i] for i in range(16)]

    def stack(rs):
        return jnp.stack(rs, axis=0)

    def body(w, carry):
        X_a, Y_a, ZZ_a, ZZZ_a, acc_inf = carry
        X, Y = rows(X_a), rows(Y_a)
        ZZ, ZZZ = rows(ZZ_a), rows(ZZZ_a)

        d = digits_ref[pl.ds(w, 1), 0].reshape(8, 128)      # (8, 128) uint32
        tab_w = table_ref[pl.ds(w, 1), :, :].reshape(TABLE_SIZE, 32)
        # 8 one-hot dots, one per sublane group of the tile
        entry_groups = []
        for a in range(8):
            d_a = d[a:a + 1, :]                              # (1, 128)
            onehot = (d_a == iota2).astype(jnp.float32)      # (256, 128)
            e = jax.lax.dot_general(
                tab_w, onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)          # (32, 128)
            # Mosaic lacks f32->u32 casts; go through int32 (values < 2^16)
            entry_groups.append(e.astype(jnp.int32).astype(jnp.uint32))
        # assemble (8, 128) limb rows from the per-group (32, 128) results
        x2 = [jnp.concatenate([entry_groups[a][i:i + 1, :] for a in range(8)],
                              axis=0) for i in range(16)]
        y2 = [jnp.concatenate([entry_groups[a][16 + i:17 + i, :] for a in range(8)],
                              axis=0) for i in range(16)]

        # mixed add carrying (ZZ, ZZZ) = (Z^2, Z^3) instead of Z — saves the
        # Z3 = Z*H multiply (10 field muls/window instead of 11)
        U2 = _mul_t(x2, ZZ)
        S2 = _mul_t(y2, ZZZ)
        H = _sub_t(U2, X)
        R = _sub_t(S2, Y)
        HH = _mul_t(H, H)
        HHH = _mul_t(H, HH)
        V = _mul_t(X, HH)
        X3 = _sub_t(_sub_t(_mul_t(R, R), HHH), _add_t(V, V))
        Y3 = _sub_t(_mul_t(R, _sub_t(V, X3)), _mul_t(Y, HHH))
        ZZ3 = _mul_t(ZZ, HH)
        ZZZ3 = _mul_t(ZZZ, HHH)

        one_rows = [jnp.full((8, 128), np.uint32(1) if i == 0 else np.uint32(0),
                             dtype=jnp.uint32) for i in range(16)]
        # acc_inf carried as a 0/1 uint32 row (Mosaic rejects i1 loop carries)
        inf_b = acc_inf != 0
        nX = _select_t(inf_b, x2, X3)
        nY = _select_t(inf_b, y2, Y3)
        nZZ = _select_t(inf_b, one_rows, ZZ3)
        nZZZ = _select_t(inf_b, one_rows, ZZZ3)
        d_zero = d == 0
        X = _select_t(d_zero, X, nX)
        Y = _select_t(d_zero, Y, nY)
        ZZ = _select_t(d_zero, ZZ, nZZ)
        ZZZ = _select_t(d_zero, ZZZ, nZZZ)
        acc_inf = acc_inf * d_zero.astype(jnp.uint32)
        return (stack(X), stack(Y), stack(ZZ), stack(ZZZ), acc_inf)

    init = (jnp.zeros((16, 8, 128), jnp.uint32), jnp.zeros((16, 8, 128), jnp.uint32),
            jnp.zeros((16, 8, 128), jnp.uint32), jnp.zeros((16, 8, 128), jnp.uint32),
            jnp.ones((8, 128), jnp.uint32))
    X_a, Y_a, ZZ_a, ZZZ_a, _ = jax.lax.fori_loop(0, WINDOWS, body, init)
    x_ref[:, 0] = X_a
    y_ref[:, 0] = Y_a
    zz_ref[:, 0] = ZZ_a
    zzz_ref[:, 0] = ZZZ_a


@functools.lru_cache(maxsize=4)
def _smul_call(n: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = n // tile
    grid = (nb,)
    return pl.pallas_call(
        _smul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((32, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WINDOWS, TABLE_SIZE, 32), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, nb, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((16, nb, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((16, nb, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((16, nb, 8, 128), jnp.uint32),
        ],
    )


def scalar_mul_zz_pallas(digits, tile: int = TILE):
    """digits: (N, 32) uint32 byte-windows -> (X, Y, ZZ, ZZZ) as (N, 16)
    limb arrays, where the affine point is (X/ZZ, Y/ZZZ)."""
    n = digits.shape[0]
    assert n % tile == 0, f"batch {n} not divisible by tile {tile}"
    nb = n // tile
    digits_t = digits.T.reshape(32, nb, 8, 128)
    table = jnp.asarray(_table_f32())
    X, Y, ZZ, ZZZ = _smul_call(n, tile)(digits_t, table)

    def back(a):  # (16, nb, 8, 128) -> (N, 16)
        return a.reshape(16, n).T

    return back(X), back(Y), back(ZZ), back(ZZZ)


def to_affine_zz(X, Y, ZZ, ZZZ, chunk: int = 1024):
    """Affine (x, y) = (X/ZZ, Y/ZZZ) with ONE batched inversion:
    iT = 1/(ZZ*ZZZ); x = X*iT*ZZZ; y = Y*iT*ZZ."""
    from .field import fe_mul
    from .point import batch_inverse
    T = fe_mul(ZZ, ZZZ)
    iT = batch_inverse(T.reshape(-1, 16), chunk).reshape(T.shape)
    x = fe_mul(fe_mul(X, iT), ZZZ)
    y = fe_mul(fe_mul(Y, iT), ZZ)
    return x, y


def pallas_available() -> bool:
    try:
        import jax
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
