"""Pallas TPU kernels: Montgomery batch inversion + affine conversion.

Round 4's compile-time profile (.bench_logs/compile_profile_r4.*) found
the pipeline's 26-33-minute cold compile lives almost entirely in the
XLA-staged inversion/affine graph (`tiled._batch_inverse_tiles` +
`tiled._affine16`): the grouped Montgomery scans, the 30 unrolled
cross-group combines and the Fermat chain expand to ~10^5 HLO ops that
XLA:TPU fusion chews on for half an hour — while every Pallas kernel in
the same pipeline (26-window scalar-mul included) Mosaic-compiles in
**seconds**.  Moving the inversion + affine into Pallas removes the
compile-time cliff at the source and keeps the whole tail VMEM-resident.

Three kernels over the tile layout (rows, nb, 8, 128), all reusing the
16-bit limb-row field ops from pallas_smul:

1. ``fwd``: sequential grid over tiles; computes T_i = ZZ_i * ZZZ_i and
   the running Montgomery prefix (P_i = T_0..T_{i-1}, carried in VMEM
   scratch across grid steps — TPU grids execute in order), emitting
   P_i, T_i per tile and the grand product.
2. ``fermat``: one Fermat inversion (x^(p-2), 255 squarings + 14 muls)
   of the single grand-product tile — the same addition chain as
   `tiled._fe_inv_rows`, Mosaic-compiled instead of XLA-unrolled.
3. ``bwd``: reverse sequential grid; carries the running inverse
   suffix, recovers each tile's inv(T_i) = carry * P_i, and finishes
   the affine conversion in-kernel: x = X*inv*ZZZ, y = Y*inv*ZZ, both
   canonically normalized.

Outputs are bit-identical to the XLA path (`tiled._affine16`): canonical
field elements don't depend on the product/scan grouping, and
tests/test_pallas_ecc.py pins lane-for-lane equality.

The XLA path remains the CPU/fallback implementation (fast test tier,
--no-tpu backend); `tiled._affine16` dispatches here when Mosaic is
available (env VUKE_TPU_PALLAS_INV=0 opts out).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ref
from .pallas_smul import _mul_t

_P_LIMBS16 = [np.uint32((ref.P >> (16 * i)) & 0xFFFF) for i in range(16)]


def _normalize16(rows):
    """Canonical representative (inputs < 2^256 < 2p: one conditional
    subtract).  Same math as tiled._fe_normalize_rows but built purely
    from comparisons and boolean algebra — jnp.zeros_like(.., dtype=bool)
    lowers to a u32->i1 truncation Mosaic rejects ("Unsupported target
    bitwidth for truncation")."""
    ge = decided = None
    for i in range(15, -1, -1):
        gt = rows[i] > _P_LIMBS16[i]
        lt = rows[i] < _P_LIMBS16[i]
        if ge is None:
            ge, decided = gt, gt | lt
        else:
            ge = ge | (gt & ~decided)
            decided = decided | gt | lt
    ge = ge | ~decided                   # == p exactly -> subtract to 0
    sub = []
    borrow = rows[0] * np.uint32(0)
    for i in range(16):
        t = rows[i] - _P_LIMBS16[i] - borrow
        sub.append(t & np.uint32(0xFFFF))
        borrow = (t >> np.uint32(16)) & np.uint32(1)
    return [jnp.where(ge, sub[i], rows[i]) for i in range(16)]


def _rows(a):
    """(16, 1, 8, 128) or (16, 8, 128) ref/array -> list of 16 (8,128) rows."""
    if a.ndim == 4:
        return [a[i, 0] for i in range(16)]
    return [a[i] for i in range(16)]


def _stack(rs):
    return jnp.stack(rs, axis=0)


def _one_rows():
    return [jnp.full((8, 128), np.uint32(1 if i == 0 else 0), dtype=jnp.uint32)
            for i in range(16)]


def _fwd_kernel(zz_ref, zzz_ref, pre_ref, t_ref, tot_ref, acc):
    """Montgomery forward pass.  pre[i] = T_0..T_{i-1}; t[i] = ZZ_i*ZZZ_i;
    tot (constant-index output block) ends as the grand product."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = _stack(_one_rows())

    a = _rows(acc)
    pre_ref[:, 0] = _stack(a)
    t = _mul_t(_rows(zz_ref), _rows(zzz_ref))
    t_ref[:, 0] = _stack(t)
    na = _stack(_mul_t(a, t))
    acc[...] = na
    tot_ref[:, 0] = na          # kept in VMEM; final grid step's value lands


def _fermat_kernel(tot_ref, inv_ref):
    """inv = tot^(p-2): the sqr/mul addition chain of tiled._fe_inv_rows,
    fori_loop-rolled so Mosaic compiles a handful of bodies."""

    def sqr_k(x, k):
        def body(_, v):
            vs = [v[j] for j in range(16)]
            return _stack(_mul_t(vs, vs))
        return [v for v in jax.lax.fori_loop(0, k, body, _stack(x))]

    def mul(x, y):
        return _mul_t(list(x), list(y))

    x1 = _rows(tot_ref)
    x2 = mul(sqr_k(x1, 1), x1)
    x3 = mul(sqr_k(x2, 1), x1)
    x6 = mul(sqr_k(x3, 3), x3)
    x9 = mul(sqr_k(x6, 3), x3)
    x11 = mul(sqr_k(x9, 2), x2)
    x22 = mul(sqr_k(x11, 11), x11)
    x44 = mul(sqr_k(x22, 22), x22)
    x88 = mul(sqr_k(x44, 44), x44)
    x176 = mul(sqr_k(x88, 88), x88)
    x220 = mul(sqr_k(x176, 44), x44)
    x223 = mul(sqr_k(x220, 3), x3)
    t = mul(sqr_k(x223, 23), x22)
    t = mul(sqr_k(t, 5), x1)
    t = mul(sqr_k(t, 3), x2)
    t = mul(sqr_k(t, 2), x1)
    inv_ref[...] = _stack(t)


def _bwd_kernel(x_ref, y_ref, zz_ref, zzz_ref, pre_ref, t_ref, itot_ref,
                xo_ref, yo_ref, ia):
    """Reverse pass + affine: iT_i = carry * P_i; carry *= T_i;
    x = X*iT*ZZZ, y = Y*iT*ZZ, canonically normalized."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ia[...] = itot_ref[...]

    a = _rows(ia)
    iT = _mul_t(a, _rows(pre_ref))
    ia[...] = _stack(_mul_t(a, _rows(t_ref)))
    x = _normalize16(_mul_t(_mul_t(_rows(x_ref), iT), _rows(zzz_ref)))
    y = _normalize16(_mul_t(_mul_t(_rows(y_ref), iT), _rows(zz_ref)))
    xo_ref[:, 0] = _stack(x)
    yo_ref[:, 0] = _stack(y)


@functools.lru_cache(maxsize=4)
def _inv_affine_calls(nb: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def blk(i):           # per-tile block, forward order
        return pl.BlockSpec((16, 1, 8, 128), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_rev():        # per-tile block, reverse order
        return pl.BlockSpec((16, 1, 8, 128), lambda i: (0, nb - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_const3():     # whole (16, 8, 128) value, same block every step
        return pl.BlockSpec((16, 8, 128), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk_whole3():     # whole (16, 8, 128) value, gridless kernel
        return pl.BlockSpec((16, 8, 128), lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    tile4 = jax.ShapeDtypeStruct((16, nb, 8, 128), jnp.uint32)
    tile3 = jax.ShapeDtypeStruct((16, 8, 128), jnp.uint32)

    fwd = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        in_specs=[blk(0), blk(0)],
        out_specs=[blk(0), blk(0),
                   pl.BlockSpec((16, 1, 8, 128), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[tile4, tile4,
                   jax.ShapeDtypeStruct((16, 1, 8, 128), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((16, 8, 128), jnp.uint32)],
        interpret=interpret,
    )

    fermat = pl.pallas_call(
        _fermat_kernel,
        in_specs=[blk_whole3()],
        out_specs=blk_whole3(),
        out_shape=tile3,
        interpret=interpret,
    )

    bwd = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        in_specs=[blk_rev(), blk_rev(), blk_rev(), blk_rev(), blk_rev(),
                  blk_rev(), blk_const3()],
        out_specs=[blk_rev(), blk_rev()],
        out_shape=[tile4, tile4],
        scratch_shapes=[pltpu.VMEM((16, 8, 128), jnp.uint32)],
        interpret=interpret,
    )
    return fwd, fermat, bwd


def _seq_madd_kernel(ox_ref, oy_ref, bx_ref, by_ref,
                     x_ref, y_ref, zz_ref, zzz_ref):
    """Affine+affine mixed addition P = B + O per lane (the sequential-scan
    hot op, ecc/incremental.py): dx = ox-bx, dy = oy-by, ZZ = dx^2,
    ZZZ = dx^3, X3 = dy^2 - (bx+ox)*ZZ, Y3 = dy*(bx*ZZ - X3) - by*ZZZ.
    Same 16-bit row algebra as the XLA form (bit-identical); in Pallas
    because the ~17k-op XLA graph cold-compiled for >900s."""
    from .pallas_smul import _add_t, _sub_t

    ox = _rows(ox_ref)
    oy = _rows(oy_ref)
    bx = _rows(bx_ref)
    by = _rows(by_ref)
    dx = _sub_t(ox, bx)
    dy = _sub_t(oy, by)
    zz = _mul_t(dx, dx)
    zzz = _mul_t(zz, dx)
    x3 = _sub_t(_mul_t(dy, dy), _mul_t(_add_t(ox, bx), zz))
    y3 = _sub_t(_mul_t(dy, _sub_t(_mul_t(bx, zz), x3)), _mul_t(by, zzz))
    x_ref[:, 0] = _stack(x3)
    y_ref[:, 0] = _stack(y3)
    zz_ref[:, 0] = _stack(zz)
    zzz_ref[:, 0] = _stack(zzz)


@functools.lru_cache(maxsize=4)
def _seq_madd_call(nb: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = pl.BlockSpec((16, 1, 8, 128), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = pl.BlockSpec((16, 8, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    t4 = jax.ShapeDtypeStruct((16, nb, 8, 128), jnp.uint32)
    return pl.pallas_call(
        _seq_madd_kernel,
        grid=(nb,),
        in_specs=[tile, tile, const, const],
        out_specs=[tile] * 4,
        out_shape=[t4] * 4,
        interpret=interpret,
    )


def seq_madd_pallas(offx, offy, bx16, by16, interpret: bool = False):
    """(16, nb, 8, 128) offset tables + (16,) base limb arrays ->
    (X3, Y3, ZZ, ZZZ) stacks for the shared inversion/affine tail."""
    nb = offx.shape[1]
    bx = jnp.broadcast_to(jnp.asarray(bx16)[:, None, None], (16, 8, 128))
    by = jnp.broadcast_to(jnp.asarray(by16)[:, None, None], (16, 8, 128))
    return _seq_madd_call(nb, interpret)(offx, offy, bx, by)


def use_pallas_inv() -> bool:
    """Pallas inversion+affine on Mosaic-capable backends (the XLA graph
    version cold-compiles for ~30 minutes; this compiles in seconds)."""
    import os
    if os.environ.get("VUKE_TPU_PALLAS_INV", "1") in ("0", "false", "no"):
        return False
    from .pubkey import use_pallas_default
    return use_pallas_default()


def affine16_pallas(X, Y, ZZ, ZZZ, interpret: bool = False):
    """(16, nb, 8, 128) uint32 stacks (or row lists) -> canonical affine
    (x, y) row lists; bit-identical to tiled._affine16."""
    def as_stack(a):
        return a if hasattr(a, "ndim") else jnp.stack(list(a), axis=0)

    X, Y, ZZ, ZZZ = map(as_stack, (X, Y, ZZ, ZZZ))
    nb = X.shape[1]
    fwd, fermat, bwd = _inv_affine_calls(nb, interpret)
    pre, t, tot = fwd(ZZ, ZZZ)
    itot = fermat(tot[:, 0])
    x, y = bwd(X, Y, ZZ, ZZZ, pre, t, itot)
    return [x[i] for i in range(16)], [y[i] for i in range(16)]
