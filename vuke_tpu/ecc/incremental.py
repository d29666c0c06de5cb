"""Sequential-scan derive: one point-add per key instead of a scalar-mul.

The reference's puzzle-scan hot path (range source x direct transform,
/root/reference/src/source/range.rs:36-70 + transform/direct.rs:12-35)
pushes every consecutive private key through a full secp256k1 scalar
multiplication (derive.rs:97-118).  For contiguous scalars that work is
redundant: with P_i = B + O_i, where B = (start-1)*G is one host-computed
base per superbatch and O_i = (i+1)*G comes from a device-resident table
built once per batch shape, each key costs ONE affine+affine point
addition (5M + 2S field muls) plus the shared batch-inversion/hash160
tail — ~20x fewer field multiplications than the 26-window fixed-base
scalar-mul (docs/KERNELS.md).

Exactness guardrails: the addition formula breaks only when B = +-O_i
(dx == 0) or B is the point at infinity.  Both need the base scalar
(start-1) mod n to land in [0, batch] or [n-batch, n); seeds are u64
(< 2^64 << n), so ``sequential_safe`` reduces to start >= batch + 2 and
the unsafe first superbatches take the regular scalar-mul path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import ref
from .pallas_smul import _add_t, _mul_t, _sub_t
from .tiled import _affine16, _hash_tail_t, affine_points_tiled


def limbs16(v: int) -> np.ndarray:
    """int -> (16,) uint32 array of 16-bit limbs (little-endian limbs)."""
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(16)],
                    dtype=np.uint32)


def sequential_safe(start: int, batch: int) -> bool:
    """True when the [start, start+batch) superbatch can use the
    incremental path: base scalar start-1 must stay clear of the offset
    scalars 1..batch (mod n) so dx != 0 and B != infinity on every lane.
    Seeds are u64 so only the low end can collide."""
    return start >= batch + 2 and start + batch < (1 << 64)


def sequential_core(bx16, by16, offx, offy):
    """(16,) base-point limb arrays + (16, nb, 8, 128) offset tables ->
    hash160/fragment dict (same shape as tiled._derive_core_t).

    Lane i of tile t holds B + (1024*t + i + 1)*G in (X, Y, ZZ, ZZZ)
    coordinates via the affine+affine mixed addition
        dx = ox - bx; dy = oy - by
        ZZ3 = dx^2; ZZZ3 = dx*ZZ3
        X3  = dy^2 - (bx + ox)*ZZ3
        Y3  = dy*(bx*ZZ3 - X3) - by*ZZZ3
    then the shared Montgomery-inversion + hash160 tail."""
    nb = offx.shape[1]
    n = nb * 1024
    from .pallas_inv import seq_madd_pallas, use_pallas_inv
    if use_pallas_inv():
        # Pallas point-add (bit-identical; the XLA form of this ~17k-op
        # graph cold-compiled >900s on the TPU — same cliff as the
        # inversion graph, same fix)
        x3, y3, zz, zzz = seq_madd_pallas(offx, offy, bx16, by16)
    else:
        bx = [bx16[i] for i in range(16)]     # () rows broadcast over lanes
        by = [by16[i] for i in range(16)]
        ox = [offx[i] for i in range(16)]
        oy = [offy[i] for i in range(16)]

        dx = _sub_t(ox, bx)
        dy = _sub_t(oy, by)
        zz = _mul_t(dx, dx)
        zzz = _mul_t(zz, dx)
        x3 = _sub_t(_mul_t(dy, dy), _mul_t(_add_t(ox, bx), zz))
        y3 = _sub_t(_mul_t(dy, _sub_t(_mul_t(bx, zz), x3)), _mul_t(by, zzz))
    x, y = _affine16(x3, y3, zz, zzz)
    return _hash_tail_t(x, y, n, nb)


_TABLE_CACHE: dict = {}


def offset_table(n: int, mesh=None):
    """Device-resident affine table of (i+1)*G for i in [0, n): two
    (16, nb, 8, 128) uint32 limb-row stacks (x, y), built once per batch
    shape with the regular tiled scalar-mul pipeline and cached for the
    process lifetime (~128 bytes/lane of HBM)."""
    key = (n, id(mesh) if mesh is not None else None)
    tab = _TABLE_CACHE.get(key)
    if tab is not None:
        return tab
    assert n % 1024 == 0
    words = np.zeros((n, 8), dtype=np.uint32)
    words[:, 7] = np.arange(1, n + 1, dtype=np.uint64).astype(np.uint32)
    if n >= (1 << 32):  # pragma: no cover - batches are far smaller
        words[:, 6] = (np.arange(1, n + 1, dtype=np.uint64) >> 32).astype(np.uint32)
    x, y = jax.jit(affine_points_tiled)(jnp.asarray(words))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ndev = mesh.devices.size
        nb = n // 1024
        spec = P(None, "seeds") if nb % ndev == 0 else P()
        x = jax.device_put(x, NamedSharding(mesh, spec))
        y = jax.device_put(y, NamedSharding(mesh, spec))
    x, y = jax.block_until_ready(x), jax.block_until_ready(y)
    _TABLE_CACHE[key] = (x, y)
    return x, y


class BaseStepper:
    """Per-superbatch base point (start-1)*G, stepped incrementally on the
    host: consecutive superbatches advance by one affine point addition
    (batch*G is precomputed) instead of a fresh scalar-mul."""

    def __init__(self, batch: int):
        self.batch = batch
        self._step = ref.point_mul(batch)
        self._at: Optional[int] = None
        self._pt = None

    def base_for(self, start: int):
        """Affine (x, y) of (start-1)*G."""
        if self._at is not None and start == self._at + self.batch:
            pt = ref.point_add(self._pt, self._step)
        else:
            pt = ref.point_mul(start - 1)
        self._at, self._pt = start, pt
        return pt
