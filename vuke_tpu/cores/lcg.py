"""LCG keystreams (glibc / MINSTD / MSVC / Borland) over seed lattices.

Bit-exact with vuke's core (/root/reference/src/lcg.rs:66-128):
``next = (a*state + c) mod m`` computed in u64, key = 8 successive outputs,
4 bytes each, big- or little-endian.

TPU-first: everything in uint32 lanes.  For power-of-two moduli the step is
a single wrapping 32-bit multiply-add (+ mask for 2^31).  For MINSTD
(m = 2^31 - 1, a Mersenne prime) the 46-bit product is folded with
``x mod (2^31-1) = (x & M) + (x >> 31)`` applied twice.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from .._lazy import jnp

from .common import byteswap32, mul_hi32

_M31 = np.uint32(0x7FFFFFFF)


@dataclass(frozen=True)
class LcgVariant:
    name: str
    a: int
    c: int
    m: int  # 2**31, 2**32, or 2**31 - 1

    @property
    def max_seed(self) -> int:
        return self.m - 1


GLIBC = LcgVariant("glibc", 1103515245, 12345, 1 << 31)
MINSTD = LcgVariant("minstd", 16807, 0, (1 << 31) - 1)
MSVC = LcgVariant("msvc", 214013, 2531011, 1 << 32)
BORLAND = LcgVariant("borland", 22695477, 1, 1 << 32)

ALL_VARIANTS = (GLIBC, MINSTD, MSVC, BORLAND)
VARIANTS_BY_NAME = {v.name: v for v in ALL_VARIANTS}


def lcg_next(state, variant: LcgVariant):
    """One LCG step on uint32 state arrays (state < m assumed, except the
    initial seed which may be any u32 — the reference feeds raw u32 seeds
    through the same formula, /root/reference/src/lcg.rs:113-118)."""
    a = np.uint32(variant.a)
    c = np.uint32(variant.c)
    if variant.m == 1 << 32:
        return state * a + c
    if variant.m == 1 << 31:
        return (state * a + c) & _M31
    # MINSTD: m = 2^31 - 1.  Full 64-bit product (a*state fits 46 bits; +c=0).
    lo = state * a
    hi = mul_hi32(state, jnp.broadcast_to(a, state.shape))
    # x = hi*2^32 + lo ; 2^32 ≡ 2 (mod 2^31-1)
    t = hi * np.uint32(2) + (lo & _M31) + (lo >> np.uint32(31))
    t = (t & _M31) + (t >> np.uint32(31))
    t = (t & _M31) + (t >> np.uint32(31))
    # result in [0, 2^31-1]; canonical form: 2^31-1 ≡ 0
    return jnp.where(t == _M31, np.uint32(0), t)


def lcg_key_words(seeds, variant: LcgVariant, big_endian: bool = True):
    """32-byte key as (N, 8) big-endian uint32 words.

    8 successive outputs, each serialized per ``endian``
    (/root/reference/src/lcg.rs:114-128).
    """
    state = jnp.asarray(seeds, dtype=jnp.uint32)
    outs = []
    for _ in range(8):
        state = lcg_next(state, variant)
        outs.append(state if big_endian else byteswap32(state))
    return jnp.stack(outs, axis=-1)
