"""Xorshift family keystreams over seed lattices.

Bit-exact with vuke's core (/root/reference/src/xorshift.rs):
  - xorshift64: shifts 13/7/17, zero seed -> 1, outputs serialized BE
  - xorshift128: 32-bit lanes x,y,z,w seeded (seed_lo, seed_hi,
    seed_lo^0x12345678, (seed>>32)^0x87654321 truncated), outputs BE
  - xorshift128+ / xoroshiro128**: state seeded via two splitmix64 steps
    (s0 = sm64(seed), s1 = sm64(s0)), outputs BE
All math in uint32 lanes; u64 values as (hi, lo) pairs.
"""

from __future__ import annotations

import numpy as np
from .._lazy import jnp

from .common import (
    u64_add, u64_const, u64_mul_const_lo, u64_mul_lo, u64_rotl, u64_shl,
    u64_shr, u64_xor,
)


def splitmix64(x):
    """One splitmix64 step on a u64 pair (/root/reference/src/xorshift.rs:
    splitmix64)."""
    x = u64_add(x, _bc(u64_const(0x9E3779B97F4A7C15), x))
    x = u64_mul_const_lo(u64_xor(x, u64_shr(x, 30)), 0xBF58476D1CE4E5B9)
    x = u64_mul_const_lo(u64_xor(x, u64_shr(x, 27)), 0x94D049BB133111EB)
    return u64_xor(x, u64_shr(x, 31))


def _bc(c, like):
    return (jnp.broadcast_to(c[0], like[0].shape), jnp.broadcast_to(c[1], like[1].shape))


def _nonzero_seed(hi, lo):
    z = (hi == 0) & (lo == 0)
    return hi, jnp.where(z, np.uint32(1), lo)


def xorshift64_keystream_words(seeds_hi, seeds_lo, n_keys: int = 1):
    """(N,) u64 seeds -> (N, n_keys, 8) BE key words (sequential keystream)."""
    hi, lo = _nonzero_seed(jnp.asarray(seeds_hi, jnp.uint32), jnp.asarray(seeds_lo, jnp.uint32))
    s = (hi, lo)
    words = []
    for _ in range(4 * n_keys):
        s = u64_xor(s, u64_shl(s, 13))
        s = u64_xor(s, u64_shr(s, 7))
        s = u64_xor(s, u64_shl(s, 17))
        words.append(s[0])  # BE serialization: high word first
        words.append(s[1])
    out = jnp.stack(words, axis=-1)
    return out.reshape(out.shape[:-1] + (n_keys, 8))


def xorshift64_key_words(seeds_hi, seeds_lo):
    return xorshift64_keystream_words(seeds_hi, seeds_lo, 1)[..., 0, :]


def xorshift128_keystream_words(seeds_hi, seeds_lo, n_keys: int = 1):
    """(N,) u64 seeds -> (N, n_keys, 8) BE key words (sequential keystream)."""
    hi, lo = _nonzero_seed(jnp.asarray(seeds_hi, jnp.uint32), jnp.asarray(seeds_lo, jnp.uint32))
    x = lo
    y = hi
    z = lo ^ np.uint32(0x12345678)
    w = hi ^ np.uint32(0x87654321)
    outs = []
    for _ in range(8 * n_keys):
        t = x ^ (x << np.uint32(11))
        x, y, z = y, z, w
        w = (w ^ (w >> np.uint32(19))) ^ (t ^ (t >> np.uint32(8)))
        outs.append(w)
    out = jnp.stack(outs, axis=-1)
    return out.reshape(out.shape[:-1] + (n_keys, 8))


def xorshift128_key_words(seeds_hi, seeds_lo):
    return xorshift128_keystream_words(seeds_hi, seeds_lo, 1)[..., 0, :]


def _xoroshiro_state(seeds_hi, seeds_lo):
    hi, lo = _nonzero_seed(jnp.asarray(seeds_hi, jnp.uint32), jnp.asarray(seeds_lo, jnp.uint32))
    s0 = splitmix64((hi, lo))
    s1 = splitmix64(s0)
    return s0, s1


def _xoroshiro_advance(s0, s1):
    s1 = u64_xor(s1, s0)
    new_s0 = u64_xor(u64_xor(u64_rotl(s0, 24), s1), u64_shl(s1, 16))
    new_s1 = u64_rotl(s1, 37)
    return new_s0, new_s1


def xorshift128plus_keystream_words(seeds_hi, seeds_lo, n_keys: int = 1):
    """(N,) u64 seeds -> (N, n_keys, 8) BE key words.

    Note: despite the name, vuke's "xorshift128+" uses the xoroshiro128 state
    transition with additive scrambling (/root/reference/src/xorshift.rs:
    Xorshift128Plus::next).
    """
    s0, s1 = _xoroshiro_state(seeds_hi, seeds_lo)
    words = []
    for _ in range(4 * n_keys):
        r = u64_add(s0, s1)
        words.append(r[0])
        words.append(r[1])
        s0, s1 = _xoroshiro_advance(s0, s1)
    out = jnp.stack(words, axis=-1)
    return out.reshape(out.shape[:-1] + (n_keys, 8))


def xorshift128plus_key_words(seeds_hi, seeds_lo):
    return xorshift128plus_keystream_words(seeds_hi, seeds_lo, 1)[..., 0, :]


def xoroshiro128starstar_keystream_words(seeds_hi, seeds_lo, n_keys: int = 1):
    """(N,) u64 seeds -> (N, n_keys, 8) BE key words."""
    s0, s1 = _xoroshiro_state(seeds_hi, seeds_lo)
    words = []
    for _ in range(4 * n_keys):
        r = u64_mul_const_lo(u64_rotl(u64_mul_const_lo(s0, 5), 7), 9)
        words.append(r[0])
        words.append(r[1])
        s0, s1 = _xoroshiro_advance(s0, s1)
    out = jnp.stack(words, axis=-1)
    return out.reshape(out.shape[:-1] + (n_keys, 8))


def xoroshiro128starstar_key_words(seeds_hi, seeds_lo):
    return xoroshiro128starstar_keystream_words(seeds_hi, seeds_lo, 1)[..., 0, :]


VARIANT_NAMES = ("xorshift64", "xorshift128", "xorshift128+", "xoroshiro128**")

KEY_FNS = {
    "xorshift64": xorshift64_key_words,
    "xorshift128": xorshift128_key_words,
    "xorshift128+": xorshift128plus_key_words,
    "xoroshiro128**": xoroshiro128starstar_key_words,
}

KEYSTREAM_FNS = {
    "xorshift64": xorshift64_keystream_words,
    "xorshift128": xorshift128_keystream_words,
    "xorshift128+": xorshift128plus_keystream_words,
    "xoroshiro128**": xoroshiro128starstar_keystream_words,
}
