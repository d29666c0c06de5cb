"""MT19937 / MT19937-64 keystreams over seed lattices.

Bit-exact with vuke's rand_mt usage:
  - seeding is classic ``init_genrand`` (confirmed by the reference's own GPU
    shader, /root/reference/src/gpu/shaders/mt19937.wgsl:39-45);
  - key bytes are successive tempered outputs serialized **little-endian**
    (/root/reference/src/gpu/mt19937.rs:215-229 "matching rand_mt").

TPU-first design: instead of materializing the full 624-word state per seed
(the occupancy killer called out in the reference's own shader comments,
mt19937.wgsl:34-36), we only compute the state prefix the first K outputs
need — ``K + 398`` init-recurrence steps carried by a ``lax.scan`` whose
vector width is the whole seed batch.  The twist for output ``i`` touches
state words ``i``, ``i+1`` and ``i+397`` only.
"""

from __future__ import annotations

import numpy as np
from .._lazy import jax, jnp

from .common import (
    byteswap32, loop_unroll, u32, u64_add_const, u64_mul_const_lo, u64_shr,
    u64_xor, u64_and, u64_or, u64_const,
)

_F32 = np.uint32(1812433253)
_MATRIX_A = np.uint32(0x9908B0DF)
_UPPER = np.uint32(0x80000000)
_LOWER = np.uint32(0x7FFFFFFF)

_TEMPER_B = np.uint32(0x9D2C5680)
_TEMPER_C = np.uint32(0xEFC60000)


def mt19937_outputs(seeds, n_out: int = 8):
    """First ``n_out`` tempered MT19937 outputs for each 32-bit seed.

    seeds: (N,) uint32. Returns (N, n_out) uint32.
    """
    seeds = jnp.asarray(seeds, dtype=jnp.uint32)
    n_state = n_out + 397 + 1  # state indices 0 .. n_out+397

    def init_step(prev, i):
        cur = _F32 * (prev ^ (prev >> np.uint32(30))) + i
        return cur, cur

    n_init = min(n_state, 624)
    idx = jnp.arange(1, n_init, dtype=jnp.uint32)
    _, rest = jax.lax.scan(init_step, seeds, idx, unroll=loop_unroll(64))
    # state: list of (N,) arrays holding the true MT sequence s[k]
    state = [seeds] + [rest[i] for i in range(n_init - 1)]
    # Raw init-recurrence values are only the sequence for k < 624; beyond
    # that, extend with the real twist: s[k] = s[k-227] ^ twistbits(
    # s[k-624], s[k-623]) — so outputs past index 226 (cascades with >28
    # targets) stay bit-exact with rand_mt.
    for k in range(624, n_state):
        y = (state[k - 624] & _UPPER) | (state[k - 623] & _LOWER)
        state.append(state[k - 227] ^ (y >> np.uint32(1))
                     ^ jnp.where((y & 1) != 0, _MATRIX_A, np.uint32(0)))

    outs = []
    for i in range(n_out):
        y = (state[i] & _UPPER) | (state[i + 1] & _LOWER)
        x = state[i + 397] ^ (y >> np.uint32(1)) ^ jnp.where((y & 1) != 0, _MATRIX_A, np.uint32(0))
        # temper
        x = x ^ (x >> np.uint32(11))
        x = x ^ ((x << np.uint32(7)) & _TEMPER_B)
        x = x ^ ((x << np.uint32(15)) & _TEMPER_C)
        x = x ^ (x >> np.uint32(18))
        outs.append(x)
    return jnp.stack(outs, axis=-1)


def milksad_key_words(seeds, n_keys: int = 1):
    """MT19937 32-byte key(s) as (N, n_keys, 8) big-endian uint32 words.

    Key bytes = 8 consecutive outputs each serialized little-endian
    (rand_mt ``fill_bytes``), so BE key words = byteswap(output).
    Successive keys (cascade semantics, /root/reference/src/analyze/
    milksad.rs:277-296) reuse the same keystream.

    Tile-aligned single-key batches on TPU backends dispatch to the Pallas
    kernel (register-resident init recurrence, ~40x the scan version).
    """
    seeds = jnp.asarray(seeds, dtype=jnp.uint32)
    if n_keys == 1 and seeds.ndim == 1 and seeds.shape[0] % 1024 == 0:
        from ..ecc.pubkey import use_pallas_default
        if use_pallas_default():
            from .pallas_kernels import milksad_key_words_pallas
            return milksad_key_words_pallas(seeds)[:, None, :]
    outs = mt19937_outputs(seeds, n_out=8 * n_keys)
    words = byteswap32(outs)
    return words.reshape(words.shape[:-1] + (n_keys, 8))


# ---------------------------------------------------------------------------
# MT19937-64
# ---------------------------------------------------------------------------

_F64 = 6364136223846793005
_MATRIX_A64 = u64_const(0xB5026F5AA96619E9)
_UPPER64 = u64_const(0xFFFFFFFF80000000)
_LOWER64 = u64_const(0x000000007FFFFFFF)


def mt19937_64_outputs(seeds_hi, seeds_lo, n_out: int = 4):
    """First ``n_out`` tempered MT19937-64 outputs per 64-bit seed.

    seeds as (hi, lo) uint32 pairs, shape (N,).
    Returns (out_hi, out_lo): each (N, n_out) uint32.
    """
    seeds_hi = jnp.asarray(seeds_hi, dtype=jnp.uint32)
    seeds_lo = jnp.asarray(seeds_lo, dtype=jnp.uint32)
    n_state = n_out + 156 + 1

    def init_step(prev, i):
        x = u64_xor(prev, u64_shr(prev, 62))
        x = u64_mul_const_lo(x, _F64)
        x = (x[0], x[1] + i)
        x = (x[0] + (x[1] < i).astype(jnp.uint32), x[1])
        return x, x

    n_init = min(n_state, 312)
    idx = jnp.arange(1, n_init, dtype=jnp.uint32)
    _, rest = jax.lax.scan(init_step, (seeds_hi, seeds_lo), idx, unroll=loop_unroll(32))
    state = [(seeds_hi, seeds_lo)] + [(rest[0][i], rest[1][i]) for i in range(n_init - 1)]
    # True twist past the 312-word init block (outputs beyond index 155 —
    # mt64 cascades with >38 targets): s[k] = s[k-156] ^ twistbits(
    # s[k-312], s[k-311]).
    for k in range(312, n_state):
        y = u64_or(u64_and(state[k - 312], _UPPER64),
                   u64_and(state[k - 311], _LOWER64))
        mag = jnp.where((y[1] & 1) != 0, np.uint32(1), np.uint32(0))
        mag = (mag * _MATRIX_A64[0], mag * _MATRIX_A64[1])
        state.append(u64_xor(u64_xor(state[k - 156], u64_shr(y, 1)), mag))

    outs_hi, outs_lo = [], []
    for i in range(n_out):
        y = u64_or(u64_and(state[i], _UPPER64), u64_and(state[i + 1], _LOWER64))
        mag = jnp.where((y[1] & 1) != 0, np.uint32(1), np.uint32(0))
        mag = (mag * _MATRIX_A64[0], mag * _MATRIX_A64[1])
        x = u64_xor(u64_xor(state[i + 156], u64_shr(y, 1)), mag)
        # temper (MT19937-64)
        x = u64_xor(x, u64_and(u64_shr(x, 29), u64_const(0x5555555555555555)))
        x = u64_xor(x, u64_and(_shl(x, 17), u64_const(0x71D67FFFEDA60000)))
        x = u64_xor(x, u64_and(_shl(x, 37), u64_const(0xFFF7EEE000000000)))
        x = u64_xor(x, u64_shr(x, 43))
        outs_hi.append(x[0])
        outs_lo.append(x[1])
    return jnp.stack(outs_hi, axis=-1), jnp.stack(outs_lo, axis=-1)


def _shl(a, n):
    from .common import u64_shl
    return u64_shl(a, n)


def mt64_key_words(seeds_hi, seeds_lo):
    """MT19937-64 32-byte key as (N, 8) big-endian uint32 words.

    Mirrors /root/reference/src/mt64.rs:15-20: ``Mt64::new(seed)``,
    ``fill_bytes(32)`` — 4 outputs serialized little-endian each.
    An output u64 v -> bytes LE -> BE words: word0 = byteswap(lo),
    word1 = byteswap(hi).
    """
    hi, lo = mt19937_64_outputs(seeds_hi, seeds_lo, n_out=4)
    # interleave: for each output j: [swap(lo_j), swap(hi_j)]
    parts = []
    for j in range(4):
        parts.append(byteswap32(lo[..., j]))
        parts.append(byteswap32(hi[..., j]))
    return jnp.stack(parts, axis=-1)
