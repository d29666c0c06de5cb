"""RIPEMD-160 over uint32 lanes (batch-vectorized).

Used for hash160 = RIPEMD160(SHA256(pubkey)) — the device-side address
fingerprint.  Little-endian word convention like MD5.

Mirrors the hash160 the bitcoin crate computes inside vuke's address
derivation (/root/reference/src/derive.rs:111-118).
"""

from __future__ import annotations

import numpy as np
from .._lazy import jnp

from .common import loop_unroll, rotl32, u32

_IV = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0],
               dtype=np.uint32)

# message word order, left line
_RL = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13,
]
# message word order, right line
_RR = [
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11,
]
# rotation amounts, left line
_SL = [
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6,
]
# rotation amounts, right line
_SR = [
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11,
]

_KL = np.array([0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E],
               dtype=np.uint32)
_KR = np.array([0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000],
               dtype=np.uint32)


def _f(j, x, y, z):
    if j < 16:
        return x ^ y ^ z
    if j < 32:
        return (x & y) | (~x & z)
    if j < 48:
        return (x | ~y) ^ z
    if j < 64:
        return (x & z) | (y & ~z)
    return x ^ (y | ~z)


def _rotl_var(x, n):
    """rotl by a traced (uint32 scalar) amount."""
    n = n & np.uint32(31)
    return (x << n) | (x >> ((np.uint32(32) - n) & np.uint32(31)))


def _f_switch(rnd, x, y, z):
    from .._lazy import jax
    return jax.lax.switch(rnd, [
        lambda x, y, z: x ^ y ^ z,
        lambda x, y, z: (x & y) | (~x & z),
        lambda x, y, z: (x | ~y) ^ z,
        lambda x, y, z: (x & z) | (y & ~z),
        lambda x, y, z: x ^ (y | ~z),
    ], x, y, z)


def compress(state, m, unroll: bool = False):
    """One RIPEMD-160 compression (rolled 80-iteration loop by default —
    compiles ~50x smaller, see sha256.compress)."""
    if unroll:
        return _compress_unrolled(state, m)
    from .._lazy import jax

    M = jnp.stack(list(m), axis=0)  # (16, ...batch)
    RL = jnp.asarray(np.array(_RL, dtype=np.int32))
    RR = jnp.asarray(np.array(_RR, dtype=np.int32))
    SL = jnp.asarray(np.array(_SL, dtype=np.uint32))
    SR = jnp.asarray(np.array(_SR, dtype=np.uint32))
    KL = jnp.asarray(_KL)
    KR = jnp.asarray(_KR)

    vzero = m[0] * np.uint32(0)                 # varying-safe zero
    h0, h1, h2, h3, h4 = (x + vzero for x in state)

    def round_fn(j, carry):
        al, bl, cl, dl, el, ar, br, cr, dr, er = carry
        rnd = j // 16
        ml = jax.lax.dynamic_index_in_dim(M, RL[j], 0, False)
        mr = jax.lax.dynamic_index_in_dim(M, RR[j], 0, False)
        t = _rotl_var(al + _f_switch(rnd, bl, cl, dl) + ml + KL[rnd], SL[j]) + el
        al, el, dl, cl, bl = el, dl, rotl32(cl, 10), bl, t
        t = _rotl_var(ar + _f_switch(4 - rnd, br, cr, dr) + mr + KR[rnd], SR[j]) + er
        ar, er, dr, cr, br = er, dr, rotl32(cr, 10), br, t
        return (al, bl, cl, dl, el, ar, br, cr, dr, er)

    init = (h0, h1, h2, h3, h4, h0, h1, h2, h3, h4)
    al, bl, cl, dl, el, ar, br, cr, dr, er = jax.lax.fori_loop(0, 80, round_fn,
                                                               init, unroll=loop_unroll(16))
    t = h1 + cl + dr
    h1 = h2 + dl + er
    h2 = h3 + el + ar
    h3 = h4 + al + br
    h4 = h0 + bl + cr
    h0 = t
    return (h0, h1, h2, h3, h4)


def _compress_unrolled(state, m):
    h0, h1, h2, h3, h4 = state
    al, bl, cl, dl, el = h0, h1, h2, h3, h4
    ar, br, cr, dr, er = h0, h1, h2, h3, h4
    for j in range(80):
        rnd = j // 16
        t = rotl32(al + _f(j, bl, cl, dl) + m[_RL[j]] + np.uint32(_KL[rnd]), _SL[j]) + el
        al, el, dl, cl, bl = el, dl, rotl32(cl, 10), bl, t
        t = rotl32(ar + _f(79 - j, br, cr, dr) + m[_RR[j]] + np.uint32(_KR[rnd]), _SR[j]) + er
        ar, er, dr, cr, br = er, dr, rotl32(cr, 10), br, t
    t = h1 + cl + dr
    h1 = h2 + dl + er
    h2 = h3 + el + ar
    h3 = h4 + al + br
    h4 = h0 + bl + cr
    h0 = t
    return (h0, h1, h2, h3, h4)


def ripemd160_blocks(blocks):
    """blocks: (..., B, 16) uint32 LE words -> (..., 5) uint32 digest words."""
    nblocks = blocks.shape[-2]
    batch_shape = blocks.shape[:-2]
    state = tuple(jnp.broadcast_to(u32(_IV[i]), batch_shape) for i in range(5))
    for b in range(nblocks):
        m = [blocks[..., b, i] for i in range(16)]
        state = compress(state, m)
    return jnp.stack(state, axis=-1)


def pad_message(data: bytes) -> np.ndarray:
    ml = len(data)
    padded = data + b"\x80"
    padded += b"\x00" * ((-(len(padded) + 8)) % 64)
    padded += (ml * 8 & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    arr = np.frombuffer(padded, dtype="<u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def digest_words_to_bytes(words) -> bytes:
    w = np.asarray(words, dtype=np.uint32)
    return w.astype("<u4").tobytes()


def ripemd160_of_sha256_words(digest_words):
    """RIPEMD-160 of a 32-byte SHA-256 digest given as (..., 8) uint32 BE
    words — the hash160 inner step.  Builds the single padded LE block on
    device and returns (..., 5) uint32 LE digest words.
    """
    from .common import byteswap32

    batch_shape = digest_words.shape[:-1]

    def const(v):
        return jnp.broadcast_to(u32(np.uint32(v)), batch_shape)

    # message = 32 bytes: LE words of the digest bytes = byteswap of BE words
    m = [byteswap32(digest_words[..., i]) for i in range(8)]
    m.append(const(0x00000080))  # 0x80 terminator, LE word
    m.extend(const(0) for _ in range(5))
    m.append(const(256))         # bit length, low word (LE)
    m.append(const(0))
    state = tuple(jnp.broadcast_to(u32(_IV[i]), batch_shape) for i in range(5))
    state = compress(state, m)
    return jnp.stack(state, axis=-1)
