"""MD5 over uint32 lanes (batch-vectorized).

MD5 uses little-endian words; blocks here are (..., 16) uint32 arrays whose
words are the little-endian interpretation of each 4-byte group.  The digest
is returned as 4 uint32 little-endian words (state A,B,C,D); serializing each
word little-endian yields the standard 16-byte digest.

Mirrors vuke's md-5 crate usage (/root/reference/src/transform/md5.rs:13-22).
"""

from __future__ import annotations

import math

import numpy as np
from .._lazy import jnp

from .common import loop_unroll, rotl32, u32

_K = np.array([int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
              dtype=np.uint32)

_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4

_IV = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476], dtype=np.uint32)


_G = [i if i < 16 else (5 * i + 1) % 16 if i < 32 else (3 * i + 5) % 16 if i < 48
      else (7 * i) % 16 for i in range(64)]


def _rotl_var(x, n):
    n = n & np.uint32(31)
    return (x << n) | (x >> ((np.uint32(32) - n) & np.uint32(31)))


def compress(state, m, unroll: bool = False):
    """One MD5 compression (rolled 64-iteration loop by default)."""
    if unroll:
        return _compress_unrolled(state, m)
    from .._lazy import jax

    M = jnp.stack(list(m), axis=0)
    K = jnp.asarray(_K)
    S = jnp.asarray(np.array(_S, dtype=np.uint32))
    G = jnp.asarray(np.array(_G, dtype=np.int32))

    def round_fn(i, carry):
        A, B, C, D = carry
        f = jax.lax.switch(i // 16, [
            lambda B, C, D: (B & C) | (~B & D),
            lambda B, C, D: (D & B) | (~D & C),
            lambda B, C, D: B ^ C ^ D,
            lambda B, C, D: C ^ (B | ~D),
        ], B, C, D)
        mg = jax.lax.dynamic_index_in_dim(M, G[i], 0, False)
        f = f + A + K[i] + mg
        return (D, B + _rotl_var(f, S[i]), B, C)

    vzero = m[0] * np.uint32(0)                 # varying-safe zero
    A, B, C, D = jax.lax.fori_loop(0, 64, round_fn,
                                   tuple(x + vzero for x in state), unroll=loop_unroll(16))
    a, b, c, d = state
    return (a + A, b + B, c + C, d + D)


def _compress_unrolled(state, m):
    a, b, c, d = state
    A, B, C, D = a, b, c, d
    for i in range(64):
        if i < 16:
            f = (B & C) | (~B & D)
            g = i
        elif i < 32:
            f = (D & B) | (~D & C)
            g = (5 * i + 1) % 16
        elif i < 48:
            f = B ^ C ^ D
            g = (3 * i + 5) % 16
        else:
            f = C ^ (B | ~D)
            g = (7 * i) % 16
        f = f + A + np.uint32(_K[i]) + m[g]
        A = D
        D = C
        C = B
        B = B + rotl32(f, _S[i])
    return (a + A, b + B, c + C, d + D)


def md5_blocks(blocks):
    """blocks: (..., B, 16) uint32 LE words -> (..., 4) uint32 digest words."""
    nblocks = blocks.shape[-2]
    batch_shape = blocks.shape[:-2]
    state = tuple(jnp.broadcast_to(u32(_IV[i]), batch_shape) for i in range(4))
    for b in range(nblocks):
        m = [blocks[..., b, i] for i in range(16)]
        state = compress(state, m)
    return jnp.stack(state, axis=-1)


def pad_message(data: bytes) -> np.ndarray:
    """MD5 pad a byte message -> (B, 16) uint32 little-endian words."""
    ml = len(data)
    padded = data + b"\x80"
    padded += b"\x00" * ((-(len(padded) + 8)) % 64)
    padded += (ml * 8 & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    arr = np.frombuffer(padded, dtype="<u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def digest_words_to_bytes(words) -> bytes:
    w = np.asarray(words, dtype=np.uint32)
    return w.astype("<u4").tobytes()
