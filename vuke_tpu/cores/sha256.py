"""SHA-256 over uint32 lanes (batch-vectorized, jit/Pallas friendly).

The compression function is expressed as pure jnp ops over arbitrary batch
shapes: every value is an array of shape ``batch_shape`` and the 64 rounds
are unrolled at trace time, compiling to straight-line VPU code on TPU.

Message blocks are (..., 16) uint32 big-endian words (as in the SHA-256
spec).  Host helpers pad arbitrary byte strings; device helpers build the
padded single blocks for the fixed-size messages the search pipeline needs
(4/8-byte seeds, 32-byte keys/digests, 33/65-byte public keys).

Reference behavior mirrored: vuke's sha2-crate usage in
/root/reference/src/transform/sha256.rs:13-29 and src/sha256_chain.rs:88-118.
"""

from __future__ import annotations

import numpy as np
from .._lazy import jnp

from .common import loop_unroll, rotr32, u32

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

IV = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def compress(state, w16, unroll: bool = False):
    """One SHA-256 compression.

    state: tuple/list of 8 uint32 arrays (batch shape each)
    w16:   list of 16 uint32 arrays (the message block words)
    Returns the 8 updated state arrays.

    Default is a rolled 64-iteration ``fori_loop`` with a 16-word rolling
    schedule — ~60x smaller HLO than full unrolling, which matters because
    compiles route through a remote service in this environment.  Pass
    ``unroll=True`` for the straight-line variant.
    """
    if unroll:
        return _compress_unrolled(state, w16)
    from .._lazy import jax

    W0 = jnp.stack(list(w16), axis=0)           # (16, ...batch)
    K = jnp.asarray(_K)
    vzero = w16[0] * np.uint32(0)               # varying-safe zero
    state = tuple(x + vzero for x in state)

    def round_fn(t, carry):
        a, b, c, d, e, f, g, h, W = carry
        i16 = jax.lax.rem(t, 16)
        wm16 = jax.lax.dynamic_index_in_dim(W, i16, axis=0, keepdims=False)
        wm15 = jax.lax.dynamic_index_in_dim(W, jax.lax.rem(t + 1, 16), 0, False)
        wm7 = jax.lax.dynamic_index_in_dim(W, jax.lax.rem(t + 9, 16), 0, False)
        wm2 = jax.lax.dynamic_index_in_dim(W, jax.lax.rem(t + 14, 16), 0, False)
        s0 = rotr32(wm15, 7) ^ rotr32(wm15, 18) ^ (wm15 >> np.uint32(3))
        s1 = rotr32(wm2, 17) ^ rotr32(wm2, 19) ^ (wm2 >> np.uint32(10))
        w_new = wm16 + s0 + wm7 + s1
        wt = jnp.where(t < 16, wm16, w_new)
        W = jax.lax.dynamic_update_index_in_dim(W, wt, i16, axis=0)
        S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + K[t] + wt
        S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g, W)

    init = tuple(state) + (W0,)
    a, b, c, d, e, f, g, h, _ = jax.lax.fori_loop(0, 64, round_fn, init,
                                                  unroll=loop_unroll(16))
    return (a + state[0], b + state[1], c + state[2], d + state[3],
            e + state[4], f + state[5], g + state[6], h + state[7])


def _compress_unrolled(state, w16):
    a, b, c, d, e, f, g, h = state
    w = list(w16)
    for t in range(64):
        if t < 16:
            wt = w[t]
        else:
            s0 = rotr32(w[t - 15], 7) ^ rotr32(w[t - 15], 18) ^ (w[t - 15] >> np.uint32(3))
            s1 = rotr32(w[t - 2], 17) ^ rotr32(w[t - 2], 19) ^ (w[t - 2] >> np.uint32(10))
            wt = w[t - 16] + s0 + w[t - 7] + s1
            w.append(wt)
        S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + np.uint32(_K[t]) + wt
        S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return (a + state[0], b + state[1], c + state[2], d + state[3],
            e + state[4], f + state[5], g + state[6], h + state[7])


def sha256_blocks(blocks):
    """Digest pre-padded message blocks.

    blocks: (..., B, 16) uint32 big-endian words.
    Returns (..., 8) uint32 digest words.
    """
    nblocks = blocks.shape[-2]
    batch_shape = blocks.shape[:-2]
    state = tuple(jnp.broadcast_to(u32(IV[i]), batch_shape) for i in range(8))
    for b in range(nblocks):
        w16 = [blocks[..., b, i] for i in range(16)]
        state = compress(state, w16)
    return jnp.stack(state, axis=-1)


def sha256_words(words, nbytes: int):
    """Digest a message of ``nbytes`` bytes given as uint32 big-endian words,
    entirely on device.

    words: list of uint32 arrays (len == ceil(nbytes/4)), common batch shape.
    If nbytes is not a multiple of 4, the final word carries the trailing
    message bytes in its most-significant positions with zeros below.
    """
    rem = nbytes % 4
    nwords = (nbytes + 3) // 4
    assert len(words) == nwords
    total_blocks = (nbytes + 9 + 63) // 64
    batch_shape = jnp.broadcast_shapes(*[np.shape(w) for w in words]) if words else ()

    def const(v):
        return jnp.broadcast_to(u32(np.uint32(v)), batch_shape)

    blk_words = list(words)
    if rem:
        # 0x80 terminator lands inside the final partial word at byte ``rem``.
        blk_words[-1] = blk_words[-1] | const(0x80 << (8 * (3 - rem)))
    else:
        blk_words.append(const(0x80000000))
    while len(blk_words) % 16 != 14:
        blk_words.append(const(0))
    bitlen = nbytes * 8
    blk_words.append(const(bitlen >> 32))
    blk_words.append(const(bitlen & 0xFFFFFFFF))
    assert len(blk_words) == total_blocks * 16

    state = tuple(jnp.broadcast_to(u32(IV[i]), batch_shape) for i in range(8))
    for b in range(total_blocks):
        state = compress(state, blk_words[16 * b:16 * (b + 1)])
    return list(state)


def sha256_key_words(key_words):
    """SHA-256 of a 32-byte key given as (..., 8) uint32 BE words -> (..., 8)."""
    words = [key_words[..., i] for i in range(8)]
    return jnp.stack(sha256_words(words, 32), axis=-1)


# ---------------------------------------------------------------------------
# Host-side padding for arbitrary byte messages
# ---------------------------------------------------------------------------

def pad_message(data: bytes) -> np.ndarray:
    """SHA-256 pad a byte message -> (B, 16) uint32 big-endian words."""
    ml = len(data)
    padded = data + b"\x80"
    padded += b"\x00" * ((-(len(padded) + 8)) % 64)
    padded += (ml * 8).to_bytes(8, "big")
    arr = np.frombuffer(padded, dtype=">u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def pad_messages(datas, nblocks: int) -> np.ndarray:
    """Pad a batch of byte messages that all fit in ``nblocks`` blocks.

    Returns (N, nblocks, 16) uint32.
    """
    out = np.zeros((len(datas), nblocks, 16), dtype=np.uint32)
    for i, d in enumerate(datas):
        p = pad_message(d)
        assert p.shape[0] <= nblocks, "message too long for bucket"
        out[i, : p.shape[0]] = p
        if p.shape[0] < nblocks:
            # shorter message: its own padding already terminates it; extra
            # blocks would corrupt the digest.  Callers must bucket by block
            # count; enforce here.
            raise ValueError("bucket mismatch: message needs fewer blocks")
    return out


def nblocks_for_len(nbytes: int) -> int:
    return (nbytes + 8) // 64 + 1
