"""SHA-512 over uint32-pair lanes (batch-vectorized, jit friendly).

TPUs have no 64-bit integer datapath, so every 64-bit word is carried as
an ``(hi, lo)`` pair of uint32 arrays (cores/common.py u64 helpers).  The
compression runs as a rolled 80-iteration ``fori_loop`` with a 16-word
rolling schedule, exactly like the SHA-256 core.

This core exists for the PBKDF2-HMAC-SHA512 device path (BIP39 seed
stretching and the MultiBit-HD dictionary attack — SURVEY.md §7.7;
/root/reference/src/multibit.rs:171-200 hand-rolls the same primitive on
the CPU).  Parity: RFC 6234 / NIST vectors in tests/test_sha512.py.
"""

from __future__ import annotations

import numpy as np

from .._lazy import jnp
from .common import loop_unroll, u64_add, u64_xor

_K64 = [
    0x428a2f98d728ae22, 0x7137449123ef65cd, 0xb5c0fbcfec4d3b2f, 0xe9b5dba58189dbbc,
    0x3956c25bf348b538, 0x59f111f1b605d019, 0x923f82a4af194f9b, 0xab1c5ed5da6d8118,
    0xd807aa98a3030242, 0x12835b0145706fbe, 0x243185be4ee4b28c, 0x550c7dc3d5ffb4e2,
    0x72be5d74f27b896f, 0x80deb1fe3b1696b1, 0x9bdc06a725c71235, 0xc19bf174cf692694,
    0xe49b69c19ef14ad2, 0xefbe4786384f25e3, 0x0fc19dc68b8cd5b5, 0x240ca1cc77ac9c65,
    0x2de92c6f592b0275, 0x4a7484aa6ea6e483, 0x5cb0a9dcbd41fbd4, 0x76f988da831153b5,
    0x983e5152ee66dfab, 0xa831c66d2db43210, 0xb00327c898fb213f, 0xbf597fc7beef0ee4,
    0xc6e00bf33da88fc2, 0xd5a79147930aa725, 0x06ca6351e003826f, 0x142929670a0e6e70,
    0x27b70a8546d22ffc, 0x2e1b21385c26c926, 0x4d2c6dfc5ac42aed, 0x53380d139d95b3df,
    0x650a73548baf63de, 0x766a0abb3c77b2a8, 0x81c2c92e47edaee6, 0x92722c851482353b,
    0xa2bfe8a14cf10364, 0xa81a664bbc423001, 0xc24b8b70d0f89791, 0xc76c51a30654be30,
    0xd192e819d6ef5218, 0xd69906245565a910, 0xf40e35855771202a, 0x106aa07032bbd1b8,
    0x19a4c116b8d2d0c8, 0x1e376c085141ab53, 0x2748774cdf8eeb99, 0x34b0bcb5e19b48a8,
    0x391c0cb3c5c95a63, 0x4ed8aa4ae3418acb, 0x5b9cca4f7763e373, 0x682e6ff3d6b2b8a3,
    0x748f82ee5defb2fc, 0x78a5636f43172f60, 0x84c87814a1f0ab72, 0x8cc702081a6439ec,
    0x90befffa23631e28, 0xa4506cebde82bde9, 0xbef9a3f7b2c67915, 0xc67178f2e372532b,
    0xca273eceea26619c, 0xd186b8c721c0c207, 0xeada7dd6cde0eb1e, 0xf57d4f7fee6ed178,
    0x06f067aa72176fba, 0x0a637dc5a2c898a6, 0x113f9804bef90dae, 0x1b710b35131c471b,
    0x28db77f523047d84, 0x32caab7b40c72493, 0x3c9ebe0a15c9bebc, 0x431d67c49c100d4c,
    0x4cc5d4becb3e42b6, 0x597f299cfc657e2a, 0x5fcb6fab3ad6faec, 0x6c44198c4a475817,
]
_KHI = np.array([k >> 32 for k in _K64], dtype=np.uint32)
_KLO = np.array([k & 0xFFFFFFFF for k in _K64], dtype=np.uint32)

IV64 = [
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b, 0xa54ff53a5f1d36f1,
    0x510e527fade682d1, 0x9b05688c2b3e6c1f, 0x1f83d9abfb41bd6b, 0x5be0cd19137e2179,
]


def _rotr64(x, n: int):
    """(hi, lo) rotated right by n (1..63)."""
    hi, lo = x
    n &= 63
    if n == 0:
        return x
    if n < 32:
        s, t = np.uint32(n), np.uint32(32 - n)
        return ((hi >> s) | (lo << t), (lo >> s) | (hi << t))
    if n == 32:
        return (lo, hi)
    s, t = np.uint32(n - 32), np.uint32(64 - n)
    return ((lo >> s) | (hi << t), (hi >> s) | (lo << t))


def _shr64(x, n: int):
    hi, lo = x
    if n < 32:
        s, t = np.uint32(n), np.uint32(32 - n)
        return (hi >> s, (lo >> s) | (hi << t))
    if n == 32:
        return (jnp.zeros_like(hi), hi)
    return (jnp.zeros_like(hi), hi >> np.uint32(n - 32))


def compress(state, w16):
    """One SHA-512 compression.

    state: list of 8 (hi, lo) uint32-pair arrays (batch shape each)
    w16:   list of 16 (hi, lo) pairs — the 128-byte message block
    Returns the 8 updated (hi, lo) pairs.
    """
    from .._lazy import jax

    Whi = jnp.stack([w[0] for w in w16], axis=0)       # (16, ...batch)
    Wlo = jnp.stack([w[1] for w in w16], axis=0)
    vzero = w16[0][0] * np.uint32(0)
    st = [(h + vzero, l + vzero) for h, l in state]
    Khi = jnp.asarray(_KHI)
    Klo = jnp.asarray(_KLO)

    def round_fn(t, carry):
        a, b, c, d, e, f, g, h, Whi, Wlo = carry
        i16 = jax.lax.rem(t, 16)

        def W(j):
            jj = jax.lax.rem(t + j, 16)
            return (jax.lax.dynamic_index_in_dim(Whi, jj, 0, False),
                    jax.lax.dynamic_index_in_dim(Wlo, jj, 0, False))

        wm16, wm15, wm7, wm2 = W(0), W(1), W(9), W(14)
        s0 = u64_xor(u64_xor(_rotr64(wm15, 1), _rotr64(wm15, 8)), _shr64(wm15, 7))
        s1 = u64_xor(u64_xor(_rotr64(wm2, 19), _rotr64(wm2, 61)), _shr64(wm2, 6))
        w_new = u64_add(u64_add(wm16, s0), u64_add(wm7, s1))
        sel = t < 16
        wt = (jnp.where(sel, wm16[0], w_new[0]), jnp.where(sel, wm16[1], w_new[1]))
        Whi = jax.lax.dynamic_update_index_in_dim(Whi, wt[0], i16, axis=0)
        Wlo = jax.lax.dynamic_update_index_in_dim(Wlo, wt[1], i16, axis=0)

        S1 = u64_xor(u64_xor(_rotr64(e, 14), _rotr64(e, 18)), _rotr64(e, 41))
        ch = (((e[0] & f[0]) ^ (~e[0] & g[0])), ((e[1] & f[1]) ^ (~e[1] & g[1])))
        kt = (Khi[t] + vzero, Klo[t] + vzero)
        t1 = u64_add(u64_add(u64_add(h, S1), u64_add(ch, kt)), wt)
        S0 = u64_xor(u64_xor(_rotr64(a, 28), _rotr64(a, 34)), _rotr64(a, 39))
        maj = (((a[0] & b[0]) ^ (a[0] & c[0]) ^ (b[0] & c[0])),
               ((a[1] & b[1]) ^ (a[1] & c[1]) ^ (b[1] & c[1])))
        t2 = u64_add(S0, maj)
        return (u64_add(t1, t2), a, b, c, u64_add(d, t1), e, f, g, Whi, Wlo)

    init = tuple(st) + (Whi, Wlo)
    out = jax.lax.fori_loop(0, 80, round_fn, init, unroll=loop_unroll(10))
    a, b, c, d, e, f, g, h = out[:8]
    return [u64_add(x, y) for x, y in zip((a, b, c, d, e, f, g, h), state)]


def compress_unrolled(state, w16):
    """Straight-line SHA-512 compression (python-unrolled 80 rounds,
    static message schedule — no dynamic ring indexing).

    Exists for programs that already carry an outer device loop (the
    PBKDF2 2048-iteration chain): nesting the rolled 80-round fori
    inside the outer fori produced a pathological XLA:TPU compile
    (>9 min, vs seconds for the unrolled body), while on the test tier
    the rolled form stays preferable (smaller XLA:CPU graphs)."""
    a, b, c, d, e, f, g, h = state
    w = list(w16)
    for t in range(80):
        if t < 16:
            wt = w[t]
        else:
            wm15, wm2 = w[t - 15], w[t - 2]
            s0 = u64_xor(u64_xor(_rotr64(wm15, 1), _rotr64(wm15, 8)),
                         _shr64(wm15, 7))
            s1 = u64_xor(u64_xor(_rotr64(wm2, 19), _rotr64(wm2, 61)),
                         _shr64(wm2, 6))
            wt = u64_add(u64_add(w[t - 16], s0), u64_add(w[t - 7], s1))
            w.append(wt)
        S1 = u64_xor(u64_xor(_rotr64(e, 14), _rotr64(e, 18)), _rotr64(e, 41))
        ch = (((e[0] & f[0]) ^ (~e[0] & g[0])), ((e[1] & f[1]) ^ (~e[1] & g[1])))
        kt = (np.uint32(_K64[t] >> 32), np.uint32(_K64[t] & 0xFFFFFFFF))
        t1 = u64_add(u64_add(u64_add(h, S1), u64_add(ch, kt)), wt)
        S0 = u64_xor(u64_xor(_rotr64(a, 28), _rotr64(a, 34)), _rotr64(a, 39))
        maj = (((a[0] & b[0]) ^ (a[0] & c[0]) ^ (b[0] & c[0])),
               ((a[1] & b[1]) ^ (a[1] & c[1]) ^ (b[1] & c[1])))
        t2 = u64_add(S0, maj)
        h, g, f, e, d, c, b, a = (g, f, e, u64_add(d, t1), c, b, a,
                                  u64_add(t1, t2))
    return [u64_add(x, y) for x, y in zip((a, b, c, d, e, f, g, h), state)]


def iv_state(batch_like):
    """IV as (hi, lo) pairs broadcast against ``batch_like`` (an array)."""
    z = batch_like * np.uint32(0)
    return [(np.uint32(v >> 32) + z, np.uint32(v & 0xFFFFFFFF) + z)
            for v in IV64]


def digest_words_to_bytes(state) -> bytes:
    """Host helper: 8 (hi, lo) scalar pairs -> 64 digest bytes."""
    out = b""
    for hi, lo in state:
        out += int(hi).to_bytes(4, "big") + int(lo).to_bytes(4, "big")
    return out


def pad_block_for_64b_message(msg_words, total_prev_blocks: int = 1):
    """Second-block words for a 64-byte message following ``total_prev_blocks``
    already-compressed 128-byte blocks (the HMAC iteration shape): message
    = 64 bytes || 0x80 || zeros || 128-bit length.

    msg_words: list of 8 (hi, lo) pairs (the 64-byte message).
    Returns 16 (hi, lo) pairs."""
    z = jnp.zeros_like(msg_words[0][0])
    total_bits = (total_prev_blocks * 128 + 64) * 8
    w = list(msg_words)
    w.append((np.uint32(0x80000000) + z, z))           # 0x80 then zeros
    for _ in range(6):
        w.append((z, z))
    w.append((np.uint32(total_bits >> 32) + z, np.uint32(total_bits & 0xFFFFFFFF) + z))
    return w
