"""Batched PBKDF2-HMAC-SHA512 on device (the BIP39/MultiBit stretch).

The reference hand-rolls this primitive on the CPU
(/root/reference/src/multibit.rs:171-200); SURVEY.md §7.7 plans it as a
device kernel so dictionary attacks (analyze/multibit.py) batch across
candidates.  Design: one jitted program takes the per-candidate HMAC key
blocks (ipad/opad, host-padded bytes -> u32 pairs), runs the whole
2048-iteration chain with a ``fori_loop`` (2 SHA-512 compressions per
iteration over uint32-pair lanes, cores/sha512.py), and returns the
64-byte derived seeds.  dkLen is fixed at 64 (one PRF block) — exactly
the BIP39/MultiBit shape.

Parity: hashlib.pbkdf2_hmac on random inputs + the reference's
issue-445 vector (tests/test_sha512.py).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np

from .._lazy import jax, jnp
from ..cores import sha512 as s512


def _key_block(password: bytes) -> bytes:
    """HMAC key, padded to the 128-byte block (long keys pre-hashed)."""
    if len(password) > 128:
        password = hashlib.sha512(password).digest()
    return password + b"\x00" * (128 - len(password))


def _blocks_to_pairs(blocks: np.ndarray):
    """(N, 128) uint8 -> 16 (hi, lo) uint32-pair arrays of shape (N,)."""
    w = blocks.reshape(len(blocks), 16, 8)
    out = []
    for i in range(16):
        hi = (w[:, i, 0].astype(np.uint32) << 24) | (w[:, i, 1].astype(np.uint32) << 16) \
            | (w[:, i, 2].astype(np.uint32) << 8) | w[:, i, 3]
        lo = (w[:, i, 4].astype(np.uint32) << 24) | (w[:, i, 5].astype(np.uint32) << 16) \
            | (w[:, i, 6].astype(np.uint32) << 8) | w[:, i, 7]
        out.append((jnp.asarray(hi), jnp.asarray(lo)))
    return out


def _salt_block_words(salt: bytes):
    """Constant second block for the first inner hash: salt || INT(1) ||
    0x80-padding || 128-bit length.  Needs len(salt) <= 107 so everything
    fits one block after the key block."""
    msg = salt + (1).to_bytes(4, "big")
    assert len(msg) <= 111, "salt too long for the single-block device path"
    total_bits = (128 + len(msg)) * 8
    block = msg + b"\x80" + b"\x00" * (111 - len(msg)) + total_bits.to_bytes(16, "big")
    assert len(block) == 128
    w = np.frombuffer(block, dtype=">u4").astype(np.uint32).reshape(16, 2)
    return [(np.uint32(w[i, 0]), np.uint32(w[i, 1])) for i in range(16)]


import functools


@functools.lru_cache(maxsize=8)
def _pbkdf2_program(iterations: int, salt: bytes):
    salt_w = _salt_block_words(salt)

    def fn(*flat):
        # flat: 64 arrays — ipad hi/lo x16 then opad hi/lo x16
        ipad = [(flat[2 * i], flat[2 * i + 1]) for i in range(16)]
        opad = [(flat[32 + 2 * i], flat[32 + 2 * i + 1]) for i in range(16)]
        iv = s512.iv_state(ipad[0][0])
        inner = s512.compress(iv, ipad)
        outer = s512.compress(iv, opad)

        z = ipad[0][0] * np.uint32(0)
        sw = [(h + z, l + z) for h, l in salt_w]
        d = s512.compress(inner, sw)
        u = s512.compress(outer, s512.pad_block_for_64b_message(d))
        t = list(u)

        # TPU: python-unrolled compression in the loop body — nesting the
        # rolled 80-round fori inside this 2047-iteration fori produced a
        # pathological XLA:TPU compile (>9 min).  CPU keeps the rolled
        # form (the unrolled body is the slow-compile case THERE).
        compress = (s512.compress_unrolled
                    if jax.devices()[0].platform != "cpu" else s512.compress)

        def body(_, carry):
            thi, tlo, uhi, ulo = carry
            up = [(uhi[i], ulo[i]) for i in range(8)]
            d = compress(inner, s512.pad_block_for_64b_message(up))
            nu = compress(outer, s512.pad_block_for_64b_message(d))
            nthi = jnp.stack([thi[i] ^ nu[i][0] for i in range(8)])
            ntlo = jnp.stack([tlo[i] ^ nu[i][1] for i in range(8)])
            return (nthi, ntlo,
                    jnp.stack([w[0] for w in nu]), jnp.stack([w[1] for w in nu]))

        init = (jnp.stack([w[0] for w in t]), jnp.stack([w[1] for w in t]),
                jnp.stack([w[0] for w in u]), jnp.stack([w[1] for w in u]))
        thi, tlo, _, _ = jax.lax.fori_loop(0, iterations - 1, body, init)
        return thi, tlo                                  # (8, N) each

    return jax.jit(fn)


def pbkdf2_hmac_sha512_batch(passwords: Sequence[bytes], salt: bytes,
                             iterations: int = 2048) -> List[bytes]:
    """Derive 64-byte PBKDF2-HMAC-SHA512 keys for a batch of passwords
    (shared salt) on the device.  Batch is padded to a power of two for
    compile-cache-stable shapes."""
    n = len(passwords)
    if n == 0:
        return []
    padded = 1
    while padded < n:
        padded *= 2
    blocks = np.zeros((padded, 128), dtype=np.uint8)
    for i in range(padded):
        kb = _key_block(passwords[min(i, n - 1)])
        blocks[i] = np.frombuffer(kb, dtype=np.uint8)
    ipad = _blocks_to_pairs(blocks ^ np.uint8(0x36))
    opad = _blocks_to_pairs(blocks ^ np.uint8(0x5C))
    flat = []
    for h, l in ipad:
        flat += [h, l]
    for h, l in opad:
        flat += [h, l]
    thi, tlo = _pbkdf2_program(iterations, salt)(*flat)
    thi = np.asarray(thi)
    tlo = np.asarray(tlo)
    out = []
    for i in range(n):
        b = b""
        for w in range(8):
            b += int(thi[w, i]).to_bytes(4, "big") + int(tlo[w, i]).to_bytes(4, "big")
        out.append(b)
    return out


def device_available() -> bool:
    """True when batching on an accelerator is worthwhile."""
    from ..ecc.pubkey import use_pallas_default
    return use_pallas_default()
