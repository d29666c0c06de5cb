"""Batched key -> pubkey -> hash160 derivation (the #1 hot kernel).

Pipeline (all on device, no host round-trip):
  key words (8 BE u32) -> normalize mod n (invalid keys reduced, 0 -> 1,
  mirroring /root/reference/src/derive.rs:79-93) -> fixed-base scalar mul ->
  batched affine -> serialize compressed (33B) / uncompressed (65B) pubkey
  words -> SHA256 -> RIPEMD160 -> hash160 fragments for matching.

The reference derives full base58/bech32 address strings for every candidate
(derive.rs:121-147, the profiled hot-loop-B cost); here strings exist only on
the host for confirmed hits.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..cores.ripemd160 import ripemd160_of_sha256_words
from ..cores.sha256 import sha256_words
from ..cores.common import byteswap32
from . import ref
from .field import fe_from_words_be, fe_is_odd, fe_normalize, fe_to_words_be
from .point import scalar_mul_base, to_affine

_N_WORDS = np.array([(ref.N >> (32 * (7 - i))) & 0xFFFFFFFF for i in range(8)],
                    dtype=np.uint32)


def normalize_scalar(words):
    """Reduce (..., 8) BE-word scalars into [1, n-1].

    Keys >= n are reduced by one conditional subtract (any 256-bit value is
    < 2n); zero maps to 1 (derive.rs:84-86).
    """
    ge = jnp.zeros(words.shape[:-1], dtype=bool)
    decided = jnp.zeros(words.shape[:-1], dtype=bool)
    for i in range(8):  # big-endian: word 0 most significant
        ni = _N_WORDS[i]
        gt = words[..., i] > ni
        lt = words[..., i] < ni
        ge = jnp.where(~decided & gt, True, ge)
        decided = decided | gt | lt
    ge = ge | ~decided

    # conditional subtract n (borrow chain from least-significant word)
    sub = []
    borrow = jnp.zeros(words.shape[:-1], dtype=jnp.uint32)
    for i in range(7, -1, -1):
        a = words[..., i]
        b = np.uint32(_N_WORDS[i])
        t = a - b
        b1 = (a < b).astype(jnp.uint32)
        t2 = t - borrow
        b2 = (t < borrow).astype(jnp.uint32)
        sub.append(t2)
        borrow = b1 | b2
    sub = jnp.stack(sub[::-1], axis=-1)
    out = jnp.where(ge[..., None], sub, words)

    zero = jnp.all(out == 0, axis=-1)
    out = out.at[..., 7].set(jnp.where(zero, np.uint32(1), out[..., 7]))
    return out


def scalar_digits(words, wbits: int = 8, signed=False):
    """(..., 8) BE words -> (..., n_windows) wbits-wide windows, LSB first.
    ``signed``: |d| | sign<<15 signed-digit recoding (half-size tables);
    ``signed == "odd"``: zero-free odd-digit recoding (odd_encode_rows)."""
    if signed == "odd":
        from .pallas_smul13 import odd_encode_rows
        return jnp.stack(
            odd_encode_rows([words[..., i] for i in range(8)], wbits), axis=-1)
    windows = -(-256 // wbits)
    mask = np.uint32((1 << wbits) - 1)
    digs = []
    for w in range(windows):
        b = wbits * w
        wi = 7 - b // 32
        off = b % 32
        v = words[..., wi] >> np.uint32(off)
        if off + wbits > 32 and wi >= 1:
            v = v | (words[..., wi - 1] << np.uint32(32 - off))
        digs.append(v & mask)
    if signed:
        from .pallas_smul13 import signed_encode
        digs = signed_encode(digs, wbits)
    return jnp.stack(digs, axis=-1)


def use_pallas_default() -> bool:
    """Pallas kernels on TPU-class backends unless disabled via env."""
    import os
    v = os.environ.get("VUKE_TPU_PALLAS")
    if v is not None:
        return v not in ("0", "false", "no")
    try:
        import jax
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def derive_pubkey(words, inv_chunk: int = 32, use_pallas: bool | None = None):
    """(N, 8) BE-word scalars (already normalized) -> affine pubkey.

    Returns (x_words, y_words, y_odd): (N, 8) BE u32 words each + parity.
    The scalar multiplication runs in the fused Pallas kernel on TPU
    backends (10x the XLA-staged path) when the batch is tile-aligned.
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    n = words.shape[0] if words.ndim == 2 else None
    if use_pallas and n is not None and n % 1024 == 0:
        from .pallas_smul import scalar_mul_zz_pallas, to_affine_zz
        from .tiled import use_smul13, window_bits, lookup_mode, signed_digits
        if use_smul13():
            from .pallas_smul13 import scalar_mul_zz_pallas13
            wbits, signed = window_bits(), signed_digits()
            X, Y, ZZ, ZZZ = scalar_mul_zz_pallas13(
                scalar_digits(words, wbits, signed), wbits=wbits,
                lookup=lookup_mode(), signed=signed)
        else:
            X, Y, ZZ, ZZZ = scalar_mul_zz_pallas(scalar_digits(words))
        x, y = to_affine_zz(X, Y, ZZ, ZZZ, chunk=inv_chunk)
    else:
        X, Y, Z = scalar_mul_base(scalar_digits(words))
        x, y = to_affine(X, Y, Z, chunk=inv_chunk)
    x = fe_normalize(x)
    y = fe_normalize(y)
    return fe_to_words_be(x), fe_to_words_be(y), fe_is_odd(y)


def hash160_compressed(xw, y_odd):
    """hash160 of the 33-byte compressed pubkey. Returns (..., 5) LE words."""
    prefix = jnp.where(y_odd, np.uint32(0x03), np.uint32(0x02))
    words = [(prefix << np.uint32(24)) | (xw[..., 0] >> np.uint32(8))]
    for j in range(1, 8):
        words.append((xw[..., j - 1] << np.uint32(24)) | (xw[..., j] >> np.uint32(8)))
    words.append(xw[..., 7] << np.uint32(24))
    sha = jnp.stack(sha256_words(words, 33), axis=-1)
    return ripemd160_of_sha256_words(sha)


def hash160_uncompressed(xw, yw):
    """hash160 of the 65-byte uncompressed pubkey. Returns (..., 5) LE words."""
    four = jnp.broadcast_to(np.uint32(0x04), xw[..., 0].shape)
    words = [(four << np.uint32(24)) | (xw[..., 0] >> np.uint32(8))]
    for j in range(1, 8):
        words.append((xw[..., j - 1] << np.uint32(24)) | (xw[..., j] >> np.uint32(8)))
    words.append((xw[..., 7] << np.uint32(24)) | (yw[..., 0] >> np.uint32(8)))
    for j in range(1, 8):
        words.append((yw[..., j - 1] << np.uint32(24)) | (yw[..., j] >> np.uint32(8)))
    words.append(yw[..., 7] << np.uint32(24))
    sha = jnp.stack(sha256_words(words, 65), axis=-1)
    return ripemd160_of_sha256_words(sha)


def hash160_fragment(h160_le_words):
    """First 8 bytes of a hash160 as a (hi, lo) pair of uint32 (big-endian
    byte order within each), for sorted-array matching."""
    return byteswap32(h160_le_words[..., 0]), byteswap32(h160_le_words[..., 1])


def derive_hash160s(words, inv_chunk: int = 32, use_pallas: bool | None = None):
    """Full fused derive: normalized scalars -> both hash160s.

    Returns dict with compressed/uncompressed (..., 5) LE-word hash160s.
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    xw, yw, y_odd = derive_pubkey(words, inv_chunk, use_pallas=use_pallas)
    n = words.shape[0] if words.ndim == 2 else None
    if use_pallas and n is not None and n % 1024 == 0:
        from ..cores.pallas_kernels import hash160s_pallas
        h160c, h160u = hash160s_pallas(xw, yw, y_odd)
    else:
        h160c = hash160_compressed(xw, y_odd)
        h160u = hash160_uncompressed(xw, yw)
    return {
        "h160c": h160c,
        "h160u": h160u,
        "x_words": xw,
        "y_words": yw,
        "y_odd": y_odd,
    }
