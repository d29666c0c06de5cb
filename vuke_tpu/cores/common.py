"""Shared uint32-lane primitives for TPU-native bitwise kernels.

Everything in vuke-tpu's device compute path is expressed over ``uint32``
lanes: TPUs have no native 64-bit integer datapath, so 64-bit quantities are
carried as ``(hi, lo)`` pairs of uint32 arrays.  All helpers here are pure,
shape-polymorphic jnp functions that vectorize over arbitrary leading batch
dimensions and compile to VPU code under ``jax.jit``.

Key-byte convention: a 32-byte private key is represented on device as 8
uint32 *big-endian words* — word ``w`` holds key bytes ``4w..4w+4`` in
big-endian order.  Hex of the key = concatenation of ``%08x`` of each word.
"""

from __future__ import annotations

import numpy as np
from .._lazy import jnp

# numpy's uint32 is dtype-equivalent to jnp.uint32 everywhere it is used
# (astype/asarray dtype args) and keeps this module importable without jax
U32 = np.uint32

MASK16 = np.uint32(0xFFFF)
MASK32 = np.uint32(0xFFFFFFFF)


def u32(x):
    return jnp.asarray(x, dtype=U32)


def rotl32(x, n: int):
    n &= 31
    if n == 0:
        return x
    return (x << np.uint32(n)) | (x >> np.uint32(32 - n))


def rotr32(x, n: int):
    return rotl32(x, (32 - n) & 31)


def byteswap32(x):
    """Reverse byte order within each uint32 lane."""
    return (
        ((x & np.uint32(0x000000FF)) << np.uint32(24))
        | ((x & np.uint32(0x0000FF00)) << np.uint32(8))
        | ((x & np.uint32(0x00FF0000)) >> np.uint32(8))
        | ((x & np.uint32(0xFF000000)) >> np.uint32(24))
    )


def mul_lo32(a, b):
    """Low 32 bits of a*b (wrapping uint32 multiply)."""
    return a * b


def mul_hi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    TPU VPU has no 32x32->64 multiply; decompose into 16-bit halves.
    """
    ah = a >> np.uint32(16)
    al = a & MASK16
    bh = b >> np.uint32(16)
    bl = b & MASK16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    # carry = ((ll >> 16) + (lh & 0xffff) + (hl & 0xffff)) >> 16
    mid = (ll >> np.uint32(16)) + (lh & MASK16) + (hl & MASK16)
    return hh + (lh >> np.uint32(16)) + (hl >> np.uint32(16)) + (mid >> np.uint32(16))


# ---------------------------------------------------------------------------
# 64-bit arithmetic over (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------

def u64_const(v: int):
    v = int(v) & 0xFFFFFFFFFFFFFFFF
    return (np.uint32(v >> 32), np.uint32(v & 0xFFFFFFFF))


def u64_from_u32(lo):
    return (jnp.zeros_like(lo), lo)


def u64_add(a, b):
    ah, al = a
    bh, bl = b
    lo = al + bl
    carry = (lo < al).astype(U32)
    return (ah + bh + carry, lo)


def u64_add_const(a, c: int):
    return u64_add(a, (jnp.broadcast_to(u32(np.uint32(c >> 32)), a[0].shape),
                       jnp.broadcast_to(u32(np.uint32(c & 0xFFFFFFFF)), a[1].shape)))


def u64_xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def u64_and(a, b):
    return (a[0] & b[0], a[1] & b[1])


def u64_or(a, b):
    return (a[0] | b[0], a[1] | b[1])


def u64_shl(a, n: int):
    ah, al = a
    n &= 63
    if n == 0:
        return a
    if n >= 32:
        return (al << np.uint32(n - 32) if n > 32 else al, jnp.zeros_like(al))
    return ((ah << np.uint32(n)) | (al >> np.uint32(32 - n)), al << np.uint32(n))


def u64_shr(a, n: int):
    ah, al = a
    n &= 63
    if n == 0:
        return a
    if n >= 32:
        return (jnp.zeros_like(ah), ah >> np.uint32(n - 32) if n > 32 else ah)
    return (ah >> np.uint32(n), (al >> np.uint32(n)) | (ah << np.uint32(32 - n)))


def u64_rotl(a, n: int):
    n &= 63
    if n == 0:
        return a
    return u64_or(u64_shl(a, n), u64_shr(a, 64 - n))


def u64_mul_lo(a, b):
    """Low 64 bits of the product of two u64 pairs."""
    ah, al = a
    bh, bl = b
    lo = al * bl
    hi = mul_hi32(al, bl) + al * bh + ah * bl
    return (hi, lo)


def u64_mul_const_lo(a, c: int):
    ch, cl = u64_const(c)
    ah, al = a
    lo = al * cl
    hi = mul_hi32(al, jnp.broadcast_to(u32(cl), al.shape)) + al * ch + ah * cl
    return (hi, lo)


def u64_eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def u64_is_zero(a):
    return (a[0] == 0) & (a[1] == 0)


# ---------------------------------------------------------------------------
# Host-side byte <-> word packing (numpy, big-endian word convention)
# ---------------------------------------------------------------------------

def bytes_to_words_be(data: bytes) -> np.ndarray:
    """Pack bytes (length multiple of 4) into big-endian uint32 words."""
    assert len(data) % 4 == 0
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)


def words_be_to_bytes(words) -> bytes:
    w = np.asarray(words, dtype=np.uint32)
    return w.astype(">u4").tobytes()


def key_words_to_bytes(words) -> bytes:
    """Device key (8 big-endian uint32 words) -> 32 raw bytes."""
    return words_be_to_bytes(np.asarray(words).reshape(8))


def key_bytes_to_words(key: bytes) -> np.ndarray:
    assert len(key) == 32
    return bytes_to_words_be(key)


def key_words_to_hex(words) -> str:
    return "".join(f"{int(w):08x}" for w in np.asarray(words).reshape(8))


def loop_unroll(tpu_unroll: int) -> int:
    """Loop-unroll factor for the current backend: ``tpu_unroll`` on
    accelerators (amortizes per-step scan overhead), 1 on XLA:CPU — the
    fast test tier's wall clock is LLVM compiling the unrolled bodies,
    and hot-loop runtime on CPU is irrelevant there."""
    from .._lazy import jax
    return 1 if jax.devices()[0].platform == "cpu" else tpu_unroll
