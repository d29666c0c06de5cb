"""Device-side decimal ASCII rendering of u64 seed lattices.

The reference hashes the *decimal string* of every numeric input (e.g.
SHA256("12345"), /root/reference/src/transform/sha256.rs:15-17 via
``Input::from_u64``'s ``string_val``).  Reproducing that on a TPU means
rendering u64 -> ascii digits in uint32 lanes: 20 rounds of divide-by-10
using the magic-constant multiply (floor(x/10) = mulhi64(x, 0xCCCC...CD) >> 3),
then packing the digits big-endian into SHA-256 message words with per-lane
lengths (variable-length single-block hashing).
"""

from __future__ import annotations

import numpy as np
from .._lazy import jnp

from .common import mul_hi32, u64_add
from .sha256 import compress as sha256_compress, IV as SHA256_IV
from .md5 import compress as md5_compress, _IV as MD5_IV
from .common import byteswap32, u32

_MAGIC_HI = np.uint32(0xCCCCCCCC)
_MAGIC_LO = np.uint32(0xCCCCCCCD)


def _mulhi64_magic(ah, al):
    """High 64 bits of (a * 0xCCCCCCCCCCCCCCCD) as a (hi, lo) uint32 pair."""
    ch = jnp.broadcast_to(u32(_MAGIC_HI), ah.shape)
    cl = jnp.broadcast_to(u32(_MAGIC_LO), al.shape)
    ll_hi = mul_hi32(al, cl)
    lh_lo = al * ch
    lh_hi = mul_hi32(al, ch)
    hl_lo = ah * cl
    hl_hi = mul_hi32(ah, cl)
    hh_lo = ah * ch
    hh_hi = mul_hi32(ah, ch)
    # mid column: ll_hi + lh_lo + hl_lo (up to 2 carries)
    m1 = ll_hi + lh_lo
    c1 = (m1 < ll_hi).astype(jnp.uint32)
    m2 = m1 + hl_lo
    c2 = (m2 < m1).astype(jnp.uint32)
    carry = c1 + c2
    hi64 = (hh_hi, hh_lo)
    for add in (lh_hi, hl_hi, carry):
        hi64 = u64_add(hi64, (jnp.zeros_like(add), add))
    return hi64


def divmod10_u64(ah, al):
    """(a // 10, a % 10) for u64 pairs, exact for all u64."""
    hh, hl = _mulhi64_magic(ah, al)
    # q = hi64 >> 3
    qh = hh >> np.uint32(3)
    ql = (hl >> np.uint32(3)) | (hh << np.uint32(29))
    digit = al - ql * np.uint32(10)  # remainder < 10, fits low 32 bits
    return (qh, ql), digit


def decimal_digits(ah, al, max_digits: int = 20):
    """Digits (least significant first) and decimal length per lane.

    Returns (digits: (..., max_digits) uint32 in 0..9, length: (...) uint32).
    Length >= 1 ("0" renders as one digit).
    """
    digs = []
    x = (ah, al)
    for _ in range(max_digits):
        x, d = divmod10_u64(*x)
        digs.append(d)
    digits = jnp.stack(digs, axis=-1)
    nonzero = digits != 0
    # length = 1 + highest index with nonzero digit
    idx = jnp.arange(max_digits, dtype=jnp.uint32)
    length = jnp.max(jnp.where(nonzero, idx + 1, np.uint32(0)), axis=-1)
    return digits, jnp.maximum(length, np.uint32(1))


def decimal_ascii_words_be(ah, al, max_digits: int = 20):
    """Big-endian message words of the decimal ASCII string + byte length.

    Returns (words: list of ceil(max_digits/4) uint32 arrays, length array).
    Byte i (0-based from string start) = '0' + digits[length-1-i] for
    i < length, else 0.
    """
    digits, length = decimal_digits(ah, al, max_digits)
    nwords = (max_digits + 3) // 4
    words = []
    for wi in range(nwords):
        word = jnp.zeros_like(ah)
        for b in range(4):
            i = wi * 4 + b  # byte position in string
            if i >= max_digits:
                continue
            src = length - np.uint32(1) - np.uint32(i)  # digit index (may wrap)
            valid = np.uint32(i) < length
            dig = jnp.zeros_like(ah)
            for j in range(max_digits):
                dig = jnp.where(src == np.uint32(j), digits[..., j], dig)
            byte = jnp.where(valid, dig + np.uint32(0x30), np.uint32(0))
            word = word | (byte << np.uint32(8 * (3 - b)))
        words.append(word)
    return words, length


def sha256_single_block_varlen(data_words, length):
    """SHA-256 of per-lane variable-length messages (<= 55 bytes, 1 block).

    data_words: list of <=14 uint32 BE word arrays containing the message
    bytes with zeros beyond each lane's length.  length: (...) uint32 bytes.
    Returns (..., 8) digest words.
    """
    batch_shape = length.shape
    w = list(data_words)
    while len(w) < 14:
        w.append(jnp.zeros(batch_shape, dtype=jnp.uint32))
    # or-in the 0x80 terminator at byte offset ``length``
    word_idx = length >> np.uint32(2)
    shift = np.uint32(8) * (np.uint32(3) - (length & np.uint32(3)))
    term = np.uint32(0x80) << shift
    out = []
    for i in range(14):
        out.append(w[i] | jnp.where(word_idx == np.uint32(i), term, np.uint32(0)))
    out.append(jnp.zeros(batch_shape, dtype=jnp.uint32))
    out.append(length * np.uint32(8))
    state = tuple(jnp.broadcast_to(u32(SHA256_IV[i]), batch_shape) for i in range(8))
    state = sha256_compress(state, out)
    return jnp.stack(state, axis=-1)


def md5_single_block_varlen(data_words_be, length):
    """MD5 of per-lane variable-length messages (<= 55 bytes, 1 block).

    Takes the same BE data words as the SHA path (bytes in string order) and
    byteswaps into MD5's LE convention.  Returns (..., 4) LE digest words.
    """
    batch_shape = length.shape
    w = [byteswap32(x) for x in data_words_be]
    while len(w) < 14:
        w.append(jnp.zeros(batch_shape, dtype=jnp.uint32))
    word_idx = length >> np.uint32(2)
    shift = np.uint32(8) * (length & np.uint32(3))  # LE: terminator at low byte
    term = np.uint32(0x80) << shift
    m = []
    for i in range(14):
        m.append(w[i] | jnp.where(word_idx == np.uint32(i), term, np.uint32(0)))
    m.append(length * np.uint32(8))
    m.append(jnp.zeros(batch_shape, dtype=jnp.uint32))
    state = tuple(jnp.broadcast_to(u32(MD5_IV[i]), batch_shape) for i in range(4))
    state = md5_compress(state, m)
    return jnp.stack(state, axis=-1)
