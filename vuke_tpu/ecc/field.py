"""secp256k1 base-field arithmetic over uint32 lanes.

TPU-first design: a field element is 16 limbs x 16 bits carried in a
``(..., 16)`` uint32 array (limb 0 = least significant).  The VPU has no
32x32->64 multiply, so 16-bit limbs keep every partial product inside
uint32; column sums stay < 2^22 so lo/hi accumulation never overflows.
Reduction uses the pseudo-Mersenne structure p = 2^256 - 2^32 - 977.

Elements are kept *semi-reduced* (< 2^256, possibly in [p, 2^256)) between
operations; :func:`fe_normalize` produces the canonical representative.

Replaces (does not translate) the host secp256k1 library the reference
links (/root/reference/src/derive.rs:97-118).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

P = 2**256 - 2**32 - 977
N_LIMBS = 16
_C977 = np.uint32(977)

_P_LIMBS = np.array([(P >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32)


def fe_from_int(v: int, batch_shape=()):  # host helper
    limbs = np.array([(v >> (16 * i)) & 0xFFFF for i in range(16)], dtype=np.uint32)
    return jnp.broadcast_to(jnp.asarray(limbs), batch_shape + (16,))


def fe_to_int(fe) -> int:  # host helper (single element)
    limbs = np.asarray(fe, dtype=np.uint64).reshape(-1, 16)[0]
    return sum(int(l) << (16 * i) for i, l in enumerate(limbs))


def fe_from_words_be(words):
    """(..., 8) uint32 big-endian words -> (..., 16) limbs."""
    parts = []
    for i in range(16):
        w = words[..., 7 - i // 2]
        parts.append((w >> np.uint32(16 * (i % 2))) & np.uint32(0xFFFF))
    return jnp.stack(parts, axis=-1)


def fe_to_words_be(fe):
    """(..., 16) limbs -> (..., 8) uint32 big-endian words."""
    words = []
    for i in range(8):
        hi = fe[..., 15 - 2 * i]
        lo = fe[..., 14 - 2 * i]
        words.append((hi << np.uint32(16)) | lo)
    return jnp.stack(words, axis=-1)


def _carry16(cols):
    """Propagate carries over a list of uint32 column accumulators, in place
    semantics: returns (limbs list of 16-bit values, final carry)."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        t = c + carry
        out.append(t & np.uint32(0xFFFF))
        carry = t >> np.uint32(16)
    return out, carry


def _mul_columns(a_limbs, b_limbs):
    """Schoolbook product columns: 32 uint32 accumulators (before carry)."""
    n = len(a_limbs)
    m = len(b_limbs)
    cols = [None] * (n + m)
    for i in range(n):
        ai = a_limbs[i]
        for j in range(m):
            p = ai * b_limbs[j]
            lo = p & np.uint32(0xFFFF)
            hi = p >> np.uint32(16)
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = jnp.zeros_like(a_limbs[0])
    return [zero if c is None else c for c in cols]


def _reduce_512(cols32):
    """Reduce 32 carried 16-bit limbs (512-bit value) mod p to 16 limbs."""
    lo = cols32[:16]
    hi = cols32[16:]
    # D = lo + hi * (2^32 + 977): hi*977 into cols 0.., hi<<32 into cols 2..
    cols = list(lo) + [jnp.zeros_like(lo[0]), jnp.zeros_like(lo[0])]
    for i in range(16):
        p = hi[i] * _C977
        cols[i] = cols[i] + (p & np.uint32(0xFFFF))
        cols[i + 1] = cols[i + 1] + (p >> np.uint32(16))
        cols[i + 2] = cols[i + 2] + hi[i]
    limbs, carry = _carry16(cols)
    # value now = limbs[0..17] + carry*2^(18*16); limbs beyond 15 are the
    # spill hi2 (< 2^34).  Fold hi2*(2^32+977) back in.
    hi2 = [limbs[16], limbs[17], carry]  # 16-bit pieces of the spill
    cols = list(limbs[:16]) + [jnp.zeros_like(limbs[0])]
    for i, h in enumerate(hi2):
        p = h * _C977
        cols[i] = cols[i] + (p & np.uint32(0xFFFF))
        cols[i + 1] = cols[i + 1] + (p >> np.uint32(16))
        cols[i + 2] = cols[i + 2] + h
    limbs, carry = _carry16(cols)
    # spill now small: limbs[16] + carry*2^(17*16)
    hi3 = limbs[16] + (carry << np.uint32(16))
    limbs = limbs[:16]
    for _ in range(2):  # fold, and fold the possible final carry once more
        p = hi3 * _C977
        limbs[0] = limbs[0] + (p & np.uint32(0xFFFF))
        limbs[1] = limbs[1] + (p >> np.uint32(16))
        limbs[2] = limbs[2] + hi3
        limbs, hi3 = _carry16(limbs)
    return limbs[:16]


import functools


@functools.lru_cache(maxsize=1)
def _col_select_matrices():
    """0/1 matrices summing the 256 partial products into 32 columns.

    Entry (i*16+j) of a flattened outer product belongs to column i+j (low
    halves) / i+j+1 (high halves).  Expressed as an f32 matmul so the column
    reduction runs on the MXU; values stay < 2^22 so f32 is exact.
    """
    lo_sel = np.zeros((256, 32), dtype=np.float32)
    hi_sel = np.zeros((256, 32), dtype=np.float32)
    for i in range(16):
        for j in range(16):
            lo_sel[i * 16 + j, i + j] = 1.0
            hi_sel[i * 16 + j, i + j + 1] = 1.0
    return lo_sel, hi_sel


def fe_mul(a, b):
    """(..., 16) x (..., 16) -> (..., 16), product mod p (semi-reduced).

    Schoolbook product as a chain of *fusable elementwise ops*: for each
    limb i of ``a``, multiply the whole ``b`` vector, split into 16-bit
    halves, and accumulate into a 32-column tensor via zero-padded shifts.
    Everything is elementwise (mul/and/shift/pad/add), so XLA fuses the
    chain into one VMEM-resident loop — no (N,256) intermediates hit HBM
    (an earlier MXU-matmul formulation was HBM-bound on exactly those).
    Column sums stay < 2^22, exact in uint32.
    """
    cols = None
    for i in range(16):
        p = a[..., i][..., None] * b                  # (..., 16) uint32
        lo = p & np.uint32(0xFFFF)
        hi = p >> np.uint32(16)
        pad = [(0, 0)] * (p.ndim - 1)
        lo_p = jnp.pad(lo, pad + [(i, 16 - i)])       # cols i .. i+15 of 32
        hi_p = jnp.pad(hi, pad + [(i + 1, 15 - i)])   # cols i+1 .. i+16
        contrib = lo_p + hi_p
        cols = contrib if cols is None else cols + contrib
    carried, _ = _carry16([cols[..., k] for k in range(32)])
    return jnp.stack(_reduce_512(carried), axis=-1)


def fe_sqr(a):
    return fe_mul(a, a)


def fe_add(a, b):
    cols = [a[..., i] + b[..., i] for i in range(16)]
    limbs, carry = _carry16(cols)
    for _ in range(2):  # fold 2^256 ≡ 2^32 + 977 (twice: fold can re-carry)
        p = carry * _C977
        limbs[0] = limbs[0] + (p & np.uint32(0xFFFF))
        limbs[1] = limbs[1] + (p >> np.uint32(16))
        limbs[2] = limbs[2] + carry
        limbs, carry = _carry16(limbs)
    return jnp.stack(limbs[:16], axis=-1)


def fe_sub(a, b):
    """a - b mod p (inputs semi-reduced < 2^256)."""
    return fe_add(a, fe_neg(b))


def fe_neg(b):
    """-b mod p for semi-reduced b (< 2^256): returns 4p - b, then folds."""
    # 4p - b: compute limb-wise with explicit borrow chain.
    fourp_limbs = [np.uint32((4 * P >> (16 * i)) & 0xFFFF) for i in range(18)]
    out = []
    borrow = jnp.zeros_like(b[..., 0])
    for i in range(16):
        t = fourp_limbs[i] - b[..., i] - borrow  # wraps in uint32
        out.append(t & np.uint32(0xFFFF))
        borrow = (t >> np.uint32(16)) & np.uint32(1)  # 1 if borrow occurred
    # remaining high limbs of 4p minus borrow
    hi0 = fourp_limbs[16] - borrow
    hi = [hi0, jnp.broadcast_to(jnp.asarray(fourp_limbs[17]), hi0.shape)]
    # fold hi*(2^256 coeff): value = out + hi*2^256 ≡ out + hi*(2^32+977)
    cols = list(out) + [jnp.zeros_like(out[0])]
    for i, h in enumerate(hi):
        p = h * _C977
        cols[i] = cols[i] + (p & np.uint32(0xFFFF))
        cols[i + 1] = cols[i + 1] + (p >> np.uint32(16))
        cols[i + 2] = cols[i + 2] + h
    limbs, carry = _carry16(cols)
    hi3 = limbs[16] + (carry << np.uint32(16))
    limbs = limbs[:16]
    for _ in range(2):
        p = hi3 * _C977
        limbs[0] = limbs[0] + (p & np.uint32(0xFFFF))
        limbs[1] = limbs[1] + (p >> np.uint32(16))
        limbs[2] = limbs[2] + hi3
        limbs, hi3 = _carry16(limbs)
    return jnp.stack(limbs[:16], axis=-1)


def fe_normalize(a):
    """Canonical representative in [0, p)."""
    # subtract p while >= p (at most once for semi-reduced inputs, but do twice
    # for safety)
    out = a
    for _ in range(2):
        ge = _ge_p(out)
        out = jnp.where(ge[..., None], _sub_p(out), out)
    return out


def _ge_p(a):
    ge = jnp.zeros(a.shape[:-1], dtype=bool)
    decided = jnp.zeros(a.shape[:-1], dtype=bool)
    for i in range(15, -1, -1):
        pi = _P_LIMBS[i]
        gt = a[..., i] > pi
        lt = a[..., i] < pi
        ge = jnp.where(~decided & gt, True, ge)
        decided = decided | gt | lt
    return ge | ~decided  # equal -> >=


def _sub_p(a):
    out = []
    borrow = jnp.zeros_like(a[..., 0])
    for i in range(16):
        t = a[..., i] - _P_LIMBS[i] - borrow
        out.append(t & np.uint32(0xFFFF))
        borrow = (t >> np.uint32(16)) & np.uint32(1)
    return jnp.stack(out, axis=-1)


def fe_is_zero(a):
    an = fe_normalize(a)
    return jnp.all(an == 0, axis=-1)


def fe_is_odd(a):
    return (fe_normalize(a)[..., 0] & np.uint32(1)).astype(bool)


def fe_select(cond, a, b):
    """where(cond, a, b) over field elements; cond has batch shape."""
    return jnp.where(cond[..., None], a, b)


def fe_inv(a):
    """a^(p-2) mod p via the standard secp256k1 addition chain."""
    x1 = a
    x2 = fe_mul(fe_sqr(x1), x1)                      # 2^2 - 1
    x3 = fe_mul(fe_sqr(x2), x1)                      # 2^3 - 1

    def pow2k(x, k):
        if k <= 2:
            for _ in range(k):
                x = fe_sqr(x)
            return x
        import jax
        return jax.lax.fori_loop(0, k, lambda _, v: fe_sqr(v), x)

    x6 = fe_mul(pow2k(x3, 3), x3)
    x9 = fe_mul(pow2k(x6, 3), x3)
    x11 = fe_mul(pow2k(x9, 2), x2)
    x22 = fe_mul(pow2k(x11, 11), x11)
    x44 = fe_mul(pow2k(x22, 22), x22)
    x88 = fe_mul(pow2k(x44, 44), x44)
    x176 = fe_mul(pow2k(x88, 88), x88)
    x220 = fe_mul(pow2k(x176, 44), x44)
    x223 = fe_mul(pow2k(x220, 3), x3)

    # final: p - 2 = ...(223 ones)...0111111011111111111111111111111101001101
    t = fe_mul(pow2k(x223, 23), x22)
    t = fe_mul(pow2k(t, 5), x1)
    t = fe_mul(pow2k(t, 3), x2)
    t = fe_mul(pow2k(t, 2), x1)
    return t
