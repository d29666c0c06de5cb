"""Pallas TPU kernel: fixed-base scalar-mul over 13-bit limbs.

The 16-bit-limb schoolbook (pallas_smul.py) spends ~40% of its VPU ops
splitting every 16x16 partial product into lo/hi halves before
accumulation (u32 can hold one product but not a column sum of them).
With 13-bit limbs a partial product is <= (2^13-1)^2 < 2^26.34 and a
column has <= 20 terms, so whole columns accumulate RAW in uint32 with no
per-product split: a field-mul drops from ~1670 to ~1340 vector ops, a
squaring (symmetric schoolbook over a pre-doubled operand) to ~1000.
Measured VPU throughput on v5e (tools/vpu_probe.py) is ~3.4T lane-ops/s
and the 16-bit kernel already runs at that ceiling, so op count is the
only lever — this is it.

Representation: 20 limbs x 13 bits (LSB first), carried in (8, 128) u32
rows.  Bounds discipline (documented per op):
  * "normalized": limbs <= 0x1FFF, top limb l19 <= 0x200 (value < ~2^256),
    the state every mul/sqr/add output returns to — mirrors the 16-bit
    scheme where the representation ceiling sits at the fold boundary so
    4p-based negation always has headroom.
  * mul/sqr INPUTS only require limbs <= 0x1FFF (any value < 2^260).
  * _neg13 returns 4p - b (4p ~ 2^258 >= any normalized value); its output
    is only ever consumed by _add13, which re-normalizes.

The reduction folds the pseudo-Mersenne identity
  2^(13i) == 2^(13(i-20)) * (2^36 + 15632)  (mod p)   for i >= 20
(2^260 mod p = 2^4*(2^32+977) = 2^36 + 15632), i.e. per spilled limb one
shift-anchored piece at bit 10 of limb i-18 and a 15632-multiple over
limbs i-20..i-18.

Same (ZZ, ZZZ) = (Z^2, Z^3) mixed-addition chain, table lookups via MXU
one-hot dots (f32 exact: 13-bit table limbs < 2^24), 32 byte windows.
Outputs convert to the standard 16x16-bit rows so everything downstream
(batch inversion, hash160, tests) is unchanged.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ref

L13 = 20                      # limbs per field element
_M13 = np.uint32(0x1FFF)
_C977 = np.uint32(977)
_C15632 = np.uint32(15632)    # 16 * 977


def _n_windows(wbits: int) -> int:
    return -(-256 // wbits)


def _signed_tsize(wbits: int) -> int:
    """Signed-digit table rows: |d| in 0..2^(wbits-1), padded to a multiple
    of 8 sublanes."""
    return (((1 << (wbits - 1)) + 1 + 7) // 8) * 8


def _tsize(wbits: int, signed) -> int:
    """Table rows for a digit mode: ``signed`` is False (unsigned windows),
    True (signed digits), or "odd" (zero-free odd digits: rows are the odd
    magnitudes 1, 3, .., 2^wbits - 1 at index (|d|-1)/2)."""
    if signed == "odd":
        return 1 << (wbits - 1)
    return _signed_tsize(wbits) if signed else (1 << wbits)


@functools.lru_cache(maxsize=4)
def _table13_i8(wbits: int = 8, signed: bool = False) -> np.ndarray:
    """(n_windows, tsize, 80) int8 two-plane window table.

    Columns 0..39 hold limb & 0x7F (7-bit low plane), 40..79 hold
    limb >> 7 (6-bit high plane).  One int8 MXU dot against a 0/1 one-hot
    yields both planes exactly in int32 (each output accumulates a single
    nonzero product <= 127); int8 dots run ~8x the f32 rate on the MXU, so
    lookups stop scaling painfully with table size.

    ``signed``: entries cover |d| in 1..2^(wbits-1) only (signed-digit
    recoding negates y in-kernel), halving the lookup cost again.
    ``signed == "odd"``: rows are the odd magnitudes (see _table13_f32)."""
    t = _table13_f32(wbits, signed).astype(np.int32)  # (w, tsize, 40)
    lo = (t & 0x7F).astype(np.int8)
    hi = (t >> 7).astype(np.int8)
    return np.concatenate([lo, hi], axis=-1)


@functools.lru_cache(maxsize=4)
def _table13_bf16(wbits: int = 8, signed=False) -> np.ndarray:
    """(n_windows, tsize, 80) bfloat16 two-plane window table: same lo7/hi6
    split as _table13_i8 but in the MXU's native dtype — plane values
    <= 127 are exact in bf16's 8-bit mantissa, and each output accumulates
    a single nonzero product, so the f32-accumulated dot is exact."""
    import ml_dtypes
    t = _table13_f32(wbits, signed).astype(np.int32)
    lo = (t & 0x7F).astype(ml_dtypes.bfloat16)
    hi = (t >> 7).astype(ml_dtypes.bfloat16)
    return np.concatenate([lo, hi], axis=-1)


@functools.lru_cache(maxsize=4)
def _table13_f32(wbits: int = 8, signed=False) -> np.ndarray:
    """(n_windows, tsize, 40) float32 fixed-base window table:
    entry [w, d] = affine (x limbs 0..19, y limbs 20..39, 13-bit) of
    d * 2^(wbits*w) * G.  Entry d=0 is (0, 0) — never selected.
    ``signed``: d covers 1..2^(wbits-1) only (rows padded to 8).
    ``signed == "odd"``: row j holds (2j+1) * 2^(wbits*w) * G — the
    zero-free odd-digit table (every row a valid point, no d=0 row)."""
    windows = _n_windows(wbits)
    tsize = _tsize(wbits, signed)
    out = np.zeros((windows, tsize, 2 * L13), dtype=np.float32)

    def put(w, row, pt):
        x, y = pt
        for i in range(L13):
            out[w, row, i] = (x >> (13 * i)) & 0x1FFF
            out[w, row, L13 + i] = (y >> (13 * i)) & 0x1FFF

    base = (ref.GX, ref.GY)
    for w in range(windows):
        if signed == "odd":
            acc = base
            step = ref.point_add(base, base)
            for j in range(tsize):                 # acc = (2j+1) * base
                put(w, j, acc)
                acc = ref.point_add(acc, step)
        else:
            dmax = (1 << (wbits - 1)) if signed else (1 << wbits) - 1
            acc = None
            for d in range(1, dmax + 1):
                acc = ref.point_add(acc, base)
                put(w, d, acc)
        for _ in range(wbits):
            base = ref.point_add(base, base)
    return out


def signed_encode(unsigned_digits, wbits: int):
    """Recode unsigned windows into signed digits d in [-2^(wbits-1),
    2^(wbits-1)], encoded |d| | (sign << 15); |d| == 0 encodes as 0
    regardless of sign so digit-0 lanes still skip.

    Invariant per step (t = u_w + carry): t <= half keeps d = t; else
    d = t - 2^wbits (so |d| = 2^wbits - t <= half - 1) with carry 1 into
    the next window.  Requires n_windows*wbits >= 258 so the top window
    (<= wbits-2 scalar bits + carry) can never go negative — byte windows
    (32*8 == 256) cannot be signed-recoded."""
    windows = len(unsigned_digits)
    assert windows * wbits >= 258, "signed digits need >= 2 spare top bits"
    half = np.uint32(1 << (wbits - 1))
    full = np.uint32(1 << wbits)
    out = []
    carry = None
    for u in unsigned_digits:
        t = u if carry is None else u + carry
        neg = t > half
        mag = jnp.where(neg, full - t, t)
        sign_bit = neg.astype(jnp.uint32) << np.uint32(15)
        out.append(jnp.where(mag == 0, jnp.zeros_like(mag), mag | sign_bit))
        carry = neg.astype(jnp.uint32)
    return out


_N_WORDS_BE = [np.uint32((ref.N >> (32 * (7 - i))) & 0xFFFFFFFF)
               for i in range(8)]


def odd_encode_rows(word_rows, wbits: int):
    """Zero-free odd-digit recoding of 8 BE u32 word rows (scalars in
    [1, n-1]) -> list of n_windows encoded digit arrays, LSB window first.

    Encoding: idx | (sign << 15) where the window value is
    (2*idx + 1) * (-1)^sign — every window is a valid (odd) table row, so
    the kernel needs no d=0 skip and no infinity tracking.

    Even scalars first gain the (odd) group order n: k+n = k (mod n), so
    the derived point is unchanged; k+n < 2^258 needs windows*wbits >= 258
    (same headroom rule as signed_encode).  Digits then come from the
    classic odd recoding: d = (k mod 2^(wbits+1)) - 2^wbits (odd,
    |d| <= 2^wbits - 1), next k = ((k >> wbits) & ~1) | 1 — exact because
    k - d = 2^(wbits+1)*floor(k / 2^(wbits+1)) + 2^wbits, and the quotient
    stays odd so every subsequent digit is odd too.  After windows-1 steps
    the remaining k (< 2^wbits, odd, positive) is the top digit."""
    windows = _n_windows(wbits)
    assert windows * wbits >= 258, "odd digits need >= 2 spare top bits"
    one = np.uint32(1)
    even = (word_rows[7] & one) == 0

    # conditional k += n (carry chain from the least-significant word);
    # the final carry is bit 256, kept as a 9th (most-significant) word
    plus = [None] * 8
    carry = jnp.zeros_like(word_rows[0])
    for i in range(7, -1, -1):
        t = word_rows[i] + _N_WORDS_BE[i]
        c1 = (t < word_rows[i]).astype(jnp.uint32)
        t2 = t + carry
        c2 = (t2 < t).astype(jnp.uint32)
        plus[i] = t2
        carry = c1 | c2
    zero = jnp.zeros_like(word_rows[0])
    k = [jnp.where(even, carry, zero)] + \
        [jnp.where(even, plus[i], word_rows[i]) for i in range(8)]

    lowmask = np.uint32((1 << (wbits + 1)) - 1)
    half = np.uint32(1 << wbits)
    digs = []
    for _ in range(windows - 1):
        low = k[8] & lowmask                       # k mod 2^(wbits+1), odd
        neg = low < half
        mag = jnp.where(neg, half - low, low - half)   # odd, 1..2^wbits-1
        digs.append((mag >> one) | (neg.astype(jnp.uint32) << np.uint32(15)))
        # k = ((k >> wbits) & ~1) | 1 over the 9-word chain
        sh = np.uint32(wbits)
        ish = np.uint32(32 - wbits)
        nk = [(k[i] >> sh) | (k[i - 1] << ish) if i else k[0] >> sh
              for i in range(9)]
        nk[8] = (nk[8] & ~one) | one
        k = nk
    # remaining k < 2^wbits (windows*wbits >= 258 headroom), odd, positive
    digs.append(k[8] >> one)
    return digs


def _carry13(cols):
    """Carry-propagate u32 row columns into 13-bit limbs. cols values must
    be < 2^32 - 2^19 so adding an incoming carry (< 2^19) cannot wrap."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        t = c + carry
        out.append(t & _M13)
        carry = t >> np.uint32(13)
    return out, carry


def _fold_tail13(limbs, extras):
    """Fold value parts at bits >= 256 back below, returning normalized
    limbs (l19 <= 0x200).

    ``limbs``: 20 rows, each <= ~2^13 (l19 may be full 13-bit);
    ``extras``: list of (row, limb_index) pairs: row * 2^(13*limb_index+260)
    contributions (i.e. spill limbs at positions >= 20), each row < 2^19.

    Every spilled unit of 2^260 folds as 2^36 + 15632; l19's bits 9..12
    (value bits >= 256) fold as 2^256 == 2^32 + 977: one piece at bit 6 of
    limb 2 plus a 977-multiple over limbs 0..1.  One carry pass then
    renormalizes (pieces are < 2^19 per column; see _carry13 bound)."""
    cols = list(limbs)
    for row, idx in extras:
        # row * 2^(13*idx) * (2^36 + 15632), anchored at limb idx
        a = row << np.uint32(10)                       # 2^36 = limb 2, bit 10
        cols[idx + 2] = cols[idx + 2] + (a & _M13)
        cols[idx + 3] = cols[idx + 3] + (a >> np.uint32(13))
        b = row * _C15632
        cols[idx] = cols[idx] + (b & _M13)
        cols[idx + 1] = cols[idx + 1] + ((b >> np.uint32(13)) & _M13)
        cols[idx + 2] = cols[idx + 2] + (b >> np.uint32(26))
    h = cols[19] >> np.uint32(9)                       # value bits 256..268
    cols[19] = cols[19] & np.uint32(0x1FF)
    a = h << np.uint32(6)                              # h * 2^32: limb 2 bit 6
    cols[2] = cols[2] + (a & _M13)
    cols[3] = cols[3] + (a >> np.uint32(13))
    b = h * _C977
    cols[0] = cols[0] + (b & _M13)
    cols[1] = cols[1] + (b >> np.uint32(13))
    out, carry = _carry13(cols)
    # carry out of l19 is impossible: cols[19] <= 0x1FF + pieces < 2^13
    del carry
    return out


def _reduce13(cols):
    """39 raw product columns (each < 2^31.7) -> normalized 20 limbs.

    High-first: columns 20..38 are carried standalone (their carry-in from
    the low half is deliberately deferred — the low half keeps its raw
    columns and is carried only ONCE, after every fold piece has landed),
    saving a full-width carry pass vs the carry-everything-first scheme
    (~80 of ~460 vector ops per reduce, and a reduce runs 9x per window).

    Bounds: spill limbs h <= 0x1FFF fold as h*(2^36 + 15632) anchored at
    their position (pieces < 2^13 each); the high chain's carry-out is
    small (col 38 is a single product < 2^26, so carry < 2^14) and folds
    the same way at position 39.  Pieces land on raw low columns
    (< 2^31.75 incl. the callers' fused row adds) + < 2^15 of pieces per
    column — still under _carry13's 2^32 - 2^19 ceiling.  The three
    extension columns 20..22 hold only fold pieces (< 2^16) and are folded
    raw before the single low carry; the final carry (< 2^19) and l19 high
    bits go through _fold_tail13 as before."""
    hi, hcarry = _carry13(cols[20:])                   # 19 limbs + carry<2^14
    z = cols[0] * np.uint32(0)
    low = list(cols[:20]) + [z, z, z]
    for i in range(19):                                # spill at limb 20+i
        h = hi[i]
        a = h << np.uint32(10)
        low[i + 2] = low[i + 2] + (a & _M13)
        low[i + 3] = low[i + 3] + (a >> np.uint32(13))
        b = h * _C15632
        low[i] = low[i] + (b & _M13)
        low[i + 1] = low[i + 1] + ((b >> np.uint32(13)) & _M13)
        low[i + 2] = low[i + 2] + (b >> np.uint32(26))
    a = hcarry << np.uint32(10)                        # carry at limb 39
    low[21] = low[21] + (a & _M13)
    low[22] = low[22] + (a >> np.uint32(13))
    b = hcarry * _C15632
    low[19] = low[19] + (b & _M13)
    low[20] = low[20] + ((b >> np.uint32(13)) & _M13)
    low[21] = low[21] + (b >> np.uint32(26))
    for j in range(3):                                 # ext cols, < 2^16
        h = low[20 + j]
        a = h << np.uint32(10)
        low[j + 2] = low[j + 2] + (a & _M13)
        low[j + 3] = low[j + 3] + (a >> np.uint32(13))
        b = h * _C15632
        low[j] = low[j] + (b & _M13)
        low[j + 1] = low[j + 1] + ((b >> np.uint32(13)) & _M13)
        low[j + 2] = low[j + 2] + (b >> np.uint32(26))
    limbs, carry = _carry13(low[:20])
    return _fold_tail13(limbs, [(carry, 0)])


def _school_cols(a, b):
    """Raw schoolbook columns of two equal-length limb lists."""
    n = len(a)
    cols = [None] * (2 * n - 1)
    for i in range(n):
        ai = a[i]
        for j in range(n):
            p = ai * b[j]                              # <= 2^26.34, no split
            k = i + j
            cols[k] = p if cols[k] is None else cols[k] + p
    return cols


def _mul13_cols(a, b, kara: bool = True):
    """Raw 39 product columns.

    ``kara=True`` (default): one Karatsuba level (10+10 limbs).  The
    middle columns are m - z0 - z2 computed in wrapping uint32 — exact
    because the identity holds columnwise over non-negative integers.
    Column bound: z1 <= 10*(2^14-2)^2 plus an overlapping z0/z2 column
    <= 10*(2^13-1)^2, total < 3.36e9 — under the _carry13 bound
    (2^32 - 2^19) with room for the fused 13/14-bit limb-row adds, but
    NOT for summing with a second product's columns.

    ``kara=False``: plain schoolbook, columns <= 20*(2^13-1)^2 < 2^30.7,
    so TWO such column sets can be summed before one reduction (the Y3
    fusion in _madd13 relies on this)."""
    if not kara:
        return _school_cols(a, b)
    h = L13 // 2
    a0, a1 = a[:h], a[h:]
    b0, b1 = b[:h], b[h:]
    z0 = _school_cols(a0, b0)                          # cols 0..18
    z2 = _school_cols(a1, b1)                          # cols 20..38
    sa = [a0[i] + a1[i] for i in range(h)]             # <= 2^14 - 2
    sb = [b0[i] + b1[i] for i in range(h)]
    m = _school_cols(sa, sb)                           # <= 10 * 2^28
    z1 = [m[k] - z0[k] - z2[k] for k in range(2 * h - 1)]  # exact, >= 0
    cols = list(z0) + [None] + list(z2)
    for k in range(2 * h - 1):
        t = k + h
        cols[t] = z1[k] if cols[t] is None else cols[t] + z1[k]
    return cols


def _sqr13_cols(a):
    """Raw squaring columns via the symmetric schoolbook: cross terms use a
    pre-doubled operand (2a_j <= 2^14, product <= 2^27.34, column sums
    <= 9 doubled cross terms + 1 diagonal per column < 10 * 2^27.4)."""
    d = [a[j] + a[j] for j in range(L13)]
    cols = [None] * 39
    for i in range(L13):
        cols_i2 = a[i] * a[i]
        k = 2 * i
        cols[k] = cols_i2 if cols[k] is None else cols[k] + cols_i2
        ai = a[i]
        for j in range(i + 1, L13):
            p = ai * d[j]
            k = i + j
            cols[k] = p if cols[k] is None else cols[k] + p
    return cols


def _add_rows_into(cols, rows):
    """Add 20 limb rows (each < 2^15) into the low columns, in place."""
    for i in range(L13):
        cols[i] = cols[i] + rows[i]
    return cols


def _mul13(a, b):
    """Field mul of 13-bit limb-row lists (inputs: limbs <= 0x1FFF)."""
    return _reduce13(_mul13_cols(a, b))


def _sqr13(a):
    return _reduce13(_sqr13_cols(a))


def _add13(a, b):
    """Add, renormalized (output l19 <= 0x200)."""
    cols = [a[i] + b[i] for i in range(L13)]
    limbs, carry = _carry13(cols)
    return _fold_tail13(limbs, [(carry, 0)])


_4P_LIMBS13 = [np.uint32((4 * ref.P >> (13 * i)) & 0x1FFF) for i in range(L13)]
_4P_HI13 = np.uint32(4 * ref.P >> (13 * L13))   # bits >= 260 of 4p (= 0)
assert _4P_HI13 == 0 and (4 * ref.P).bit_length() == 258


def _neg13(b):
    """4p - b for normalized b (< 2^257 << 4p ~ 2^258).  Output is NOT
    normalized (value < 2^258) — feed only into _add13."""
    out = []
    borrow = jnp.zeros_like(b[0])
    for i in range(L13):
        t = _4P_LIMBS13[i] - b[i] - borrow
        out.append(t & _M13)
        borrow = (t >> np.uint32(13)) & np.uint32(1)
    # b <= 4p so the final borrow is always zero
    return out


def _sub13(a, b):
    """a - b mod p for normalized a, b."""
    n = _neg13(b)
    # a + (4p - b) < 2^257 + 2^258: the carry chain spills <= 1 unit past
    # limb 19's 13 bits, which _fold_tail13 handles via the l19 high bits.
    cols = [a[i] + n[i] for i in range(L13)]
    limbs, carry = _carry13(cols)
    return _fold_tail13(limbs, [(carry, 0)])


def _select13(cond, a, b):
    return [jnp.where(cond, a[i], b[i]) for i in range(L13)]


def _madd13(X, Y, ZZ, ZZZ, x2, y2):
    """Fused (ZZ, ZZZ)-coordinate mixed addition: 8M + 2S with the
    add/sub passes folded into the product reductions.

    Identities used (mod p, with n* = 4p - * from _neg13):
      H  = x2*ZZ + nX          (one reduce instead of mul-reduce + sub)
      R  = y2*ZZZ + nY
      X3 = R^2 + nHHH + 2*nV   (nV limbs doubled pre-add: <= 2^14, still
                                within _carry13's column budget)
      Y3 = R*(V - X3) + nY*HHH (two raw products summed, ONE reduce;
                                columns <= 40*(2^13-1)^2 < 2^31.4)
    Saves ~11% of the window's vector ops vs separate _sub13/_add13 calls.
    """
    nX = _neg13(X)
    nY = _neg13(Y)
    H = _reduce13(_add_rows_into(_mul13_cols(x2, ZZ), nX))
    R = _reduce13(_add_rows_into(_mul13_cols(y2, ZZZ), nY))
    HH = _sqr13(H)
    HHH = _mul13(H, HH)
    V = _mul13(X, HH)
    nHHH = _neg13(HHH)
    nV2 = [v + v for v in _neg13(V)]
    X3 = _reduce13(_add_rows_into(
        _add_rows_into(_sqr13_cols(R), nHHH), nV2))
    # both schoolbook: two Karatsuba column sets summed would overflow u32
    y3cols = _mul13_cols(R, _sub13(V, X3), kara=False)
    y3b = _mul13_cols(nY, HHH, kara=False)
    Y3 = _reduce13([y3cols[k] + y3b[k] for k in range(39)])
    ZZ3 = _mul13(ZZ, HH)
    ZZZ3 = _mul13(ZZZ, HHH)
    return X3, Y3, ZZ3, ZZZ3


def _rows13_to16(rows13):
    """20x13-bit rows -> 16x16-bit rows (value < 2^256 guaranteed by
    normalization: l19 <= 0x200 means bits >= 256 are clear... l19 <= 0x1FF
    strictly after _fold_tail13's mask; a carry into l19 keeps it < 2^10,
    i.e. value < 2^257 — fold once more if bit 256 could be set."""
    # ensure value < 2^256: fold l19's bits >= 9, twice — after one fold a
    # low-limb carry chain can still leave l19 == 0x200 (value == 2^256+eps,
    # a ~2^-223 tail for random values but reachable by adversarial inputs);
    # the second fold's input has l19 <= 0x200 and tiny low limbs, so its
    # output is strictly < 2^256.
    rows = _fold_tail13(_fold_tail13(list(rows13), []), [])
    out = []
    for j in range(16):
        start = 16 * j
        i0 = start // 13
        sh = start - 13 * i0
        t = rows[i0] >> np.uint32(sh)
        avail = 13 - sh
        t = t | (rows[i0 + 1] << np.uint32(avail)) if i0 + 1 < L13 else t
        if avail + 13 < 16 and i0 + 2 < L13:
            t = t | (rows[i0 + 2] << np.uint32(avail + 13))
        out.append(t & np.uint32(0xFFFF))
    return out


def _smul13_kernel(digits_ref, table_ref, x_ref, y_ref, zz_ref, zzz_ref,
                   *, signed: bool = False, out13: bool = False,
                   prefetch: bool = True, ipt: int = 1):
    """digits_ref: (n_windows, ipt, 8, 128) u32; table (n_windows, tsize, 40)
    f32 or (n_windows, tsize, 80) int8 planes; outputs: (16, ipt, 8, 128)
    u32 X, Y, ZZ (=Z^2), ZZZ (=Z^3) — 16-bit rows, bit-compatible with the
    16-bit kernel's outputs.

    ``ipt`` (items per grid step): process ``ipt`` tiles per kernel
    invocation — every field op becomes an (ipt, 8, 128) batch, giving the
    scheduler ipt-way ILP across the madd dependency chain (the same trick
    the MT19937 kernel uses for its serial init chain).  ipt == 1 keeps
    the original (8, 128) row shapes bit-for-bit (warm-cache stability).

    ``signed``: digits are encoded |d| | (sign << 15); a negative digit
    adds -|d|*2^(wbits*w)*G by negating the looked-up y (4p - y, a valid
    _madd13 operand: limbs <= 0x1FFF, value <= 4p).

    ``signed == "odd"``: zero-free odd digits (odd_encode_rows) — every
    window selects a valid table row, so the d=0 skip and the
    infinity-accumulator select chains vanish: window 0 initializes the
    accumulator directly from its lookup and the loop runs windows
    1..n-1 as unconditional mixed adds (~6 _select13 fewer per window).

    ``prefetch``: software-pipeline the table lookup — carry window w's
    looked-up (x2, y2) in the loop state and issue window w+1's MXU dots
    inside w's body, so the scheduler can overlap them with the VPU-bound
    field chain (the dots have no dependency on the chain)."""
    from jax.experimental import pallas as pl

    n_windows = digits_ref.shape[0]
    tsize = table_ref.shape[1]
    lanes = 128 if ipt == 1 else ipt * 128
    # measured-rejected variants (docs/KERNELS.md): int16 one-hot compares
    # (Mosaic: "16-bit iota not supported by hardware", and the i32->i16
    # narrowing variant also fails to lower) and full window unrolling
    # (11.11ms vs 10.79 fori at ipt=2, with a 141s Mosaic compile).
    unroll_windows = False
    iota2 = jax.lax.broadcasted_iota(jnp.uint32, (tsize, lanes), 0)

    def rows(arr):
        return [arr[i] for i in range(L13)]

    def stack(rs):
        return jnp.stack(rs, axis=0)

    def lookup(w):
        """Window w's table entries as (x2 rows, y2 rows), sign applied."""
        if ipt == 1:
            d = digits_ref[pl.ds(w, 1), 0].reshape(8, 128)
        else:
            d = digits_ref[pl.ds(w, 1)].reshape(ipt, 8, 128)
        if signed:
            sign = (d >> np.uint32(15)) != 0
            idx = d & np.uint32(0x7FFF)
        else:
            idx = d
        int8_planes = table_ref.dtype == jnp.int8
        bf16_planes = table_ref.dtype == jnp.bfloat16
        tab_w = table_ref[pl.ds(w, 1), :, :].reshape(tsize, table_ref.shape[2])
        # a single 4D dot per window (one-hot with the whole (ipt, 8, 128)
        # row shape as non-contracting dims) measured 18.7ms vs 10.65 —
        # Mosaic lowers the multi-dim-N contraction off the MXU fast path;
        # the 8 per-sublane (tsize, ipt*128) dots below stay.
        entry_groups = []
        for a in range(8):
            if ipt == 1:
                d_a = idx[a:a + 1, :]
            else:
                d_a = idx[:, a, :].reshape(1, ipt * 128)
            if int8_planes:
                onehot = (d_a == iota2).astype(jnp.int8)
                e = jax.lax.dot_general(
                    tab_w, onehot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)    # (80, lanes)
                e = e[:2 * L13] + (e[2 * L13:] << 7)     # lo + (hi << 7)
                e = e.astype(jnp.uint32)
            elif bf16_planes:
                onehot = (d_a == iota2).astype(jnp.bfloat16)
                e = jax.lax.dot_general(
                    tab_w, onehot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (80, lanes), exact
                e = e.astype(jnp.int32)
                e = e[:2 * L13] + (e[2 * L13:] << 7)
                e = e.astype(jnp.uint32)
            else:
                onehot = (d_a == iota2).astype(jnp.float32)
                e = jax.lax.dot_general(
                    tab_w, onehot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)      # (40, lanes)
                e = e.astype(jnp.int32).astype(jnp.uint32)
            if ipt > 1:
                e = e.reshape(e.shape[0], ipt, 128)
            entry_groups.append(e)
        if ipt == 1:
            x2 = [jnp.concatenate([entry_groups[a][i:i + 1, :] for a in range(8)],
                                  axis=0) for i in range(L13)]
            y2 = [jnp.concatenate([entry_groups[a][L13 + i:L13 + i + 1, :]
                                   for a in range(8)], axis=0) for i in range(L13)]
        else:
            x2 = [jnp.stack([entry_groups[a][i] for a in range(8)], axis=1)
                  for i in range(L13)]
            y2 = [jnp.stack([entry_groups[a][L13 + i] for a in range(8)], axis=1)
                  for i in range(L13)]
        if signed:
            y2 = _select13(sign, _neg13(y2), y2)
        return x2, y2

    zero_free = signed == "odd"
    _row_shape = (8, 128) if ipt == 1 else (ipt, 8, 128)

    def body(w, carry):
        if prefetch:
            if zero_free:
                X_a, Y_a, ZZ_a, ZZZ_a, x2_a, y2_a = carry
            else:
                X_a, Y_a, ZZ_a, ZZZ_a, acc_inf, x2_a, y2_a = carry
            x2, y2 = rows(x2_a), rows(y2_a)
            nx2, ny2 = lookup(jnp.minimum(w + 1, n_windows - 1))
        else:
            if zero_free:
                X_a, Y_a, ZZ_a, ZZZ_a = carry
            else:
                X_a, Y_a, ZZ_a, ZZZ_a, acc_inf = carry
            x2, y2 = lookup(w)
        X, Y = rows(X_a), rows(Y_a)
        ZZ, ZZZ = rows(ZZ_a), rows(ZZZ_a)

        # fused mixed add in (ZZ, ZZZ) coordinates: 8M + 2S
        X3, Y3, ZZ3, ZZZ3 = _madd13(X, Y, ZZ, ZZZ, x2, y2)

        if zero_free:
            out = (stack(X3), stack(Y3), stack(ZZ3), stack(ZZZ3))
            if prefetch:
                out = out + (stack(nx2), stack(ny2))
            return out

        if ipt == 1:
            d = digits_ref[pl.ds(w, 1), 0].reshape(8, 128)
        else:
            d = digits_ref[pl.ds(w, 1)].reshape(ipt, 8, 128)
        one_rows = [jnp.full(_row_shape, np.uint32(1) if i == 0 else np.uint32(0),
                             dtype=jnp.uint32) for i in range(L13)]
        inf_b = acc_inf != 0
        nX = _select13(inf_b, x2, X3)
        nY = _select13(inf_b, y2, Y3)
        nZZ = _select13(inf_b, one_rows, ZZ3)
        nZZZ = _select13(inf_b, one_rows, ZZZ3)
        d_zero = d == 0
        X = _select13(d_zero, X, nX)
        Y = _select13(d_zero, Y, nY)
        ZZ = _select13(d_zero, ZZ, nZZ)
        ZZZ = _select13(d_zero, ZZZ, nZZZ)
        acc_inf = acc_inf * d_zero.astype(jnp.uint32)
        out = (stack(X), stack(Y), stack(ZZ), stack(ZZZ), acc_inf)
        if prefetch:
            out = out + (stack(nx2), stack(ny2))
        return out

    if zero_free:
        # window 0 is always a valid point: seed the accumulator from its
        # lookup ((ZZ, ZZZ) = 1) and run windows 1.. as unconditional adds
        x20, y20 = lookup(0)
        one_rows = [jnp.full(_row_shape, np.uint32(1) if i == 0 else np.uint32(0),
                             dtype=jnp.uint32) for i in range(L13)]
        init = (stack(x20), stack(y20), stack(one_rows), stack(one_rows))
        if prefetch:
            x21, y21 = lookup(1)
            init = init + (stack(x21), stack(y21))
        if unroll_windows:
            res = init
            for w in range(1, n_windows):
                res = body(w, res)
        else:
            res = jax.lax.fori_loop(1, n_windows, body, init)
    else:
        z = jnp.zeros((L13,) + _row_shape, jnp.uint32)
        init = (z, z, z, z, jnp.ones(_row_shape, jnp.uint32))
        if prefetch:
            x20, y20 = lookup(0)
            init = init + (stack(x20), stack(y20))
        if unroll_windows:
            res = init
            for w in range(n_windows):
                res = body(w, res)
        else:
            res = jax.lax.fori_loop(0, n_windows, body, init)
    X_a, Y_a, ZZ_a, ZZZ_a = res[0], res[1], res[2], res[3]
    if out13:
        # raw 13-bit rows (value < 2^258 for Y after a signed top-window
        # inf-replacement, else normalized) — the inversion/affine stage
        # continues in 13-bit limbs and converts at the very end
        outs = (X_a, Y_a, ZZ_a, ZZZ_a)
    else:
        outs = tuple(jnp.stack(_rows13_to16(rows(a)), axis=0)
                     for a in (X_a, Y_a, ZZ_a, ZZZ_a))
    for ref_, a in zip((x_ref, y_ref, zz_ref, zzz_ref), outs):
        if ipt == 1:
            ref_[:, 0] = a
        else:
            ref_[:, :] = a


def _prefetch_default() -> bool:
    # measured exactly neutral at w10/i8/signed (11.82ms both ways) — the
    # int8 lookups are too small a share to need hiding; default off
    import os
    return os.environ.get("VUKE_TPU_PREFETCH", "0") not in ("0", "false", "no")


def _ipt_default() -> int:
    """Tiles per grid step (ILP across the madd chain).  Measured on v5e
    at 2^17 (2026-08-20): ipt=1 11.19ms, ipt=2 10.65-10.88ms (+4.5%),
    ipt=4 11.44ms (VMEM pressure wins out) — see docs/KERNELS.md.
    VUKE_TPU_IPT overrides; odd nb falls back to 1 automatically.
    CPU (interpret-mode) backends stay at 1: ipt only helps the Mosaic
    scheduler, and the bigger fused body slows the already-slow XLA:CPU
    compiles of the test tier for nothing."""
    import os
    v = os.environ.get("VUKE_TPU_IPT")
    if v is not None:
        return int(v)
    try:
        if jax.devices()[0].platform == "cpu":
            return 1
    except Exception:
        pass
    return 2


@functools.lru_cache(maxsize=8)
def _smul13_call(n: int, tile: int, wbits: int = 8, interpret: bool = False,
                 lookup: str = "i8", signed=False,
                 out13: bool = False, prefetch: bool | None = None,
                 ipt: int | None = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if prefetch is None:
        prefetch = _prefetch_default()
    if ipt is None:
        ipt = _ipt_default()
    windows = _n_windows(wbits)
    tsize = _tsize(wbits, signed)
    tab_cols = 2 * L13 if lookup == "f32" else 4 * L13
    out_rows = L13 if out13 else 16
    nb = n // tile
    while ipt > 1 and nb % ipt:
        ipt //= 2
    grid = (nb // ipt,)
    return pl.pallas_call(
        functools.partial(_smul13_kernel, signed=signed, out13=out13,
                          prefetch=prefetch, ipt=ipt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((windows, ipt, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((windows, tsize, tab_cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_rows, ipt, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, nb, 8, 128), jnp.uint32)
            for _ in range(4)
        ],
        interpret=interpret,
    )


def scalar_mul_zz_pallas13(digits, tile: int = 1024, wbits: int = 8,
                           interpret: bool = False, lookup: str = "i8",
                           signed=False):
    """digits: (N, n_windows) uint32 wbits-wide windows (LSB window first;
    signed-encoded |d| | sign<<15 when ``signed``; odd-encoded
    idx | sign<<15 when ``signed == "odd"``) -> (X, Y, ZZ, ZZZ) as
    (N, 16) 16-bit limb arrays (same contract as
    pallas_smul.scalar_mul_zz_pallas)."""
    n = digits.shape[0]
    windows = _n_windows(wbits)
    assert n % tile == 0, f"batch {n} not divisible by tile {tile}"
    assert digits.shape[1] == windows, (digits.shape, wbits)
    nb = n // tile
    digits_t = digits.T.reshape(windows, nb, 8, 128)
    table = jnp.asarray(
        {"i8": _table13_i8, "bf16": _table13_bf16,
         "f32": _table13_f32}[lookup](wbits, signed))
    X, Y, ZZ, ZZZ = _smul13_call(n, tile, wbits, interpret, lookup, signed)(
        digits_t, table)

    def back(a):
        return a.reshape(16, n).T

    return back(X), back(Y), back(ZZ), back(ZZZ)
