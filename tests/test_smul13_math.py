"""13-bit-limb field arithmetic validation (pallas_smul13) without Pallas.

The limb helpers are shape- and backend-agnostic arrays-of-rows functions;
running them under numpy (uint32 wrap semantics identical to jnp on TPU)
makes exhaustive edge-case checking instant, where interpret-mode Pallas
on CPU takes tens of minutes to compile.  The full-window (ZZ, ZZZ)
accumulation chain is replicated in pure numpy against the pure-Python
secp256k1 oracle; the real Mosaic kernel itself is covered by the
tpu_only test in test_pallas_ecc.py.

Reference semantics: /root/reference/src/derive.rs:78-118 (scalar -> pubkey).
"""

import numpy as np
import pytest

import vuke_tpu.ecc.pallas_smul13 as m13
from vuke_tpu.ecc import ref


@pytest.fixture(autouse=True)
def _numpy_backend(monkeypatch):
    """Run the limb helpers on numpy for speed (same uint32 semantics)."""
    monkeypatch.setattr(m13, "jnp", np)
    yield


def to13(v: int, lanes: int = 1):
    """int -> list of 20 uint32 rows of shape (lanes,)."""
    return [np.full((lanes,), (v >> (13 * i)) & 0x1FFF, dtype=np.uint32)
            for i in range(m13.L13)]


def vec13(vals):
    """list of ints -> list of 20 uint32 rows of shape (len(vals),)."""
    return [np.array([(v >> (13 * i)) & 0x1FFF for v in vals],
                     dtype=np.uint32) for i in range(m13.L13)]


def from13(rows, lane: int = 0) -> int:
    return sum(int(r[lane]) << (13 * i) for i, r in enumerate(rows))


def from13_all(rows):
    n = rows[0].shape[0]
    return [from13(rows, i) for i in range(n)]


def assert_normalized(rows):
    for i, r in enumerate(rows[:-1]):
        assert (r <= 0x1FFF).all(), f"limb {i} exceeds 13 bits: {r.max()}"
    assert (rows[-1] <= 0x200).all(), f"l19 not normalized: {rows[-1].max()}"


EDGE_VALUES = [
    0, 1, 2, 0x1FFF, 0x2000,
    ref.P - 1, ref.P, ref.P + 1, 2 * ref.P, 2 * ref.P + 3,
    (1 << 256) - 1, (1 << 255) + 977, (1 << 129) - 1,
    ref.N - 1, ref.GX, ref.GY,
]


def _rand_vals(n, bits=256, seed=0):
    rng = np.random.RandomState(seed)
    return [int.from_bytes(rng.bytes(bits // 8), "big") for _ in range(n)]


def test_mul13_edge_and_random():
    vals = EDGE_VALUES + _rand_vals(48, seed=1)
    pairs = [(a, b) for a in vals[:12] for b in vals[:12]]
    pairs += list(zip(vals, reversed(vals)))
    a = vec13([p[0] for p in pairs])
    b = vec13([p[1] for p in pairs])
    out = m13._mul13(a, b)
    assert_normalized(out)
    got = from13_all(out)
    for (x, y), g in zip(pairs, got):
        assert g % ref.P == (x * y) % ref.P, (hex(x), hex(y))


def test_mul13_max_unnormalized_inputs():
    # mul inputs only require limbs <= 0x1FFF (value < 2^260)
    vmax = (1 << 260) - 1
    a = [np.full((1,), 0x1FFF, dtype=np.uint32) for _ in range(m13.L13)]
    out = m13._mul13(a, a)
    assert_normalized(out)
    assert from13(out) % ref.P == (vmax * vmax) % ref.P


def test_sqr13_matches_mul():
    vals = EDGE_VALUES + _rand_vals(48, seed=2)
    a = vec13(vals)
    out = m13._sqr13(a)
    assert_normalized(out)
    for v, g in zip(vals, from13_all(out)):
        assert g % ref.P == (v * v) % ref.P, hex(v)
    # also at the unnormalized-input bound
    amax = [np.full((1,), 0x1FFF, dtype=np.uint32) for _ in range(m13.L13)]
    g = from13(m13._sqr13(amax))
    assert g % ref.P == (((1 << 260) - 1) ** 2) % ref.P


def test_add_sub_neg13():
    vals = EDGE_VALUES + _rand_vals(32, seed=3)
    pairs = list(zip(vals, list(reversed(vals)))) + [(v, v) for v in vals]
    a = vec13([p[0] for p in pairs])
    b = vec13([p[1] for p in pairs])
    s = m13._add13(a, b)
    assert_normalized(s)
    for (x, y), g in zip(pairs, from13_all(s)):
        assert g % ref.P == (x + y) % ref.P
    d = m13._sub13(a, b)
    assert_normalized(d)
    for (x, y), g in zip(pairs, from13_all(d)):
        assert g % ref.P == (x - y) % ref.P
    # _neg13 feeding _add13 (the only legal consumer)
    n = m13._neg13(b)
    for (_, y), g in zip(pairs, from13_all(m13._add13(a, n))):
        pass  # covered by _sub13 above (same path); keep bound check:
    for r in n[:-1]:
        assert (r <= 0x1FFF).all()


def test_rows13_to16_roundtrip():
    vals = [v % (1 << 256) for v in EDGE_VALUES] + _rand_vals(32, seed=4)
    rows = vec13(vals)
    out16 = m13._rows13_to16(rows)
    for j, v in enumerate(vals):
        got = sum(int(r[j]) << (16 * i) for i, r in enumerate(out16))
        assert got == v, hex(v)


def _words_be(ks):
    return [np.array([(k >> (32 * (7 - i))) & 0xFFFFFFFF for k in ks],
                     dtype=np.uint32) for i in range(8)]


def _chain_numpy(ks, wbits=8, signed=False):
    """Replicate the kernel's per-window (ZZ, ZZZ) loop on (n,) numpy rows."""
    tab = m13._table13_f32(wbits, signed)  # (n_windows, tsize, 40) f32
    mask = (1 << wbits) - 1
    n = len(ks)
    windows = m13._n_windows(wbits)
    if signed == "odd":
        digs = m13.odd_encode_rows(_words_be(ks), wbits)
    else:
        digs = [np.array([(k >> (wbits * w)) & mask for k in ks],
                         dtype=np.uint32) for w in range(windows)]
        if signed:
            digs = m13.signed_encode(digs, wbits)

    def lookup(w):
        d = digs[w]
        idx = d & np.uint32(0x7FFF) if signed else d
        # table lookup: f32-exact int conversion, as the MXU one-hot dot does
        entry = tab[w, idx, :]  # (n, 40)
        ei = entry.astype(np.int32).astype(np.uint32)
        x2 = [ei[:, i] for i in range(m13.L13)]
        y2 = [ei[:, m13.L13 + i] for i in range(m13.L13)]
        if signed:
            sign = (d >> np.uint32(15)) != 0
            y2 = m13._select13(sign, m13._neg13(y2), y2)
        return x2, y2

    one = [np.full((n,), np.uint32(1 if i == 0 else 0), dtype=np.uint32)
           for i in range(m13.L13)]
    if signed == "odd":
        # zero-free: window 0 seeds the accumulator, no skip/infinity logic
        X, Y = lookup(0)
        ZZ, ZZZ = list(one), list(one)
        for w in range(1, windows):
            x2, y2 = lookup(w)
            X, Y, ZZ, ZZZ = m13._madd13(X, Y, ZZ, ZZZ, x2, y2)
        return X, Y, ZZ, ZZZ

    zero = [np.zeros((n,), dtype=np.uint32) for _ in range(m13.L13)]
    X, Y, ZZ, ZZZ = list(zero), list(zero), list(zero), list(zero)
    acc_inf = np.ones((n,), dtype=np.uint32)
    for w in range(windows):
        d = digs[w]
        x2, y2 = lookup(w)

        X3, Y3, ZZ3, ZZZ3 = m13._madd13(X, Y, ZZ, ZZZ, x2, y2)

        inf_b = acc_inf != 0
        nX = m13._select13(inf_b, x2, X3)
        nY = m13._select13(inf_b, y2, Y3)
        nZZ = m13._select13(inf_b, one, ZZ3)
        nZZZ = m13._select13(inf_b, one, ZZZ3)
        d_zero = d == 0
        X = m13._select13(d_zero, X, nX)
        Y = m13._select13(d_zero, Y, nY)
        ZZ = m13._select13(d_zero, ZZ, nZZ)
        ZZZ = m13._select13(d_zero, ZZZ, nZZZ)
        acc_inf = acc_inf * d_zero.astype(np.uint32)
    return X, Y, ZZ, ZZZ


@pytest.mark.parametrize("wbits,signed", [(8, False), (10, False),
                                          (10, "odd")])
def test_i8_table_planes_recombine(wbits, signed):
    """lo + (hi << 7) over the int8 two-plane table == the f32 table."""
    t8 = m13._table13_i8(wbits, signed).astype(np.int32)
    lo, hi = t8[..., :2 * m13.L13], t8[..., 2 * m13.L13:]
    assert (lo >= 0).all() and (lo <= 0x7F).all()
    assert (hi >= 0).all() and (hi <= 0x3F).all()
    assert np.array_equal(lo + (hi << 7),
                          m13._table13_f32(wbits, signed).astype(np.int32))


def test_odd_table_rows_are_odd_multiples():
    tab = m13._table13_f32(10, "odd")
    for w in (0, 13, 25):
        for j in (0, 1, 255, 511):
            x = sum(int(tab[w, j, i]) << (13 * i) for i in range(m13.L13))
            y = sum(int(tab[w, j, m13.L13 + i]) << (13 * i)
                    for i in range(m13.L13))
            ex, ey = ref.point_mul(((2 * j + 1) << (10 * w)) % ref.N)
            assert (x, y) == (ex, ey), (w, j)


@pytest.mark.parametrize("wbits", [8, 10])
def test_digit_extraction(wbits):
    """tiled._digits_t and pubkey.scalar_digits vs Python bit slicing."""
    from vuke_tpu.ecc import tiled, pubkey
    ks = [0, 1, (1 << 256) - 1, ref.N - 1, ref.GX] + _rand_vals(8, seed=6)
    words = np.array([[(k >> (32 * (7 - i))) & 0xFFFFFFFF for i in range(8)]
                      for k in ks], dtype=np.uint32)
    windows = m13._n_windows(wbits)
    mask = (1 << wbits) - 1
    expect = np.array([[(k >> (wbits * w)) & mask for w in range(windows)]
                       for k in ks], dtype=np.uint32)
    got_t = np.asarray(tiled._digits_t(np.ascontiguousarray(words.T), wbits))
    assert np.array_equal(got_t.T, expect)
    got = np.asarray(pubkey.scalar_digits(words, wbits))
    assert np.array_equal(got, expect)


@pytest.mark.parametrize("wbits", [10, 11])
def test_signed_encode_reconstructs(wbits):
    ks = [0, 1, 2, (1 << 256) - 1, ref.N - 1, ref.GX,
          0x3FF, 0x400, 0x401, (0x3FF << 10) | 0x3FF] + _rand_vals(16, seed=7)
    windows = m13._n_windows(wbits)
    mask = (1 << wbits) - 1
    digs = [np.array([(k >> (wbits * w)) & mask for k in ks],
                     dtype=np.uint32) for w in range(windows)]
    enc = m13.signed_encode(digs, wbits)
    half = 1 << (wbits - 1)
    for j, k in enumerate(ks):
        total = 0
        for w in range(windows):
            e = int(enc[w][j])
            mag, sign = e & 0x7FFF, e >> 15
            assert mag <= half
            assert not (mag == 0 and sign)
            total += (-mag if sign else mag) << (wbits * w)
        assert total == k, hex(k)


@pytest.mark.parametrize("wbits", [10, 11])
def test_odd_encode_reconstructs(wbits):
    """Zero-free odd digits: all magnitudes odd and in range, value
    reconstructs to k or k+n (even scalars gain n), always = k (mod n)."""
    ks = [1, 2, 3, 4, ref.N - 1, ref.N - 2, ref.GX % ref.N,
          0x3FF, 0x400, 0x401, (1 << 255) + 12346,
          (0x3FF << 10) | 0x3FF] + \
        [v % (ref.N - 1) + 1 for v in _rand_vals(16, seed=8)]
    enc = m13.odd_encode_rows(_words_be(ks), wbits)
    windows = m13._n_windows(wbits)
    assert len(enc) == windows
    tsize = m13._tsize(wbits, "odd")
    for j, k in enumerate(ks):
        total = 0
        for w in range(windows):
            e = int(enc[w][j])
            idx, sign = e & 0x7FFF, e >> 15
            assert idx < tsize, (w, idx)
            mag = 2 * idx + 1
            total += (-mag if sign else mag) << (wbits * w)
        expect = k if k % 2 else k + ref.N
        assert total == expect, hex(k)
        assert total % ref.N == k % ref.N


@pytest.mark.parametrize("wbits,signed", [(8, False), (10, False),
                                          (10, True), (11, True),
                                          (10, "odd"), (11, "odd")])
def test_chain_matches_oracle(wbits, signed):
    ks = [1, 2, 3, 255, 256, 257, 0xDEADBEEF, 1 << 128, (1 << 255) + 12345,
          ref.N - 1, ref.N - 2, 0x100000000, 0x1000000000000,
          1 << 250, (1 << 256) - (1 << 230)]
    ks = [k % ref.N or 1 for k in ks]
    ks += [v % (ref.N - 1) + 1 for v in _rand_vals(9, seed=5)]
    X, Y, ZZ, ZZZ = _chain_numpy(ks, wbits, signed)
    x16 = m13._rows13_to16(X)
    y16 = m13._rows13_to16(Y)
    zz16 = m13._rows13_to16(ZZ)
    zzz16 = m13._rows13_to16(ZZZ)

    def val16(rows, j):
        return sum(int(r[j]) << (16 * i) for i, r in enumerate(rows))

    for j, k in enumerate(ks):
        ex, ey = ref.point_mul(k)
        zz, zzz = val16(zz16, j) % ref.P, val16(zzz16, j) % ref.P
        gx = val16(x16, j) * pow(zz, ref.P - 2, ref.P) % ref.P
        gy = val16(y16, j) * pow(zzz, ref.P - 2, ref.P) % ref.P
        assert gx == ex and gy == ey, hex(k)
