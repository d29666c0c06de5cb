"""secp256k1 parity tests: device field/point math vs pure-Python oracle."""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from vuke_tpu.ecc import field, point, pubkey, ref


def _fe(vs):
    return jnp.stack([field.fe_from_int(v) for v in vs], axis=0)


def _ints(fe_batch):
    arr = np.asarray(fe_batch, dtype=np.uint64).reshape(-1, 16)
    return [sum(int(l) << (16 * i) for i, l in enumerate(row)) for row in arr]


RNG_VALS = [1, 2, 977, 2**255 - 19, ref.P - 1, ref.P - 2, 0xDEADBEEF,
            int.from_bytes(hashlib.sha256(b"x").digest(), "big") % ref.P]


def test_fe_mul_add_sub():
    a = _fe(RNG_VALS)
    b = _fe(list(reversed(RNG_VALS)))
    got_mul = _ints(field.fe_normalize(field.fe_mul(a, b)))
    got_add = _ints(field.fe_normalize(field.fe_add(a, b)))
    got_sub = _ints(field.fe_normalize(field.fe_sub(a, b)))
    for i, (x, y) in enumerate(zip(RNG_VALS, reversed(RNG_VALS))):
        assert got_mul[i] == x * y % ref.P
        assert got_add[i] == (x + y) % ref.P
        assert got_sub[i] == (x - y) % ref.P


def test_fe_mul_semireduced_inputs():
    # inputs in [p, 2^256) must still multiply correctly
    vals = [ref.P, ref.P + 1, 2**256 - 1, ref.P + 12345]
    a = _fe(vals)
    got = _ints(field.fe_normalize(field.fe_mul(a, a)))
    for i, v in enumerate(vals):
        assert got[i] == (v * v) % ref.P


def test_fe_inv():
    vals = [1, 2, 977, ref.P - 1, 123456789]
    a = _fe(vals)
    got = _ints(field.fe_normalize(field.fe_inv(a)))
    for i, v in enumerate(vals):
        assert got[i] == pow(v, ref.P - 2, ref.P)


def test_point_double_and_mixed_add():
    # 2G and G + 2G = 3G against the oracle
    one = field.fe_from_int(1, (1,))
    gx = field.fe_from_int(ref.GX, (1,))
    gy = field.fe_from_int(ref.GY, (1,))
    X, Y, Z = point.point_double(gx, gy, one)
    x2, y2 = point.to_affine(X, Y, Z, chunk=1)
    ex, ey = ref.point_mul(2)
    assert _ints(field.fe_normalize(x2))[0] == ex
    assert _ints(field.fe_normalize(y2))[0] == ey

    X3, Y3, Z3 = point.point_add_mixed(X, Y, Z, gx, gy)
    x3, y3 = point.to_affine(X3, Y3, Z3, chunk=1)
    ex3, ey3 = ref.point_mul(3)
    assert _ints(field.fe_normalize(x3))[0] == ex3
    assert _ints(field.fe_normalize(y3))[0] == ey3


def test_scalar_mul_base_small_and_random():
    scalars = [1, 2, 3, 255, 256, 257, 65537, 2**32, 2**255 % ref.N,
               0xC4BBCB1FBEC99D65BF59D85C8CB62EE2DB963F0FE106F483D9AFA73BD4E39A8A,
               ref.N - 1]
    words = np.zeros((len(scalars), 8), dtype=np.uint32)
    for i, k in enumerate(scalars):
        for j in range(8):
            words[i, j] = (k >> (32 * (7 - j))) & 0xFFFFFFFF
    # pad batch to multiple of inversion chunk
    pad = (-len(scalars)) % 4
    wpad = np.vstack([words, np.tile(words[:1], (pad, 1))])
    xw, yw, y_odd = pubkey.derive_pubkey(jnp.asarray(wpad), inv_chunk=4)
    xw = np.asarray(xw)
    yw = np.asarray(yw)
    y_odd = np.asarray(y_odd)
    for i, k in enumerate(scalars):
        ex, ey = ref.point_mul(k)
        gx = sum(int(xw[i, j]) << (32 * (7 - j)) for j in range(8))
        gy = sum(int(yw[i, j]) << (32 * (7 - j)) for j in range(8))
        assert gx == ex, f"x mismatch for k={k}"
        assert gy == ey, f"y mismatch for k={k}"
        assert bool(y_odd[i]) == bool(ey & 1)


def test_normalize_scalar():
    cases = [0, 1, ref.N - 1, ref.N, ref.N + 5, 2**256 - 1]
    words = np.zeros((len(cases), 8), dtype=np.uint32)
    for i, k in enumerate(cases):
        for j in range(8):
            words[i, j] = (k >> (32 * (7 - j))) & 0xFFFFFFFF
    out = np.asarray(pubkey.normalize_scalar(jnp.asarray(words)))
    for i, k in enumerate(cases):
        expect = k % ref.N
        if expect == 0:
            expect = 1
        got = sum(int(out[i, j]) << (32 * (7 - j)) for j in range(8))
        assert got == expect, f"normalize failed for {k}"


def test_hash160_matches_hashlib():
    # "correct horse battery staple" key — the reference's golden vector
    # (/root/reference/src/derive.rs:178-200)
    k = 0xC4BBCB1FBEC99D65BF59D85C8CB62EE2DB963F0FE106F483D9AFA73BD4E39A8A
    words = np.zeros((4, 8), dtype=np.uint32)
    for j in range(8):
        words[:, j] = (k >> (32 * (7 - j))) & 0xFFFFFFFF
    out = pubkey.derive_hash160s(jnp.asarray(words), inv_chunk=4)

    comp = ref.pubkey_compressed(k)
    uncomp = ref.pubkey_uncompressed(k)

    def h160(b):
        try:
            return hashlib.new("ripemd160", hashlib.sha256(b).digest()).digest()
        except Exception:
            pytest.skip("ripemd160 unavailable in hashlib")

    from vuke_tpu.cores.ripemd160 import digest_words_to_bytes
    got_c = digest_words_to_bytes(np.asarray(out["h160c"])[0])
    got_u = digest_words_to_bytes(np.asarray(out["h160u"])[0])
    assert got_c == h160(comp)
    assert got_u == h160(uncomp)


def test_batch_inverse():
    vals = [3, 5, 7, 11, 13, 17, 19, 23]
    a = _fe(vals)
    inv = point.batch_inverse(a, chunk=4)
    got = _ints(field.fe_normalize(inv))
    for i, v in enumerate(vals):
        assert got[i] == pow(v, ref.P - 2, ref.P)


def test_point_add_general_edge_cases():
    one = field.fe_from_int(1, (1,))
    zero = field.fe_from_int(0, (1,))
    gx = field.fe_from_int(ref.GX, (1,))
    gy = field.fe_from_int(ref.GY, (1,))
    # G + G (doubling case)
    X, Y, Z = point.point_add_general(gx, gy, one, gx, gy, one)
    x, y = point.to_affine(X, Y, Z, chunk=1)
    ex, ey = ref.point_mul(2)
    assert _ints(field.fe_normalize(x))[0] == ex
    assert _ints(field.fe_normalize(y))[0] == ey
    # G + inf = G
    X, Y, Z = point.point_add_general(gx, gy, one, one, one, zero)
    x, y = point.to_affine(X, Y, Z, chunk=1)
    assert _ints(field.fe_normalize(x))[0] == ref.GX
    # G + (-G) = inf
    negy = field.fe_from_int(ref.P - ref.GY, (1,))
    X, Y, Z = point.point_add_general(gx, gy, one, gx, negy, one)
    assert bool(np.asarray(field.fe_is_zero(Z))[0])


def test_batch_inverse_tiles_grouped_math(monkeypatch):
    """The grouped Montgomery scan (g > 1) inverts every lane exactly.

    The Fermat chain is stubbed with a host modpow oracle so the test only
    exercises the new grouping algebra (in-group scans + cross-group
    prefix/suffix combine); the real chain is covered by the TPU-tier
    tests in test_tiled_math.py."""
    from vuke_tpu.ecc import tiled

    def oracle_inv(rows):
        flat = np.stack([np.asarray(r) for r in rows]).reshape(16, -1)
        vals = [sum(int(flat[i, j]) << (16 * i) for i in range(16))
                for j in range(flat.shape[1])]
        inv = np.zeros_like(flat)
        for j, v in enumerate(vals):
            iv = pow(v % ref.P, ref.P - 2, ref.P)
            for i in range(16):
                inv[i, j] = (iv >> (16 * i)) & 0xFFFF
        inv = inv.reshape((16,) + np.asarray(rows[0]).shape)
        return [jnp.asarray(inv[i]) for i in range(16)]

    monkeypatch.setenv("VUKE_TPU_INVGROUP", "2")
    monkeypatch.setattr(tiled, "_fe_inv_rows", oracle_inv)

    rng = np.random.RandomState(9)
    nb = 4
    n = nb * 8 * 128
    vals = [int.from_bytes(rng.bytes(32), "big") % ref.P or 1
            for _ in range(n)]
    z = np.zeros((16, n), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(16):
            z[i, j] = (v >> (16 * i)) & 0xFFFF
    inv = np.asarray(
        tiled._batch_inverse_tiles(jnp.asarray(z.reshape(16, nb, 8, 128)))
    ).reshape(16, n)
    for j in (0, 1, 1023, 1024, 2047, 2048, n - 1):
        got = sum(int(inv[i, j]) << (16 * i) for i in range(16)) % ref.P
        assert got == pow(vals[j], ref.P - 2, ref.P), j


def test_tiled_words_layout_and_normalize_parity():
    """The scan fast path's entry transpose + tile-layout normalize agree
    with the lane-major normalize_scalar (derive_tiled_from_words's only
    new algebra over the TPU-validated seed pipeline)."""
    from vuke_tpu.ecc import tiled

    rng = np.random.RandomState(11)
    n = 2048
    words = rng.randint(0, 2**31, size=(n, 8)).astype(np.uint32) * 2 \
        + rng.randint(0, 2, size=(n, 8)).astype(np.uint32)
    # plant normalization edges
    words[0] = 0                                     # zero -> 1
    words[1] = [(ref.N >> (32 * (7 - i))) & 0xFFFFFFFF for i in range(8)]
    words[2] = 0xFFFFFFFF                            # > n, reduces

    words_j = jnp.asarray(words)
    words_t = words_j.T.reshape(8, n // 1024, 8, 128)
    norm_t = tiled._normalize_words_t(words_t)
    got = np.asarray(norm_t.reshape(8, n).T)
    expect = np.asarray(pubkey.normalize_scalar(words_j))
    assert np.array_equal(got, expect)
