"""Pallas ECC kernel parity: ZZ scalar-mul kernel and the tiled derive
pipeline vs the XLA-staged path and the pure-Python oracle.

The rest of the suite deliberately uses batches that are NOT multiples of
1024, so the Pallas fast path (pubkey.derive_pubkey's ``n % 1024 == 0``
gate) is never taken there.  These tests are the only coverage of the
fused kernels and only run on a Mosaic-capable backend (TPU/axon); on CPU
they skip.  Reference semantics: /root/reference/src/derive.rs:78-118
(pubkey + hash160 for both compressed and uncompressed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vuke_tpu.ecc import ref
from vuke_tpu.ecc.pubkey import (derive_hash160s, derive_pubkey,
                                 normalize_scalar)

pytestmark = pytest.mark.tpu_only  # conftest skips these off-TPU


def _scalar_words(ks):
    """list of ints -> (N, 8) BE u32 word array."""
    return jnp.asarray(
        np.array([[(k >> (32 * (7 - i))) & 0xFFFFFFFF for i in range(8)]
                  for k in ks], dtype=np.uint32))


def _interesting_scalars(n):
    ks = [1, 2, 3, 255, 256, 257, ref.N - 1, ref.N - 2,
          (1 << 255) + 12345, 0xDEADBEEF]
    rng = np.random.RandomState(7)
    while len(ks) < n:
        ks.append(int.from_bytes(rng.bytes(32), "big") % (ref.N - 1) + 1)
    return ks[:n]


def test_pallas_pubkey_matches_xla_and_oracle():
    ks = _interesting_scalars(1024)
    words = _scalar_words(ks)
    xp, yp, op = jax.jit(
        lambda w: derive_pubkey(w, use_pallas=True))(words)
    xs, ys, os_ = jax.jit(
        lambda w: derive_pubkey(w, use_pallas=False))(words)
    xp, yp, op = np.asarray(xp), np.asarray(yp), np.asarray(op)
    assert (xp == np.asarray(xs)).all()
    assert (yp == np.asarray(ys)).all()
    assert (op == np.asarray(os_)).all()
    # spot-check the first 8 against the pure-Python oracle
    for i in range(8):
        gx, gy = ref.point_mul(ks[i])
        x_int = int.from_bytes(
            b"".join(int(w).to_bytes(4, "big") for w in xp[i]), "big")
        y_int = int.from_bytes(
            b"".join(int(w).to_bytes(4, "big") for w in yp[i]), "big")
        assert x_int == gx and y_int == gy
        assert bool(op[i]) == bool(gy & 1)


def test_tiled_derive_matches_standard():
    from vuke_tpu.ecc.tiled import derive_hash160s_tiled
    from vuke_tpu.cores.mt19937 import milksad_key_words

    seeds = jnp.asarray(
        np.random.RandomState(3).randint(0, 2**31, size=1024, dtype=np.int64)
        .astype(np.uint32))
    d_t = jax.jit(derive_hash160s_tiled)(seeds)

    def std(seeds):
        keys = milksad_key_words(seeds, n_keys=1)[:, 0, :]
        return derive_hash160s(normalize_scalar(keys), inv_chunk=32)

    d_s = jax.jit(std)(seeds)
    hc = np.asarray(d_s["h160c"])
    hu = np.asarray(d_s["h160u"])
    assert (np.asarray(d_t["h160c"]) == hc).all()
    assert (np.asarray(d_t["h160u"]) == hu).all()
    # match fragments are the big-endian first 8 bytes of the hash160
    def be(a):
        return np.frombuffer(
            np.ascontiguousarray(a).tobytes(), dtype=">u4").reshape(a.shape)

    assert (np.asarray(d_t["frag_c"][0]) == be(hc[:, 0])).all()
    assert (np.asarray(d_t["frag_c"][1]) == be(hc[:, 1])).all()
    assert (np.asarray(d_t["frag_u"][0]) == be(hu[:, 0])).all()
    assert (np.asarray(d_t["frag_u"][1]) == be(hu[:, 1])).all()


def test_tiled_from_words_matches_standard():
    """The scan hot path's tile-layout derive (derive_tiled_from_words)
    is bit-identical to the standard derive on raw (unnormalized) keys."""
    from vuke_tpu.ecc.tiled import derive_tiled_from_words

    ks = _interesting_scalars(1024)
    ks[5] = 0                # normalization edge: 0 -> 1
    ks[6] = ref.N            # == order -> 1 after reduce
    ks[7] = ref.N + 12345
    words = _scalar_words(ks)

    d_t = jax.jit(derive_tiled_from_words)(words)

    def std(w):
        norm = normalize_scalar(w)
        d = derive_hash160s(norm, inv_chunk=32)
        return norm, d

    norm_s, d_s = jax.jit(std)(words)
    assert (np.asarray(d_t["norm"]) == np.asarray(norm_s)).all()
    assert (np.asarray(d_t["h160c"]) == np.asarray(d_s["h160c"])).all()
    assert (np.asarray(d_t["h160u"]) == np.asarray(d_s["h160u"])).all()


def test_pallas_inversion_affine_matches_host_oracle():
    """The Pallas Montgomery-inversion + affine kernels (ecc/pallas_inv.py)
    produce the exact canonical affine coordinates, verified lane-for-lane
    against host bignum inversion (x = X/ZZ, y = Y/ZZZ mod p) — including
    a multi-tile batch so both sequential scan passes cross tile
    boundaries.  (Deliberately NOT compared against tiled._affine16's XLA
    branch on-device: that graph is the ~30-minute cold compile this
    kernel exists to remove; the host oracle is equally exact and free.)"""
    from vuke_tpu.ecc.pallas_smul13 import scalar_mul_zz_pallas13
    from vuke_tpu.ecc.pallas_inv import affine16_pallas
    from vuke_tpu.ecc.pubkey import scalar_digits
    from vuke_tpu.ecc import tiled

    n = 4096
    ks = _interesting_scalars(n)
    words = _scalar_words(ks)
    wbits, signed = tiled.window_bits(), tiled.signed_digits()
    X, Y, ZZ, ZZZ = jax.jit(lambda w: scalar_mul_zz_pallas13(
        scalar_digits(w, wbits, signed), wbits=wbits,
        signed=signed))(words)
    nb = n // 1024
    tile = lambda a: a.T.reshape(16, nb, 8, 128)

    xp, yp = jax.jit(lambda *a: tuple(
        jnp.stack(r, 0) for r in affine16_pallas(*a)))(
        tile(X), tile(Y), tile(ZZ), tile(ZZZ))

    def ints(stacked):                       # (16, nb, 8, 128) -> (N,) ints
        rows = np.asarray(stacked).reshape(16, n).T.astype(object)
        return [sum(int(r[i]) << (16 * i) for i in range(16)) for r in rows]

    Xi, Yi = ints(tile(X)), ints(tile(Y))
    ZZi, ZZZi = ints(tile(ZZ)), ints(tile(ZZZ))
    xi, yi = ints(xp), ints(yp)
    for l in range(n):
        assert xi[l] == Xi[l] * pow(ZZi[l], ref.P - 2, ref.P) % ref.P
        assert yi[l] == Yi[l] * pow(ZZZi[l], ref.P - 2, ref.P) % ref.P
    # and lane 0 is the oracle point for its scalar
    gx, gy = ref.point_mul(ks[0])
    assert (xi[0], yi[0]) == (gx, gy)
