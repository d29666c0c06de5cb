"""Parity pins for the native C++ secp256k1 deriver (native/vuke_ecc.cpp)
and the eager-numpy transform backend (vuke_tpu/_npshim.py) — the two
halves of the compile-free CPU scan path.
"""

import numpy as np
import pytest

from vuke_tpu import encode, native
from vuke_tpu.ecc import ref


needs_native = pytest.mark.skipif(not native.has_derive(),
                                  reason="native ECC library unavailable")


def _oracle_h160s(key_int):
    v = key_int % ref.N
    if v == 0:
        v = 1
    x, y = ref.point_mul(v)
    comp = bytes([2 + (y & 1)]) + x.to_bytes(32, "big")
    uncomp = b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")
    return v, encode.hash160(comp), encode.hash160(uncomp)


def _to_words(ints):
    out = np.zeros((len(ints), 8), dtype=np.uint32)
    for i, v in enumerate(ints):
        out[i] = np.frombuffer((v % (1 << 256)).to_bytes(32, "big"), dtype=">u4")
    return out


ADVERSARIAL = [
    1, 2, 3, 255, 256, 65537,
    0,                       # normalizes to 1
    ref.N, ref.N - 1, ref.N + 5,
    ref.P, ref.P + 1,        # field-boundary values as scalars
    (1 << 256) - 1,
    1 << 255,
    0x8000000000000000,
    # keys whose byte windows are all-0xFF / alternating (table stress)
    int.from_bytes(b"\xff" * 32, "big") % ref.N,
    int.from_bytes(b"\x01\x00" * 16, "big"),
]


@needs_native
def test_native_derive_adversarial_and_random_parity():
    rng = np.random.default_rng(7)
    ints = list(ADVERSARIAL)
    ints += [int.from_bytes(rng.bytes(32), "big") for _ in range(48)]
    keys = _to_words(ints)
    norm, h160c, h160u = native.batch_derive_h160(keys, threads=2)
    for i, v in enumerate(ints):
        ev, ec, eu = _oracle_h160s(v)
        assert h160c[20 * i:20 * i + 20] == ec, f"h160c mismatch at {i}"
        assert h160u[20 * i:20 * i + 20] == eu, f"h160u mismatch at {i}"
        got_norm = int.from_bytes(
            np.ascontiguousarray(norm[i]).astype(">u4").tobytes(), "big")
        assert got_norm == ev, f"normalization mismatch at {i}"


@needs_native
def test_native_derive_thread_determinism():
    rng = np.random.default_rng(11)
    keys = _to_words([int.from_bytes(rng.bytes(32), "big") for _ in range(512)])
    n1, c1, u1 = native.batch_derive_h160(keys, threads=1)
    n8, c8, u8 = native.batch_derive_h160(keys, threads=8)
    assert c1 == c8 and u1 == u8 and np.array_equal(n1, n8)


@needs_native
def test_native_matches_device_program():
    """Native derive agrees lane-for-lane with the (XLA) device program."""
    from vuke_tpu.ecc.pubkey import derive_hash160s, normalize_scalar

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    keys = _to_words(list(ADVERSARIAL)
                     + [int.from_bytes(rng.bytes(32), "big") for _ in range(16)])
    pad = (-len(keys)) % 32
    if pad:
        keys = np.vstack([keys, np.tile(keys[-1:], (pad, 1))])
    norm, h160c, h160u = native.batch_derive_h160(keys)
    d = derive_hash160s(normalize_scalar(jnp.asarray(keys)), inv_chunk=8)
    dev_c = np.asarray(d["h160c"]).astype("<u4").tobytes()
    dev_u = np.asarray(d["h160u"]).astype("<u4").tobytes()
    assert dev_c == h160c
    assert dev_u == h160u


@needs_native
def test_native_derive_matcher_end_to_end():
    """DeriveMatcher native path: planted key flagged, fragments exact."""
    import os

    if os.environ.get("VUKE_TEST_PLATFORM") != "cpu":
        pytest.skip("native DeriveMatcher path is CPU-backend only")
    from vuke_tpu.derive import KeyDeriver
    from vuke_tpu.matcher import DeviceTargetSet, Matcher
    from vuke_tpu.pipeline import DeriveMatcher

    secret = 0xDEADBEEFCAFEF00D
    _, h160c, _ = _oracle_h160s(secret)
    addr = encode.p2pkh_address(h160c, encode.BITCOIN)
    dm = DeriveMatcher(DeviceTargetSet([addr]), collect_keys=False)
    assert dm._native, "native path should engage on the CPU tier"
    keys = _to_words([secret - 1, secret, secret + 1, 12345])
    res = dm.run(keys, np.ones(4, dtype=bool))
    assert int(res["count"]) == 1
    assert int(np.asarray(res["hit_idx"])[0]) == 1
    mask = dm.run_mask(keys, np.ones(4, dtype=bool))
    assert list(np.asarray(mask)) == [False, True, False, False]
    # confirm through the host string matcher like the driver does
    derived = KeyDeriver().derive(int(secret).to_bytes(32, "big"))
    assert Matcher.from_addresses([addr]).check(derived) is not None


NUMERIC_TRANSFORMS = ["direct", "direct:be", "sha256", "double_sha256", "md5",
                      "milksad", "mt64", "lcg", "lcg:glibc:le", "xorshift",
                      "sha256_chain:iterated", "sha256_chain:indexed:le"]


@pytest.mark.parametrize("name", NUMERIC_TRANSFORMS)
def test_numpy_backend_keygen_parity(name):
    """Eager-numpy keygen == jitted jax keygen, per transform."""
    import jax
    import jax.numpy as jnp

    from vuke_tpu._lazy import numpy_backend
    from vuke_tpu.transforms import parse_transform

    nt = parse_transform(name).numeric
    hi = np.array([0, 0, 0, 1, 0xFFFFFFFF], dtype=np.uint32)
    lo = np.array([1, 777, 0xFFFFFFFF, 5, 0xFFFFFFFF], dtype=np.uint32)
    with numpy_backend():
        keys_np, valid_np = nt.fn(hi, lo)
    keys_jx, valid_jx = jax.jit(nt.fn)(jnp.asarray(hi), jnp.asarray(lo))
    assert np.array_equal(np.asarray(keys_np), np.asarray(keys_jx)), name
    assert np.array_equal(np.asarray(valid_np), np.asarray(valid_jx)), name
