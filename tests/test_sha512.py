"""SHA-512 core + device PBKDF2-HMAC-SHA512 parity (NIST/RFC + hashlib)."""

import hashlib

import numpy as np
import pytest

import jax.numpy as jnp

from vuke_tpu.cores import sha512 as s512


def _msg_to_pairs(block: bytes):
    w = np.frombuffer(block, dtype=">u4").reshape(16, 2)
    return [(jnp.asarray(np.uint32(w[i, 0]))[None], jnp.asarray(np.uint32(w[i, 1]))[None])
            for i in range(16)]


def _digest(state) -> bytes:
    out = b""
    for hi, lo in state:
        out += int(np.asarray(hi)[0]).to_bytes(4, "big")
        out += int(np.asarray(lo)[0]).to_bytes(4, "big")
    return out


def _pad_full(msg: bytes) -> bytes:
    bits = len(msg) * 8
    pad = b"\x80" + b"\x00" * ((111 - len(msg)) % 128)
    return msg + pad + bits.to_bytes(16, "big")


@pytest.mark.parametrize("msg", [b"abc", b"", b"a" * 111,
                                 bytes(range(64)), b"x" * 100])
def test_sha512_single_block_vectors(msg):
    block = _pad_full(msg)
    assert len(block) == 128
    iv = s512.iv_state(jnp.zeros(1, dtype=jnp.uint32))
    st = s512.compress(iv, _msg_to_pairs(block))
    assert _digest(st) == hashlib.sha512(msg).digest()


def test_sha512_two_blocks():
    msg = b"q" * 200
    block = _pad_full(msg)
    assert len(block) == 256
    iv = s512.iv_state(jnp.zeros(1, dtype=jnp.uint32))
    st = s512.compress(iv, _msg_to_pairs(block[:128]))
    st = s512.compress(st, _msg_to_pairs(block[128:]))
    assert _digest(st) == hashlib.sha512(msg).digest()


def test_pad_block_for_64b_message():
    """The HMAC-iteration block builder matches manual padding."""
    u = bytes(range(64))
    words = _msg_to_pairs(u + b"\x00" * 64)[:8]
    w16 = s512.pad_block_for_64b_message(words, total_prev_blocks=1)
    manual = u + b"\x80" + b"\x00" * 47 + ((128 + 64) * 8).to_bytes(16, "big")
    exp = _msg_to_pairs(manual)
    for (gh, gl), (eh, el) in zip(w16, exp):
        assert int(np.asarray(gh).reshape(-1)[0]) == int(np.asarray(eh)[0])
        assert int(np.asarray(gl).reshape(-1)[0]) == int(np.asarray(el)[0])


@pytest.mark.parametrize("iters", [2, 7, 2048])
def test_pbkdf2_device_matches_hashlib(iters):
    from vuke_tpu.wallets.pbkdf2_device import pbkdf2_hmac_sha512_batch

    if iters == 2048:
        pytest.importorskip("jax")
    pws = [b"password", b"", b"a" * 64, b"mnemonic words here ok",
           b"k" * 129]  # >128 forces the pre-hash path
    salt = b"mnemonicTREZOR"
    got = pbkdf2_hmac_sha512_batch(pws, salt, iterations=iters)
    for pw, g in zip(pws, got):
        assert g == hashlib.pbkdf2_hmac("sha512", pw, salt, iters, dklen=64), pw


def test_pbkdf2_bip39_trezor_vector():
    """Official BIP39 test vector (Trezor set, passphrase TREZOR)."""
    from vuke_tpu.wallets.pbkdf2_device import pbkdf2_hmac_sha512_batch

    mnemonic = ("legal winner thank year wave sausage worth useful legal "
                "winner thank yellow")
    seed = pbkdf2_hmac_sha512_batch([mnemonic.encode()], b"mnemonicTREZOR")[0]
    # value pinned against OpenSSL (hashlib.pbkdf2_hmac) for this official
    # BIP39 input — an in-repo recall of the published hex had a corrupt
    # tail, so the independent library computation is the authority here
    assert seed.hex() == (
        "2e8905819b8723fe2c1d161860e5ee1830318dbf49a83bd451cfb8440c28bd6f"
        "a457fe1296106559a3c80937a1c1069be3a3a5bd381ee6260e8d9739fce1f607")


def test_multibit_batch_matches_single():
    """multibit_hd_keys_batch (host path on CPU tier) == per-candidate."""
    from vuke_tpu.wallets.multibit import multibit_hd_keys, multibit_hd_keys_batch

    ms = ["abandon abandon abandon abandon abandon abandon abandon abandon "
          "abandon abandon abandon about",
          "legal winner thank year wave sausage worth useful legal winner "
          "thank yellow",
          "not a valid mnemonic at all"]
    got = multibit_hd_keys_batch(ms, "", 3)
    assert [m for m, _ in got] == ms[:2]          # invalid entry dropped
    for m, keys in got:
        assert keys == multibit_hd_keys(m, "", 3)


@pytest.mark.tpu_only
def test_multibit_batch_device_path():
    """Device PBKDF2 batch == host, through the full multibit flow."""
    from vuke_tpu.wallets.multibit import multibit_hd_keys, multibit_hd_keys_batch

    ms = ["abandon abandon abandon abandon abandon abandon abandon abandon "
          "abandon abandon abandon about"] * 33   # >= min_device_batch
    got = multibit_hd_keys_batch(ms, "TREZOR", 2, min_device_batch=32)
    assert len(got) == 33
    expect = multibit_hd_keys(ms[0], "TREZOR", 2)
    for _, keys in got:
        assert keys == expect
