"""Wallet-derivation golden-vector tests (host-side cores)."""

import hashlib

import pytest

from vuke_tpu import encode
from vuke_tpu.wallets import armory, bip32, bip39, bitimage, electrum, multibit


# --- Electrum (official vectors, /root/reference/src/electrum.rs:216-223) ---

ELECTRUM_SEED = "acb740e454c3134901d7c8f16497cc1c"
ELECTRUM_MPK = ("e9d4b7866dd1e91c862aebf62a49548c7dbf7bcc6e4b7b8c9da820c7737968df"
                "9c09d5a3e271dc814a29981f81b3faaf2737b551ef5dcc6189cf0f8252c442b3")


@pytest.fixture(scope="module")
def electrum_deriver():
    return electrum.ElectrumDeriver.from_hex_seed(ELECTRUM_SEED)


def _uncompressed_p2pkh(key: bytes) -> str:
    from vuke_tpu.ecc import ref
    k = int.from_bytes(key, "big")
    x, y = ref.point_mul(k)
    pub = b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")
    return encode.p2pkh_address(encode.hash160(pub))


def test_electrum_master_pubkey(electrum_deriver):
    assert electrum_deriver.master_pubkey_hex() == ELECTRUM_MPK


def test_electrum_receiving_address(electrum_deriver):
    key = electrum_deriver.derive_key(0)
    assert _uncompressed_p2pkh(key) == "1FJEEB8ihPMbzs2SkLmr37dHyRFzakqUmo"


def test_electrum_change_address():
    d = electrum.ElectrumDeriver.from_hex_seed(ELECTRUM_SEED, for_change=True)
    key = d.derive_key(0)
    assert _uncompressed_p2pkh(key) == "1KRW8pH6HFHZh889VDq6fEKvmrsmApwNfe"


def test_electrum_invalid_seed():
    with pytest.raises(electrum.ElectrumError):
        electrum.ElectrumDeriver.from_hex_seed("not_valid_hex!")


def test_double_sha256_empty():
    d = hashlib.sha256(hashlib.sha256(b"").digest()).hexdigest()
    assert d == "5df6e0e2761359d30a8275058e299fcc0381534545f55cf43e41983f5d4c9456"


def test_truncate_seed():
    assert electrum.truncate_seed("abcd1234") == "abcd1234"
    long = "a" * 40
    t = electrum.truncate_seed(long)
    assert t == "aaaaaaaa...aaaaaaaa"


# --- MultiBit HD (issue-445 vector, multibit.rs:404+) -----------------------

def test_multibit_bug_issue_445():
    mnemonic = ("skin join dog sponsor camera puppy ritual diagram arrow "
                "poverty boy elbow")
    d = multibit.MultibitBugDeriver(mnemonic, "")
    key = d.derive_key(0)
    from vuke_tpu.ecc import ref
    k = int.from_bytes(key, "big")
    x, y = ref.point_mul(k)
    pub = bytes([2 + (y & 1)]) + x.to_bytes(32, "big")
    addr = encode.p2pkh_address(encode.hash160(pub))
    assert addr == "1LQ8XnNKqC7Vu7atH5k4X8qVCc9ug2q7WE"


def test_multibit_invalid_word_count():
    with pytest.raises(multibit.MultibitError):
        multibit.MultibitBugDeriver("abandon abandon abandon", "")


def test_multibit_unknown_word():
    m = " ".join(["abandon"] * 11 + ["notaword"])
    with pytest.raises(multibit.MultibitError):
        multibit.MultibitBugDeriver(m, "")


# --- BIP39 ------------------------------------------------------------------

def test_bip39_standard_vector():
    # BIP39 spec test vector: all-zero 16-byte entropy
    words = bip39.entropy_to_mnemonic(b"\x00" * 16)
    assert " ".join(words) == ("abandon abandon abandon abandon abandon abandon "
                               "abandon abandon abandon abandon abandon about")
    seed = bip39.mnemonic_to_seed(" ".join(words), "TREZOR")
    assert seed.hex().startswith("c55257c360c07c72029aebc1b53c05ed")


def test_bip39_64_byte_entropy():
    words = bip39.entropy_to_mnemonic(b"\x00" * 64)
    assert len(words) == 48


# --- BIP32 ------------------------------------------------------------------

def test_bip32_vector1():
    # BIP32 spec test vector 1: seed 000102030405060708090a0b0c0d0e0f
    seed = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    master, chain = bip32.seed_to_master_key(seed)
    assert master.hex() == "e8f32e723decf4051aefac8e2c93c9c5b214313817cdb01a1494b917c8436b35"
    key = bip32.derive_path(master, chain, "m/0'")
    assert key.hex() == "edb2e14f9ee77d26dd93b4ecede8d16ed408ce149b6cd80b0715a2d911a0afea"
    key = bip32.derive_path(master, chain, "m/0'/1")
    assert key.hex() == "3c6cb8d0f6a264c91ea8b5030fadaa8e538b020f0a387421a12de9319dc93368"


def test_bip32_path_parsing():
    assert bip32.parse_derivation_path("m") == []
    assert bip32.parse_derivation_path("m/84'/0'/0'/0/0") == [
        (84, True), (0, True), (0, True), (0, False), (0, False)]
    with pytest.raises(bip32.Bip32Error):
        bip32.parse_derivation_path("x/1")
    with pytest.raises(bip32.Bip32Error):
        bip32.parse_derivation_path("m/2147483648")


# --- Armory -----------------------------------------------------------------

def test_armory_deterministic():
    seed = hashlib.sha256(b"test").digest()
    k1 = armory.armory_key(seed)
    k2 = armory.armory_key(seed)
    assert k1 == k2
    assert k1 is not None and len(k1) == 32
    k3 = armory.armory_key(hashlib.sha256(b"other").digest())
    assert k3 != k1


# --- Bitimage ---------------------------------------------------------------

def test_bitimage_deterministic_and_path():
    data = b"fake image bytes"
    d = bitimage.BitimageDeriver(data, "")
    k1 = d.derive_path("m/84'/0'/0'/0/0")
    k2 = bitimage.BitimageDeriver(data, "").derive_path("m/84'/0'/0'/0/0")
    assert k1 == k2
    k3 = d.derive_path("m/84'/0'/0'/0/1")
    assert k3 != k1
    kp = bitimage.BitimageDeriver(data, "hunter2").derive_path("m/84'/0'/0'/0/0")
    assert kp != k1


def test_bitimage_increment_path():
    assert bitimage.increment_path_index("m/84'/0'/0'/0/0") == "m/84'/0'/0'/0/1"
    assert bitimage.increment_path_index("m/44'/0'/5'") == "m/44'/0'/6'"


# --- Wallet transforms ------------------------------------------------------

def test_electrum_transform_spec():
    from vuke_tpu.transforms.wallets import electrum_spec
    spec = electrum_spec(derivation_count=2)
    keys = spec.string.fn([ELECTRUM_SEED, "not hex!"])
    valid = spec.string.valid_fn(None)
    assert valid[0].all()
    assert not valid[1].any()
    import numpy as np
    k0 = np.asarray(keys[0, 0], dtype=">u4").tobytes()
    d = electrum.ElectrumDeriver.from_hex_seed(ELECTRUM_SEED)
    assert k0 == d.derive_key(0)


def test_multibit_transform_spec():
    from vuke_tpu.transforms.wallets import multibit_spec
    spec = multibit_spec(derivation_count=2)
    m = ("skin join dog sponsor camera puppy ritual diagram arrow "
         "poverty boy elbow")
    keys = spec.string.fn([m])
    import numpy as np
    k0 = np.asarray(keys[0, 0], dtype=">u4").tobytes()
    assert k0 == multibit.MultibitBugDeriver(m, "").derive_key(0)
    assert spec.string.slots[0] == "[m/0'/0/0]"


def test_armory_transform_spec():
    from vuke_tpu.transforms.wallets import armory_spec
    spec = armory_spec()
    keys = spec.string.fn(["hello"])
    import numpy as np
    seed = hashlib.sha256(b"hello").digest()
    assert np.asarray(keys[0, 0], dtype=">u4").tobytes() == armory.armory_key(seed)


# --- remaining reference wallet-core vectors ---------------------------------

def test_stretch_key_deterministic_and_distinct():
    # electrum.rs:224-236
    from vuke_tpu.wallets.electrum import stretch_key
    assert stretch_key(b"test_seed") == stretch_key(b"test_seed")
    assert stretch_key(b"seed1") != stretch_key(b"seed2")


def test_get_sequence_format():
    # electrum.rs:248-256: distinct per index and per change-flag
    from vuke_tpu.wallets.electrum import get_sequence
    mpk = bytes(64)
    assert get_sequence(mpk, 0, 0) != get_sequence(mpk, 0, 1)
    assert get_sequence(mpk, 0, 0) != get_sequence(mpk, 1, 0)


def test_electrum_derive_keys_multiple(electrum_deriver):
    # electrum.rs:288-299
    keys = electrum_deriver.derive_keys(5)
    assert len(keys) == 5
    assert len(set(keys)) == 5


def test_pbkdf2_hmac_sha512_sanity():
    # multibit.rs:374-383: PBKDF2(1 iter) == HMAC-SHA512(pw, salt||00000001)
    import hashlib
    import hmac as hmac_mod
    got = hashlib.pbkdf2_hmac("sha512", b"password", b"salt", 1)
    expect = hmac_mod.new(b"password", b"salt" + b"\x00\x00\x00\x01",
                          hashlib.sha512).digest()
    assert len(got) == 64 and got == expect


def test_entropy_to_mnemonic_all_zeros():
    # multibit.rs:386-392: 16 zero bytes -> 12 words starting "abandon"
    from vuke_tpu.wallets.bip39 import entropy_to_mnemonic
    words = entropy_to_mnemonic(bytes(16))
    assert len(words) == 12
    assert words[0] == "abandon"


def test_buggy_mnemonic_generation():
    # multibit.rs:462-479: the issue-445 buggy 48-word mnemonic
    from vuke_tpu.wallets.bip39 import entropy_to_mnemonic, mnemonic_to_seed
    mnemonic = ("skin join dog sponsor camera puppy ritual diagram arrow "
                "poverty boy elbow")
    seed = mnemonic_to_seed(mnemonic, "")
    buggy = entropy_to_mnemonic(seed)
    assert len(buggy) == 48
    assert buggy[0] == "trim"
    assert buggy[1] == "snack"
    assert buggy[2] == "gorilla"
    assert buggy[47] == "coach"


def test_parse_derivation_path_master_only():
    # bitimage.rs:310-313
    from vuke_tpu.wallets.bip32 import parse_derivation_path
    assert parse_derivation_path("m") == []


def test_parse_derivation_path_invalid():
    # bitimage.rs:316-319
    import pytest
    from vuke_tpu.wallets.bip32 import Bip32Error, parse_derivation_path
    with pytest.raises(Exception):
        parse_derivation_path("84'/0'/0'/0/0")
    with pytest.raises(Exception):
        parse_derivation_path("m/abc")


def test_parse_derivation_path_index_bounds():
    # bitimage.rs:364-377
    import pytest
    from vuke_tpu.wallets.bip32 import parse_derivation_path
    with pytest.raises(Exception, match="BIP32 limit"):
        parse_derivation_path("m/2147483648'/0'/0'/0/0")
    assert parse_derivation_path("m/2147483647'/0'/0'/0/0")


def test_bitimage_passphrase_changes_key():
    # bitimage.rs:341-351
    from vuke_tpu.wallets.bitimage import BitimageDeriver
    a = BitimageDeriver(b"hello world", "").derive_path("m/84'/0'/0'/0/0")
    b = BitimageDeriver(b"hello world", "secret").derive_path("m/84'/0'/0'/0/0")
    assert a != b


def test_increment_path_index_hardened_tail():
    # bitimage.rs:322-326 (incl. the hardened-tail case)
    from vuke_tpu.wallets.bitimage import increment_path_index
    assert increment_path_index("m/84'/0'/0'/0/0") == "m/84'/0'/0'/0/1"
    assert increment_path_index("m/84'/0'/0'/0/5") == "m/84'/0'/0'/0/6"
    assert increment_path_index("m/44'/0'/0'/0'") == "m/44'/0'/0'/1'"
