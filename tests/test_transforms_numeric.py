"""Numeric-transform parity: device keygen fns vs host oracles.

Covers the device decimal-ASCII rendering + variable-length hashing paths
(the string slots of sha256/double_sha256/md5/direct for numeric inputs)
and the per-variant slot/validity semantics.
"""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vuke_tpu.cores.common import key_words_to_bytes
from vuke_tpu.transforms import parse_transform

import oracles

SEEDS = [0, 1, 7, 42, 999, 65535, 12345678901, 2**63 + 5, 2**64 - 1]


def _run(spec, seeds):
    hi = np.array([s >> 32 for s in seeds], dtype=np.uint32)
    lo = np.array([s & 0xFFFFFFFF for s in seeds], dtype=np.uint32)
    keys, valid = jax.jit(spec.numeric.fn)(jnp.asarray(hi), jnp.asarray(lo))
    return np.asarray(keys), np.asarray(valid)


def test_sha256_numeric_slots():
    spec = parse_transform("sha256")
    keys, valid = _run(spec, SEEDS)
    for i, s in enumerate(SEEDS):
        assert valid[i].all()
        assert key_words_to_bytes(keys[i, 0]) == hashlib.sha256(str(s).encode()).digest()
        assert key_words_to_bytes(keys[i, 1]) == hashlib.sha256(
            s.to_bytes(8, "big")).digest()
        assert key_words_to_bytes(keys[i, 2]) == hashlib.sha256(
            s.to_bytes(8, "little")).digest()


def test_double_sha256_numeric():
    spec = parse_transform("double_sha256")
    keys, valid = _run(spec, [5, 123456789])
    for i, s in enumerate([5, 123456789]):
        e = hashlib.sha256(hashlib.sha256(str(s).encode()).digest()).digest()
        assert key_words_to_bytes(keys[i, 0]) == e


def test_md5_numeric():
    spec = parse_transform("md5")
    keys, valid = _run(spec, SEEDS)
    for i, s in enumerate(SEEDS):
        d = hashlib.md5(str(s).encode()).digest()
        assert key_words_to_bytes(keys[i, 0]) == d + d


def test_direct_numeric():
    spec = parse_transform("direct")
    keys, valid = _run(spec, [300, 2**40 + 7])
    for i, s in enumerate([300, 2**40 + 7]):
        be = b"\x00" * 24 + s.to_bytes(8, "big")
        le = s.to_bytes(8, "little") + b"\x00" * 24
        sb = str(s).encode()
        sk = sb + b"\x00" * (32 - len(sb))
        assert key_words_to_bytes(keys[i, 0]) == be
        assert key_words_to_bytes(keys[i, 1]) == le
        assert key_words_to_bytes(keys[i, 2]) == sk


def test_milksad_validity_mask():
    spec = parse_transform("milksad")
    keys, valid = _run(spec, [5, 2**32 + 5])
    assert valid[0, 0]
    assert not valid[1, 0]  # seeds > u32::MAX skipped (milksad.rs:20-27)
    assert key_words_to_bytes(keys[0, 0]) == oracles.MT19937(5).fill_bytes(32)


def test_lcg_per_variant_validity():
    spec = parse_transform("lcg")
    # glibc max 2^31-1; minstd max 2^31-2; msvc/borland max 2^32-1
    seeds = [2**31 - 1, 2**31 - 2, 2**32 - 1, 2**32]
    keys, valid = _run(spec, seeds)
    assert list(valid[0]) == [True, False, True, True]
    assert list(valid[1]) == [True, True, True, True]
    assert list(valid[2]) == [False, False, True, True]
    assert list(valid[3]) == [False, False, False, False]


def test_xorshift_slots():
    spec = parse_transform("xorshift")
    keys, valid = _run(spec, [42])
    assert valid.all()
    assert key_words_to_bytes(keys[0, 0]) == oracles.xorshift64_key(42)
    assert key_words_to_bytes(keys[0, 1]) == oracles.xorshift128_key(42)
    assert key_words_to_bytes(keys[0, 2]) == oracles.xorshift128plus_key(42)
    assert key_words_to_bytes(keys[0, 3]) == oracles.xoroshiro128starstar_key(42)


def test_sha256_chain_numeric_dual_emission():
    # numeric inputs emit BOTH the string-seed chain and the bytes-seed chain
    spec = parse_transform("sha256_chain:iterated")
    seeds = [77]
    keys, valid = _run(spec, seeds)
    depth = 10
    assert keys.shape[1] == 2 * depth
    # string-seed chain first
    k = hashlib.sha256(b"77").digest()
    for n in range(depth):
        assert key_words_to_bytes(keys[0, n]) == k
        k = hashlib.sha256(k).digest()
    # bytes-seed chain second
    k = hashlib.sha256((77).to_bytes(4, "big")).digest()
    for n in range(depth):
        assert key_words_to_bytes(keys[0, depth + n]) == k
        k = hashlib.sha256(k).digest()
    assert valid[0].all()


def test_sha256_chain_numeric_indexed_string_seed():
    spec = parse_transform("sha256_chain:counter")
    keys, valid = _run(spec, [123])
    for n in range(10):
        e = hashlib.sha256(b"123" + str(n).encode()).digest()
        assert key_words_to_bytes(keys[0, n]) == e


def test_sha256_chain_u64_bytes_invalid():
    spec = parse_transform("sha256_chain:iterated")
    keys, valid = _run(spec, [2**40])
    # string chain valid, bytes chain invalid (seed > u32::MAX)
    assert valid[0, :10].all()
    assert not valid[0, 10:].any()
