"""Numeric (u64-lattice) transforms: fused device seed->key functions.

Each transform is a pure function from a u64 seed lattice (as (hi, lo)
uint32 pairs) to ``(N, n_slots, 8)`` big-endian key words plus a per-key
*validity mask* (some transforms skip seeds, e.g. milksad ignores seeds
> u32::MAX — /root/reference/src/transform/milksad.rs:20-27).

Slot labels reproduce the reference's source-string suffixes so hits print
identically (e.g. ``seed:glibc:be`` for LCG — /root/reference/src/transform/
lcg.rs:43-68).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List

import numpy as np
from .._lazy import jnp

from ..cores import decimal, lcg as lcg_core, mt19937, sha256_chain as chain_core, xorshift as xs_core
from ..cores.common import byteswap32
from ..cores.sha256 import sha256_words, sha256_key_words


@dataclass
class NumericTransform:
    """name: registry name; slots: per-key label suffixes ('' = none).

    ``sequential_slot``: index of a slot whose key equals the seed value
    itself (key_{seed+1} = key_{seed} + 1), letting contiguous-range scans
    take the incremental point-add fast path (ecc/incremental.py)."""
    name: str
    slots: List[str]
    fn: Callable  # (hi, lo) -> (keys (N, S, 8) uint32, valid (N, S) bool)
    sequential_slot: "int | None" = None

    @property
    def n_slots(self) -> int:
        return len(self.slots)


def _all_valid(keys):
    return jnp.ones(keys.shape[:-1], dtype=bool)


# --- direct (/root/reference/src/transform/direct.rs:12-35) ----------------

def _direct(hi, lo):
    z = jnp.zeros_like(hi)
    # BE: value in key bytes 24..32
    be = jnp.stack([z, z, z, z, z, z, hi, lo], axis=-1)
    # LE: value bytes little-endian in key bytes 0..8
    le = jnp.stack([byteswap32(lo), byteswap32(hi), z, z, z, z, z, z], axis=-1)
    # string-as-bytes: ascii decimal in key bytes 0..len
    words, _len = decimal.decimal_ascii_words_be(hi, lo)
    sw = jnp.stack(words[:5] + [z, z, z][: 8 - len(words[:5])], axis=-1)
    keys = jnp.stack([be, le, sw], axis=-2)
    return keys, _all_valid(keys)


DIRECT = NumericTransform("direct", ["", "", ""], _direct, sequential_slot=0)


def _direct_one(idx):
    def fn(hi, lo):
        keys, valid = _direct(hi, lo)
        return keys[:, idx:idx + 1, :], valid[:, idx:idx + 1]
    return fn


# single-interpretation variants (TPU extension, not in the reference CLI):
# direct:be scans seeds as the private keys themselves — the bitcoin-puzzle
# workload — and is fully served by the incremental point-add fast path
DIRECT_BE = NumericTransform("direct", [""], _direct_one(0), sequential_slot=0)
DIRECT_LE = NumericTransform("direct", [""], _direct_one(1))
DIRECT_STR = NumericTransform("direct", [""], _direct_one(2))


# --- sha256 / double_sha256 (/root/reference/src/transform/sha256.rs) ------

def _hash_three(hi, lo, double: bool):
    words, length = decimal.decimal_ascii_words_be(hi, lo)
    h_str = decimal.sha256_single_block_varlen(words, length)
    h_be = jnp.stack(sha256_words([hi, lo], 8), axis=-1)
    h_le = jnp.stack(sha256_words([byteswap32(lo), byteswap32(hi)], 8), axis=-1)
    if double:
        h_str = sha256_key_words(h_str)
        h_be = sha256_key_words(h_be)
        h_le = sha256_key_words(h_le)
    keys = jnp.stack([h_str, h_be, h_le], axis=-2)
    return keys, _all_valid(keys)


SHA256 = NumericTransform("sha256", ["", "", ""], lambda h, l: _hash_three(h, l, False))
DOUBLE_SHA256 = NumericTransform("double_sha256", ["", "", ""],
                                 lambda h, l: _hash_three(h, l, True))


# --- md5 (string only, duplicated 16B -> 32B) ------------------------------

def _md5(hi, lo):
    words, length = decimal.decimal_ascii_words_be(hi, lo)
    d = decimal.md5_single_block_varlen(words, length)  # (..., 4) LE words
    be = byteswap32(d)  # key bytes = digest bytes; BE words = swap(LE words)
    keys = jnp.concatenate([be, be], axis=-1)[..., None, :]
    return keys, _all_valid(keys)


MD5 = NumericTransform("md5", [""], _md5)


# --- milksad (MT19937, u32 seeds only) -------------------------------------

def _milksad(hi, lo):
    keys = mt19937.milksad_key_words(lo, n_keys=1)
    valid = (hi == 0)[..., None] & jnp.ones(keys.shape[:-1], dtype=bool)
    return keys, valid


MILKSAD = NumericTransform("milksad", [""], _milksad)


# --- mt64 ------------------------------------------------------------------

def _mt64(hi, lo):
    keys = mt19937.mt64_key_words(hi, lo)[..., None, :]
    return keys, _all_valid(keys)


MT64 = NumericTransform("mt64", [""], _mt64)


# --- lcg -------------------------------------------------------------------

def make_lcg(variants=None, big_endian: bool = True) -> NumericTransform:
    """LCG transform; no variant => all four.  Per-variant seed cap
    ``val <= m-1`` and label rules ('' single variant; ':name' multi BE;
    ':name:le' multi LE) mirror /root/reference/src/transform/lcg.rs:43-68.
    """
    vs = list(variants) if variants else list(lcg_core.ALL_VARIANTS)

    def fn(hi, lo):
        keys = []
        valids = []
        for v in vs:
            kw = lcg_core.lcg_key_words(lo, v, big_endian)
            keys.append(kw)
            max32 = np.uint32(min(v.max_seed, 0xFFFFFFFF))
            valids.append((hi == 0) & (lo <= max32))
        keys = jnp.stack(keys, axis=-2)
        valid = jnp.stack(valids, axis=-1)
        return keys, valid

    if len(vs) == 1:
        slots = [""]
    elif big_endian:
        slots = [f":{v.name}" for v in vs]
    else:
        slots = [f":{v.name}:le" for v in vs]
    return NumericTransform("lcg", slots, fn)


# --- xorshift --------------------------------------------------------------

def make_xorshift(variant: str | None = None) -> NumericTransform:
    names = [variant] if variant else list(xs_core.VARIANT_NAMES)

    def fn(hi, lo):
        keys = jnp.stack([xs_core.KEY_FNS[n](hi, lo) for n in names], axis=-2)
        return keys, _all_valid(keys)

    slots = [""] if len(names) == 1 else [f":{n}" for n in names]
    return NumericTransform("xorshift", slots, fn)


# --- sha256_chain ----------------------------------------------------------

def make_sha256_chain(variant: str | None = None,
                      depth: int = chain_core.DEFAULT_CHAIN_DEPTH) -> NumericTransform:
    """Chain transform.  For numeric inputs the reference emits BOTH the
    decimal-string-seed chain and (for seeds <= u32::MAX) the 4-BE-byte-seed
    chain, with identical labels 'seed[variant:idx]'
    (/root/reference/src/transform/sha256_chain.rs:60-93)."""
    variants = [variant] if variant else list(chain_core.VARIANTS)

    def fn(hi, lo):
        words, length = decimal.decimal_ascii_words_be(hi, lo)
        str_chains = [_string_seed_chain(words, length, v, depth) for v in variants]
        bin_chains = [chain_core.chain_words(lo, v, depth) for v in variants]
        keys = jnp.concatenate(str_chains + bin_chains, axis=-2)
        n_str = depth * len(variants)
        valid_str = jnp.ones(keys.shape[:-2] + (n_str,), dtype=bool)
        valid_bin = jnp.broadcast_to((hi == 0)[..., None], keys.shape[:-2] + (n_str,))
        valid = jnp.concatenate([valid_str, valid_bin], axis=-1)
        return keys, valid

    slots = ([f"[{v}:{i}]" for v in variants for i in range(depth)]
             + [f"[{v}:{i}]" for v in variants for i in range(depth)])
    return NumericTransform("sha256_chain", slots, fn)


def _append_const_bytes(words, length, const_bytes: bytes, max_len: int = 20):
    """Append constant bytes at per-lane variable byte offset ``length``.

    words: list of BE word arrays holding ``length`` message bytes (zeros
    beyond).  Returns (new_words, new_length) covering max_len+len(const)
    bytes.
    """
    nb = len(const_bytes)
    total_words = (max_len + nb + 3) // 4
    batch = length.shape
    out = list(words) + [jnp.zeros(batch, dtype=jnp.uint32)
                         for _ in range(total_words - len(words))]
    cpad = const_bytes + b"\x00" * ((-nb) % 4)
    cw = [int.from_bytes(cpad[4 * i:4 * i + 4], "big") for i in range(len(cpad) // 4)]
    word_idx = length >> np.uint32(2)
    sh = (length & np.uint32(3)) * np.uint32(8)
    for ci, cword in enumerate(cw):
        hi_part = jnp.where(sh > 0, np.uint32(cword) >> sh, np.uint32(cword))
        lo_part = jnp.where(sh > 0, np.uint32(cword) << (np.uint32(32) - sh), np.uint32(0))
        for wi in range(total_words):
            tgt = word_idx + np.uint32(ci)
            out[wi] = out[wi] | jnp.where(tgt == np.uint32(wi), hi_part, np.uint32(0))
            out[wi] = out[wi] | jnp.where(tgt + np.uint32(1) == np.uint32(wi), lo_part, np.uint32(0))
    return out, length + np.uint32(nb)


def _string_seed_chain(words, length, variant: str, depth: int):
    """Chain over a variable-length decimal-string seed (device-side)."""
    keys = []
    if variant == "iterated":
        key = decimal.sha256_single_block_varlen(words, length)
        keys.append(key)
        for _ in range(depth - 1):
            key = sha256_key_words(key)
            keys.append(key)
    elif variant.startswith("indexed"):
        be = variant.endswith("be")
        for n in range(depth):
            idx_bytes = int(n).to_bytes(4, "big" if be else "little")
            w2, l2 = _append_const_bytes(words, length, idx_bytes)
            keys.append(decimal.sha256_single_block_varlen(w2, l2))
    else:  # counter
        for n in range(depth):
            w2, l2 = _append_const_bytes(words, length, str(n).encode())
            keys.append(decimal.sha256_single_block_varlen(w2, l2))
    return jnp.stack(keys, axis=-2)
