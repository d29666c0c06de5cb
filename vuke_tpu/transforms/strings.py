"""String-input transforms: host-side padding, device-side hashing.

Wordlist/stdin/file sources produce strings; the host packs them into
fixed-block-count buckets (the TPU analogue of the reference GPU path's
single-block cutoff, /root/reference/src/gpu/hash.rs:331-380 — but without
its 55-byte limit: multi-block buckets just take more compressions) and the
device hashes each bucket with one jitted call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Sequence

import numpy as np
from .._lazy import jax, jnp

from ..cores import md5 as md5_core, sha256 as sha256_core
from ..cores.common import byteswap32
from ..cores.sha256 import sha256_key_words


@dataclass
class StringTransform:
    """Maps a batch of strings to (N, n_slots, 8) key words (host+device)."""
    name: str
    slots: List[str]
    fn: Callable  # (list[str]) -> np.ndarray (N, n_slots, 8) uint32
    valid_fn: Callable | None = None  # (list[str]) -> (N, n_slots) bool


def _bucket_indices(datas: Sequence[bytes], nblocks_fn):
    buckets: dict[int, list[int]] = {}
    for i, d in enumerate(datas):
        buckets.setdefault(nblocks_fn(len(d)), []).append(i)
    return buckets


def _host_digest_max() -> int:
    """Batches at or below this size hash on the host (hashlib), never the
    device.  `vuke single` and small wordlists must not wait on a device
    compile — the reference's `single` is instant (main.rs:954-992); round-2
    routed a 1-string digest through the PAD=1024 device program and blocked
    on a remote compile for minutes."""
    import os
    return int(os.environ.get("VUKE_HOST_DIGEST_MAX", 4096))


def _host_digest(datas: Sequence[bytes], algo: str) -> np.ndarray:
    import hashlib
    if algo == "md5":
        return np.stack([np.frombuffer(hashlib.md5(d).digest(), dtype="<u4")
                         for d in datas])
    if algo == "sha256":
        return np.stack([np.frombuffer(hashlib.sha256(d).digest(), dtype=">u4")
                         for d in datas])
    return np.stack([np.frombuffer(
        hashlib.sha256(hashlib.sha256(d).digest()).digest(), dtype=">u4")
        for d in datas])


import functools


@functools.cache
def _sha256_jit():
    return jax.jit(lambda blocks: sha256_core.sha256_blocks(blocks))


@functools.cache
def _sha256d_jit():
    return jax.jit(lambda blocks: sha256_key_words(sha256_core.sha256_blocks(blocks)))


@functools.cache
def _md5_jit():
    return jax.jit(lambda blocks: md5_core.md5_blocks(blocks))


def batched_digest(datas: Sequence[bytes], algo: str) -> np.ndarray:
    """Digest arbitrary byte strings on device, bucketed by block count.

    Returns (N, 8) BE digest words for sha256/double_sha256, (N, 4) LE words
    for md5.
    """
    if len(datas) == 0:
        return np.zeros((0, 4 if algo == "md5" else 8), dtype=np.uint32)
    if len(datas) <= _host_digest_max():
        return _host_digest(datas, algo)
    if algo == "md5":
        out = np.zeros((len(datas), 4), dtype=np.uint32)
        nb = lambda n: (n + 9 + 63) // 64
        pad = md5_core.pad_message
        jit = _md5_jit()
    else:
        out = np.zeros((len(datas), 8), dtype=np.uint32)
        nb = lambda n: (n + 9 + 63) // 64
        pad = sha256_core.pad_message
        jit = (_sha256_jit if algo == "sha256" else _sha256d_jit)()
    for nblocks, idxs in _bucket_indices(datas, nb).items():
        blocks = np.stack([pad(datas[i]) for i in idxs])
        assert blocks.shape[1] == nblocks
        # pad batch to a power of two: stable shapes -> stable compile cache
        n = len(idxs)
        padded = 1
        while padded < n:
            padded *= 2
        if padded > n:
            blocks = np.concatenate(
                [blocks, np.tile(blocks[-1:], (padded - n, 1, 1))])
        dig = np.asarray(jit(jnp.asarray(blocks)))[:n]
        out[idxs] = dig
    return out


def _digest_to_key_words(dig: np.ndarray, algo: str) -> np.ndarray:
    if algo == "md5":
        # 16-byte digest duplicated to 32 (transform/md5.rs:17-21);
        # key BE words = byteswap of LE digest words.  Digests are host
        # arrays at this point — plain numpy, no device round-trip.
        be = np.asarray(dig, dtype=np.uint32).byteswap()
        return np.concatenate([be, be], axis=-1)
    return dig


def make_string_hash(algo: str) -> StringTransform:
    """sha256 / double_sha256 / md5 over the string itself (the only slot
    string inputs get, /root/reference/src/transform/sha256.rs:15-17)."""

    def fn(strings: Sequence[str]) -> np.ndarray:
        datas = [s.encode() for s in strings]
        dig = batched_digest(datas, algo)
        return _digest_to_key_words(dig, algo)[:, None, :]

    return StringTransform(algo, [""], fn)


def make_string_direct() -> StringTransform:
    """direct: string bytes as key prefix if <= 32 bytes
    (/root/reference/src/transform/direct.rs:28-33).  Longer strings yield
    no key; we emit an invalid marker row (all zero => caller filters by the
    returned mask from fn_with_valid)."""

    def fn(strings: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(strings), 1, 8), dtype=np.uint32)
        for i, s in enumerate(strings):
            b = s.encode()
            if len(b) <= 32:
                padded = b + b"\x00" * (32 - len(b))
                out[i, 0] = np.frombuffer(padded, dtype=">u4")
        return out

    t = StringTransform("direct", [""], fn)
    t.valid_fn = lambda strings: np.array(
        [[len(s.encode()) <= 32] for s in strings], dtype=bool)
    return t


def make_string_sha256_chain(variant: str | None, depth: int) -> StringTransform:
    """Chain from string seeds (generate_chain_from_string,
    /root/reference/src/sha256_chain.rs:157-162)."""
    from ..cores import sha256_chain as chain_core
    variants = [variant] if variant else list(chain_core.VARIANTS)

    def fn(strings: Sequence[str]) -> np.ndarray:
        datas = [s.encode() for s in strings]
        if depth <= 0:   # zero-depth chains are empty (sha256_chain.rs:88-97)
            return np.zeros((len(datas), 0, 8), dtype=np.uint32)
        cols = []
        for v in variants:
            if v == "iterated":
                key = batched_digest(datas, "sha256")
                chain = [key]
                if len(datas) <= _host_digest_max():
                    import hashlib
                    cur = [k.astype(">u4").tobytes() for k in key]
                    for _ in range(depth - 1):
                        cur = [hashlib.sha256(b).digest() for b in cur]
                        chain.append(np.stack(
                            [np.frombuffer(b, dtype=">u4") for b in cur]))
                else:
                    kw = jnp.asarray(key)
                    for _ in range(depth - 1):
                        kw = jax.jit(sha256_key_words)(kw)
                        chain.append(np.asarray(kw))
                cols.extend(chain)
            elif v.startswith("indexed"):
                be = v.endswith("be")
                for n in range(depth):
                    idx = int(n).to_bytes(4, "big" if be else "little")
                    cols.append(batched_digest([d + idx for d in datas], "sha256"))
            else:  # counter
                for n in range(depth):
                    cols.append(batched_digest([d + str(n).encode() for d in datas], "sha256"))
        return np.stack(cols, axis=1)

    slots = [f"[{v}:{i}]" for v in variants for i in range(depth)]
    return StringTransform("sha256_chain", slots, fn)
