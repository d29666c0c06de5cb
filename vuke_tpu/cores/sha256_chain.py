"""SHA256-chain keystreams (iterated / indexed / counter) over seed lattices.

Bit-exact with /root/reference/src/sha256_chain.rs:88-162:
  - Iterated:       k0 = SHA256(seed), k_n = SHA256(k_{n-1})
  - IndexedBinary:  k_n = SHA256(seed || n as 4 bytes BE/LE)
  - IndexedString:  k_n = SHA256(seed || ascii(n))
  - u32 seeds are hashed as their 4 big-endian bytes
  - default chain depth 10

Device-side: a u32 seed lattice expands to ``depth`` keys per seed with no
host round-trip — the reference's GPU path shuttles digests back to the CPU
between hops (/root/reference/src/gpu/sha256_chain.rs:27-90); here the whole
chain stays in-lane and fuses.
"""

from __future__ import annotations

import numpy as np
from .._lazy import jnp

from .common import byteswap32
from .sha256 import sha256_words

DEFAULT_CHAIN_DEPTH = 10

VARIANTS = ("iterated", "indexed:be", "indexed:le", "counter")


def _seed_word(seeds, big_endian=True):
    s = jnp.asarray(seeds, dtype=jnp.uint32)
    return s if big_endian else byteswap32(s)


def iterated_chain_words(seeds, depth: int = DEFAULT_CHAIN_DEPTH):
    """(N,) u32 seeds -> (N, depth, 8) BE key words."""
    w = _seed_word(seeds)
    key = jnp.stack(sha256_words([w], 4), axis=-1)
    keys = [key]
    for _ in range(depth - 1):
        key = jnp.stack(sha256_words([key[..., i] for i in range(8)], 32), axis=-1)
        keys.append(key)
    return jnp.stack(keys, axis=-2)


def indexed_chain_words(seeds, depth: int = DEFAULT_CHAIN_DEPTH, big_endian: bool = True):
    """k_n = SHA256(seed_be4 || n as 4 bytes be/le) -> (N, depth, 8)."""
    w = _seed_word(seeds)
    keys = []
    for n in range(depth):
        nw = np.uint32(n) if big_endian else np.uint32(int.from_bytes(
            int(n).to_bytes(4, "little"), "big"))
        idx = jnp.broadcast_to(jnp.uint32(nw), w.shape)
        keys.append(jnp.stack(sha256_words([w, idx], 8), axis=-1))
    return jnp.stack(keys, axis=-2)


def counter_chain_words(seeds, depth: int = DEFAULT_CHAIN_DEPTH):
    """k_n = SHA256(seed_be4 || ascii(n)) -> (N, depth, 8)."""
    w = _seed_word(seeds)
    keys = []
    for n in range(depth):
        s = str(n).encode()
        nbytes = 4 + len(s)
        # build words: first word = seed, remaining words carry ascii digits
        # packed big-endian, final partial word zero-padded low.
        tail = s + b"\x00" * ((-len(s)) % 4)
        tail_words = [np.uint32(int.from_bytes(tail[i:i + 4], "big"))
                      for i in range(0, len(tail), 4)]
        words = [w] + [jnp.broadcast_to(jnp.uint32(tw), w.shape) for tw in tail_words]
        keys.append(jnp.stack(sha256_words(words, nbytes), axis=-1))
    return jnp.stack(keys, axis=-2)


def chain_words(seeds, variant: str, depth: int = DEFAULT_CHAIN_DEPTH):
    if variant == "iterated":
        return iterated_chain_words(seeds, depth)
    if variant == "indexed:be":
        return indexed_chain_words(seeds, depth, big_endian=True)
    if variant == "indexed:le":
        return indexed_chain_words(seeds, depth, big_endian=False)
    if variant == "counter":
        return counter_chain_words(seeds, depth)
    raise ValueError(f"unknown sha256_chain variant: {variant}")
