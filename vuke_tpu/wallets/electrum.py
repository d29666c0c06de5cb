"""Electrum pre-BIP39 deterministic derivation (2011-2014).

Matches /root/reference/src/electrum.rs: 100k-iteration SHA256 stretch of
the ASCII hex seed, master key = stretched scalar, child =
(master + double_SHA256("{i}:{chg}:" || mpk64)) mod n, uncompressed
addresses.  Pinned by the official Electrum test vector
(electrum.rs:216-223).

The stretch loop here is hashlib on the host for single seeds; the batch
path (timestamp scans) uses the device iterated-SHA256 kernel via
:func:`stretch_keys_device`.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

from ..ecc import ref


class ElectrumError(ValueError):
    pass


def stretch_key(seed: bytes) -> bytes:
    """x = SHA256(seed+seed); 99,999 x = SHA256(x+seed) iterations."""
    x = hashlib.sha256(seed + seed).digest()
    for _ in range(99_999):
        x = hashlib.sha256(x + seed).digest()
    return x


def get_sequence(mpk64: bytes, for_change: int, index: int) -> bytes:
    data = f"{index}:{for_change}:".encode() + mpk64
    return hashlib.sha256(hashlib.sha256(data).digest()).digest()


def truncate_seed(seed: str) -> str:
    if len(seed) <= 20:
        return seed
    return f"{seed[:8]}...{seed[-8:]}"


class ElectrumDeriver:
    def __init__(self, stretched: bytes, for_change: bool = False,
                 pubkey_bytes: Optional[bytes] = None):
        k = int.from_bytes(stretched, "big")
        if k == 0 or k >= ref.N:
            raise ElectrumError("Invalid stretched key")
        self.master_privkey = k
        if pubkey_bytes is None:   # single-seed path: host EC
            x, y = ref.point_mul(k)
            pubkey_bytes = x.to_bytes(32, "big") + y.to_bytes(32, "big")
        self.master_pubkey_bytes = pubkey_bytes
        self.for_change = for_change

    @classmethod
    def from_hex_seed(cls, hex_seed: str, for_change: bool = False) -> "ElectrumDeriver":
        if not hex_seed or not all(c in "0123456789abcdefABCDEF" for c in hex_seed):
            raise ElectrumError("Seed must be valid hex")
        return cls(stretch_key(hex_seed.encode()), for_change)

    def master_pubkey_hex(self) -> str:
        return self.master_pubkey_bytes.hex()

    def derive_key(self, index: int) -> bytes:
        chg = 1 if self.for_change else 0
        seq = int.from_bytes(get_sequence(self.master_pubkey_bytes, chg, index), "big")
        if seq >= ref.N:
            raise ElectrumError("Sequence overflow")
        child = (self.master_privkey + seq) % ref.N
        if child == 0:
            raise ElectrumError("zero child key")
        return child.to_bytes(32, "big")

    def derive_keys(self, count: int) -> List[bytes]:
        return [self.derive_key(i) for i in range(count)]


def stretch_keys_device(seeds: List[bytes]):
    """Batched 100k-iteration stretch on the TPU.

    Electrum's stretch is an iterated SHA256 over a 64-byte message
    (32-byte running digest || 32-byte... the seed is the ASCII hex string,
    so message length = 32 + len(seed)); the iteration chain stays in-lane
    and seeds batch across lanes (SURVEY.md §7.7).  Only worthwhile for
    large seed batches; single seeds use the hashlib path.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ..cores.sha256 import sha256_words, pad_message, sha256_blocks

    if not seeds:
        return []
    slen = len(seeds[0])
    assert all(len(s) == slen for s in seeds), "uniform seed length required"

    # initial x = SHA256(seed+seed), on host (once per seed)
    xs = [hashlib.sha256(s + s).digest() for s in seeds]
    x_words = np.stack([np.frombuffer(x, dtype=">u4").astype(np.uint32) for x in xs])

    # message = x (32B) || seed (slen B); seed words are per-lane constants
    pad_to = (slen + 3) // 4 * 4
    seed_words = np.stack([
        np.frombuffer(s + b"\x00" * (pad_to - slen), dtype=">u4").astype(np.uint32)
        for s in seeds])
    nbytes = 32 + slen

    @jax.jit
    def stretch(xw, sw):
        def body(_, xw):
            words = [xw[:, i] for i in range(8)] + [sw[:, i] for i in range(sw.shape[1])]
            return jnp.stack(sha256_words(words, nbytes), axis=-1)
        return jax.lax.fori_loop(0, 99_999, body, xw)

    out = np.asarray(stretch(jnp.asarray(x_words), jnp.asarray(seed_words)))
    return [bytes(np.asarray(out[i], dtype=">u4").tobytes()) for i in range(len(seeds))]


def master_pubkeys_device(stretched: List[bytes]):
    """Batch-derive uncompressed master pubkeys (64B x||y) on device.

    Replaces the per-seed host ``ref.point_mul`` in timestamp-scale electrum
    scans (/root/reference/src/electrum.rs:118-130 semantics) with the
    shared fixed-base scalar-mul kernel.  Invalid scalars (0 or >= n) map
    to ``None``, matching ElectrumDeriver's rejection.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ..ecc.pubkey import derive_pubkey

    out = [None] * len(stretched)
    idxs = [i for i, s in enumerate(stretched)
            if 0 < int.from_bytes(s, "big") < ref.N]
    if not idxs:
        return out

    PAD = 1024  # tile-aligned: hits the Pallas kernel on TPU backends

    global _MPK_PROGRAM
    try:
        prog = _MPK_PROGRAM
    except NameError:
        def _derive(words):
            xw, yw, _ = derive_pubkey(words, inv_chunk=32)
            return xw, yw
        prog = _MPK_PROGRAM = jax.jit(_derive)

    for ofs in range(0, len(idxs), PAD):
        chunk = idxs[ofs:ofs + PAD]
        words = np.ones((PAD, 8), dtype=np.uint32)  # dummy scalar pad
        for j, i in enumerate(chunk):
            words[j] = np.frombuffer(stretched[i], dtype=">u4")
        xw, yw = prog(jnp.asarray(words))
        xw = np.asarray(xw[:len(chunk)], dtype=">u4")
        yw = np.asarray(yw[:len(chunk)], dtype=">u4")
        for j, i in enumerate(chunk):
            out[i] = xw[j].tobytes() + yw[j].tobytes()
    return out
