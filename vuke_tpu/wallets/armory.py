"""Armory legacy HD derivation (pre-BIP32).

Matches /root/reference/src/transform/armory.rs:26-73: chaincode =
HMAC-SHA256(key=SHA256(SHA256(root)), "Derive Chaincode from Root Key");
advance: priv *= scalar(SHA256(SHA256(uncompressed_pubkey)) XOR chaincode),
4 steps -> the P5 key.
"""

from __future__ import annotations

import hashlib
import hmac
from typing import Optional

from ..ecc import ref


def armory_key(seed: bytes) -> Optional[bytes]:
    h1 = hashlib.sha256(seed).digest()
    h2 = hashlib.sha256(h1).digest()
    chaincode = hmac.new(h2, b"Derive Chaincode from Root Key",
                         hashlib.sha256).digest()

    if len(seed) == 32:
        k = int.from_bytes(seed, "big")
    else:
        k = int.from_bytes(h1, "big")
    if k == 0 or k >= ref.N:
        return None

    for _ in range(4):
        x, y = ref.point_mul(k)
        pub = b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")
        d = hashlib.sha256(hashlib.sha256(pub).digest()).digest()
        scalar = int.from_bytes(bytes(a ^ b for a, b in zip(d, chaincode)), "big")
        if scalar >= ref.N or scalar == 0:
            return None
        k = (k * scalar) % ref.N
        if k == 0:
            return None
    return k.to_bytes(32, "big")
