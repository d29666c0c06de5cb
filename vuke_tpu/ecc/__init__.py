"""Batched secp256k1 over uint32 lanes: field, points, pubkey/hash160."""

from . import field, point, pubkey, ref  # noqa: F401
