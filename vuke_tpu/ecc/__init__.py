"""Batched secp256k1 over uint32 lanes: field, points, pubkey/hash160.

Submodules load lazily (PEP 562): ``ref`` is pure-Python bignum used by
host-only paths (wallet derivation, ``vuke single``) that must not drag
in the jax-importing device modules (field/point/pubkey).
"""

import importlib

_SUBMODULES = ("field", "incremental", "pallas_inv", "pallas_smul",
               "pallas_smul13", "point", "pubkey", "ref", "tiled")


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_SUBMODULES))
