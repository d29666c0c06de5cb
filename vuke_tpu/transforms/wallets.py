"""Wallet-derivation transforms: Electrum, MultiBit HD, Armory, Bitimage.

Implemented in the wallet milestone; placeholder specs raise until then.
"""

from __future__ import annotations


def electrum_spec(for_change: bool = False):
    raise NotImplementedError("electrum transform lands in the wallet milestone")


def multibit_spec():
    raise NotImplementedError("multibit transform lands in the wallet milestone")


def armory_spec():
    raise NotImplementedError("armory transform lands in the wallet milestone")


def bitimage_spec():
    raise NotImplementedError("bitimage transform lands in the wallet milestone")
