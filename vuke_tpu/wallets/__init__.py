"""Wallet-derivation cores: BIP39/BIP32, Electrum, MultiBit HD, Armory,
Bitimage."""

from . import armory, bip32, bip39, bitimage, electrum, multibit  # noqa: F401
