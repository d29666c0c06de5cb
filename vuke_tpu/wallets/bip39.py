"""BIP39 mnemonics: wordlist, entropy<->mnemonic, seed derivation.

Matches the reference's hand-rolled implementations
(/root/reference/src/multibit.rs:165-239) including the non-standard
64-byte-entropy -> 48-word case the MultiBit bug requires.  The English
wordlist is the canonical public BIP39 data file.
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import List

_WORDLIST_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                              "data", "bip39_english.txt")


@functools.lru_cache(maxsize=1)
def wordlist() -> List[str]:
    with open(_WORDLIST_PATH) as f:
        words = [w.strip() for w in f if w.strip()]
    assert len(words) == 2048, "BIP39 wordlist must have 2048 entries"
    return words


@functools.lru_cache(maxsize=1)
def word_index() -> dict:
    return {w: i for i, w in enumerate(wordlist())}


VALID_WORD_COUNTS = (12, 15, 18, 21, 24)


class MnemonicError(ValueError):
    pass


def validate_mnemonic(mnemonic: str):
    """Word-count + word-membership validation (multibit.rs:144-163 —
    checksum is intentionally NOT verified, matching the reference)."""
    words = mnemonic.split()
    if len(words) not in VALID_WORD_COUNTS:
        raise MnemonicError(
            f"Invalid word count: {len(words)} (expected 12, 15, 18, 21, or 24)")
    idx = word_index()
    for w in words:
        if w not in idx:
            raise MnemonicError(f"Unknown word: {w}")


def entropy_to_mnemonic(entropy: bytes) -> List[str]:
    """Entropy bytes -> mnemonic words; supports arbitrary lengths including
    the buggy 64-byte case (512 bits -> 48 words)."""
    h = hashlib.sha256(entropy).digest()
    checksum_bits = len(entropy) * 8 // 32
    bits = []
    for b in entropy:
        for i in range(7, -1, -1):
            bits.append((b >> i) & 1)
    for i in range(checksum_bits):
        bits.append((h[i // 8] >> (7 - (i % 8))) & 1)
    words = []
    wl = wordlist()
    for i in range(len(bits) // 11):
        idx = 0
        for j in range(11):
            idx = (idx << 1) | bits[i * 11 + j]
        words.append(wl[idx])
    return words


def mnemonic_to_seed(mnemonic: str, passphrase: str = "") -> bytes:
    """PBKDF2-HMAC-SHA512, 2048 iterations, salt 'mnemonic'+passphrase."""
    return hashlib.pbkdf2_hmac("sha512", mnemonic.encode(),
                               ("mnemonic" + passphrase).encode(), 2048, 64)
