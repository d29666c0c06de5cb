"""MultiBit HD seed-as-entropy bug derivation.

Matches /root/reference/src/multibit.rs:87-139: mnemonic -> BIP39 seed ->
(BUG) 64-byte seed treated as entropy -> 48-word mnemonic -> second BIP39
seed -> BIP32 m/0'/0/i.  Pinned by the issue-445 vector (multibit.rs:404+).
"""

from __future__ import annotations

from typing import List

from . import bip32, bip39


class MultibitError(ValueError):
    pass


class MultibitBugDeriver:
    def __init__(self, mnemonic: str, passphrase: str = ""):
        try:
            bip39.validate_mnemonic(mnemonic)
        except bip39.MnemonicError as e:
            raise MultibitError(str(e))
        original_seed = bip39.mnemonic_to_seed(mnemonic, passphrase)
        buggy_mnemonic = " ".join(bip39.entropy_to_mnemonic(original_seed))
        self.buggy_seed = bip39.mnemonic_to_seed(buggy_mnemonic, passphrase)
        self.master_key, self.chain_code = bip32.seed_to_master_key(self.buggy_seed)

    def derive_key(self, index: int) -> bytes:
        k0h, c0h = bip32.derive_hardened_child(self.master_key, self.chain_code, 0)
        k0h0, c0h0 = bip32.derive_normal_child(k0h, c0h, 0)
        key, _ = bip32.derive_normal_child(k0h0, c0h0, index)
        return key

    def derive_keys(self, count: int) -> List[bytes]:
        return [self.derive_key(i) for i in range(count)]


def multibit_hd_keys(mnemonic: str, passphrase: str, count: int) -> List[bytes]:
    try:
        deriver = MultibitBugDeriver(mnemonic, passphrase)
    except MultibitError as e:
        raise ValueError(str(e))
    return deriver.derive_keys(count)


def multibit_hd_keys_batch(mnemonics: List[str], passphrase: str,
                           count: int, min_device_batch: int = 32):
    """Dictionary-attack batch: [(mnemonic, [keys])] for the VALID entries.

    On accelerator backends the two PBKDF2-HMAC-SHA512 stretches (the
    dominant cost: 2 x 2048 iterations per candidate) batch across
    candidates on device (wallets/pbkdf2_device.py); the BIP32 tail runs
    host-side (EC through the native ladder when present).  CPU backends
    and small batches use the per-candidate hashlib path — OpenSSL's
    PBKDF2 is already the best host implementation.
    Reference workload: /root/reference/src/analyze/multibit.rs:66-185."""
    valid = []
    for m in mnemonics:
        try:
            bip39.validate_mnemonic(m)
            valid.append(m)
        except bip39.MnemonicError:
            continue
    if not valid:
        return []
    from .pbkdf2_device import device_available, pbkdf2_hmac_sha512_batch
    salt = ("mnemonic" + passphrase).encode()
    if device_available() and len(valid) >= min_device_batch:
        seeds = pbkdf2_hmac_sha512_batch([m.encode() for m in valid], salt)
        buggy = [" ".join(bip39.entropy_to_mnemonic(s)) for s in seeds]
        buggy_seeds = pbkdf2_hmac_sha512_batch([b.encode() for b in buggy], salt)
    else:
        buggy_seeds = []
        for m in valid:
            s = bip39.mnemonic_to_seed(m, passphrase)
            b = " ".join(bip39.entropy_to_mnemonic(s))
            buggy_seeds.append(bip39.mnemonic_to_seed(b, passphrase))
    out = []
    for m, bs in zip(valid, buggy_seeds):
        mk, cc = bip32.seed_to_master_key(bs)
        k0h, c0h = bip32.derive_hardened_child(mk, cc, 0)
        k0h0, c0h0 = bip32.derive_normal_child(k0h, c0h, 0)
        keys = [bip32.derive_normal_child(k0h0, c0h0, i)[0]
                for i in range(count)]
        out.append((m, keys))
    return out


def truncate_mnemonic(mnemonic: str) -> str:
    words = mnemonic.split()
    if len(words) <= 4:
        return mnemonic
    return f"{' '.join(words[:2])}...{' '.join(words[-2:])}"
