"""Full key derivation: every representation of a private key.

Host-side DerivedKey mirrors the reference's struct field-for-field
(/root/reference/src/derive.rs:12-52) and is produced only for hits and the
``single`` command; the bulk pipeline derives hash160s on device
(:mod:`vuke_tpu.ecc.pubkey`) and never touches strings.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import encode
from .ecc import ref


@dataclass
class DerivedKey:
    raw: bytes
    private_key_hex: str
    private_key_decimal: str
    private_key_binary: str
    bit_length: int
    hamming_weight: int
    leading_zeros: int
    pubkey_compressed: str
    pubkey_uncompressed: str
    wif_compressed: str
    wif_uncompressed: str
    p2pkh_compressed: str
    p2pkh_uncompressed: str
    p2wpkh: str

    def addresses(self):
        return (self.p2pkh_compressed, self.p2pkh_uncompressed, self.p2wpkh)


def normalize_key(key: bytes) -> bytes:
    """Invalid keys reduced mod curve order; zero -> 1 (derive.rs:79-93)."""
    v = int.from_bytes(key, "big") % ref.N
    if v == 0:
        v = 1
    return v.to_bytes(32, "big")


def _pubkey_point(k: int, key: bytes):
    """Public point for a normalized key: native C++ fixed-window ladder
    when available (~10us), pure-Python bignum otherwise (~10ms — the
    pre-native generate+storage path spent ~15ms/record here).  Parity is
    pinned in tests/test_native_ecc.py."""
    from . import native

    pub = (native.pubkey_uncompressed(key)
           if native.available_now() and native.has_pubkey() else None)
    if pub is not None and len(pub) == 65 and pub[0] == 4:
        return int.from_bytes(pub[1:33], "big"), int.from_bytes(pub[33:65], "big")
    return ref.point_mul(k)


class KeyDeriver:
    """Converts 32-byte keys to every address/string format."""

    def __init__(self, network: encode.Network = encode.BITCOIN):
        self.network = network

    def derive(self, key: bytes) -> DerivedKey:
        key = normalize_key(key)
        k = int.from_bytes(key, "big")
        x, y = _pubkey_point(k, key)
        comp = bytes([2 + (y & 1)]) + x.to_bytes(32, "big")
        uncomp = b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")

        h160c = encode.hash160(comp)
        h160u = encode.hash160(uncomp)

        hex_str = key.hex()
        leading_zero_bits = 256 - k.bit_length()
        return DerivedKey(
            raw=key,
            private_key_hex=hex_str,
            private_key_decimal=str(k),
            private_key_binary=format(k, "0256b"),
            bit_length=256 - leading_zero_bits,
            hamming_weight=bin(k).count("1"),
            leading_zeros=len(hex_str) - len(hex_str.lstrip("0")),
            pubkey_compressed=comp.hex(),
            pubkey_uncompressed=uncomp.hex(),
            wif_compressed=encode.wif(key, True, self.network),
            wif_uncompressed=encode.wif(key, False, self.network),
            p2pkh_compressed=encode.p2pkh_address(h160c, self.network),
            p2pkh_uncompressed=encode.p2pkh_address(h160u, self.network),
            p2wpkh=encode.p2wpkh_address(h160c, self.network),
        )
