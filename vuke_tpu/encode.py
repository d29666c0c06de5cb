"""Host-side Bitcoin encodings: base58check, bech32, WIF, address codecs.

Only confirmed hits ever reach these string paths — the device pipeline works
exclusively in hash160 space (unlike the reference, which formats every
candidate: /root/reference/src/derive.rs:121-147).

Implements the standard encodings (BIP13/BIP173) from their public specs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}

_BECH32_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_BECH32_INDEX = {c: i for i, c in enumerate(_BECH32_CHARSET)}


def sha256d(data: bytes) -> bytes:
    return hashlib.sha256(hashlib.sha256(data).digest()).digest()


def hash160(data: bytes) -> bytes:
    return hashlib.new("ripemd160", hashlib.sha256(data).digest()).digest()


def base58check_encode(payload: bytes) -> str:
    data = payload + sha256d(payload)[:4]
    num = int.from_bytes(data, "big")
    out = []
    while num:
        num, rem = divmod(num, 58)
        out.append(_B58_ALPHABET[rem])
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def base58check_decode(s: str) -> bytes:
    num = 0
    for c in s:
        if c not in _B58_INDEX:
            raise ValueError(f"invalid base58 character: {c!r}")
        num = num * 58 + _B58_INDEX[c]
    raw = num.to_bytes((num.bit_length() + 7) // 8, "big")
    pad = 0
    for c in s:
        if c == "1":
            pad += 1
        else:
            break
    data = b"\x00" * pad + raw
    if len(data) < 4:
        raise ValueError("base58 string too short")
    payload, checksum = data[:-4], data[-4:]
    if sha256d(payload)[:4] != checksum:
        raise ValueError("base58 checksum mismatch")
    return payload


# --- bech32 (BIP173) -------------------------------------------------------

def _bech32_polymod(values) -> int:
    gen = [0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3]
    chk = 1
    for v in values:
        top = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= gen[i] if ((top >> i) & 1) else 0
    return chk


def _bech32_hrp_expand(hrp: str):
    return [ord(x) >> 5 for x in hrp] + [0] + [ord(x) & 31 for x in hrp]


def _bech32_create_checksum(hrp: str, data):
    values = _bech32_hrp_expand(hrp) + list(data)
    polymod = _bech32_polymod(values + [0, 0, 0, 0, 0, 0]) ^ 1
    return [(polymod >> 5 * (5 - i)) & 31 for i in range(6)]


def _bech32_verify_checksum(hrp: str, data) -> bool:
    return _bech32_polymod(_bech32_hrp_expand(hrp) + list(data)) == 1


def _convertbits(data, frombits: int, tobits: int, pad: bool):
    acc = 0
    bits = 0
    ret = []
    maxv = (1 << tobits) - 1
    for value in data:
        if value < 0 or (value >> frombits):
            raise ValueError("invalid value for convertbits")
        acc = (acc << frombits) | value
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            ret.append((acc >> bits) & maxv)
    if pad:
        if bits:
            ret.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        raise ValueError("invalid padding in convertbits")
    return ret


def bech32_encode_v0(hrp: str, witprog: bytes) -> str:
    data = [0] + _convertbits(witprog, 8, 5, True)
    checksum = _bech32_create_checksum(hrp, data)
    return hrp + "1" + "".join(_BECH32_CHARSET[d] for d in data + checksum)


def bech32_decode(addr: str):
    """Returns (hrp, witver, witprog bytes). BIP173 (bech32, v0 only)."""
    if addr.lower() != addr and addr.upper() != addr:
        raise ValueError("mixed-case bech32")
    addr = addr.lower()
    pos = addr.rfind("1")
    if pos < 1 or pos + 7 > len(addr) or len(addr) > 90:
        raise ValueError("invalid bech32 framing")
    hrp, rest = addr[:pos], addr[pos + 1:]
    if any(c not in _BECH32_INDEX for c in rest):
        raise ValueError("invalid bech32 character")
    data = [_BECH32_INDEX[c] for c in rest]
    if not _bech32_verify_checksum(hrp, data):
        raise ValueError("bech32 checksum mismatch")
    witver = data[0]
    witprog = bytes(_convertbits(data[1:-6], 5, 8, False))
    return hrp, witver, witprog


# --- network parameters ----------------------------------------------------

@dataclass(frozen=True)
class Network:
    """Version bytes / hrp per network (bitcoin::Network equivalent,
    /root/reference/src/network.rs:6-17)."""
    name: str
    p2pkh_version: int
    wif_version: int
    hrp: str


BITCOIN = Network("bitcoin", 0x00, 0x80, "bc")
TESTNET = Network("testnet", 0x6F, 0xEF, "tb")
SIGNET = Network("signet", 0x6F, 0xEF, "tb")
REGTEST = Network("regtest", 0x6F, 0xEF, "bcrt")

NETWORKS = {n.name: n for n in (BITCOIN, TESTNET, SIGNET, REGTEST)}


def parse_network(s: str) -> Network:
    """Unknown networks warn and fall back to mainnet, mirroring
    /root/reference/src/network.rs:6-17."""
    net = NETWORKS.get(s.lower())
    if net is None:
        import sys
        print(f"Warning: unknown network '{s}', using bitcoin mainnet", file=sys.stderr)
        return BITCOIN
    return net


# --- address / WIF construction -------------------------------------------

def p2pkh_address(h160: bytes, network: Network = BITCOIN) -> str:
    return base58check_encode(bytes([network.p2pkh_version]) + h160)


def p2wpkh_address(h160: bytes, network: Network = BITCOIN) -> str:
    return bech32_encode_v0(network.hrp, h160)


def wif(key: bytes, compressed: bool, network: Network = BITCOIN) -> str:
    payload = bytes([network.wif_version]) + key
    if compressed:
        payload += b"\x01"
    return base58check_encode(payload)


def wif_decode(s: str):
    """Returns (key bytes, compressed flag, version byte)."""
    payload = base58check_decode(s)
    version = payload[0]
    body = payload[1:]
    if len(body) == 33 and body[-1] == 0x01:
        return body[:32], True, version
    if len(body) == 32:
        return body, False, version
    raise ValueError("invalid WIF payload length")


def decode_address_h160(addr: str):
    """Decode a target address to its hash160 + kind.

    Returns (h160 bytes, kind) with kind in {"p2pkh", "p2wpkh"}, or None if
    the string is not a recognizable address (kept as opaque string target).
    """
    try:
        if addr[:1] in "13mn2" and 25 <= len(addr) <= 36:
            payload = base58check_decode(addr)
            if len(payload) == 21:
                return payload[1:], "p2pkh"
        if "1" in addr and addr[:addr.rfind("1")].lower() in ("bc", "tb", "bcrt"):
            _, witver, prog = bech32_decode(addr)
            if witver == 0 and len(prog) == 20:
                return prog, "p2wpkh"
    except ValueError:
        return None
    return None
