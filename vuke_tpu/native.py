"""ctypes loader for the native host library (batch encodings).

Builds lazily via the checked-in Makefile if the .so is missing and a
compiler is available; every entry point has a pure-Python fallback in
:mod:`vuke_tpu.encode`, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_SO_PATH = os.path.join(os.path.dirname(__file__), "data", "libvuke_native.so")
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")

_lib = None
_tried = False


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        if not os.path.isdir(_NATIVE_DIR) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.vuke_batch_p2pkh.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_uint8, ctypes.c_char_p,
                                         ctypes.c_int]
        lib.vuke_batch_p2wpkh.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_char_p, ctypes.c_char_p,
                                          ctypes.c_int]
        lib.vuke_batch_wif.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_uint8, ctypes.c_int,
                                       ctypes.c_char_p, ctypes.c_int]
        lib.vuke_b58check_encode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                             ctypes.c_char_p, ctypes.c_int]
        lib.vuke_b58check_encode.restype = ctypes.c_int
        try:
            lib.vuke_batch_derive_h160.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
            lib.vuke_batch_pubkey.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_char_p]
        except AttributeError:
            pass  # stale .so without the ECC unit; derive path unavailable
        _lib = lib
    except OSError:
        _lib = None
    return _lib


_STRIDE = 96


def batch_p2pkh(h160s: bytes, n: int, version: int = 0x00) -> Optional[List[str]]:
    """n contiguous 20-byte hash160s -> addresses, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(n * _STRIDE)
    lib.vuke_batch_p2pkh(h160s, n, version, out, _STRIDE)
    raw = out.raw
    return [raw[i * _STRIDE:(i + 1) * _STRIDE].split(b"\x00", 1)[0].decode()
            for i in range(n)]


def batch_p2wpkh(h160s: bytes, n: int, hrp: str = "bc") -> Optional[List[str]]:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(n * _STRIDE)
    lib.vuke_batch_p2wpkh(h160s, n, hrp.encode(), out, _STRIDE)
    raw = out.raw
    return [raw[i * _STRIDE:(i + 1) * _STRIDE].split(b"\x00", 1)[0].decode()
            for i in range(n)]


def batch_wif(keys: bytes, n: int, version: int = 0x80,
              compressed: bool = True) -> Optional[List[str]]:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(n * _STRIDE)
    lib.vuke_batch_wif(keys, n, version, 1 if compressed else 0, out, _STRIDE)
    raw = out.raw
    return [raw[i * _STRIDE:(i + 1) * _STRIDE].split(b"\x00", 1)[0].decode()
            for i in range(n)]


def has_derive() -> bool:
    """True when the native secp256k1 batch deriver is loadable."""
    lib = get_lib()
    return lib is not None and hasattr(lib, "vuke_batch_derive_h160")


def batch_derive_h160(keys_words, threads: int = 0):
    """(N, 8) big-endian u32 word keys -> (norm_words, h160c_bytes,
    h160u_bytes) via the native secp256k1 pipeline (native/vuke_ecc.cpp),
    or None when the library is unavailable.

    norm_words: (N, 8) BE u32 of the mod-n normalized keys;
    h160*_bytes: N*20 contiguous digest bytes (hash160 byte order)."""
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "vuke_batch_derive_h160"):
        return None
    keys_np = np.ascontiguousarray(np.asarray(keys_words, dtype=np.uint32))
    n = keys_np.shape[0]
    if n == 0:
        return (keys_np, b"", b"")
    kb = keys_np.astype(">u4").tobytes()
    h160c = ctypes.create_string_buffer(20 * n)
    h160u = ctypes.create_string_buffer(20 * n)
    norm = ctypes.create_string_buffer(32 * n)
    lib.vuke_batch_derive_h160(kb, n, threads, h160c, h160u, norm)
    norm_words = np.frombuffer(norm.raw, dtype=">u4").reshape(n, 8).astype(np.uint32)
    return norm_words, h160c.raw, h160u.raw


def available_now() -> bool:
    """True when the library is loaded or its .so already exists — a check
    that never triggers a compiler build (latency-sensitive callers like
    ``vuke single`` must not block on `make`)."""
    return _lib is not None or os.path.exists(_SO_PATH)


def has_pubkey() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "vuke_batch_pubkey")


def batch_pubkey(keys: bytes, n: int, threads: int = 0):
    """n*32 big-endian key bytes -> n*65 uncompressed pubkey bytes
    (0x04||x||y; keys normalized mod n, zero -> 1), or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "vuke_batch_pubkey"):
        return None
    out = ctypes.create_string_buffer(65 * n)
    lib.vuke_batch_pubkey(keys, n, threads, out, None)
    return out.raw


def pubkey_uncompressed(key: bytes):
    """One 32-byte key -> 65-byte uncompressed pubkey, or None."""
    out = batch_pubkey(key, 1, 1)
    return None if out is None else out
