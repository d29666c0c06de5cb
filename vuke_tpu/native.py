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
