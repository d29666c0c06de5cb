"""Transform registry: the reference's ``name:variant:endian`` CLI grammar.

Mirrors TransformType::from_str (/root/reference/src/transform/mod.rs:170-215)
including the error messages' variant lists.  Each parsed spec bundles the
numeric (device-lattice) and string (bucketed-host) implementations plus the
display name used in outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..cores import lcg as lcg_core, sha256_chain as chain_core, xorshift as xs_core
from . import numeric, strings

_XS_ALIASES = {
    "64": "xorshift64", "xorshift64": "xorshift64",
    "128": "xorshift128", "xorshift128": "xorshift128",
    "128plus": "xorshift128+", "128+": "xorshift128+", "plus": "xorshift128+",
    "xorshift128+": "xorshift128+",
    "xoroshiro": "xoroshiro128**", "starstar": "xoroshiro128**",
    "xoroshiro128**": "xoroshiro128**", "xoroshiro128starstar": "xoroshiro128**",
}

_CHAIN_NAMES = {
    "iterated": "iterated",
    "indexed": "indexed:be",
    "counter": "counter",
}


@dataclass
class TransformSpec:
    name: str                                   # display name (Transform::name)
    numeric: Optional[numeric.NumericTransform]  # device lattice path
    string: Optional[strings.StringTransform]    # host/string path


import functools


@functools.lru_cache(maxsize=None)
def parse_transform(s: str) -> TransformSpec:
    """Parse + cache: repeated parses return the same spec object, so the
    jitted keygen programs built from it are reused in-process."""
    sl = s.lower()
    if sl == "direct":
        return TransformSpec("direct", numeric.DIRECT, strings.make_string_direct())
    if sl in ("direct:be", "direct:le", "direct:str"):
        # single-interpretation variants (extension): direct:be = seeds ARE
        # the private keys (the puzzle-scan workload; served by the
        # incremental point-add fast path over contiguous ranges)
        nt = {"be": numeric.DIRECT_BE, "le": numeric.DIRECT_LE,
              "str": numeric.DIRECT_STR}[sl.split(":")[1]]
        st = strings.make_string_direct() if sl.endswith(":str") else None
        return TransformSpec("direct", nt, st)
    if sl == "sha256":
        return TransformSpec("sha256", numeric.SHA256, strings.make_string_hash("sha256"))
    if sl == "double_sha256":
        return TransformSpec("double_sha256", numeric.DOUBLE_SHA256,
                             strings.make_string_hash("double_sha256"))
    if sl == "md5":
        return TransformSpec("md5", numeric.MD5, strings.make_string_hash("md5"))
    if sl == "milksad":
        return TransformSpec("milksad", numeric.MILKSAD, None)
    if sl == "mt64":
        return TransformSpec("mt64", numeric.MT64, None)
    if sl == "armory":
        from . import wallets
        return wallets.armory_spec()
    if sl == "multibit":
        from . import wallets
        return wallets.multibit_spec()
    if sl in ("electrum", "electrum:change"):
        from . import wallets
        return wallets.electrum_spec(for_change=sl.endswith(":change"))
    if sl == "bitimage" or sl.startswith("bitimage:"):
        from . import wallets
        return wallets.bitimage_spec()
    if sl == "lcg" or sl.startswith("lcg:"):
        variant, endian = _parse_lcg(sl)
        vs = [variant] if variant else None
        return TransformSpec("lcg", numeric.make_lcg(vs, endian == "be"), None)
    if sl == "xorshift" or sl.startswith("xorshift:"):
        variant = _parse_xorshift(sl)
        return TransformSpec("xorshift", numeric.make_xorshift(variant), None)
    if sl == "sha256_chain" or sl.startswith("sha256_chain:"):
        variant, depth = _parse_chain(sl)
        name = f"sha256_chain:{variant}" if variant else "sha256_chain"
        return TransformSpec(
            name,
            numeric.make_sha256_chain(variant, depth),
            strings.make_string_sha256_chain(variant, depth),
        )
    raise ValueError(
        f"Unknown transform: {s}. Valid: direct, sha256, double_sha256, md5, "
        f"milksad, mt64, armory, multibit, electrum[:change], "
        f"lcg[:variant][:endian], xorshift[:variant], sha256_chain[:variant], bitimage"
    )


def _parse_lcg(s: str):
    """lcg | lcg:le | lcg:variant | lcg:variant:endian
    (/root/reference/src/lcg.rs LcgConfig::parse)."""
    parts = s.rstrip(":").split(":")
    if parts == ["lcg"]:
        return None, "be"
    if len(parts) == 2:
        v = parts[1]
        if v in ("be", "big"):
            return None, "be"
        if v in ("le", "little"):
            return None, "le"
        if v in lcg_core.VARIANTS_BY_NAME:
            return lcg_core.VARIANTS_BY_NAME[v], "be"
        raise ValueError(
            f"Invalid LCG variant or endian: '{v}'. Valid variants: glibc, "
            f"minstd, msvc, borland. Valid endian: be, le")
    if len(parts) == 3:
        v, e = parts[1], parts[2]
        if v not in lcg_core.VARIANTS_BY_NAME:
            raise ValueError(f"Invalid LCG variant: '{v}'. Valid: glibc, minstd, msvc, borland")
        if e in ("be", "big"):
            endian = "be"
        elif e in ("le", "little"):
            endian = "le"
        else:
            raise ValueError(f"Invalid endian: '{e}'. Valid: be, le")
        return lcg_core.VARIANTS_BY_NAME[v], endian
    raise ValueError("Invalid LCG format. Use: lcg, lcg:variant, lcg:endian, lcg:variant:endian")


def _parse_xorshift(s: str):
    parts = s.rstrip(":").split(":")
    if parts == ["xorshift"]:
        return None
    if len(parts) == 2 and parts[1] in _XS_ALIASES:
        return _XS_ALIASES[parts[1]]
    raise ValueError(
        f"Invalid xorshift variant: '{':'.join(parts[1:])}'. "
        f"Valid: 64, 128, 128plus, xoroshiro")


def _parse_chain(s: str):
    parts = s.rstrip(":").split(":")
    if parts == ["sha256_chain"]:
        return None, chain_core.DEFAULT_CHAIN_DEPTH
    if len(parts) == 2:
        v = parts[1]
        if v in _CHAIN_NAMES:
            return _CHAIN_NAMES[v], chain_core.DEFAULT_CHAIN_DEPTH
        raise ValueError(f"Invalid SHA256 chain variant: '{v}'. Valid: iterated, indexed, counter")
    if len(parts) == 3 and parts[1] == "indexed":
        if parts[2] in ("be", "big"):
            return "indexed:be", chain_core.DEFAULT_CHAIN_DEPTH
        if parts[2] in ("le", "little"):
            return "indexed:le", chain_core.DEFAULT_CHAIN_DEPTH
        raise ValueError(f"Invalid endian: '{parts[2]}'. Valid: be, le")
    raise ValueError(
        f"Invalid SHA256 chain format: '{s}'. Valid: sha256_chain, "
        f"sha256_chain:iterated, sha256_chain:indexed[:be|:le], sha256_chain:counter")
