"""Puzzle-data provider system (reference: boha crate integration).

Grammar (/root/reference/src/provider.rs:61-150):
  ``provider:collection[:filter]``  -> address list (filters: all, unsolved,
                                       solved, with-pubkey)
  ``provider:collection:id[:neighbors]`` -> single puzzle context (auto mask
                                       bits + expected address + cascade)

The reference's only provider is ``boha``.  Here puzzle data is loaded from
a local JSON dataset (``VUKE_TPU_PUZZLE_DATA`` env var or
``vuke_tpu/data/puzzles.json``) with the same collections; the provider
machinery (resolve / build_cascade / verify_key) is provider-agnostic.

Dataset JSON shape::

    {"b1000": [{"id": 66, "bits": 66, "address": "13zb1...", "solved": false,
                "pubkey": null, "key_hex": null}, ...], ...}
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data", "puzzles.json")

FILTERS = ("all", "unsolved", "solved", "with-pubkey")


@dataclass
class Puzzle:
    id: int
    bits: int
    address: str
    solved: bool = False
    pubkey: Optional[str] = None
    key_hex: Optional[str] = None


@dataclass
class PuzzleContext:
    """Single-puzzle analysis context (provider.rs:23-34)."""
    puzzle: Puzzle
    collection: str
    mask_bits: Optional[int] = None
    cascade_targets: List[tuple] = field(default_factory=list)  # (bits, target)


@dataclass
class ProviderResult:
    addresses: List[str]
    description: str
    context: Optional[PuzzleContext] = None


class _Dataset:
    def __init__(self):
        self._collections = None

    def load(self):
        if self._collections is not None:
            return self._collections
        path = os.environ.get("VUKE_TPU_PUZZLE_DATA", _DATA_PATH)
        if not os.path.exists(path):
            self._collections = {}
            return self._collections
        with open(path) as f:
            raw = json.load(f)
        self._collections = {
            name: [Puzzle(**p) for p in ps] for name, ps in raw.items()
        }
        return self._collections


_DATASET = _Dataset()


def is_provider(s: str) -> bool:
    return s.startswith("boha:")


def _collection(name: str) -> List[Puzzle]:
    cols = _DATASET.load()
    if name not in cols:
        avail = ", ".join(sorted(cols)) or "(no dataset loaded — set VUKE_TPU_PUZZLE_DATA)"
        raise ValueError(f"Unknown collection '{name}'. Available: {avail}")
    return cols[name]


def resolve(s: str) -> Optional[ProviderResult]:
    """Resolve a provider reference to addresses, or None if ``s`` is not a
    provider reference (then it is treated as a file path)."""
    if not is_provider(s):
        return None
    parts = s.split(":")
    if len(parts) < 2 or parts[0] != "boha":
        raise ValueError(f"Invalid provider reference: {s}")
    coll_name = parts[1]
    puzzles = _collection(coll_name)
    selector = parts[2] if len(parts) > 2 else "all"

    if selector in FILTERS:
        if selector == "all":
            sel = puzzles
        elif selector == "unsolved":
            sel = [p for p in puzzles if not p.solved]
        elif selector == "solved":
            sel = [p for p in puzzles if p.solved]
        else:  # with-pubkey
            sel = [p for p in puzzles if p.pubkey]
        return ProviderResult(
            addresses=[p.address for p in sel],
            description=f"boha:{coll_name}:{selector} ({len(sel)} puzzles)",
        )

    # numeric id -> single puzzle context
    try:
        pid = int(selector)
    except ValueError:
        raise ValueError(
            f"Invalid filter or id '{selector}'. Filters: {', '.join(FILTERS)}")
    pz = next((p for p in puzzles if p.id == pid), None)
    if pz is None:
        raise ValueError(f"No puzzle id {pid} in collection {coll_name}")
    neighbors = int(parts[3]) if len(parts) > 3 else 0
    ctx = PuzzleContext(puzzle=pz, collection=coll_name, mask_bits=pz.bits)
    if neighbors:
        ctx.cascade_targets = build_cascade(coll_name, pid, neighbors)
    return ProviderResult(addresses=[pz.address],
                          description=f"boha:{coll_name}:{pid}", context=ctx)


def build_cascade(coll_name: str, pid: int, neighbors: int) -> List[tuple]:
    """Cascade targets from solved neighbor puzzles: (bits, masked_key_u64)
    sorted ascending by bits (provider.rs:104-127).

    Mask formula matches the analyzers: (key & (2^bits - 1)) | 2^(bits-1)
    over the low 8 key bytes (/root/reference/src/analyze/milksad.rs:146-189).
    """
    puzzles = _collection(coll_name)
    solved = [p for p in puzzles if p.solved and p.key_hex and p.id != pid]
    solved.sort(key=lambda p: abs(p.id - pid))
    out = []
    for p in solved[:neighbors]:
        key = int(p.key_hex, 16)
        low64 = key & 0xFFFFFFFFFFFFFFFF
        bits = p.bits
        mask = (1 << bits) - 1 if bits < 64 else 0xFFFFFFFFFFFFFFFF
        out.append((bits, (low64 & mask) | (1 << (bits - 1))))
    out.sort(key=lambda t: t[0])
    # duplicate bit-counts rejected (key_parser.rs:124-151 semantics)
    seen = set()
    dedup = []
    for b, t in out:
        if b not in seen:
            seen.add(b)
            dedup.append((b, t))
    return dedup


def verify_key(key: bytes, coll_name: str):
    """Check a key's three addresses against a whole collection
    (provider.rs:129-150).  Returns (puzzle, address_type) or None."""
    from .derive import KeyDeriver
    puzzles = _collection(coll_name)
    derived = KeyDeriver().derive(key)
    by_addr = {p.address: p for p in puzzles}
    for kind, addr in (("p2pkh_compressed", derived.p2pkh_compressed),
                       ("p2pkh_uncompressed", derived.p2pkh_uncompressed),
                       ("p2wpkh", derived.p2wpkh)):
        if addr in by_addr:
            return by_addr[addr], kind
    return None
