"""Input sources: range / wordlist / timestamps / stdin / files.

Numeric sources (range, timestamps) become device-side integer lattices
driven by :class:`vuke_tpu.pipeline.ForwardDriver`; string/blob sources
stream host batches through :class:`StringDriver`.

Semantics mirror /root/reference/src/source/: range.rs (inclusive u64
range), timestamps.rs (date range -> unix seconds; optional x1000 "ms"
expansion ``ts*1000 + ms``), wordlist.rs (whole-file, trimmed, empties
skipped), stdin.rs (streaming 1000-line batches), files.rs (file bytes as
blobs, recursive dir walk skipping symlinks).
"""

from __future__ import annotations

import datetime as _dt
import os
import sys
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

from .pipeline import ForwardDriver, ProcessStats, StringDriver

STRING_BATCH = 1000


def _string_only_specs(string_driver: Optional[StringDriver]):
    """Transforms reachable only through the string path (electrum,
    multibit, ...): numeric sources feed them the *decimal string* of each
    seed, mirroring Input::from_u64's string_val population
    (/root/reference/src/transform/input.rs:22-30) — e.g. the
    electrum-over-timestamps attack, transform/electrum.rs:44-66."""
    if string_driver is None:
        return []
    return [s for s in string_driver.specs
            if s.numeric is None and s.string is not None
            and getattr(s.string, "blob_fn", None) is None]


def _run_string_specs_over_range(string_driver, start: int, end: int,
                                 counted: bool) -> ProcessStats:
    stats = ProcessStats()
    specs = _string_only_specs(string_driver)
    if not specs:
        return stats
    prog = getattr(string_driver, "progress", None)
    if counted and prog is not None:
        string_driver.progress = None   # numeric driver already advanced
    try:
        pos = start
        while pos <= end:
            hi = min(pos + STRING_BATCH - 1, end)
            st = string_driver.process_batch(
                [str(v) for v in range(pos, hi + 1)], specs=specs)
            if counted:   # numeric driver already counted these inputs
                st.inputs_processed = 0
            stats.merge(st)
            pos = hi + 1
    finally:
        string_driver.progress = prog
    return stats


@dataclass
class RangeSource:
    start: int
    end: int

    def process(self, numeric_driver: ForwardDriver,
                string_driver: Optional[StringDriver] = None) -> ProcessStats:
        stats = numeric_driver.run_range(self.start, self.end)
        stats.merge(_run_string_specs_over_range(
            string_driver, self.start, self.end,
            counted=bool(getattr(numeric_driver, "specs", None))))
        return stats


@dataclass
class TimestampSource:
    """Date range -> unix-second lattice; optional millisecond expansion.

    The reference processes each base timestamp AND, with --microseconds,
    every ``ts*1000 + ms`` (timestamps.rs:62-75) — i.e. two contiguous
    lattices: [start, end] and [start*1000, (end+1)*1000 - 1].
    """
    start: int
    end: int
    microseconds: bool = False

    @classmethod
    def from_dates(cls, start_date: str, end_date: str, microseconds: bool = False):
        start = int(_dt.datetime.strptime(start_date, "%Y-%m-%d")
                    .replace(tzinfo=_dt.timezone.utc).timestamp())
        end_day = _dt.datetime.strptime(end_date, "%Y-%m-%d").replace(
            hour=23, minute=59, second=59, tzinfo=_dt.timezone.utc)
        return cls(start, int(end_day.timestamp()), microseconds)

    def process(self, numeric_driver: ForwardDriver,
                string_driver: Optional[StringDriver] = None) -> ProcessStats:
        counted = bool(getattr(numeric_driver, "specs", None))
        stats = numeric_driver.run_range(self.start, self.end)
        stats.merge(_run_string_specs_over_range(
            string_driver, self.start, self.end, counted))
        if self.microseconds:
            stats.merge(numeric_driver.run_range(self.start * 1000,
                                                 (self.end + 1) * 1000 - 1))
            stats.merge(_run_string_specs_over_range(
                string_driver, self.start * 1000, (self.end + 1) * 1000 - 1,
                counted))
        return stats


@dataclass
class WordlistSource:
    path: str

    def words(self) -> List[str]:
        with open(self.path, encoding="utf-8", errors="replace") as f:
            return [w for w in (line.strip() for line in f) if w]

    def process(self, numeric_driver, string_driver: StringDriver) -> ProcessStats:
        stats = ProcessStats()
        words = self.words()
        for i in range(0, len(words), STRING_BATCH):
            stats.merge(string_driver.process_batch(words[i:i + STRING_BATCH]))
        return stats


@dataclass
class StdinSource:
    def process(self, numeric_driver, string_driver: StringDriver) -> ProcessStats:
        stats = ProcessStats()
        batch: List[str] = []
        for line in sys.stdin:
            s = line.strip()
            if not s:
                continue
            batch.append(s)
            if len(batch) >= STRING_BATCH:
                stats.merge(string_driver.process_batch(batch))
                batch = []
        if batch:
            stats.merge(string_driver.process_batch(batch))
        return stats


@dataclass
class FilesSource:
    """Whole-file bytes as blob inputs (for bitimage), path as label."""
    path: str
    recursive: bool = False

    def entries(self) -> List[str]:
        if os.path.isfile(self.path):
            return [self.path]
        out: List[str] = []
        if self.recursive:
            for root, dirs, files in os.walk(self.path, followlinks=False):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    if not os.path.islink(p):
                        out.append(p)
        else:
            for f in sorted(os.listdir(self.path)):
                p = os.path.join(self.path, f)
                if os.path.isfile(p) and not os.path.islink(p):
                    out.append(p)
        return out

    def blobs(self) -> Iterator[Tuple[bytes, str]]:
        for p in self.entries():
            try:
                with open(p, "rb") as f:
                    yield f.read(), p
            except OSError as e:
                print(f"Warning: failed to read {p}: {e}", file=sys.stderr)

    def process(self, numeric_driver, string_driver: StringDriver) -> ProcessStats:
        stats = ProcessStats()
        batch: List[str] = []
        # blob-capable transforms handle bytes through their blob path; plain
        # string transforms see the file path label only if decodable
        for data, label in self.blobs():
            stats.inputs_processed += 1
            if hasattr(string_driver, "process_blob"):
                stats.merge(string_driver.process_blob(data, label))
        return stats
