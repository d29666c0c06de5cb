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


@dataclass
class RangeSource:
    start: int
    end: int

    def process(self, numeric_driver: ForwardDriver,
                string_driver: Optional[StringDriver] = None) -> ProcessStats:
        return numeric_driver.run_range(self.start, self.end)


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
        stats = numeric_driver.run_range(self.start, self.end)
        if self.microseconds:
            stats.merge(numeric_driver.run_range(self.start * 1000,
                                                 (self.end + 1) * 1000 - 1))
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
