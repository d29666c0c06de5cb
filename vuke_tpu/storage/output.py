"""StorageOutput: Output-trait adapter over the Parquet backend.

Mirrors /root/reference/src/output/storage.rs:20-155 — buffers records,
writes through the backend, ``finish()`` closes chunks and returns the
written paths + record count.  Also exposes ``key_fast`` so the generate hot
path can append records without a host re-derive (full string columns are
derived lazily only here, off the device loop).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from .records import ResultRecord

FLUSH_EVERY = 4096


@dataclass
class StorageSummary:
    paths: List[str]
    records_written: int


class StorageOutput:
    def __init__(self, backend):
        self.backend = backend
        self._buffer: List[ResultRecord] = []
        self._written = 0

    def _push(self, record: ResultRecord):
        self._buffer.append(record)
        self._written += 1
        if len(self._buffer) >= FLUSH_EVERY:
            self.backend.write_batch(self._buffer)
            self._buffer = []

    def key(self, source: str, transform: str, derived):
        self._push(ResultRecord.from_derived(source, transform, derived))

    def key_fast(self, source: str, transform: str, key: bytes,
                 p2pkh_compressed: str, deriver=None):
        assert deriver is not None
        self._push(ResultRecord.from_derived(source, transform,
                                             deriver.derive(key)))

    def hit(self, source: str, transform: str, derived, match_info):
        self._push(ResultRecord.from_derived(source, transform, derived,
                                             matched_target=match_info.address))

    def flush(self):
        if self._buffer:
            self.backend.write_batch(self._buffer)
            self._buffer = []
        self.backend.flush()

    def finish(self) -> StorageSummary:
        self.flush()
        paths = self.backend.close()
        return StorageSummary(paths=paths, records_written=self._written)
