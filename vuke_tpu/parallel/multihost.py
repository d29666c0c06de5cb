"""Multi-host pod distribution: static seed-space partitioning + early stop.

The reference is single-process (SURVEY.md §2.7 — its only "distribution"
is S3 as a shared sink); this module is the new first-class component the
TPU port needs: `jax.distributed` initialization, deterministic per-host
ownership of contiguous seed ranges (host h of H owns
[lo + h*S/H, lo + (h+1)*S/H)), ICI-level sharding *within* a host via the
"seeds" mesh axis, and a host-level early-stop protocol for brute-force
sweeps (found flags reduced across hosts between super-rounds over DCN).

Deterministic ownership means no work-stealing/rebalancing is needed and a
killed job can resume from per-range checkpoints
(:mod:`vuke_tpu.parallel.checkpoint`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Initialize jax.distributed from standard env vars if present.

    Returns (process_index, process_count).  Single-process when no
    coordinator is configured.
    """
    import jax
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return jax.process_index(), jax.process_count()


@dataclass(frozen=True)
class RangeShard:
    """The contiguous sub-range a host owns."""
    start: int
    end: int  # inclusive

    @property
    def count(self) -> int:
        return self.end - self.start + 1


def partition_range(start: int, end: int, n_hosts: int,
                    host_id: Optional[int] = None) -> List[RangeShard] | RangeShard:
    """Split the inclusive range [start, end] into n_hosts contiguous shards.

    Remainder seeds go to the leading shards, so shard sizes differ by at
    most 1 and ownership is a pure function of (range, n_hosts, host_id).
    """
    total = end - start + 1
    base = total // n_hosts
    rem = total % n_hosts
    shards = []
    pos = start
    for h in range(n_hosts):
        n = base + (1 if h < rem else 0)
        shards.append(RangeShard(pos, pos + n - 1) if n > 0
                      else RangeShard(pos, pos - 1))
        pos += n
    if host_id is not None:
        return shards[host_id]
    return shards


def all_hosts_any(local_flag: bool) -> bool:
    """OR-reduce a host-local boolean across all hosts (DCN).

    Single-process: identity.  Multi-process: psum over a host-replicated
    scalar via multihost_utils.
    """
    import jax
    if jax.process_count() == 1:
        return local_flag
    import numpy as np
    from jax.experimental import multihost_utils
    v = np.array([1.0 if local_flag else 0.0], dtype=np.float32)
    total = multihost_utils.process_allgather(v)
    return bool(total.sum() > 0)


def gather_results(local_items: list) -> list:
    """Gather per-host python objects (hit lists) to every host."""
    import jax
    if jax.process_count() == 1:
        return list(local_items)
    from jax.experimental import multihost_utils
    import json
    import numpy as np
    payload = json.dumps(local_items).encode()
    # fixed-size frame: length-prefixed, padded
    maxlen = 1 << 16
    buf = np.zeros(maxlen, dtype=np.uint8)
    data = len(payload).to_bytes(4, "big") + payload
    assert len(data) <= maxlen, "hit payload too large for gather frame"
    buf[:len(data)] = np.frombuffer(data, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in gathered.reshape(jax.process_count(), maxlen):
        n = int.from_bytes(bytes(row[:4]), "big")
        out.extend(json.loads(bytes(row[4:4 + n]).decode()))
    return out


class DistributedSweep:
    """Early-stop brute-force sweep across hosts.

    Every host sweeps its own shard in super-rounds of ``round_batches``
    superbatches; between rounds the found-flags are OR-reduced across hosts
    and everyone stops as soon as any host finds a seed — the distributed
    analogue of the reference's AtomicBool early-exit
    (/root/reference/src/analyze/milksad.rs:83-124).
    """

    def __init__(self, program, round_batches: int = 8):
        self.program = program
        self.round_batches = round_batches

    def run(self, start: int, end: int, target_words=None, progress=None,
            decode=None):
        from ..analyze import sweeps
        import jax
        host = jax.process_index()
        n_hosts = jax.process_count()
        shard = partition_range(start, end, n_hosts, host)
        pos = shard.start
        batch = self.program.batch
        searched = 0
        local = None
        while pos <= shard.end:
            round_end = min(shard.end, pos + batch * self.round_batches - 1)
            r = sweeps.sweep(self.program, pos, round_end, target_words=target_words,
                             progress=progress, decode=decode)
            searched += r.searched
            if r.found:
                local = r.seed
            pos = round_end + 1
            if all_hosts_any(local is not None):
                break
        found = gather_results([local] if local is not None else [])
        found = [f for f in found if f is not None]
        return (min(found) if found else None), searched
