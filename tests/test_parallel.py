"""Distribution-layer tests: partitioning math, checkpoint manifests.

Device-level sharding is covered by __graft_entry__.dryrun_multichip (driver)
and tests/test_sharding.py (subprocess CPU mesh); these tests cover the
host-side logic directly.
"""

import pytest

from vuke_tpu.parallel.checkpoint import SweepCheckpoint
from vuke_tpu.parallel.multihost import RangeShard, partition_range


def test_partition_range_exact():
    shards = partition_range(0, 99, 4)
    assert [s.count for s in shards] == [25, 25, 25, 25]
    assert shards[0].start == 0 and shards[3].end == 99
    # contiguity
    for a, b in zip(shards, shards[1:]):
        assert b.start == a.end + 1


def test_partition_range_remainder():
    shards = partition_range(10, 20, 3)  # 11 seeds
    assert [s.count for s in shards] == [4, 4, 3]
    assert shards[0].start == 10 and shards[2].end == 20


def test_partition_range_host_view():
    s = partition_range(0, 2**32 - 1, 8, host_id=3)
    assert isinstance(s, RangeShard)
    assert s.count == 2**32 // 8


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ckpt.json")
    c = SweepCheckpoint.load(p, job_id="scan-1")
    c.mark_completed(0, 99)
    c.mark_completed(100, 199)   # merges with previous
    c.mark_completed(300, 399)
    c.save()

    c2 = SweepCheckpoint.load(p, job_id="scan-1")
    assert c2.completed == [(0, 199), (300, 399)]
    assert c2.pending_ranges(0, 499) == [(200, 299), (400, 499)]
    assert c2.pending_ranges(0, 150) == []
    assert c2.pending_ranges(250, 260) == [(250, 260)]

    # different job id -> fresh manifest
    c3 = SweepCheckpoint.load(p, job_id="scan-2")
    assert c3.completed == []


def test_checkpoint_found_seed(tmp_path):
    p = str(tmp_path / "ckpt.json")
    c = SweepCheckpoint.load(p, job_id="j")
    c.found_seed = 42
    c.save()
    assert SweepCheckpoint.load(p, job_id="j").found_seed == 42


def test_distributed_sweep_single_host():
    """Single-process DistributedSweep degenerates to a plain sharded sweep
    with the early-stop round protocol."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import oracles
    import numpy as np
    from vuke_tpu.analyze import sweeps
    from vuke_tpu.cores.common import key_bytes_to_words
    from vuke_tpu.cores.mt19937 import milksad_key_words
    from vuke_tpu.parallel.multihost import DistributedSweep

    seed = 5000
    key = oracles.MT19937(seed).fill_bytes(32)
    prog = sweeps.SweepProgram(lambda hi, lo, n: milksad_key_words(lo, n),
                               "exact", batch=1 << 12)
    ds = DistributedSweep(prog, round_batches=2)
    import jax.numpy as jnp
    found, searched = ds.run(0, 8191, target_words=jnp.asarray(key_bytes_to_words(key)))
    assert found == seed
    assert searched >= seed - 8192


def test_dispatch_sweep_checkpoint_resume(tmp_path):
    """analyze --checkpoint: a sweep interrupted after some chunks resumes
    from the manifest and still finds the planted seed (r1 VERDICT: the
    checkpoint library had no call sites)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import oracles
    import numpy as np
    from vuke_tpu.analyze import sweeps
    from vuke_tpu.analyze.analyzers import AnalysisConfig
    from vuke_tpu.cores.common import key_bytes_to_words
    from vuke_tpu.cores.mt19937 import milksad_key_words

    seed = 7000
    key = oracles.MT19937(seed).fill_bytes(32)
    tw = np.asarray(key_bytes_to_words(key))

    def keystream(hi, lo, n_keys):
        return milksad_key_words(lo, n_keys=n_keys)

    path = str(tmp_path / "sweep.json")
    config = AnalysisConfig(batch=512, checkpoint_path=path)
    prog = sweeps.SweepProgram(keystream, "exact", batch=512)

    # simulate prior partial progress: first 2048 seeds already done
    from vuke_tpu.parallel.checkpoint import SweepCheckpoint
    c = SweepCheckpoint.load(path, "job-x")
    c.mark_completed(0, 2047)
    c.save()

    r = sweeps.dispatch_sweep(prog, 0, 7999, target_words=tw,
                              config=config, job="job-x")
    assert r.found and r.seed == seed
    assert r.searched <= 8000 - 2048  # completed prefix was skipped

    # a re-run with the same manifest short-circuits to the recorded seed
    r2 = sweeps.dispatch_sweep(prog, 0, 7999, target_words=tw,
                               config=config, job="job-x")
    assert r2.found and r2.seed == seed and r2.searched == 0
