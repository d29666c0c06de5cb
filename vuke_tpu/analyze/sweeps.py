"""Device-side brute-force sweeps for the reverse analyzers.

TPU-first replacement for the reference's Rayon chunk loops and wgpu
pipelines (/root/reference/src/analyze/milksad.rs:69-365, gpu/mt19937.rs):
a sweep is a jitted superbatch program ``seed lattice -> keystream ->
(exact | masked | cascade) compare -> (hit?, first index)``; the host loop
provides early exit at superbatch granularity — the SPMD analogue of the
reference's AtomicBool (SURVEY.md §2.7).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_SWEEP_BATCH = 1 << 20


def _seed_lattice(start_hi, start_lo, offs):
    lo = start_lo + offs
    carry = (lo < offs).astype(jnp.uint32)
    hi = start_hi + carry
    return hi, lo


def _masked_low64(kw):
    """(…, 8) BE key words -> low-8-bytes-as-u64 (hi, lo) uint32 pair."""
    return kw[..., 6], kw[..., 7]


def _mask_compare(kw, bits: int, target: int):
    """(full_key_low64 & (2^bits-1)) | 2^(bits-1) == target, all static."""
    hi, lo = _masked_low64(kw)
    mask = (1 << bits) - 1 if bits < 64 else (1 << 64) - 1
    high_bit = 1 << (bits - 1)
    want = np.uint64(target)
    mhi = np.uint32(mask >> 32)
    mlo = np.uint32(mask & 0xFFFFFFFF)
    hhi = np.uint32(high_bit >> 32)
    hlo = np.uint32(high_bit & 0xFFFFFFFF)
    got_hi = (hi & mhi) | hhi
    got_lo = (lo & mlo) | hlo
    thi = np.uint32(int(want) >> 32)
    tlo = np.uint32(int(want) & 0xFFFFFFFF)
    return (got_hi == thi) & (got_lo == tlo)


def _xla_fallback_step(step_fn, exc):
    """Re-jit a sweep step with Pallas keystreams disabled.

    The accelerator-error fallback (reference: main.rs:1577-1594 degrades
    GPU analyzers to CPU): keystream fns choose the Pallas kernel at trace
    time via use_pallas_default(), so disabling it and re-tracing yields
    the XLA-staged program."""
    import os
    from ..telemetry import log
    log().warning(
        "Pallas sweep program failed (%s: %s); falling back to the "
        "XLA-staged keystream", type(exc).__name__, exc)
    os.environ["VUKE_TPU_PALLAS"] = "0"
    return jax.jit(step_fn)


@dataclass
class SweepResult:
    found: bool
    seed: Optional[int]
    searched: int
    elapsed: float
    cascade_hits: int = 0


class SweepProgram:
    """Compiled sweep step for one keystream function + compare config.

    keystream: (hi, lo) -> (N, n_keys, 8) BE key words
    compare: "exact" (vs the 8-word target argument),
             "mask" (single (bits, target)),
             "cascade" (tuple of (bits, target) — key j vs target j)
    """

    def __init__(self, keystream: Callable, compare: str,
                 mask: Optional[Tuple[int, int]] = None,
                 cascade: Optional[Sequence[Tuple[int, int]]] = None,
                 batch: int = DEFAULT_SWEEP_BATCH, track_first_filter: bool = False):
        self.batch = batch
        self.compare = compare
        n_keys = len(cascade) if compare == "cascade" else 1
        self._offs = jnp.asarray(np.arange(batch, dtype=np.uint32))
        cascade = tuple(cascade) if cascade else None
        track = track_first_filter and compare == "cascade"

        def step(start_hi, start_lo, limit, offs, target_words):
            hi, lo = _seed_lattice(start_hi, start_lo, offs)
            kw = keystream(hi, lo, n_keys) if compare == "cascade" else keystream(hi, lo, 1)
            in_range = offs < limit
            if compare == "exact":
                k = kw[:, 0, :]
                ok = jnp.all(k == target_words[None, :], axis=-1)
            elif compare == "mask":
                bits, target = mask
                ok = _mask_compare(kw[:, 0, :], bits, target)
            else:
                ok = jnp.ones(kw.shape[0], dtype=bool)
                for j, (bits, target) in enumerate(cascade):
                    ok = ok & _mask_compare(kw[:, j, :], bits, target)
            ok = ok & in_range
            out = {"found": ok.any(), "idx": jnp.argmax(ok)}
            if track:
                bits0, target0 = cascade[0]
                ff = _mask_compare(kw[:, 0, :], bits0, target0) & in_range
                out["first_filter_hits"] = ff.sum()
            return out

        self._step_fn = step
        self._step = jax.jit(step)

    def run_batch(self, start: int, limit: Optional[int] = None,
                  target_words=None):
        if limit is None:
            limit = self.batch
        if target_words is None:
            target_words = jnp.zeros(8, dtype=jnp.uint32)
        args = (jnp.uint32(start >> 32), jnp.uint32(start & 0xFFFFFFFF),
                jnp.uint32(limit), self._offs, target_words)
        try:
            return self._step(*args)
        except Exception as e:  # Pallas/Mosaic failure -> XLA keystream
            self._step = _xla_fallback_step(self._step_fn, e)
            return self._step(*args)


class ChainSweepProgram:
    """Sweep for SHA256-chain analysis: each u32 seed yields ``depth`` keys
    per variant; exact/mask modes check every chain position, cascade mode
    maps chain position i -> cascade target i
    (/root/reference/src/analyze/sha256_chain.rs:48-157, 288-360)."""

    def __init__(self, variant: str, depth: int, compare: str,
                 mask: Optional[Tuple[int, int]] = None,
                 cascade: Optional[Sequence[Tuple[int, int]]] = None,
                 batch: int = DEFAULT_SWEEP_BATCH // 4):
        from ..cores.sha256_chain import chain_words
        self.batch = batch
        self.depth = depth
        self._offs = jnp.asarray(np.arange(batch, dtype=np.uint32))
        cascade = tuple(cascade) if cascade else None

        def step(start_hi, start_lo, limit, offs, target_words):
            lo = start_lo + offs  # u32 seed space only
            kw = chain_words(lo, variant, depth)          # (N, depth, 8)
            in_range = offs < limit
            if compare == "exact":
                okm = jnp.all(kw == target_words[None, None, :], axis=-1)  # (N, depth)
            elif compare == "mask":
                bits, target = mask
                okm = _mask_compare(kw, bits, target)
            else:
                # cascade: chain position i must match target i (the chain is
                # generated with depth == len(cascade) — sha256_chain.rs:331)
                ok = jnp.ones(kw.shape[0], dtype=bool)
                for j, (bits, target) in enumerate(cascade):
                    ok = ok & _mask_compare(kw[:, j, :], bits, target)
                okm = ok[:, None]
            okm = okm & in_range[:, None]
            flat = okm.reshape(-1)
            return {"found": flat.any(), "idx": jnp.argmax(flat)}

        self._step_fn = step
        self._step = jax.jit(step)
        self._positions = 1  # decoded by caller via depth

    def run_batch(self, start: int, limit: Optional[int] = None, target_words=None):
        if limit is None:
            limit = self.batch
        if target_words is None:
            target_words = jnp.zeros(8, dtype=jnp.uint32)
        args = (jnp.uint32(start >> 32), jnp.uint32(start & 0xFFFFFFFF),
                jnp.uint32(limit), self._offs, target_words)
        try:
            return self._step(*args)
        except Exception as e:  # Pallas/Mosaic failure -> XLA keystream
            self._step = _xla_fallback_step(self._step_fn, e)
            return self._step(*args)


def dispatch_sweep(program, space_start: int, space_end: int, *,
                   target_words=None, progress=None,
                   max_seeds: Optional[int] = None, decode=None,
                   config=None, job: str = "") -> SweepResult:
    """Sweep with optional durable checkpointing / multi-host distribution.

    - ``config.checkpoint_path`` set -> resume from / record to an atomic
      manifest keyed by ``job`` (parallel/checkpoint.py), so a preempted
      brute-force continues instead of restarting from zero.
    - ``jax.process_count() > 1`` -> static per-host shard with DCN
      early-stop (parallel/multihost.DistributedSweep).
    - otherwise the plain pipelined early-exit sweep.
    """
    if max_seeds is not None:
        space_end = min(space_end, space_start + max_seeds - 1)
    ckpt_path = getattr(config, "checkpoint_path", None) if config is not None else None
    if ckpt_path:
        from ..parallel.checkpoint import SweepCheckpoint, checkpointed_sweep
        ckpt = SweepCheckpoint.load(ckpt_path, job or "sweep")
        return checkpointed_sweep(program, space_start, space_end, ckpt,
                                  target_words=target_words, progress=progress,
                                  decode=decode)
    import jax
    if jax.process_count() > 1:
        from ..parallel.multihost import DistributedSweep
        t0 = time.time()
        seed, searched = DistributedSweep(program).run(
            space_start, space_end, target_words=target_words,
            progress=progress, decode=decode)
        return SweepResult(seed is not None, seed, searched, time.time() - t0)
    return sweep(program, space_start, space_end, target_words=target_words,
                 progress=progress, decode=decode)


def sweep(program, space_start: int, space_end: int,
          target_words=None, progress=None,
          max_seeds: Optional[int] = None, decode=None) -> SweepResult:
    """Host loop: pipelined superbatches with early exit.

    Searches [space_start, space_end] inclusive; stops at the first found
    superbatch and returns the first matching seed.  ``decode(bstart, idx)``
    maps a flat hit index back to a seed (default: bstart + idx).
    """
    t0 = time.time()
    searched = 0
    cascade_hits = 0
    pos = space_start
    pending = []  # (batch_start, n, result)
    end = space_end
    if max_seeds is not None:
        end = min(end, space_start + max_seeds - 1)
    if decode is None:
        decode = lambda bstart, idx: bstart + idx

    def consume(bstart, n, res):
        nonlocal searched, cascade_hits
        searched += n
        cascade_hits += int(res.get("first_filter_hits", 0))
        if bool(res["found"]):
            return decode(bstart, int(res["idx"]))
        if progress is not None:
            progress.advance(n)
        return None

    while pos <= end or pending:
        if pos <= end:
            n = min(program.batch, end - pos + 1)
            pending.append((pos, n, program.run_batch(pos, n, target_words)))
            pos += program.batch
        while len(pending) > 2 or (pos > end and pending):
            bstart, n, res = pending.pop(0)
            seed = consume(bstart, n, res)
            if seed is not None:
                return SweepResult(True, seed, searched, time.time() - t0,
                                   cascade_hits)
    return SweepResult(False, None, searched, time.time() - t0, cascade_hits)
