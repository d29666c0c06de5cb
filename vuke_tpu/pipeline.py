"""The fused forward-search engine: seed lattice in, hits out.

Architecture (SURVEY.md §7): per-transform *keygen* programs (cheap to
compile) feed one shared *derive+match* program — ``keys -> normalize ->
fixed-base scalar-mul -> hash160 -> sorted-set match -> compacted hit
indices`` — compiled once per (batch, target-set) and reused by every
transform and every slot.  This replaces the reference's Rayon chunk loop +
per-candidate address formatting (/root/reference/src/source/range.rs:36-70,
derive.rs:121-147): strings exist only on the host, and only for hits.

Dispatch is pipelined: superbatch ``i+1`` is enqueued before the results of
``i`` are read back (JAX async dispatch provides the double-buffering the
reference's GPU path hand-rolls, /root/reference/src/gpu/mt19937.rs:316-386).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .cores.common import key_words_to_bytes
from .derive import KeyDeriver
from .ecc.pubkey import derive_hash160s, hash160_fragment, normalize_scalar
from .matcher import DeviceTargetSet, Matcher
from .transforms.registry import TransformSpec

DEFAULT_BATCH = 1 << 16
MAX_HITS_PER_BATCH = 256  # legacy constant (native path hit_idx buffer)


def _pack_mask(m):
    """(N,) bool -> (N/32,) uint32, bit j of word w = lane 32w+j.

    ``jnp.nonzero``'s scatter-based compaction measured ~30 ms per 2^19
    batch on the v5e (gather/scatter runs on the scalar unit); packing is
    pure VPU work and the host unpacks only on the rare hit batch."""
    n = m.shape[0]
    assert n % 32 == 0
    bits = m.reshape(n // 32, 32).astype(jnp.uint32)
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    return (bits << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)


def _unpack_mask(packed: np.ndarray, n: int) -> np.ndarray:
    """Host-side inverse of _pack_mask -> (n,) bool."""
    b = np.asarray(packed, dtype="<u4").tobytes()
    return np.unpackbits(np.frombuffer(b, dtype=np.uint8),
                         bitorder="little")[:n].astype(bool)


@dataclass
class ProcessStats:
    inputs_processed: int = 0
    keys_generated: int = 0
    matches_found: int = 0

    def merge(self, other: "ProcessStats"):
        self.inputs_processed += other.inputs_processed
        self.keys_generated += other.keys_generated
        self.matches_found += other.matches_found


def _seed_lattice(start_hi, start_lo, offsets):
    lo = start_lo + offsets
    carry = (lo < offsets).astype(jnp.uint32)
    hi = start_hi + carry
    return hi, lo


import functools


@functools.lru_cache(maxsize=None)
def _dm_program(match: bool, collect: bool, inv_chunk: int, win_c: int, win_u: int,
                full_mask: bool = False, use_pallas: bool | None = None):
    """Module-level cache of the compiled derive+match program.

    Target pools enter as *arguments* (padded to power-of-two shapes) so
    different target sets share one compilation — both in-process (this
    cache) and in the backend compile cache (stable HLO).

    ``full_mask`` builds the rare-path variant returning the whole (N,)
    match mask — used only when a batch's hit count overflows
    MAX_HITS_PER_BATCH, so no hit is ever silently dropped.

    ``use_pallas=False`` builds the XLA-staged fallback variant — the
    runtime accelerator-error fallback (reference: main.rs:1577-1594
    degrades GPU analyzers to CPU on pipeline errors)."""
    from .ecc.pubkey import use_pallas_default
    if use_pallas is False and not use_pallas_default():
        # On CPU backends the default already resolves to the XLA path;
        # collapsing to the None key avoids compiling an identical program
        # twice (CPU compiles of this graph take ~80s each).
        return _dm_program(match, collect, inv_chunk, win_c, win_u, full_mask)

    def fn(keys, valid, chi, clo, uhi, ulo):
        n = keys.shape[0]
        pallas_ok = (use_pallas if use_pallas is not None
                     else use_pallas_default())
        if pallas_ok and n % 1024 == 0:
            # tile-layout derive (scan hot path): one entry transpose
            # replaces the per-kernel lane<->tile relayouts and the
            # lane-major chunked inversion of the standard path
            from .ecc.tiled import derive_tiled_from_words
            d = derive_tiled_from_words(keys)
            norm = d["norm"]
            fc, fu = d["frag_c"], d["frag_u"]
            h160c = lambda: d["h160c"]
        else:
            norm = normalize_scalar(keys)
            d = derive_hash160s(norm, inv_chunk=inv_chunk,
                                use_pallas=use_pallas)
            fc = hash160_fragment(d["h160c"])
            fu = hash160_fragment(d["h160u"])
            h160c = lambda: d["h160c"]
        out = {"n_valid": valid.sum()}
        if match:
            m = (DeviceTargetSet._lookup(chi, clo, win_c, *fc)
                 | DeviceTargetSet._lookup(uhi, ulo, win_u, *fu))
            m = m & valid
            if full_mask:
                out["mask"] = m
            else:
                out["count"] = m.sum()
                out["mask_packed"] = _pack_mask(m)
        if collect:
            out["keys"] = norm
            out["h160c"] = h160c()
        return out

    return jax.jit(fn)


def _native_derive_enabled() -> bool:
    """Native C++ derive path on CPU backends (native/vuke_ecc.cpp).

    The XLA:CPU fallback graph compiles ~160s and runs ~3ms/key — three
    orders of magnitude off the reference's libsecp256k1-backed CPU path.
    The native deriver starts instantly and runs ~0.1ms/key/core, so it is
    the default wherever Pallas isn't (--no-tpu scans, CPU-only hosts).
    VUKE_NATIVE_DERIVE=0 opts out (tests pin native == XLA parity)."""
    import os
    if os.environ.get("VUKE_NATIVE_DERIVE", "1") in ("0", "false", "no"):
        return False
    from .ecc.pubkey import use_pallas_default
    if use_pallas_default():
        return False
    from . import native
    return native.has_derive()


class DeriveMatcher:
    """The shared hot program: (N, 8) keys -> hash160s -> match results.

    One compile per (mode, windows); every transform/slot/target-set
    reuses it.  On CPU backends the program is the native C++ deriver
    (no XLA compile at all); accelerator backends run the Pallas/XLA
    device program.
    """

    def __init__(self, targets: Optional[DeviceTargetSet], collect_keys: bool,
                 inv_chunk: int = 32):
        self.targets = targets
        self.collect_keys = collect_keys
        self.inv_chunk = inv_chunk
        self.match = targets is not None and not targets.empty
        self._windows = targets.windows if self.match else (4, 4)
        self._native = _native_derive_enabled()
        self._fn = (None if self._native else
                    _dm_program(self.match, collect_keys, inv_chunk,
                                *self._windows))
        if self.match:
            self._pool_args = targets.device_args()
        else:
            z = jnp.zeros(4, dtype=jnp.uint32)
            self._pool_args = (z, z, z, z)

    # -- native (CPU) path --------------------------------------------------

    def _run_native(self, keys, valid, full_mask: bool = False):
        from . import native

        keys_np = np.asarray(keys, dtype=np.uint32)
        valid_np = np.asarray(valid)
        n = keys_np.shape[0]
        norm, h160c_b, h160u_b = native.batch_derive_h160(keys_np)
        out = {"n_valid": valid_np.sum()}
        if self.match:
            fc = np.frombuffer(h160c_b, dtype=">u4").reshape(n, 5)
            fu = np.frombuffer(h160u_b, dtype=">u4").reshape(n, 5)
            frag_c = (fc[:, 0].astype(np.uint64) << np.uint64(32)) | fc[:, 1]
            frag_u = (fu[:, 0].astype(np.uint64) << np.uint64(32)) | fu[:, 1]
            m = self.targets.host_match(frag_c, frag_u) & valid_np
            if full_mask:
                out["mask"] = m
            else:
                idx = np.nonzero(m)[0]
                out["count"] = np.int64(len(idx))
                out["hit_idx"] = idx    # host path: exact, unbounded
        if self.collect_keys:
            out["keys"] = norm
            out["h160c"] = np.frombuffer(h160c_b, dtype="<u4").reshape(n, 5)
        return out

    # -- device path --------------------------------------------------------

    def run(self, keys, valid):
        if self._native:
            return self._run_native(keys, valid)
        try:
            return self._fn(keys, valid, *self._pool_args)
        except Exception as e:  # Mosaic/Pallas compile or runtime failure
            from .telemetry import log
            log().warning(
                "Pallas derive program failed (%s: %s); falling back to the "
                "XLA-staged path", type(e).__name__, e)
            self._fn = _dm_program(self.match, self.collect_keys,
                                   self.inv_chunk, *self._windows,
                                   use_pallas=False)
            return self._fn(keys, valid, *self._pool_args)

    def run_mask(self, keys, valid):
        """Rare path: full (N,) match mask for overflowed batches."""
        if self._native:
            return self._run_native(keys, valid, full_mask=True)["mask"]
        fn = _dm_program(self.match, False, self.inv_chunk, *self._windows,
                         full_mask=True)
        return fn(keys, valid, *self._pool_args)["mask"]


@functools.lru_cache(maxsize=None)
def _seq_program(win_c: int, win_u: int, full_mask: bool = False):
    """Compiled sequential-scan slot program: base point + offset tables ->
    point-add derive -> match (ecc/incremental.py).  Cached per
    target-window shape like _dm_program; the base point and limit are
    traced arguments so one compile serves every superbatch."""

    def fn(bx16, by16, offx, offy, limit, offsets, chi, clo, uhi, ulo):
        from .ecc.incremental import sequential_core
        d = sequential_core(bx16, by16, offx, offy)
        valid = offsets < limit
        m = (DeviceTargetSet._lookup(chi, clo, win_c, *d["frag_c"])
             | DeviceTargetSet._lookup(uhi, ulo, win_u, *d["frag_u"]))
        m = m & valid
        out = {"n_valid": valid.sum()}
        if full_mask:
            out["mask"] = m
        else:
            out["count"] = m.sum()
            out["mask_packed"] = _pack_mask(m)
        return out

    return jax.jit(fn)


class SequentialScan:
    """Runner for contiguous-scalar slots (direct/direct:be over a range):
    one affine point addition per key from a cached (i+1)*G offset table
    instead of a full fixed-base scalar multiplication — the puzzle-scan
    fast path (~20x fewer field muls; see ecc/incremental.py and
    docs/KERNELS.md)."""

    def __init__(self, dm: "DeriveMatcher", batch: int, mesh=None):
        from .ecc.incremental import BaseStepper, offset_table
        self.dm = dm
        self.batch = batch
        self._offx, self._offy = offset_table(batch, mesh=mesh)
        self._offsets = jnp.asarray(np.arange(batch, dtype=np.uint32))
        self._fn = _seq_program(*dm._windows)
        self._stepper = BaseStepper(batch)

    def run(self, start: int, limit: int):
        from .ecc.incremental import limbs16
        bx, by = self._stepper.base_for(start)
        return self._fn(jnp.asarray(limbs16(bx)), jnp.asarray(limbs16(by)),
                        self._offx, self._offy, jnp.uint32(limit),
                        self._offsets, *self.dm._pool_args)


def _sequential_enabled() -> bool:
    import os
    from .ecc.pubkey import use_pallas_default
    if os.environ.get("VUKE_TPU_SEQUENTIAL", "1") in ("0", "false", "no"):
        return False
    return use_pallas_default()


def _numpy_keygen_enabled() -> bool:
    """Eager numpy keygen on CPU backends: the transform cores are pure
    elementwise math (vuke_tpu/_npshim.py), and executing them in numpy
    skips XLA:CPU keygen compiles that cost minutes cold (a first
    sha256-transform generate measured 6m35s of pure LLVM compile).
    VUKE_NUMPY_KEYGEN=0 opts out (parity pinned per transform in
    tests/test_numpy_backend.py)."""
    import os
    if os.environ.get("VUKE_NUMPY_KEYGEN", "1") in ("0", "false", "no"):
        return False
    from .ecc.pubkey import use_pallas_default
    return not use_pallas_default()


def _host_seed_split(start_hi, start_lo, offs):
    offs_np = np.asarray(offs)
    lo = np.uint64(int(start_lo)) + offs_np.astype(np.uint64)
    hi = (np.uint64(int(start_hi)) + (lo >> np.uint64(32))).astype(np.uint32)
    return offs_np, hi, (lo & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def _keygen_program(nt):
    """Per-NumericTransform keygen, cached *on the transform object*
    (a dead object's id can be reused by a fresh spec, so an id-keyed dict
    could serve a stale compiled closure).  Transforms marked ``host_only``
    (EC-heavy wallet derivations) run eagerly on host; on CPU backends all
    transforms run eagerly in numpy (see _numpy_keygen_enabled).
    """
    fn = getattr(nt, "_compiled_batch", None)
    if fn is None:
        def keygen(start_hi, start_lo, limit, offs):
            hi, lo = _seed_lattice(start_hi, start_lo, offs)
            keys, valid = nt.fn(hi, lo)              # (N, S, 8), (N, S)
            valid = valid & (offs < limit)[:, None]
            return keys, valid

        if getattr(nt, "host_only", False):
            def fn(start_hi, start_lo, limit, offs):
                offs_np, hi, lo32 = _host_seed_split(start_hi, start_lo, offs)
                keys, valid = nt.fn(hi, lo32)
                valid = np.asarray(valid) & (offs_np < int(limit))[:, None]
                return jnp.asarray(keys), jnp.asarray(valid)
        elif _numpy_keygen_enabled():
            def fn(start_hi, start_lo, limit, offs):
                from ._lazy import numpy_backend
                offs_np, hi, lo32 = _host_seed_split(start_hi, start_lo, offs)
                with numpy_backend():
                    keys, valid = nt.fn(hi, lo32)
                valid = np.asarray(valid) & (offs_np < int(limit))[:, None]
                return np.asarray(keys), valid
        else:
            fn = jax.jit(keygen)
        nt._compiled_batch = fn
    return fn


class ScanProgram:
    """Keygen program for one numeric transform + shared derive/match."""

    def __init__(self, spec: TransformSpec, dm: DeriveMatcher,
                 batch: int = DEFAULT_BATCH, mesh=None):
        assert spec.numeric is not None
        self.spec = spec
        self.batch = batch
        self.dm = dm
        nt = spec.numeric

        offsets = np.arange(batch, dtype=np.uint32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._offsets = jax.device_put(offsets, NamedSharding(mesh, P("seeds")))
        else:
            self._offsets = jnp.asarray(offsets)

        self._keygen = _keygen_program(nt)

        # contiguous-scalar slots (direct/direct:be) take the incremental
        # point-add path when matching on an accelerator backend
        self._seq = None
        self._seq_slot = getattr(nt, "sequential_slot", None)
        if (self._seq_slot is not None and dm.match
                and batch % 1024 == 0 and _sequential_enabled()):
            try:
                self._seq = SequentialScan(dm, batch, mesh=mesh)
            except Exception as e:  # offset-table build/compile failure
                from .telemetry import log
                log().warning(
                    "sequential-scan table build failed (%s: %s); using the "
                    "scalar-mul path", type(e).__name__, e)
                self._seq = None

    def run(self, start: int, limit: Optional[int] = None):
        """Launch one superbatch (async).  Returns per-slot result dicts."""
        if limit is None:
            limit = self.batch
        keys = valid = None
        results = []
        for s in range(self.spec.numeric.n_slots):
            if self._seq is not None and s == self._seq_slot:
                from .ecc.incremental import sequential_safe
                if sequential_safe(start, self.batch):
                    results.append(dict(self._seq.run(start, limit)))
                    continue
            if keys is None:
                keys, valid = self._keygen(
                    jnp.uint32(start >> 32), jnp.uint32(start & 0xFFFFFFFF),
                    jnp.uint32(limit), self._offsets)
            r = dict(self.dm.run(keys[:, s, :], valid[:, s]))
            if self.dm.collect_keys:
                r["valid"] = valid[:, s]
            results.append(r)
        return results


class ForwardDriver:
    """Runs numeric transforms over a contiguous seed range with pipelined
    superbatches, confirming device-flagged hits on the host through the
    byte-exact string matcher."""

    def __init__(self, specs: Sequence[TransformSpec], matcher: Optional[Matcher],
                 output, deriver: Optional[KeyDeriver] = None,
                 batch: int = DEFAULT_BATCH, mesh=None, inv_chunk: int = 32,
                 progress=None):
        self.specs = [s for s in specs if s.numeric is not None]
        self.matcher = matcher
        self.output = output
        self.deriver = deriver or KeyDeriver()
        self.batch = batch
        self.progress = progress
        self.targets = DeviceTargetSet(matcher.targets) if matcher is not None else None
        generate_mode = matcher is None
        self.dm = DeriveMatcher(self.targets, collect_keys=generate_mode,
                                inv_chunk=inv_chunk)
        self.programs = [ScanProgram(spec, self.dm, batch=batch, mesh=mesh)
                         for spec in self.specs]
        self._single_jits = {}

    # -- hit confirmation ---------------------------------------------------

    def _confirm_hits(self, spec: TransformSpec, start: int, slot_i: int,
                      result, prog=None, n=None) -> int:
        if "count" not in result:   # matcher present but no parseable targets
            return 0
        count = int(result["count"])
        if count == 0:
            return 0
        if "mask_packed" in result:
            # device path: unpack the bit-packed match mask (exact for any
            # hit count — the old jnp.nonzero compaction cost ~30 ms/batch
            # on the scalar unit and needed an overflow rare path)
            packed = np.asarray(result["mask_packed"])
            idx = np.nonzero(_unpack_mask(packed, packed.shape[0] * 32))[0]
        else:
            idx = np.asarray(result["hit_idx"])[:count]
        matches = 0
        for i in idx:
            seed = start + int(i)
            derived = self._derive_seed_slot(spec, seed, slot_i)
            if derived is None:
                continue
            info = self.matcher.check(derived)
            if info is not None:
                matches += 1
                source = f"{seed}{spec.numeric.slots[slot_i]}"
                self.output.hit(source, spec.name, derived, info)
        return matches

    def _derive_seed_slot(self, spec: TransformSpec, seed: int, slot_i: int):
        """Recompute one key from (seed, slot) on a singleton batch — a
        single source of truth for transform semantics."""
        fn = getattr(spec.numeric, "_compiled_single", None)
        if fn is None:
            if getattr(spec.numeric, "host_only", False):
                fn = spec.numeric.fn
            elif _numpy_keygen_enabled():
                def fn(hi, lo, _f=spec.numeric.fn):
                    from ._lazy import numpy_backend
                    with numpy_backend():
                        return _f(np.asarray(hi), np.asarray(lo))
            else:
                fn = jax.jit(spec.numeric.fn)
            spec.numeric._compiled_single = fn
        hi = jnp.asarray(np.array([seed >> 32], dtype=np.uint32))
        lo = jnp.asarray(np.array([seed & 0xFFFFFFFF], dtype=np.uint32))
        keys, valid = fn(hi, lo)
        if not bool(np.asarray(valid)[0, slot_i]):
            return None
        return self.deriver.derive(key_words_to_bytes(np.asarray(keys)[0, slot_i]))

    # -- main loop ----------------------------------------------------------

    def run_range(self, start: int, end: int) -> ProcessStats:
        """Process the inclusive u64 seed range [start, end]."""
        stats = ProcessStats()
        pending = []  # (spec, batch_start, n, per-slot results)
        pos = start
        while pos <= end or pending:
            if pos <= end:
                n = min(self.batch, end - pos + 1)
                for spec, prog in zip(self.specs, self.programs):
                    pending.append((spec, prog, pos, n, prog.run(pos, n)))
                pos += self.batch
            while len(pending) > len(self.programs) or (pos > end and pending):
                spec, prog, bstart, n, results = pending.pop(0)
                stats.merge(self._consume(spec, bstart, n, results, prog=prog))
                if self.progress is not None:
                    self.progress.advance(n)
        self.output.flush()
        return stats

    def _consume(self, spec: TransformSpec, bstart: int, n: int, results,
                 prog=None) -> ProcessStats:
        s = ProcessStats(inputs_processed=n)
        for slot_i, result in enumerate(results):
            s.keys_generated += int(result["n_valid"])
            if self.matcher is not None:
                s.matches_found += self._confirm_hits(spec, bstart, slot_i, result,
                                                      prog=prog, n=n)
        if self.matcher is None and self.output is not None:
            self._emit_generate(spec, bstart, n, results)
        return s

    def _emit_generate(self, spec: TransformSpec, bstart: int, n: int, results):
        from . import encode, native
        emit = _fast_emitter(self.output, self.deriver)
        slot_rows = []
        for result in results:
            keys = np.asarray(result["keys"])[:n]
            h160c = np.asarray(result["h160c"])[:n]
            valid = np.asarray(result["valid"])[:n]
            # batch-format addresses through the native encoder when available
            h160_bytes = h160c.astype("<u4").tobytes()
            addrs = native.batch_p2pkh(h160_bytes, n,
                                       self.deriver.network.p2pkh_version)
            slot_rows.append((keys, h160c, valid, addrs))
        # reference output order: per input, all slots (range.rs:43-63)
        for i in range(n):
            seed = bstart + i
            for slot_i, (keys, h160c, valid, addrs) in enumerate(slot_rows):
                if not valid[i]:
                    continue
                key = key_words_to_bytes(keys[i])
                if addrs is not None:
                    addr = addrs[i]
                else:
                    addr = encode.p2pkh_address(h160c[i].astype("<u4").tobytes(),
                                                self.deriver.network)
                emit(f"{seed}{spec.numeric.slots[slot_i]}", spec.name, key, addr)


def _fast_emitter(output, deriver):
    """Prefer the no-host-EC ``key_fast`` path; fall back to a full derive
    + ``key`` for outputs that only implement the basic interface."""
    kf = getattr(output, "key_fast", None)
    if kf is not None:
        return lambda source, name, key, addr: kf(source, name, key, addr,
                                                  deriver=deriver)
    return lambda source, name, key, addr: output.key(source, name,
                                                      deriver.derive(key))


class StringDriver:
    """Forward search over string inputs (wordlist/stdin/files).

    Device programs are the SAME DeriveMatcher programs the numeric
    ForwardDriver compiles (full-mask variant for matching, collect variant
    for generate mode) — when the string pad width equals the numeric batch,
    string and numeric drivers share every expensive ECC compilation."""

    # fixed device width for the shared string derive program; 1024 keeps
    # the Pallas tile fast path (n % 1024 == 0).  VUKE_STRING_PAD overrides
    # (the CPU test tier sets 512 so string programs share the numeric
    # drivers' batch-512 compilations).
    PAD = 1024

    def __init__(self, specs: Sequence[TransformSpec], matcher: Optional[Matcher],
                 output, deriver: Optional[KeyDeriver] = None, inv_chunk: int = 32,
                 progress=None):
        self.specs = list(specs)
        self.matcher = matcher
        self.output = output
        self.deriver = deriver or KeyDeriver()
        self.inv_chunk = inv_chunk
        self.targets = DeviceTargetSet(matcher.targets) if matcher else None
        self._dm = None
        self._gen_dm = None
        import os
        self.pad = int(os.environ.get("VUKE_STRING_PAD", self.PAD))
        self._valid_ones = jnp.ones(self.pad, dtype=bool)
        # progress over *inputs* (words/lines/files) — the reference renders
        # an indicatif bar in every source (source/wordlist.rs, lib.rs:32-37)
        self.progress = progress

    def _pad_chunks(self, keys_flat: np.ndarray):
        for ofs in range(0, len(keys_flat), self.pad):
            chunk = keys_flat[ofs:ofs + self.pad]
            m = len(chunk)
            if m < self.pad:
                chunk = np.vstack([chunk, np.tile(chunk[-1:], (self.pad - m, 1))])
            yield ofs, m, jnp.asarray(chunk)

    def _device_match(self, keys_flat: np.ndarray) -> np.ndarray:
        """(M, 8) keys -> candidate mask, via fixed-width padded chunks."""
        if self._dm is None:
            self._dm = DeriveMatcher(self.targets, collect_keys=False,
                                     inv_chunk=self.inv_chunk)
        out = np.zeros(len(keys_flat), dtype=bool)
        for ofs, m, chunk in self._pad_chunks(keys_flat):
            mask = self._dm.run_mask(chunk, self._valid_ones)
            out[ofs:ofs + m] = np.asarray(mask)[:m]
        return out

    def process_blob(self, data: bytes, label: str) -> ProcessStats:
        """Single blob input (FilesSource): runs blob-capable transforms
        (bitimage) on file bytes; others see the label string only.

        Non-blob specs go through ONE process_batch call restricted to that
        subset, so each transform is applied exactly once per file
        (/root/reference/src/source/files.rs:106-111)."""
        stats = ProcessStats()
        if self.progress is not None:
            self.progress.advance(1)
        non_blob = [s for s in self.specs
                    if s.string is not None and getattr(s.string, "blob_fn", None) is None]
        if non_blob:
            prog, self.progress = self.progress, None  # advanced above already
            try:
                stats.merge(self.process_batch([label], specs=non_blob))
            finally:
                self.progress = prog
            stats.inputs_processed = 0  # counted once by the caller per file
        for spec in self.specs:
            st = spec.string
            if st is None:
                continue
            blob_fn = getattr(st, "blob_fn", None)
            if blob_fn is None:
                continue
            keys = blob_fn([(data, label)])
            valid = blob_fn.last_valid
            stats.keys_generated += int(valid.sum())
            n, S = keys.shape[:2]
            for s_i in range(S):
                if not valid[0, s_i]:
                    continue
                derived = self.deriver.derive(key_words_to_bytes(keys[0, s_i]))
                source = f"{label}{st.slots[s_i]}"
                if self.matcher is not None:
                    info = self.matcher.check(derived)
                    if info is not None:
                        stats.matches_found += 1
                        self.output.hit(source, spec.name, derived, info)
                else:
                    self.output.key(source, spec.name, derived)
        return stats

    def process_batch(self, strings: Sequence[str],
                      specs: Optional[Sequence[TransformSpec]] = None) -> ProcessStats:
        stats = ProcessStats(inputs_processed=len(strings))
        if not strings:
            return stats
        if self.progress is not None:
            self.progress.advance(len(strings))
        for spec in (self.specs if specs is None else specs):
            st = spec.string
            if st is None:
                continue
            keys = st.fn(list(strings))                # (N, S, 8)
            valid = (st.valid_fn(list(strings)) if st.valid_fn is not None
                     else np.ones(keys.shape[:2], dtype=bool))
            stats.keys_generated += int(valid.sum())
            n, S = keys.shape[:2]
            label = getattr(st, "label_fn", None) or (lambda s: s)
            if self.matcher is not None and self.targets is not None and not self.targets.empty:
                mask = self._device_match(keys.reshape(-1, 8)) & valid.reshape(-1)
                for flat_i in np.nonzero(mask)[0]:
                    i, s_i = divmod(int(flat_i), S)
                    derived = self.deriver.derive(key_words_to_bytes(keys[i, s_i]))
                    info = self.matcher.check(derived)
                    if info is not None:
                        stats.matches_found += 1
                        self.output.hit(f"{label(strings[i])}{st.slots[s_i]}",
                                        spec.name, derived, info)
            elif self.matcher is None:
                self._emit_generate(spec, st, strings, keys, valid, label)
        return stats

    def _emit_generate(self, spec, st, strings, keys, valid, label):
        """Generate-mode output via device h160 + native address encoding
        (one device batch instead of per-key host EC)."""
        from . import encode, native

        n, S = keys.shape[:2]
        flat = keys.reshape(-1, 8)
        norm = np.zeros_like(flat)
        h160c = np.zeros((len(flat), 5), dtype=np.uint32)
        if self._gen_dm is None:
            self._gen_dm = DeriveMatcher(None, collect_keys=True,
                                         inv_chunk=self.inv_chunk)
        for ofs, m, chunk in self._pad_chunks(flat):
            r = self._gen_dm.run(chunk, self._valid_ones)
            norm[ofs:ofs + m] = np.asarray(r["keys"])[:m]
            h160c[ofs:ofs + m] = np.asarray(r["h160c"])[:m]
        addrs = native.batch_p2pkh(h160c.astype("<u4").tobytes(), len(flat),
                                   self.deriver.network.p2pkh_version)
        emit = _fast_emitter(self.output, self.deriver)
        for i in range(n):
            for s_i in range(S):
                if not valid[i, s_i]:
                    continue
                flat_i = i * S + s_i
                key = key_words_to_bytes(norm[flat_i])
                if addrs is not None:
                    addr = addrs[flat_i]
                else:
                    addr = encode.p2pkh_address(
                        h160c[flat_i].astype("<u4").tobytes(), self.deriver.network)
                emit(f"{label(strings[i])}{st.slots[s_i]}", spec.name, key, addr)
