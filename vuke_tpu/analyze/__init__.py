"""Reverse key-origin analysis: registry + CLI runner.

Mirrors AnalyzerType::{all,fast,from_str} (/root/reference/src/analyze/
mod.rs:158-255) and the run_analyze orchestration (main.rs:1381-1539):
analyzers run sequentially over the parsed key with mask/cascade config,
sweeps dispatched to the device.
"""

from __future__ import annotations

import sys
from typing import List, Optional

from .analyzers import (  # noqa: F401
    AnalysisConfig, AnalysisResult, AnalysisStatus, DirectAnalyzer,
    HeuristicAnalyzer, KeyMetadata, LcgAnalyzer, MilksadAnalyzer,
    Mt64Analyzer, Sha256ChainAnalyzer, XorshiftAnalyzer,
    calculate_bit_length,
)
from .key_parser import ParseError, apply_mask, parse_cascade, parse_private_key  # noqa: F401
from .output import format_results, format_results_json  # noqa: F401


def all_analyzers() -> List:
    """Default set (AnalyzerType::all, analyze/mod.rs:199-209)."""
    return [
        MilksadAnalyzer(),
        Mt64Analyzer(),
        LcgAnalyzer(),
        XorshiftAnalyzer(),
        Sha256ChainAnalyzer(),
        DirectAnalyzer(),
        HeuristicAnalyzer(),
    ]


def fast_analyzers() -> List:
    return [DirectAnalyzer(), HeuristicAnalyzer()]


def analyzer_from_str(s: str, mnemonic=None, mnemonic_file=None, passphrase="",
                      chain_depth: int = 10):
    from ..transforms.registry import _parse_lcg, _parse_xorshift, _parse_chain
    sl = s.lower()
    if sl == "milksad":
        return MilksadAnalyzer()
    if sl == "mt64":
        return Mt64Analyzer()
    if sl in ("multibit-hd", "multibit"):
        from .multibit import MultibitAnalyzer
        return MultibitAnalyzer(mnemonic=mnemonic, mnemonic_file=mnemonic_file,
                                passphrase=passphrase)
    if sl == "direct":
        return DirectAnalyzer()
    if sl == "heuristic":
        return HeuristicAnalyzer()
    if sl == "lcg" or sl.startswith("lcg:"):
        variant, endian = _parse_lcg(sl)
        return LcgAnalyzer(variant, endian == "be")
    if sl == "xorshift" or sl.startswith("xorshift:"):
        return XorshiftAnalyzer(_parse_xorshift(sl))
    if sl == "sha256_chain" or sl.startswith("sha256_chain:"):
        variant, _depth = _parse_chain(sl)
        return Sha256ChainAnalyzer(variant, chain_depth)
    raise ValueError(
        f"Unknown analyzer: {s}. Valid: milksad, mt64, multibit-hd, direct, "
        f"heuristic, lcg[:variant][:endian], xorshift[:variant], "
        f"sha256_chain[:variant]")


def run_analyze(key_str: str, fast: bool = False, mask: Optional[int] = None,
                cascade: Optional[str] = None, analyzers: Optional[List[str]] = None,
                mnemonic=None, mnemonic_file=None, passphrase: str = "",
                chain_depth: int = 10, puzzle: Optional[str] = None,
                verify: Optional[str] = None, as_json: bool = False,
                batch: Optional[int] = None, max_seeds: Optional[int] = None,
                checkpoint: Optional[str] = None, out=None):
    out = out if out is not None else sys.stdout
    if batch is None:
        # accelerator sweeps are dispatch-latency-bound below ~2^24
        # (~30 ms per host round-trip regardless of batch: 2^20 measured
        # 36M seeds/s, 2^26 measured 2.03G — the compute bound); cascade
        # streams carry n_keys x the memory, so the default stops at 2^24
        # (.bench_logs/sweep_rates.json, docs/SCALING.md)
        from ..ecc.pubkey import use_pallas_default
        batch = (1 << 24) if use_pallas_default() else (1 << 20)
    config = AnalysisConfig(mask_bits=mask, batch=batch, max_seeds=max_seeds,
                            checkpoint_path=checkpoint)

    from .. import provider as provider_mod

    if puzzle:
        res = provider_mod.resolve(puzzle)
        if res is not None and res.context is not None:
            ctx = res.context
            if config.mask_bits is None and ctx.mask_bits and ctx.mask_bits <= 64:
                config.mask_bits = ctx.mask_bits
                print(f"Puzzle {puzzle}: auto-set mask to {ctx.mask_bits} bits",
                      file=sys.stderr)
            if ctx.cascade_targets:
                config.cascade_targets = ctx.cascade_targets
                print(f"Puzzle {puzzle}: cascade from {len(ctx.cascade_targets)} "
                      f"solved neighbors", file=sys.stderr)

    if cascade:
        # provider reference (boha:b1000:66[:n]) or literal bits:target list
        # (main.rs:1371-1378 resolve_cascade)
        targets = provider_mod.parse_cascade_ref(cascade)
        config.cascade_targets = (targets if targets is not None
                                  else parse_cascade(cascade))

    key = parse_private_key(key_str)

    if verify:
        parts = verify.split(":")
        coll = parts[1] if len(parts) > 1 else parts[0]
        report = provider_mod.verify_key(key, coll)
        for m in report.matches:
            print(f"Key matches puzzle #{m.puzzle.id} in {m.collection} via "
                  f"{m.address_type}: {m.puzzle.address}", file=out)
        if not report.matches:
            print(f"Key does not match any puzzle in {coll} "
                  f"({report.total_checked} checked)", file=out)

    if analyzers:
        selected = [analyzer_from_str(a, mnemonic, mnemonic_file, passphrase,
                                      chain_depth) for a in analyzers]
    elif fast:
        selected = fast_analyzers()
    else:
        selected = all_analyzers()

    from ..progress import Progress
    from ..telemetry import profile_trace

    results = []
    with profile_trace():
        for analyzer in selected:
            progress = None
            if analyzer.is_brute_force:
                print(f"Running {analyzer.name} (brute-force)...", file=sys.stderr)
                progress = Progress(label=analyzer.name)
            results.append(analyzer.analyze(key, config, progress=progress))
            if progress is not None:
                progress.finish()

    metadata = KeyMetadata.from_key(key)
    if as_json:
        print(format_results_json(metadata, results), file=out)
    else:
        print(format_results(metadata, results), file=out, end="")
    return results
