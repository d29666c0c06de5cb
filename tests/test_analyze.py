"""Reverse-analyzer tests: round-trip (transform -> analyze) recovery.

Mirrors the reference's analyzer self-consistency tier (SURVEY.md §4.3):
keys produced by a transform are recovered by its analyzer, on bounded
search spaces so tests stay fast (full 2^32 sweeps are exercised by the
benchmarks, like the reference's #[ignore]d tests).
"""

import numpy as np
import pytest

from vuke_tpu.analyze import (
    AnalysisConfig, AnalysisStatus, DirectAnalyzer, HeuristicAnalyzer,
    KeyMetadata, LcgAnalyzer, MilksadAnalyzer, Mt64Analyzer,
    Sha256ChainAnalyzer, XorshiftAnalyzer, apply_mask, format_results,
    format_results_json, parse_cascade, parse_private_key,
)

import oracles

BATCH = 1 << 14
CFG = dict(batch=BATCH, max_seeds=1 << 15)


def _cfg(**kw):
    base = dict(CFG)
    base.update(kw)
    return AnalysisConfig(**base)


def test_parse_private_key_formats():
    k = parse_private_key("0xabc")
    assert k == (0xABC).to_bytes(32, "big")
    # hex wins over decimal for short digit strings (key_parser.rs order)
    k = parse_private_key("255")
    assert k == (0x255).to_bytes(32, "big")
    # >64 digits can only be decimal
    big = 10**70
    assert parse_private_key(str(big)) == big.to_bytes(32, "big")
    k = parse_private_key("5KJvsngHeMpm884wtkJNzQGaCErckhHJBGFsvd3VyK5qMZXj3hS")
    assert k.hex() == "c4bbcb1fbec99d65bf59d85c8cb62ee2db963f0fe106f483d9afa73bd4e39a8a"
    with pytest.raises(Exception):
        parse_private_key("zzz")


def test_parse_cascade():
    t = parse_cascade("10:0x202,5:0x15")
    assert t == [(5, 0x15), (10, 0x202)]
    with pytest.raises(Exception):
        parse_cascade("5:0x15")  # needs >= 2
    with pytest.raises(Exception):
        parse_cascade("5:1,5:1")  # duplicate


def test_milksad_exact_roundtrip():
    seed = 9000
    key = oracles.MT19937(seed).fill_bytes(32)
    r = MilksadAnalyzer().analyze(key, _cfg())
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed = {seed}" in r.details


def test_milksad_masked_roundtrip():
    seed = 12000
    key = oracles.MT19937(seed).fill_bytes(32)
    bits = 40
    r = MilksadAnalyzer().analyze(key, _cfg(mask_bits=bits))
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed = {seed}" in r.details
    assert f"mask_bits={bits}" in r.details


def test_milksad_cascade_roundtrip():
    seed = 5432
    rng = oracles.MT19937(seed)
    k1 = rng.fill_bytes(32)
    k2 = rng.fill_bytes(32)
    targets = [(20, apply_mask(k1, 20)), (28, apply_mask(k2, 28))]
    cfg = _cfg()
    cfg.cascade_targets = targets
    r = MilksadAnalyzer().analyze(b"\x00" * 32, cfg)
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed = {seed}" in r.details


def test_milksad_not_found():
    key = bytes(range(32))
    r = MilksadAnalyzer().analyze(key, _cfg(max_seeds=BATCH))
    assert r.status == AnalysisStatus.NOT_FOUND
    assert "checked" in r.details


def test_lcg_exact_roundtrip():
    seed = 777
    key = oracles.lcg_key(seed, 16807, 0, (1 << 31) - 1, True)
    r = LcgAnalyzer(variant=None).analyze(key, _cfg())
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed={seed}" in r.details
    assert "variant=minstd" in r.details


def test_lcg_masked_roundtrip():
    seed = 999
    key = oracles.lcg_key(seed, 214013, 2531011, 1 << 32, True)
    from vuke_tpu.cores.lcg import MSVC
    r = LcgAnalyzer(variant=MSVC).analyze(key, _cfg(mask_bits=48))
    assert r.status == AnalysisStatus.CONFIRMED
    assert "variant=msvc" in r.details
    assert "mask_bits=48" in r.details


def test_mt64_requires_cascade():
    r = Mt64Analyzer().analyze(b"\x01" * 32, _cfg())
    assert r.status == AnalysisStatus.UNKNOWN
    assert "--cascade" in r.details


def test_mt64_cascade_roundtrip():
    seed = 3333
    rng = oracles.MT19937_64(seed)
    k1 = rng.fill_bytes(32)
    k2 = rng.fill_bytes(32)
    cfg = _cfg()
    cfg.cascade_targets = [(24, apply_mask(k1, 24)), (30, apply_mask(k2, 30))]
    r = Mt64Analyzer().analyze(b"\x00" * 32, cfg)
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed = {seed}" in r.details


def test_xorshift_cascade_roundtrip():
    seed = 2024
    k1 = oracles.xorshift64_key(seed)
    # keystream continuation for second key
    s = seed
    out = b""
    M64 = 0xFFFFFFFFFFFFFFFF
    for _ in range(8):
        s ^= (s << 13) & M64
        s ^= s >> 7
        s ^= (s << 17) & M64
        out += s.to_bytes(8, "big")
    k2 = out[32:64]
    cfg = _cfg()
    cfg.cascade_targets = [(22, apply_mask(k1, 22)), (26, apply_mask(k2, 26))]
    r = XorshiftAnalyzer("xorshift64").analyze(b"\x00" * 32, cfg)
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed={seed}" in r.details
    assert "variant=xorshift64" in r.details


def test_sha256_chain_exact_roundtrip():
    import hashlib
    seed = 4321
    k0 = hashlib.sha256(int(seed).to_bytes(4, "big")).digest()
    k3 = k0
    for _ in range(3):
        k3 = hashlib.sha256(k3).digest()
    r = Sha256ChainAnalyzer("iterated").analyze(k3, _cfg())
    assert r.status == AnalysisStatus.CONFIRMED
    assert f"seed={seed}" in r.details
    assert "chain_index=3" in r.details


def test_direct_analyzer():
    key = (42).to_bytes(32, "big")
    r = DirectAnalyzer().analyze(key, AnalysisConfig())
    assert r.status == AnalysisStatus.POSSIBLE
    assert "bit_length" in r.details

    key = b"test" + b"\x00" * 28
    r = DirectAnalyzer().analyze(key, AnalysisConfig())
    assert 'ASCII string: "test"' in r.details

    key = bytes.fromhex("c4bbcb1fbec99d65bf59d85c8cb62ee2db963f0fe106f483d9afa73bd4e39a8a")
    r = DirectAnalyzer().analyze(key, AnalysisConfig())
    assert r.status == AnalysisStatus.NOT_FOUND


def test_heuristic_analyzer():
    r = HeuristicAnalyzer().analyze(b"\x00" * 32, AnalysisConfig())
    assert r.status == AnalysisStatus.POSSIBLE

    key = bytes([1, 2, 3, 4] * 8)
    r = HeuristicAnalyzer().analyze(key, AnalysisConfig())
    assert r.status == AnalysisStatus.POSSIBLE
    assert "repeating" in r.details

    key = bytes.fromhex("c4bbcb1fbec99d65bf59d85c8cb62ee2db963f0fe106f483d9afa73bd4e39a8a")
    r = HeuristicAnalyzer().analyze(key, AnalysisConfig())
    assert r.status == AnalysisStatus.UNKNOWN


def test_format_results():
    from vuke_tpu.analyze.analyzers import AnalysisResult
    md = KeyMetadata(hex="abc123", bit_length=256, hamming_weight=128, leading_zeros=0)
    results = [AnalysisResult("test", AnalysisStatus.CONFIRMED, "seed = 42")]
    text = format_results(md, results)
    assert "Private Key: abc123" in text
    assert "CONFIRMED" in text
    assert "seed = 42" in text
    js = format_results_json(md, results)
    import json
    parsed = json.loads(js)
    assert parsed["private_key"] == "abc123"
    assert parsed["results"][0]["status"] == "confirmed"


def test_sweep_program_falls_back_on_kernel_failure():
    """Accelerator failure degrades the sweep to the XLA keystream instead
    of aborting the analyze (reference: main.rs:1577-1594)."""
    from vuke_tpu.analyze.sweeps import SweepProgram, sweep
    from vuke_tpu.cores.mt19937 import milksad_key_words

    seed = 777
    key_words = np.asarray(milksad_key_words(
        np.array([seed], dtype=np.uint32), n_keys=1))[0, 0]

    def keystream(hi, lo, n_keys):
        return milksad_key_words(lo, n_keys=n_keys)

    prog = SweepProgram(keystream, "exact", batch=512)

    def boom(*a, **k):
        raise RuntimeError("injected Mosaic failure")

    prog._step = boom
    import jax.numpy as jnp
    r = sweep(prog, 0, 2048, target_words=jnp.asarray(key_words))
    assert r.found and r.seed == seed


def test_analyze_verify_reports_matches():
    """--verify checks a key against a whole collection and reports every
    match with its type (provider.rs:398-476; main.rs run_analyze)."""
    import io

    from vuke_tpu.analyze import run_analyze

    buf = io.StringIO()
    run_analyze("0x1", fast=True, verify="boha:b1000", out=buf)
    text = buf.getvalue()
    assert "matches puzzle #1 in b1000" in text
    assert "p2pkh_compressed" in text

    buf = io.StringIO()
    run_analyze("0x" + "ef" * 32, fast=True, verify="boha:b1000", out=buf)
    assert "does not match any puzzle" in buf.getvalue()
    assert "256 checked" in buf.getvalue()


# --- analyzer registry / metadata parity (analyze/mod.rs:91-255 test mod,
# analyze/sha256_chain.rs test_analyzer_name/test_supports_mask/
# test_is_brute_force/test_with_variant/test_with_chain_depth) -------------

def test_analyzer_names_and_flags():
    from vuke_tpu.analyze import all_analyzers, fast_analyzers
    meta = {a.name: (a.supports_mask, a.is_brute_force)
            for a in all_analyzers()}
    assert set(meta) == {"milksad", "mt64", "lcg", "xorshift",
                         "sha256_chain", "direct", "heuristic"}
    for brute in ("milksad", "mt64", "lcg", "xorshift", "sha256_chain"):
        assert meta[brute] == (True, True), brute
    for fast in ("direct", "heuristic"):
        assert meta[fast] == (False, False), fast
    assert [a.name for a in fast_analyzers()] == ["direct", "heuristic"]


def test_analyzer_from_str_variants():
    from vuke_tpu.analyze import analyzer_from_str
    # case-insensitive (mod.rs:219-221)
    assert analyzer_from_str("MILKSAD").name == "milksad"
    assert analyzer_from_str("multibit-hd").name == "multibit-hd"
    assert analyzer_from_str("multibit").name == "multibit-hd"
    a = analyzer_from_str("lcg:glibc")
    assert [v.name for v in a.variants] == ["glibc"]
    a = analyzer_from_str("lcg")
    assert len(a.variants) == 4
    a = analyzer_from_str("xorshift:xoroshiro")
    assert a.variants == ["xoroshiro128**"]   # canonical variant name
    a = analyzer_from_str("sha256_chain:counter", chain_depth=7)
    assert a.variants == ["counter"]
    assert a.chain_depth == 7
    with pytest.raises(ValueError, match="Unknown analyzer"):
        analyzer_from_str("notathing")


def test_direct_heuristic_masked_is_unknown():
    # direct.rs/heuristic.rs: mask => Unknown (SURVEY §2.4)
    key = (42).to_bytes(32, "big")
    for a in (DirectAnalyzer(), HeuristicAnalyzer()):
        r = a.analyze(key, AnalysisConfig(mask_bits=16))
        assert r.status == AnalysisStatus.UNKNOWN


def test_direct_padding_detection():
    # direct.rs:11-64: >=24 leading/trailing zero bytes flagged as padding
    r = DirectAnalyzer().analyze(b"\0" * 28 + b"\xaa\xbb\xcc\xdd",
                                 AnalysisConfig())
    assert r.status == AnalysisStatus.POSSIBLE and "BE padding" in r.details
    r = DirectAnalyzer().analyze(b"\xaa\xbb\xcc\xdd" + b"\0" * 28,
                                 AnalysisConfig())
    assert r.status == AnalysisStatus.POSSIBLE and "LE padding" in r.details
