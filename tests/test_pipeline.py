"""End-to-end forward pipeline tests: planted-key scans and generate parity.

The reference's "one model running end-to-end" analogue (SURVEY.md §7.4):
a milksad scan over a small range recovers a planted key with a hit banner.
"""

import io

import numpy as np
import pytest

from vuke_tpu.derive import KeyDeriver
from vuke_tpu.matcher import Matcher
from vuke_tpu.output import ConsoleOutput
from vuke_tpu.pipeline import ForwardDriver, StringDriver
from vuke_tpu.sources import RangeSource
from vuke_tpu.transforms import parse_transform

import oracles


@pytest.fixture(scope="module")
def deriver():
    return KeyDeriver()


def _plant_address(key_bytes: bytes, deriver, which: str = "p2pkh_compressed"):
    d = deriver.derive(key_bytes)
    return getattr(d, which)


def test_milksad_scan_recovers_planted_key(deriver, capsys=None):
    seed = 3111
    key = oracles.MT19937(seed).fill_bytes(32)
    addr = _plant_address(key, deriver)

    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses([addr, "1BitcoinEaterAddressDontSendf59kuE"])
    spec = parse_transform("milksad")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(1, 3500)

    assert stats.inputs_processed == 3500
    assert stats.matches_found == 1
    text = buf.getvalue()
    assert "========== HIT ==========" in text
    assert f"Source: {seed}" in text
    assert "Transform: milksad" in text
    assert f"Private Key: {key.hex()}" in text
    assert addr in text


def test_sha256_scan_p2wpkh_target(deriver):
    # plant the bech32 address of SHA256("4242") — string slot of seed 4242
    import hashlib
    key = hashlib.sha256(b"4242").digest()
    addr = _plant_address(key, deriver, "p2wpkh")

    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses([addr])
    spec = parse_transform("sha256")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(4000, 4600)

    assert stats.matches_found == 1
    assert "p2wpkh" in buf.getvalue()
    assert addr in buf.getvalue()


def test_lcg_scan_uncompressed_target(deriver):
    # glibc LCG key for seed 777, matched via uncompressed p2pkh
    key = oracles.lcg_key(777, 1103515245, 12345, 1 << 31, True)
    addr = _plant_address(key, deriver, "p2pkh_uncompressed")

    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses([addr])
    spec = parse_transform("lcg")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(700, 900)

    assert stats.matches_found == 1
    text = buf.getvalue()
    assert "Source: 777:glibc" in text  # multi-variant label
    assert "p2pkh_uncompressed" in text


def test_generate_compact_output_matches_reference_format(deriver):
    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    spec = parse_transform("milksad")
    driver = ForwardDriver([spec], None, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(1, 10)

    assert stats.inputs_processed == 10
    assert stats.keys_generated == 10
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == 10
    # line format: source,transform,privkey_hex,p2pkh_compressed
    for i, line in enumerate(lines):
        parts = line.split(",")
        assert len(parts) == 4
        assert parts[0] == str(i + 1)
        assert parts[1] == "milksad"
        expect_key = oracles.MT19937(i + 1).fill_bytes(32)
        # key is normalized (these are < n, so unchanged)
        assert parts[2] == expect_key.hex()
        assert parts[3] == deriver.derive(expect_key).p2pkh_compressed


def test_string_driver_wordlist_scan(deriver):
    import hashlib
    key = hashlib.sha256(b"correct horse battery staple").digest()
    addr = "1JwSSubhmg6iPtRjtyqhUYYH7bZg3Lfy1T"  # derive.rs:178-200 golden

    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses([addr])
    spec = parse_transform("sha256")
    sd = StringDriver([spec], matcher, out, deriver, inv_chunk=32)
    stats = sd.process_batch(["hello", "correct horse battery staple", "world"])

    assert stats.inputs_processed == 3
    assert stats.keys_generated == 3
    assert stats.matches_found == 1
    assert addr in buf.getvalue()


def test_tail_batch_masking(deriver):
    # range smaller than one batch and not divisible: no out-of-range keys
    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    spec = parse_transform("mt64")
    driver = ForwardDriver([spec], None, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(100, 136)
    assert stats.inputs_processed == 37
    assert stats.keys_generated == 37
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == 37
    assert lines[0].startswith("100,")
    assert lines[-1].startswith("136,")


@pytest.mark.slow   # XLA:CPU compile mass gates the fast tier's
# wall clock (200-340s each cold); the default TPU tier runs these
def test_hit_overflow_batch_loses_none(deriver):
    """>256 device hits in one superbatch must all be confirmed (r1 VERDICT:
    MAX_HITS_PER_BATCH truncation silently dropped hits)."""
    n_plant = 300  # > MAX_HITS_PER_BATCH=256, all inside one 512-batch
    addrs = []
    for s in range(1, n_plant + 1):
        key = s.to_bytes(32, "big")     # direct transform 'be' slot
        addrs.append(_plant_address(key, deriver))

    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses(addrs)
    spec = parse_transform("direct")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(1, 512)
    assert stats.matches_found == n_plant


def test_derive_matcher_falls_back_on_kernel_failure(deriver):
    """Accelerator-path failure degrades to the XLA-staged program instead
    of aborting the scan (reference: main.rs:1577-1594 GPU->CPU fallback)."""
    key = (123).to_bytes(32, "big")
    addr = _plant_address(key, deriver)

    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses([addr])
    spec = parse_transform("direct")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=512, inv_chunk=32)

    def boom(*a, **k):
        raise RuntimeError("injected Mosaic failure")

    driver.dm._fn = boom
    stats = driver.run_range(1, 256)
    assert stats.matches_found == 1


def test_all_unparseable_targets_scan_does_not_crash(deriver):
    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses(["not-an-address", "# nonsense"])
    spec = parse_transform("milksad")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=512, inv_chunk=32)
    stats = driver.run_range(1, 600)
    assert stats.inputs_processed == 600
    assert stats.matches_found == 0


def test_process_blob_applies_each_string_transform_once(deriver):
    """Two non-blob string transforms on one file input must each run exactly
    once (ADVICE r1: N^2 duplicate processing in process_blob)."""
    specs = [parse_transform("sha256"), parse_transform("md5")]
    n_slots = sum(len(s.string.slots) for s in specs)

    class CountingOutput:
        def __init__(self):
            self.keys = []

        def key(self, source, transform, derived):
            self.keys.append((source, transform))

        def hit(self, *a):
            pass

        def flush(self):
            pass

    out = CountingOutput()
    driver = StringDriver(specs, None, out, deriver)
    stats = driver.process_blob(b"some file bytes", "dir/file.txt")
    assert stats.keys_generated == n_slots
    assert len(out.keys) == n_slots
    assert len(set(out.keys)) == n_slots


def test_wordlist_scan_reports_progress(tmp_path):
    """Wordlist/stdin scans must render progress (reference: indicatif bars
    in every source, source/wordlist.rs + lib.rs:32-37) — round 2 only
    wired Progress into ranged forward runs."""
    import io

    from vuke_tpu.pipeline import StringDriver
    from vuke_tpu.progress import Progress
    from vuke_tpu.sources import WordlistSource
    from vuke_tpu.transforms.registry import parse_transform

    class NullOutput:
        def key(self, *a):
            pass

        def hit(self, *a):
            pass

        def flush(self):
            pass

    words = tmp_path / "w.txt"
    words.write_text("\n".join(f"word{i}" for i in range(50)) + "\n")
    buf = io.StringIO()
    progress = Progress(total=None, label="scan", stream=buf,
                        min_interval=0.0, enabled=True)
    # empty target set: the scan path is exercised without a device program
    sd = StringDriver([parse_transform("direct")], Matcher([]), NullOutput(),
                      progress=progress)
    stats = WordlistSource(str(words)).process(None, sd)
    progress.finish()
    assert stats.inputs_processed == 50
    assert progress.pos == 50
    out = buf.getvalue()
    assert "scan 50" in out and "/s" in out
