"""CLI smoke tests via click's test runner (host-fast command paths)."""

import json

import pytest
from click.testing import CliRunner

from vuke_tpu.cli import cli


@pytest.fixture()
def runner():
    return CliRunner()


def test_single_golden_vector(runner):
    r = runner.invoke(cli, ["single", "correct horse battery staple",
                            "--transform", "sha256"])
    assert r.exit_code == 0, r.output
    assert "5KJvsngHeMpm884wtkJNzQGaCErckhHJBGFsvd3VyK5qMZXj3hS" in r.output
    assert "1JwSSubhmg6iPtRjtyqhUYYH7bZg3Lfy1T" in r.output
    assert 'Passphrase: "correct horse battery staple"' in r.output


def test_single_unknown_transform(runner):
    r = runner.invoke(cli, ["single", "x", "--transform", "nope"])
    assert r.exit_code != 0
    assert "Unknown transform" in r.output


def test_single_testnet_network(runner):
    r = runner.invoke(cli, ["single", "hello", "--transform", "sha256",
                            "--network", "testnet"])
    assert r.exit_code == 0
    # testnet addresses start with m/n, WIF with 9/c, bech32 with tb1
    assert "tb1" in r.output


def test_analyze_fast_json(runner):
    r = runner.invoke(cli, ["analyze", "0x2a", "--fast", "--json"])
    assert r.exit_code == 0, r.output
    data = json.loads(r.output[r.output.index("{"):])
    assert data["bit_length"] == 6
    statuses = {x["analyzer"]: x["status"] for x in data["results"]}
    assert statuses == {"direct": "possible", "heuristic": "possible"}


def test_analyze_invalid_key(runner):
    r = runner.invoke(cli, ["analyze", "zzz", "--fast"])
    assert r.exit_code != 0


def test_analyze_cascade_validation(runner):
    r = runner.invoke(cli, ["analyze", "0x2a", "--fast", "--cascade", "5:0x15"])
    assert r.exit_code != 0  # cascade needs >= 2 targets


def test_query_cli(runner, tmp_path):
    from vuke_tpu.derive import KeyDeriver
    from vuke_tpu.storage import ParquetBackend, StorageOutput
    out = StorageOutput(ParquetBackend(tmp_path))
    d = KeyDeriver().derive(b"\x03" * 32)
    for i in range(3):
        out.key(str(i), "md5", d)
    out.finish()
    r = runner.invoke(cli, ["query", str(tmp_path),
                            "SELECT COUNT(*) AS n FROM results", "-f", "json"])
    assert r.exit_code == 0, r.output
    assert json.loads(r.output[r.output.index("["):])[0]["n"] == 3
    r = runner.invoke(cli, ["query", str(tmp_path), "--schema"])
    assert r.exit_code == 0
    assert "private_key_raw" in r.output


def test_scan_missing_targets(runner):
    r = runner.invoke(cli, ["scan", "range", "--start", "1", "--end", "10"])
    assert r.exit_code != 0


def test_help_surfaces(runner):
    for cmd in ([], ["generate"], ["scan"], ["analyze"], ["query"], ["bench"]):
        r = runner.invoke(cli, cmd + ["--help"])
        assert r.exit_code == 0


@pytest.mark.slow   # XLA:CPU compile mass gates the fast tier's
# wall clock (200-340s each cold); the default TPU tier runs these
def test_scan_checkpoint_manifest(runner, tmp_path):
    """scan --checkpoint writes a manifest covering the whole range; a rerun
    with the same manifest reprocesses nothing."""
    import json as _json
    import os

    targets = tmp_path / "targets.txt"
    targets.write_text("1BitcoinEaterAddressDontSendf59kuE\n")
    ckpt = tmp_path / "scan.json"
    args = ["scan", "--transform", "direct", "--batch", "512",
            "--checkpoint", str(ckpt), "--targets", str(targets),
            "range", "--start", "1", "--end", "600"]
    r = runner.invoke(cli, args)
    assert r.exit_code == 0, r.output
    data = _json.loads(ckpt.read_text())
    assert data["completed"] == [[1, 600]]

    r2 = runner.invoke(cli, args)
    assert r2.exit_code == 0, r2.output
    assert "Inputs: 0," in r2.output  # fully resumed


@pytest.mark.slow   # XLA:CPU compile mass gates the fast tier's
# wall clock (200-340s each cold); the default TPU tier runs these
def test_generate_output_file_closed(runner, tmp_path):
    out_path = tmp_path / "keys.txt"
    r = runner.invoke(cli, ["generate", "--transform", "direct", "--batch", "512",
                            "-o", str(out_path),
                            "range", "--start", "1", "--end", "10"])
    assert r.exit_code == 0, r.output
    lines = [l for l in out_path.read_text().splitlines() if l]
    assert len(lines) == 30  # direct emits be/le/string slots per seed


def test_single_never_touches_device(runner, monkeypatch):
    """`single` must be instant: a 1-string digest takes the host-oracle
    path unconditionally (reference `single` is instant, main.rs:954-992).
    Round-2 regression: it blocked minutes on a remote device compile."""
    import vuke_tpu.transforms.strings as strings

    def _boom(*a, **k):
        raise AssertionError("single routed a tiny batch to the device")

    monkeypatch.setattr(strings, "_sha256_jit", _boom)
    monkeypatch.setattr(strings, "_sha256d_jit", _boom)
    monkeypatch.setattr(strings, "_md5_jit", _boom)
    for t in ("sha256", "double_sha256", "md5", "sha256_chain:iterated"):
        r = runner.invoke(cli, ["single", "abc", "--transform", t])
        assert r.exit_code == 0, r.output
    r = runner.invoke(cli, ["single", "correct horse battery staple",
                            "--transform", "sha256"])
    assert "L3p8oAcQTtuokSCRHQ7i4MhjWc9zornvpJLfmg62sYpLRJF9woSu" in r.output


def test_host_digest_matches_device_path(monkeypatch):
    """Host hashlib fast path is bit-identical to the device bucket path."""
    import numpy as np
    from vuke_tpu.transforms import strings

    datas = [b"", b"abc", b"x" * 55, b"y" * 56, b"z" * 200]
    host = {a: strings._host_digest(datas, a)
            for a in ("sha256", "double_sha256", "md5")}
    monkeypatch.setenv("VUKE_HOST_DIGEST_MAX", "0")
    for algo, h in host.items():
        dev = strings.batched_digest(datas, algo)
        assert dev.dtype == np.uint32
        np.testing.assert_array_equal(np.asarray(h, dtype=np.uint32), dev)


def test_bench_transform_electrum():
    """bench_transform must measure string-only transforms over decimal
    inputs (benchmark.rs feeds every transform through apply_batch) — the
    round-2 string-bench path had no unit test."""
    from vuke_tpu.benchmark import bench_transform

    r = bench_transform("electrum", batch=2, warmup_s=0.0, measure_s=0.01)
    assert r["transform"] == "electrum"
    assert r["inputs_per_sec"] > 0
    assert r["keys_per_sec"] == r["inputs_per_sec"] * 20  # 20 derivations/seed
    assert r["batch"] == 2
