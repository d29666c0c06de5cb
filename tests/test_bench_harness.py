"""Bench-harness regression guards.

Round 3 shipped a 28x headline regression because of *harness* defects,
not kernel defects: the stage order put the known-best mode last, and the
insurance retry could never fire once the budget was spent.  These tests
make the harness contract CI-checkable so a stage-ordering or budget
regression fails a push instead of a round (the reference runs criterion
benches on every push for the same reason —
/root/reference/.github/workflows/codspeed.yml).
"""

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def _sweep_best_tiled_mode():
    """The fastest tiled mode according to the committed TPU sweep data."""
    path = os.path.join(_REPO, "docs", "batch_sweep_tpu.json")
    with open(path) as f:
        data = json.load(f)
    tiled = [r for r in data["results"]
             if r["mode"].startswith("tiled") and r["mode"] != "tiled_seq"
             and r.get("clean_run")]   # tiled_seq is its own metric
             # (sequential-scan), never the headline candidate
    assert tiled, "no tiled sweep rows committed"
    return max(tiled, key=lambda r: r["derivations_per_sec"])["mode"]


def test_stage_order_starts_with_measured_best():
    """The first tiled stage in the default list must be the mode the
    committed sweep says is fastest — the driver must always race the
    best-known kernel first, never a known-slower default."""
    stages = [s.strip() for s in bench.DEFAULT_STAGES.split(",")]
    first_tiled = next(s for s in stages
                       if s.startswith("tiled") and s != "tiled_seq")
    assert first_tiled == _sweep_best_tiled_mode()


def test_stage_list_has_insurance_and_seq():
    """xla (the guaranteed cheap first line) must lead; tiled_seq (the
    sequential-scan metric) must be present so BENCH_r* carries it."""
    stages = [s.strip() for s in bench.DEFAULT_STAGES.split(",")]
    assert stages[0] == "xla"
    assert "tiled_seq" in stages


def test_insurance_reserve_is_funded():
    """The reserve held back from the first tiled stage must be enough for
    the retry gate, or the insurance can never fire (the round-3 bug)."""
    assert bench._INSURANCE_RESERVE_S > 200.0
    assert bench._XLA_CAP_S + bench._INSURANCE_RESERVE_S < 1200.0, (
        "xla cap + reserve must leave the headline stage a real window "
        "inside the driver's 1500s budget")


def test_stage_subprocess_produces_parseable_result():
    """End-to-end harness smoke on the CPU backend: the exact subprocess
    bench.py spawns must print a JSON line with derivations_per_sec.  Uses
    the non-tiled xla mode (Pallas needs Mosaic) at a tiny batch; XLA:CPU
    compiles are shared with the rest of the fast tier via the persistent
    cache."""
    import subprocess

    from vuke_tpu._cache import apply_cpu_compile_flags

    # force the host platform: this is a harness smoke, it must never
    # contend for the single shared TPU; fresh subprocess so the env var
    # IS honored.  The canonical compile-speed flags (idempotent — they
    # may already be in XLA_FLAGS from conftest) keep XLA:CPU quick.
    apply_cpu_compile_flags()
    env = dict(os.environ, VUKE_BENCH_BATCH="2048", VUKE_BENCH_SECONDS="1",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "vuke_tpu._bench_stage", "xla"],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    r = json.loads(line)
    assert r["derivations_per_sec"] > 0
    assert r["mode"] == "xla"


def test_emit_vs_baseline_math():
    """vs_baseline must scale the 100M/s v5p-8 target by local peak
    TFLOPs: one v5e chip (197 TF) against v5p-8 (4x459 TF)."""
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit({"derivations_per_sec": 10.73e6,
                     "device_kind": "TPU v5 lite", "n_devices": 1,
                     "mode": "tiled_odd"})
    out = json.loads(buf.getvalue())
    expected = 10.73e6 / (100e6 * 197.0 / (4 * 459.0))
    assert out["vs_baseline"] == pytest.approx(expected)
    assert out["metric"] == "seed_to_hash160_derivations_per_sec"
