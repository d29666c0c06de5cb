"""Per-unit COLD-compile wall-time profiler for the tiled derive pipeline.

Round 3's driver benchmark died on a 26-33-minute cold compile of the
flagship program (VERDICT.md).  The pipeline is jitted as ONE program
(benchmark.bench_derive), so the total is XLA-compiling the outer graph
plus Mosaic-compiling the three embedded Pallas kernels — but nothing on
record says which piece burns the time.  This tool AOT-compiles each unit
separately against a FRESH persistent-cache directory (so every
measurement is honestly cold while the production .jax_cache stays
untouched) and prints a per-unit wall-time table.

Usage:  python tools/profile_compile.py [--batch 524288] [--units mt,smul,...]
Units:  mt, recode, smul, inv_affine (XLA graph, forced via
        VUKE_TPU_PALLAS_INV=0), inv_affine_pallas, hash160, full
(`full` is the entire bench_derive step — 26-33 min cold; off by default.)

Output: one JSON line per unit on stdout; progress on stderr.
"""

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 19)
    ap.add_argument("--units", default="mt,recode,smul,inv_affine,hash160")
    ap.add_argument("--wbits", type=int, default=10)
    ap.add_argument("--digits", default="odd")
    args = ap.parse_args()

    from vuke_tpu._cache import strip_mosaic_locations

    strip_mosaic_locations()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = tempfile.mkdtemp(prefix="vuke_coldcache_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[profile] cold cache dir: {cache_dir}", file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    print(f"[profile] device: {dev.device_kind} ({dev.platform})",
          file=sys.stderr, flush=True)

    n = args.batch
    nb = n // 1024
    wbits = args.wbits
    windows = -(-256 // wbits)
    signed = {"odd": "odd", "signed": True, "unsigned": False}[args.digits]

    S = jax.ShapeDtypeStruct
    u32 = jnp.uint32

    def timed(name, fn, *avals):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*avals)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        r = {"unit": name, "lower_s": round(t_lower, 2),
             "compile_s": round(t_compile, 2), "batch": n}
        try:
            cm = compiled.cost_analysis()
            if cm:
                r["flops"] = cm.get("flops")
        except Exception:
            pass
        print(json.dumps(r), flush=True)
        print(f"[profile] {name}: lower {t_lower:.1f}s  "
              f"compile {t_compile:.1f}s", file=sys.stderr, flush=True)
        return compiled

    units = [u.strip() for u in args.units.split(",") if u.strip()]

    for unit in units:
        if unit == "mt":
            from vuke_tpu.cores.pallas_kernels import _mt_call
            timed("mt_keygen_pallas", lambda s: _mt_call(n)(s),
                  S((nb, 8, 128), u32))
        elif unit == "recode":
            from vuke_tpu.ecc.tiled import _digits_t, _normalize_words_t
            timed("normalize+recode",
                  lambda w: _digits_t(_normalize_words_t(w), wbits, signed),
                  S((8, nb, 8, 128), u32))
        elif unit == "smul":
            from vuke_tpu.ecc.pallas_smul13 import (_smul13_call, _table13_i8)
            tab = jnp.asarray(_table13_i8(wbits, signed))
            call = _smul13_call(n, 1024, wbits, False, "i8", signed)
            timed(f"smul13_pallas_w{wbits}_{args.digits}",
                  lambda d: call(d, tab),
                  S((windows, nb, 8, 128), u32))
        elif unit == "inv_affine":
            # force the XLA graph branch — since ecc/pallas_inv.py,
            # _affine16 dispatches to the (seconds-fast) Pallas kernels on
            # Mosaic backends and would misreport the XLA cliff as gone
            os.environ["VUKE_TPU_PALLAS_INV"] = "0"
            try:
                from vuke_tpu.ecc.tiled import _affine16
                timed("inversion+affine_xla",
                      lambda X, Y, ZZ, ZZZ: tuple(
                          jnp.stack(r, 0) for r in _affine16(X, Y, ZZ, ZZZ)),
                      *[S((16, nb, 8, 128), u32)] * 4)
            finally:
                del os.environ["VUKE_TPU_PALLAS_INV"]
        elif unit == "inv_affine_pallas":
            from vuke_tpu.ecc.pallas_inv import affine16_pallas
            timed("inversion+affine_pallas",
                  lambda X, Y, ZZ, ZZZ: tuple(
                      jnp.stack(r, 0)
                      for r in affine16_pallas(X, Y, ZZ, ZZZ)),
                  *[S((16, nb, 8, 128), u32)] * 4)
        elif unit == "hash160":
            from vuke_tpu.cores.pallas_kernels import _hash160_call
            timed("hash160_pallas",
                  lambda x, y, p: _hash160_call(n)(x, y, p),
                  S((8, nb, 8, 128), u32), S((8, nb, 8, 128), u32),
                  S((nb, 8, 128), u32))
        elif unit == "full":
            from vuke_tpu.ecc.tiled import derive_hash160s_tiled
            timed("full_pipeline",
                  lambda seeds: derive_hash160s_tiled(seeds)["frag_c"][0]
                  .sum(dtype=u32),
                  S((n,), u32))
        else:
            print(f"[profile] unknown unit '{unit}'", file=sys.stderr)


if __name__ == "__main__":
    main()
