"""Persistent-compile-cache activation that works on this image.

The image's sitecustomize preimports jax before any user code runs, so the
usual ``JAX_COMPILATION_CACHE_DIR`` env vars are read *too early* and
silently do nothing — ``jax.config.update`` after import is the only way
the cache actually engages (round 1 shipped with the env-var approach and
every process paid full Mosaic recompiles).

This module also makes the cache key *stable across source-line shifts*
(`strip_mosaic_locations`).  JAX's own key computation already runs MLIR's
``strip-debuginfo`` on the outer StableHLO module, but a Pallas kernel is
embedded as a *serialized* Mosaic module inside a custom call's
``backend_config`` — opaque bytes the outer pass cannot reach, carrying
every kernel source location.  Any edit that shifted a line in a file
containing (or transitively traced into) a Pallas kernel therefore changed
the key and forced a full 26-33-minute Mosaic recompile; round 3's
driver benchmark ran fully cold for exactly this reason (a 16:49 commit
after the 16:06 warm-up, BENCH_r03 0.33M/s vs the warmed 11.2M/s).
Stripping debug locations from the Mosaic module *before* serialization
removes the instability at the source: byte-identical payloads for
byte-identical computations, regardless of where the code sits in a file.
Verified: a 3-line shift in a kernel file changes the lowered module
without the patch and leaves it bit-identical with it
(tests/test_cache_key.py).
"""

import os

# Lives inside the repo (gitignored): /tmp is wiped across machine restarts
# and a cold cache costs minutes of Mosaic recompiles per program.  Cache
# entries are keyed by computation hash, not path, so dirs are mergeable.
_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CACHE_DIR = os.environ.get("VUKE_JAX_CACHE_DIR",
                                   os.path.join(_REPO_DIR, ".jax_cache"))

_done = False
_strip_done = False


def strip_mosaic_locations() -> None:
    """Strip debug locations from Mosaic modules before they are serialized
    into ``tpu_custom_call`` backend configs, so the persistent-cache key
    depends only on the computation, never on source-line positions.

    Locations are used only for Mosaic diagnostics; semantics are
    untouched (strip-debuginfo is the same pass JAX's cache key already
    applies to the outer module).  Disable with VUKE_STRIP_MOSAIC_LOCS=0
    to restore file:line info in Mosaic error messages."""
    global _strip_done
    if _strip_done:
        return
    _strip_done = True
    if os.environ.get("VUKE_STRIP_MOSAIC_LOCS", "1") in ("0", "false", "no"):
        return
    try:
        from typing import cast as type_cast

        import jax._src.tpu_custom_call as tcc
        from jax._src.lib.mlir import ir
        from jax._src.lib.mlir import passmanager as pm

        orig = tcc._lower_mosaic_module_to_asm
        if getattr(orig, "_vuke_strips_locations", False):
            return

        def stripped_lower(module, *args, **kwargs):
            # forward *args/**kwargs verbatim so a jax upgrade that changes
            # _lower_mosaic_module_to_asm's keyword surface degrades to
            # unstripped lowering instead of a TypeError at compile time
            try:
                with module.context:
                    cloned = module.operation.clone()
                    pm.PassManager.parse(
                        "builtin.module(strip-debuginfo)").run(cloned)
                    module = type_cast(ir.Module, cloned)
            except Exception:
                pass  # fall through with the original (located) module
            return orig(module, *args, **kwargs)

        stripped_lower._vuke_strips_locations = True
        tcc._lower_mosaic_module_to_asm = stripped_lower
    except Exception:
        pass


def apply_cpu_compile_flags() -> None:
    """XLA:CPU compile-speed knobs, shared by the fast test tier and the
    ``--no-tpu`` CLI backend.

    - ``xla_cpu_max_isa=AVX2``: without a pinned ISA, AOT cache entries
      embed tuning pseudo-features (+prefer-no-gather) that fail the
      load-time host feature check, so the persistent cache silently
      recompiled every big program (~80-190s each).
    - ``xla_backend_optimization_level=1``: LLVM -O3 hits a pathological
      pattern on PRNG-chain + reduce fusions (a single sweep step compiled
      >6 min with a "Very slow compile" alarm).  A CPU scan wants compile
      speed, not peak CPU codegen — the reference's CPU path starts
      instantly (source/range.rs:36-70), and round 3's first --no-tpu
      planted-hit scan cost 4m04s of compiles without these flags.

    Safe to call after jax is (pre)imported: XLA_FLAGS is parsed when the
    CPU client initializes, which happens on first device use."""
    import platform
    flags = os.environ.get("XLA_FLAGS", "")
    # the ISA pin is an x86-ism; on aarch64 hosts XLA:CPU would at best
    # ignore and at worst reject it
    if ("xla_cpu_max_isa" not in flags
            and platform.machine().lower() in ("x86_64", "amd64")):
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    if "xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=1").strip()
    os.environ["XLA_FLAGS"] = flags


def enable_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    global _done
    strip_mosaic_locations()
    if _done:
        return
    _done = True
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    except Exception:
        pass
