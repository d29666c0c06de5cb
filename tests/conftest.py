"""Test configuration.

Two tiers:

- Default: tests run on the default backend — in this image that is the
  single axon TPU chip (a sitecustomize hook preimports jax and registers
  the TPU; compiles route through the remote-compile service and are cached
  persistently across runs).
- Fast tier: ``VUKE_TEST_PLATFORM=cpu`` (what ``make test-fast`` sets)
  switches the whole process to the CPU host platform with 8 virtual
  devices *before* any backend initialization.  Tests marked
  ``tpu_only`` are skipped there; everything else runs in seconds.

Multi-device sharding semantics are additionally tested in a *subprocess*
with an 8-device CPU host platform (tests/test_sharding.py) to keep the
giant ECC graphs off the slow CPU LLVM pipeline.

NOTE: the TPU is a single shared device — never run two JAX processes
concurrently (device grants serialize and everything looks hung).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vuke_tpu._cache import apply_cpu_compile_flags, enable_compile_cache

enable_compile_cache()

_CPU = os.environ.get("VUKE_TEST_PLATFORM", "") == "cpu"
if _CPU:
    # string drivers pad to the numeric drivers' test batch so both share
    # every expensive ECC compilation (XLA:CPU compiles are the tier's
    # wall clock; see pipeline.StringDriver)
    os.environ.setdefault("VUKE_STRING_PAD", "512")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["XLA_FLAGS"] = flags
    # AVX2 pin + -O1 codegen (shared with the --no-tpu CLI backend):
    # stable AOT cache keys and no pathological LLVM -O3 compiles
    apply_cpu_compile_flags()
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu_only: needs the real TPU (Pallas/Mosaic kernels)")
    config.addinivalue_line(
        "markers", "slow: long-running even on TPU (full sweeps, big compiles)")


def _mosaic_capable() -> bool:
    """True when the default backend can lower Pallas kernels."""
    if _CPU:
        return False
    import jax

    return jax.devices()[0].platform in ("tpu", "axon")


def pytest_collection_modifyitems(config, items):
    if not any("tpu_only" in item.keywords for item in items):
        return
    if _mosaic_capable():
        return
    skip = pytest.mark.skip(reason="tpu_only: no Mosaic-capable backend")
    for item in items:
        if "tpu_only" in item.keywords:
            item.add_marker(skip)
