"""Test configuration.

Tests run on the default backend — in this image that is the single axon
TPU chip (a sitecustomize hook preimports jax and registers the TPU, so the
platform cannot be switched by env vars afterwards).  Compiles route through
the remote-compile service and are cached persistently across runs.

Multi-device sharding semantics are tested in a *subprocess* with an
8-device CPU host platform (tests/test_sharding.py) to keep the giant ECC
graphs off the slow CPU LLVM pipeline.

NOTE: the TPU is a single shared device — never run two JAX processes
concurrently (device grants serialize and everything looks hung).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vuke_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
