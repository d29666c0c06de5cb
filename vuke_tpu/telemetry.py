"""Structured logging + profiler hooks.

The reference declares tracing deps but never uses them (SURVEY.md §5 —
observability is progress bars + eprintln).  Here logging and profiling are
first-class: ``setup_logging`` configures structured stderr logging
(VUKE_TPU_LOG=debug|info|...), ``profile_trace`` wraps a region in a JAX
profiler trace (view with TensorBoard/xprof), and ``Metrics`` is a tiny
counter registry the drivers can export.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import threading
import time
from typing import Dict, Optional

_LOGGER = logging.getLogger("vuke_tpu")


def setup_logging(level: Optional[str] = None) -> logging.Logger:
    level = level or os.environ.get("VUKE_TPU_LOG", "warning")
    numeric = getattr(logging, level.upper(), logging.WARNING)
    if not _LOGGER.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        _LOGGER.addHandler(h)
    _LOGGER.setLevel(numeric)
    return _LOGGER


def log() -> logging.Logger:
    return _LOGGER


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str] = None):
    """JAX profiler trace around a region (xprof-compatible).

    Enabled when ``out_dir`` or VUKE_TPU_PROFILE_DIR is set; otherwise a
    no-op, so drivers can wrap hot loops unconditionally.
    """
    out_dir = out_dir or os.environ.get("VUKE_TPU_PROFILE_DIR")
    if not out_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Thread-safe counters/gauges with JSON export."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = {}
        self._t0 = time.time()

    def inc(self, name: str, value: float = 1.0):
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def set(self, name: str, value: float):
        with self._lock:
            self._counters[name] = value

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            out = dict(self._counters)
        out["uptime_secs"] = time.time() - self._t0
        return out

    def dump_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)


METRICS = Metrics()
