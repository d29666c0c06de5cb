"""Lazy module proxies for jax — keeps the CLI's host-only paths fast.

The image's sitecustomize preimports jax into every Python process, but
``vuke single`` (and the ``./vuke`` launcher's ``python -S`` fast path,
which skips sitecustomize entirely) must not *re-trigger* a jax import
through the transform registry: single-key derivation is pure host code
(hashlib + bignum EC), and the reference's ``single`` is instant
(/root/reference/src/main.rs:954-992).  Modules on the registry's import
chain use these proxies so jax loads on first *device* use, not at
import time (tests/test_host_fast.py pins the jax-free import chain).
"""

from __future__ import annotations

import contextlib
import contextvars
import importlib

# when set, the proxies resolve to the numpy shim (vuke_tpu/_npshim.py)
# instead of jax — eager numpy execution of the transform cores
_np_mode: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "vuke_numpy_backend", default=False)


class _LazyModule:
    """Defers the import to first attribute access; transparent afterwards."""

    __slots__ = ("_name", "_mod")

    def __init__(self, name: str):
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_mod", None)

    def _load(self):
        mod = object.__getattribute__(self, "_mod")
        if mod is None:
            mod = importlib.import_module(object.__getattribute__(self, "_name"))
            object.__setattr__(self, "_mod", mod)
        return mod

    def __getattr__(self, attr):
        if _np_mode.get():
            from . import _npshim
            name = object.__getattribute__(self, "_name")
            shim = _npshim.jnp_shim if name == "jax.numpy" else _npshim.jax_shim
            return getattr(shim, attr)
        return getattr(self._load(), attr)


@contextlib.contextmanager
def numpy_backend():
    """Execute transform-core code in eager numpy (no jax, no compile).

    Only valid around code written against these lazy proxies (cores/*,
    transforms/numeric.py); inside the context, ``jnp.*`` is numpy and
    ``jax.lax.*`` is the shim's python-loop emulation."""
    token = _np_mode.set(True)
    try:
        yield
    finally:
        _np_mode.reset(token)


jax = _LazyModule("jax")
jnp = _LazyModule("jax.numpy")
