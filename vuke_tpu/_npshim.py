"""Numpy execution backend for the elementwise transform cores.

The numeric transforms (cores/*, transforms/numeric.py) are pure
elementwise math written against the lazy ``jnp``/``jax`` proxies
(vuke_tpu/_lazy.py).  Inside :func:`numpy_backend` those proxies resolve
HERE instead, so the same transform code executes eagerly in numpy — no
XLA:CPU compile at all.  That matters because cold LLVM compiles of the
keygen graphs cost minutes on the CPU backend (a first sha256-transform
generate measured 6m35s of pure compile), while the numpy execution of
the same batch takes milliseconds.  Used by the CPU scan path
(pipeline._keygen_program); parity with the jitted jax programs is
pinned per-transform in tests/test_numpy_backend.py.

Only the API surface the cores actually use is implemented — adding an
op here requires adding it to the parity test too.
"""

from __future__ import annotations

import numpy as np


class _LaxShim:
    @staticmethod
    def rem(a, b):
        return np.remainder(a, b)

    @staticmethod
    def dynamic_index_in_dim(operand, index, axis=0, keepdims=True):
        idx = int(index)
        taken = np.take(operand, idx, axis=axis)
        if keepdims:
            taken = np.expand_dims(taken, axis)
        return taken

    @staticmethod
    def dynamic_update_index_in_dim(operand, update, index, axis):
        out = np.array(operand, copy=True)
        idx = [slice(None)] * out.ndim
        idx[axis] = int(index)
        out[tuple(idx)] = update
        return out

    @staticmethod
    def fori_loop(lower, upper, body_fun, init_val, unroll=None):
        val = init_val
        for i in range(int(lower), int(upper)):
            val = body_fun(i, val)
        return val

    @staticmethod
    def scan(f, init, xs=None, length=None, unroll=None):
        carry = init
        ys = []
        n = length if xs is None else (
            len(xs[0]) if isinstance(xs, (tuple, list)) else len(xs))
        for i in range(n):
            if xs is None:
                x = None
            elif isinstance(xs, (tuple, list)):
                x = tuple(a[i] for a in xs)
            else:
                x = xs[i]
            carry, y = f(carry, x)
            ys.append(y)
        if ys and ys[0] is not None:
            if isinstance(ys[0], (tuple, list)):
                stacked = tuple(np.stack([y[j] for y in ys])
                                for j in range(len(ys[0])))
            else:
                stacked = np.stack(ys)
        else:
            stacked = None
        return carry, stacked

    @staticmethod
    def switch(index, branches, *operands):
        return branches[int(index)](*operands)


class _Device:
    platform = "cpu"


class _JaxShim:
    lax = _LaxShim()

    @staticmethod
    def devices():
        return [_Device()]

    @staticmethod
    def jit(fn, **kwargs):
        return fn


class _JnpShim:
    """Attribute-for-attribute numpy; the cores only use ops numpy has."""

    def __getattr__(self, name):
        return getattr(np, name)


jax_shim = _JaxShim()
jnp_shim = _JnpShim()
