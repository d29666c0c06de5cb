"""Persistent-compile-cache key stability.

Round 3's driver benchmark shipped 0.33M/s instead of the warmed 11.2M/s
because a commit *after* the last cache warm-up shifted source lines in
pipeline files, changing the cache key and forcing a 26-33-minute cold
Mosaic recompile inside the driver's 1500s window.  The root cause: a
Pallas kernel is serialized (locations and all) into the
``tpu_custom_call`` backend_config, where JAX's own strip-debuginfo
canonicalization cannot reach.  ``vuke_tpu._cache.strip_mosaic_locations``
strips the Mosaic module before serialization; these tests pin the
property that makes warm benches survive commits:

  the computation component of the compile-cache key is identical for
  byte-identical computations regardless of source-line position.

Each scenario lowers (never compiles) a Pallas kernel for the TPU target
in a fresh subprocess — Mosaic lowering is pure Python/MLIR and needs no
device — and hashes the exact bytes JAX's cache key hashes
(jax._src.cache_key._canonicalize_ir).
"""

import hashlib
import os
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KERNEL_MODULE = """\
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def kern(x_ref, o_ref):
    t = x_ref[...] * jnp.float32(3.0)
    o_ref[...] = t + jnp.float32(1.0)

def f(x):
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
"""

_DRIVER = """\
import hashlib, sys
sys.path.insert(0, {repo!r})
if {patch}:
    from vuke_tpu._cache import strip_mosaic_locations
    strip_mosaic_locations()
import jax, jax.numpy as jnp
from jax._src import cache_key
import kmod
x = jnp.ones((8, 128), jnp.float32)
lowered = jax.jit(kmod.f).trace(x).lower(lowering_platforms=("tpu",))
blob = cache_key._canonicalize_ir(
    lowered.compiler_ir(), cache_key.IgnoreCallbacks.NO)
print(hashlib.sha256(blob).hexdigest())
"""


def _lowered_key(tmp_path, shift_lines: int, patch: bool) -> str:
    """sha256 of the canonicalized compiler input for the toy kernel,
    with its defining module shifted down by ``shift_lines`` lines."""
    mod_dir = tmp_path / f"shift{shift_lines}_{patch}"
    mod_dir.mkdir()
    (mod_dir / "kmod.py").write_text("# pad\n" * shift_lines + _KERNEL_MODULE)
    driver = _DRIVER.format(repo=_REPO, patch=patch)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=str(mod_dir) + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run([sys.executable, "-c", driver], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout.strip().splitlines()[-1]


def test_key_stable_across_line_shifts(tmp_path):
    """With the strip patch, shifting a kernel's source 7 lines down leaves
    the cache-key computation hash bit-identical; without it the hash
    moves (which is the round-3 failure mode — this half proves the test
    has teeth, not just that two runs agree)."""
    base = _lowered_key(tmp_path, 0, patch=True)
    shifted = _lowered_key(tmp_path, 7, patch=True)
    assert base == shifted, (
        "Mosaic payload still depends on source-line positions: a commit "
        "after warm-up would void the compile cache again")
    unpatched = _lowered_key(tmp_path, 7, patch=False)
    assert unpatched != base, (
        "unpatched lowering no longer embeds locations — jax behavior "
        "changed; re-evaluate whether strip_mosaic_locations is needed")


def test_strip_patch_installed_by_enable_compile_cache():
    """enable_compile_cache (called by every entry point: CLI, bench
    stages, tests, tools) must install the location-stripping wrapper."""
    from vuke_tpu._cache import enable_compile_cache

    enable_compile_cache()
    import jax._src.tpu_custom_call as tcc

    assert getattr(tcc._lower_mosaic_module_to_asm,
                   "_vuke_strips_locations", False)


@pytest.mark.slow
def test_flagship_pipeline_lowering_is_location_free(tmp_path):
    """The real tiled pipeline (the program bench.py's tiled_odd stage
    compiles) lowers to the same canonicalized bytes from two processes
    importing the package from different sys.path orderings — a smoke
    check that nothing else on the hot path leaks process-varying state
    into the compiler input."""
    driver = textwrap.dedent("""\
        import hashlib, sys
        sys.path.insert(0, {repo!r})
        from vuke_tpu._cache import strip_mosaic_locations
        strip_mosaic_locations()
        import os
        os.environ["VUKE_TPU_DIGITS"] = "odd"
        import jax, jax.numpy as jnp, numpy as np
        from jax._src import cache_key
        from vuke_tpu.ecc.tiled import derive_hash160s_tiled

        def body(seeds):
            d = derive_hash160s_tiled(seeds)
            return (d["frag_c"][0].sum(dtype=jnp.uint32),
                    d["frag_u"][0].sum(dtype=jnp.uint32))

        seeds = jnp.asarray(np.arange(2048, dtype=np.uint32))
        lowered = jax.jit(body).trace(seeds).lower(
            lowering_platforms=("tpu",))
        blob = cache_key._canonicalize_ir(
            lowered.compiler_ir(), cache_key.IgnoreCallbacks.NO)
        print(hashlib.sha256(blob).hexdigest())
    """).format(repo=_REPO)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    hashes = []
    for _ in range(2):
        proc = subprocess.run([sys.executable, "-c", driver], env=env,
                              capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stderr[-2000:]
        hashes.append(proc.stdout.strip().splitlines()[-1])
    assert hashes[0] == hashes[1]
