"""shard_map x the production Pallas tiled pipeline (VERDICT r4 #2).

Round 4 validated multi-device sharding only for the XLA fallback path;
the tiled Pallas pipeline — what every real TPU deployment runs — was
never executed under shard_map at N>1.  This test runs
``derive_hash160s_tiled`` per-shard on a 2-device mesh in TPU interpret
mode and pins lane-exact equality with the XLA path.

Marked slow: the interpret-mode compile of the smul13 kernel costs
minutes cold on XLA:CPU (cached afterwards in .jax_cache).  The same
composition also runs in the driver's dryrun_multichip when
VUKE_DRYRUN_TILED=1.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
sys.path.insert(0, %(repo)r)
from vuke_tpu._cache import enable_compile_cache, apply_cpu_compile_flags
apply_cpu_compile_flags()
import jax
jax.config.update("jax_platforms", "cpu")
enable_compile_cache()
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import jax.experimental.pallas.tpu as pltpu

from vuke_tpu.ecc.tiled import derive_hash160s_tiled
from vuke_tpu.cores.mt19937 import milksad_key_words
from vuke_tpu.ecc.pubkey import derive_hash160s, normalize_scalar

devices = jax.devices()[:2]
mesh = Mesh(np.array(devices), ("seeds",))
seeds = np.arange(1, 2 * 1024 + 1, dtype=np.uint32)

def shard_body(s):
    d = derive_hash160s_tiled(s)
    return d["h160c"], d["h160u"]

f = jax.shard_map(shard_body, mesh=mesh, in_specs=P("seeds"),
                  out_specs=(P("seeds"), P("seeds")), check_vma=False)
with pltpu.force_tpu_interpret_mode():
    hc, hu = jax.jit(f)(jnp.asarray(seeds))
    hc, hu = np.asarray(hc), np.asarray(hu)

kw = milksad_key_words(jnp.asarray(seeds), n_keys=1)[:, 0, :]
d = derive_hash160s(normalize_scalar(kw), inv_chunk=8)
assert np.array_equal(hc, np.asarray(d["h160c"])), "h160c mismatch"
assert np.array_equal(hu, np.asarray(d["h160u"])), "h160u mismatch"
print("SHARDED_TILED_PARITY_OK")
"""


def test_tiled_pipeline_under_shard_map():
    """2-device mesh, per-shard Pallas tiled derive == XLA reference."""
    code = _PROBE % {"repo": REPO}
    env = dict(os.environ)
    env.pop("VUKE_TEST_PLATFORM", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=3600, cwd=REPO)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "SHARDED_TILED_PARITY_OK" in r.stdout
