"""Multi-device sharding semantics on an 8-device CPU mesh (subprocess).

Runs in a subprocess because the parent test process is bound to the TPU
backend; the child forces the CPU host platform with 8 virtual devices and
verifies a sharded keygen+match step (cheap kernels — the full fused ECC
step on the CPU mesh is exercised by the driver's dryrun_multichip).
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.environ["VUKE_REPO"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from vuke_tpu.parallel.mesh import get_mesh, seeds_sharding
from vuke_tpu.cores.mt19937 import milksad_key_words
from vuke_tpu.cores.common import key_bytes_to_words

assert len(jax.devices()) == 8, jax.devices()
mesh = get_mesh()
sharding = seeds_sharding(mesh)

batch = 1024
offs = jax.device_put(np.arange(batch, dtype=np.uint32), sharding)

# plant: the MT19937 key for seed 777 must be found by the sharded scan
target_words = key_bytes_to_words(bytes.fromhex(os.environ["TARGET_KEY_HEX"]))

@jax.jit
def step(start, offs, tw):
    seeds = start + offs
    kw = milksad_key_words(seeds, n_keys=1)[:, 0, :]
    ok = jnp.all(kw == tw[None, :], axis=-1)
    return ok.sum(), jnp.argmax(ok)

count, idx = step(jnp.uint32(0), offs, jnp.asarray(target_words))
# verify the lattice really was sharded over 8 devices
arr = offs
assert len(arr.sharding.device_set) == 8, arr.sharding
print("count", int(count), "seed", int(idx))
assert int(count) == 1 and int(idx) == 777
print("SHARDING-OK")
"""


@pytest.mark.parametrize("seed", [777])
def test_sharded_scan_finds_planted_key(seed):
    sys.path.insert(0, os.path.dirname(__file__))
    import oracles
    key = oracles.MT19937(seed).fill_bytes(32)
    env = dict(os.environ)
    env["VUKE_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["TARGET_KEY_HEX"] = key.hex()
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                       capture_output=True, text=True, timeout=500)
    assert "SHARDING-OK" in r.stdout, f"stdout: {r.stdout}\nstderr: {r.stderr[-2000:]}"
