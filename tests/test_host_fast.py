"""Pins the jax-free host fast path used by the ./vuke launcher.

``vuke single`` is pure host code (hashlib digests + bignum EC); the
launcher runs it under ``python -S`` where jax CANNOT load (the axon
PJRT plugin registers via sitecustomize, which -S skips), so any jax
import on this chain is a hard failure in production, not a slowdown.
These tests enforce the jax-free import chain in a subprocess and check
the fast-path output byte-matches the reference vector
(/root/reference/README.md:76-93).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# run the probe under `python -S` with a minimal path so the probe itself
# controls every import; site-packages location comes from this process
SITE_DIRS = [p for p in sys.path if p.endswith("site-packages")]


def _run_hostonly(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([REPO] + SITE_DIRS)
    return subprocess.run([sys.executable, "-S", "-c", code],
                          capture_output=True, text=True, env=env, timeout=120)


def test_transform_registry_imports_without_jax():
    code = """
import sys
from vuke_tpu.transforms import parse_transform
names = ['sha256', 'double_sha256', 'md5', 'direct', 'direct:be',
         'sha256_chain', 'sha256_chain:indexed:le', 'electrum',
         'electrum:change', 'multibit', 'armory', 'bitimage',
         'lcg:glibc:le', 'xorshift:xoroshiro', 'milksad', 'mt64']
for t in names:
    parse_transform(t)
    assert 'jax' not in sys.modules, f'jax imported while parsing {t}'
print('OK')
"""
    r = _run_hostonly(code)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_single_key_paths_stay_jax_free():
    """String-transform key generation + full host derive never import jax."""
    code = """
import sys
from vuke_tpu.transforms import parse_transform
from vuke_tpu.cores.common import key_words_to_bytes
from vuke_tpu.derive import KeyDeriver
d = KeyDeriver()
for t in ['sha256', 'double_sha256', 'md5', 'direct', 'sha256_chain',
          'electrum', 'armory']:
    spec = parse_transform(t)
    kw = spec.string.fn(['abc'])
    if kw.shape[1]:
        d.derive(key_words_to_bytes(kw[0, 0]))
    assert 'jax' not in sys.modules, f'jax imported running {t}'
print('OK')
"""
    r = _run_hostonly(code)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_launcher_single_reference_vector():
    """./vuke single through the -S fast path, byte-exact golden output."""
    vuke = os.path.join(REPO, "vuke")
    if not os.path.exists(vuke):
        pytest.skip("launcher missing")
    r = subprocess.run(
        [vuke, "single", "correct horse battery staple", "--transform", "sha256"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    # /root/reference/README.md:76-93 vector
    assert ("c4bbcb1fbec99d65bf59d85c8cb62ee2"
            "db963f0fe106f483d9afa73bd4e39a8a") in out
    assert "L3p8oAcQTtuokSCRHQ7i4MhjWc9zornvpJLfmg62sYpLRJF9woSu" in out
    assert "1C7zdTfnkzmr13HfA2vNm5SJYRK6nEKyq8" in out
    assert "1JwSSubhmg6iPtRjtyqhUYYH7bZg3Lfy1T" in out
    assert "bc1q08alc0e5ua69scxhvyma568nvguqccrv4cc9n4" in out


def test_lazy_proxy_resolves_real_module():
    """The _lazy proxies are transparent once jax IS loaded."""
    from vuke_tpu._lazy import jnp

    import jax.numpy as real_jnp
    assert jnp.uint32 is real_jnp.uint32
