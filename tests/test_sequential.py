"""Sequential-scan (incremental point-add) fast-path tests.

ecc/incremental.py + pipeline integration: addition-formula exactness vs
the host oracle, the safety predicate, incremental host base stepping, and
(slow/TPU tier) bit-exact parity with the scalar-mul pipeline plus e2e
planted-key recovery through — and around — the fast path.

Reference workload: range scans with the direct transform push every
consecutive key through a full secp256k1 derivation
(/root/reference/src/source/range.rs:36-70, derive.rs:97-118); the
incremental path must produce byte-identical hits.
"""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vuke_tpu.ecc import incremental as inc
from vuke_tpu.ecc import ref


def test_sequential_safe_bounds():
    batch = 1024
    assert not inc.sequential_safe(0, batch)
    assert not inc.sequential_safe(1, batch)          # base = 0*G = infinity
    assert not inc.sequential_safe(2, batch)          # base = 1*G = offset 0
    assert not inc.sequential_safe(batch + 1, batch)  # base = last offset
    assert inc.sequential_safe(batch + 2, batch)
    assert inc.sequential_safe(1 << 40, batch)
    assert not inc.sequential_safe((1 << 64) - batch // 2, batch)


def test_limbs16_roundtrip():
    for v in (0, 1, ref.GX, ref.GY, ref.P - 1):
        l = inc.limbs16(v)
        assert sum(int(l[i]) << (16 * i) for i in range(16)) == v


def test_base_stepper_incremental_vs_fresh():
    bs = inc.BaseStepper(1024)
    assert bs.base_for(5000) == ref.point_mul(4999)
    # consecutive superbatch: one point-add step, same result as fresh
    assert bs.base_for(5000 + 1024) == ref.point_mul(4999 + 1024)
    # non-consecutive start: falls back to a fresh scalar-mul
    assert bs.base_for(999_999) == ref.point_mul(999_998)


def _rows_of_ints(vals, shape):
    flat = np.zeros((16, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(16):
            flat[i, j] = (v >> (16 * i)) & 0xFFFF
    return jnp.asarray(flat.reshape((16,) + shape))


def test_seq_add_formula_matches_oracle():
    """The affine+affine -> (X, Y, ZZ, ZZZ) addition used by
    sequential_core, checked against the host oracle on tiny row shapes
    (the full sequential_core needs the Fermat inversion chain — slow
    tier; this pins the new algebra cheaply on every backend)."""
    from vuke_tpu.ecc.pallas_smul import _add_t, _mul_t, _sub_t

    base_k = 987654321
    bx_i, by_i = ref.point_mul(base_k)
    offs_k = [1, 2, 3, 1000, 54321, 99999]
    pts = [ref.point_mul(k) for k in offs_k]
    offx = _rows_of_ints([p[0] for p in pts], (len(offs_k),))
    offy = _rows_of_ints([p[1] for p in pts], (len(offs_k),))

    def add_zz(bx16, by16, ox_s, oy_s):
        bx = [bx16[i] for i in range(16)]
        by = [by16[i] for i in range(16)]
        ox = [ox_s[i] for i in range(16)]
        oy = [oy_s[i] for i in range(16)]
        dx = _sub_t(ox, bx)
        dy = _sub_t(oy, by)
        zz = _mul_t(dx, dx)
        zzz = _mul_t(zz, dx)
        x3 = _sub_t(_mul_t(dy, dy), _mul_t(_add_t(ox, bx), zz))
        y3 = _sub_t(_mul_t(dy, _sub_t(_mul_t(bx, zz), x3)),
                    _mul_t(by, zzz))
        return tuple(jnp.stack(r) for r in (x3, y3, zz, zzz))

    # eager on purpose: the jitted graph hits a pathologically slow LLVM
    # compile on XLA:CPU; a few thousand tiny eager dispatches are seconds
    X3, Y3, ZZ, ZZZ = add_zz(
        jnp.asarray(inc.limbs16(bx_i)), jnp.asarray(inc.limbs16(by_i)),
        offx, offy)

    def val(stack, j):
        a = np.asarray(stack).reshape(16, -1)
        return sum(int(a[i, j]) << (16 * i) for i in range(16))

    for j, k in enumerate(offs_k):
        ex, ey = ref.point_mul(base_k + k)
        zz, zzz = val(ZZ, j) % ref.P, val(ZZZ, j) % ref.P
        gx = val(X3, j) * pow(zz, ref.P - 2, ref.P) % ref.P
        gy = val(Y3, j) * pow(zzz, ref.P - 2, ref.P) % ref.P
        assert gx == ex and gy == ey, (j, k)


@pytest.mark.slow
def test_sequential_core_matches_scalar_mul_pipeline():
    """Bit-exact parity: the incremental path's hash160s/fragments equal
    the scalar-mul pipeline's on the same contiguous scalars."""
    from vuke_tpu.ecc.tiled import derive_tiled_from_words

    start = (1 << 33) + 777
    n = 1024
    vals = np.uint64(start) + np.arange(n, dtype=np.uint64)
    words = np.zeros((n, 8), dtype=np.uint32)
    words[:, 7] = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    words[:, 6] = (vals >> np.uint64(32)).astype(np.uint32)
    d_ref = jax.jit(derive_tiled_from_words)(jnp.asarray(words))

    offx, offy = inc.offset_table(n)
    bx, by = ref.point_mul(start - 1)
    d_seq = jax.jit(inc.sequential_core)(
        jnp.asarray(inc.limbs16(bx)), jnp.asarray(inc.limbs16(by)),
        offx, offy)

    np.testing.assert_array_equal(np.asarray(d_seq["h160c"]),
                                  np.asarray(d_ref["h160c"]))
    np.testing.assert_array_equal(np.asarray(d_seq["h160u"]),
                                  np.asarray(d_ref["h160u"]))
    for k in ("frag_c", "frag_u"):
        for a, b in zip(d_seq[k], d_ref[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _scan_driver(addr_targets, batch):
    from vuke_tpu.derive import KeyDeriver
    from vuke_tpu.matcher import Matcher
    from vuke_tpu.output import ConsoleOutput
    from vuke_tpu.pipeline import ForwardDriver
    from vuke_tpu.transforms import parse_transform

    deriver = KeyDeriver()
    buf = io.StringIO()
    out = ConsoleOutput(stream=buf)
    matcher = Matcher.from_addresses(addr_targets)
    spec = parse_transform("direct:be")
    driver = ForwardDriver([spec], matcher, out, deriver, batch=batch,
                           inv_chunk=32)
    return driver, buf, deriver


@pytest.mark.slow
def test_direct_be_scan_recovers_planted_key_via_sequential():
    # seed must lie INSIDE the scanned range below (latent bug until round
    # 4: the original +12345 offset was beyond the 4096-seed range, so the
    # scan correctly found nothing — caught the first time the slow tier
    # actually ran this test on the TPU)
    seed = (1 << 21) + 2345
    key = seed.to_bytes(32, "big")
    from vuke_tpu.derive import KeyDeriver
    addr = KeyDeriver().derive(key).p2pkh_compressed

    driver, buf, _ = _scan_driver([addr], batch=1024)
    prog = driver.programs[0]
    if prog._seq is None:
        pytest.skip("sequential path unavailable on this backend")
    stats = driver.run_range(1 << 21, (1 << 21) + 4095)

    assert stats.matches_found == 1
    text = buf.getvalue()
    assert f"Source: {seed}" in text
    assert f"Private Key: {key.hex()}" in text
    assert addr in text


@pytest.mark.slow
def test_direct_be_unsafe_start_falls_back_and_still_hits():
    """Starts inside the collision window must take the scalar-mul path
    (base scalar would coincide with an offset) and still find the key."""
    seed = 700
    key = seed.to_bytes(32, "big")
    from vuke_tpu.derive import KeyDeriver
    addr = KeyDeriver().derive(key).p2pkh_compressed

    driver, buf, _ = _scan_driver([addr], batch=1024)
    stats = driver.run_range(1, 2048)

    assert stats.matches_found == 1
    assert f"Source: {seed}" in buf.getvalue()
