"""Pallas TPU kernels for the non-ECC hot stages.

- MT19937 keygen: the 405-step init recurrence runs register-resident per
  (8,128) seed tile (the XLA scan version round-trips HBM every step).
  Only the state taps the first 8 outputs need (indices 0..8 and 397..404)
  are kept live.
- hash160: SHA-256 + RIPEMD-160 of both pubkey serializations fused in one
  kernel (the XLA rolled round-loops materialize state every round).

Both match the uint32-lane reference cores bit-for-bit (tests cross-check).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .mt19937 import _F32, _MATRIX_A, _UPPER, _LOWER, _TEMPER_B, _TEMPER_C
from .sha256 import _K as SHA_K, IV as SHA_IV
from .ripemd160 import (_RL, _RR, _SL, _SR, _KL, _KR, _IV as RMD_IV, _f as rmd_f)
from .common import byteswap32

TILE = 1024


# ---------------------------------------------------------------------------
# MT19937 keygen
# ---------------------------------------------------------------------------

def _mt_tiles(nb: int) -> int:
    """Tiles interleaved per MT kernel invocation.  The 405-step init
    recurrence is a DEPENDENT ~1600-op chain on a single (8,128) vreg, so
    one tile per grid step is VPU-latency-bound; running T tiles' chains
    side by side (every op a (T,8,128) batch of independent vregs) turns
    the stage throughput-bound.  Env VUKE_TPU_MT_TILES overrides."""
    import os
    t = int(os.environ.get("VUKE_TPU_MT_TILES", "8"))
    while t > 1 and nb % t:
        t //= 2
    return max(1, t)


def _mt_kernel(seeds_ref, out_ref):
    """seeds (T, 8, 128) uint32 -> out (8, T, 8, 128): 8 BE key words."""
    s = seeds_ref[:]                                  # (T, 8, 128)
    taps = {0: s}
    prev = s
    for i in range(1, 405):
        cur = _F32 * (prev ^ (prev >> np.uint32(30))) + np.uint32(i)
        if i <= 8 or i >= 397:
            taps[i] = cur
        prev = cur
    for i in range(8):
        y = (taps[i] & _UPPER) | (taps[i + 1] & _LOWER)
        x = taps[i + 397] ^ (y >> np.uint32(1)) ^ jnp.where(
            (y & 1) != 0, _MATRIX_A, np.uint32(0))
        x = x ^ (x >> np.uint32(11))
        x = x ^ ((x << np.uint32(7)) & _TEMPER_B)
        x = x ^ ((x << np.uint32(15)) & _TEMPER_C)
        x = x ^ (x >> np.uint32(18))
        out_ref[i] = byteswap32(x)                    # LE bytes -> BE words


@functools.lru_cache(maxsize=4)
def _mt_call(n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nb = n // TILE
    t = _mt_tiles(nb)
    return pl.pallas_call(
        _mt_kernel,
        grid=(nb // t,),
        in_specs=[pl.BlockSpec((t, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, t, 8, 128), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nb, 8, 128), jnp.uint32),
    )


def milksad_key_words_pallas(seeds):
    """(N,) uint32 seeds -> (N, 8) BE key words (bit-equal to
    mt19937.milksad_key_words[:, 0, :]).  N must be a multiple of 1024."""
    n = seeds.shape[0]
    assert n % TILE == 0
    nb = n // TILE
    s = seeds.reshape(nb, 8, 128)
    out = _mt_call(n)(s)                              # (8, nb, 8, 128)
    return out.reshape(8, n).T


# ---------------------------------------------------------------------------
# hash160 (both pubkey forms) fused
# ---------------------------------------------------------------------------

def _sha_compress_rows(state, w):
    """Unrolled SHA-256 compression over (8,128) rows."""
    a, b, c, d, e, f, g, h = state
    w = list(w)

    def rotr(x, nn):
        return (x >> np.uint32(nn)) | (x << np.uint32(32 - nn))

    for t in range(64):
        if t < 16:
            wt = w[t]
        else:
            s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> np.uint32(3))
            s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> np.uint32(10))
            wt = w[t - 16] + s0 + w[t - 7] + s1
            w.append(wt)
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + np.uint32(SHA_K[t]) + wt
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return (a + state[0], b + state[1], c + state[2], d + state[3],
            e + state[4], f + state[5], g + state[6], h + state[7])


def _rmd_compress_rows(state, m):
    def rotl(x, nn):
        nn &= 31
        if nn == 0:
            return x
        return (x << np.uint32(nn)) | (x >> np.uint32(32 - nn))

    h0, h1, h2, h3, h4 = state
    al, bl, cl, dl, el = h0, h1, h2, h3, h4
    ar, br, cr, dr, er = h0, h1, h2, h3, h4
    for j in range(80):
        rnd = j // 16
        t = rotl(al + rmd_f(j, bl, cl, dl) + m[_RL[j]] + np.uint32(_KL[rnd]), _SL[j]) + el
        al, el, dl, cl, bl = el, dl, rotl(cl, 10), bl, t
        t = rotl(ar + rmd_f(79 - j, br, cr, dr) + m[_RR[j]] + np.uint32(_KR[rnd]), _SR[j]) + er
        ar, er, dr, cr, br = er, dr, rotl(cr, 10), br, t
    t = h1 + cl + dr
    return (t, h2 + dl + er, h3 + el + ar, h4 + al + br, h0 + bl + cr)


def _hash160_kernel(xw_ref, yw_ref, par_ref, hc_ref, hu_ref):
    """Inputs: x/y pubkey words (8, 1, 8, 128) BE; parity (1, 8, 128) 0/1.
    Outputs: h160 compressed + uncompressed (5, 1, 8, 128) LE words."""
    shape = (8, 128)
    xw = [xw_ref[i, 0] for i in range(8)]
    yw = [yw_ref[i, 0] for i in range(8)]
    par = par_ref[0]

    def const(v):
        return jnp.full(shape, np.uint32(v), dtype=jnp.uint32)

    def sha_iv():
        return tuple(const(SHA_IV[i]) for i in range(8))

    def rmd_iv():
        return tuple(const(RMD_IV[i]) for i in range(5))

    def sha_pad_tail(words, nbytes):
        # single-block tail padding for the final block
        out = list(words)
        while len(out) % 16 != 14:
            out.append(const(0))
        out.append(const(0))
        out.append(const(nbytes * 8))
        return out

    # --- compressed: 33 bytes = prefix(02/03) || x ---
    prefix = np.uint32(0x02) + par
    wc = [(prefix << np.uint32(24)) | (xw[0] >> np.uint32(8))]
    for j in range(1, 8):
        wc.append((xw[j - 1] << np.uint32(24)) | (xw[j] >> np.uint32(8)))
    wc.append((xw[7] << np.uint32(24)) | const(0x800000))
    sc = _sha_compress_rows(sha_iv(), sha_pad_tail(wc, 33))
    # ripemd of the 32-byte digest (LE message words = byteswapped)
    mc = [byteswap32(sc[i]) for i in range(8)]
    mc += [const(0x80), const(0), const(0), const(0), const(0), const(0),
           const(256), const(0)]
    rc = _rmd_compress_rows(rmd_iv(), mc)
    for i in range(5):
        hc_ref[i, 0] = rc[i]

    # --- uncompressed: 65 bytes = 04 || x || y (2 SHA blocks) ---
    wu = [(const(0x04) << np.uint32(24)) | (xw[0] >> np.uint32(8))]
    for j in range(1, 8):
        wu.append((xw[j - 1] << np.uint32(24)) | (xw[j] >> np.uint32(8)))
    wu.append((xw[7] << np.uint32(24)) | (yw[0] >> np.uint32(8)))
    for j in range(1, 8):
        wu.append((yw[j - 1] << np.uint32(24)) | (yw[j] >> np.uint32(8)))
    # block 1 = first 16 words
    su = _sha_compress_rows(sha_iv(), wu[:16])
    # block 2 = last word + 0x80 terminator + length
    w2 = [(yw[7] << np.uint32(24)) | const(0x800000)]
    w2 += [const(0)] * 13
    w2 += [const(0), const(65 * 8)]
    su = _sha_compress_rows(su, w2)
    mu = [byteswap32(su[i]) for i in range(8)]
    mu += [const(0x80), const(0), const(0), const(0), const(0), const(0),
           const(256), const(0)]
    ru = _rmd_compress_rows(rmd_iv(), mu)
    for i in range(5):
        hu_ref[i, 0] = ru[i]


@functools.lru_cache(maxsize=4)
def _hash160_call(n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nb = n // TILE
    spec8 = pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
    spec5 = pl.BlockSpec((5, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _hash160_kernel,
        grid=(nb,),
        in_specs=[spec8, spec8,
                  pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[spec5, spec5],
        out_shape=[jax.ShapeDtypeStruct((5, nb, 8, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((5, nb, 8, 128), jnp.uint32)],
    )


def hash160s_pallas(xw, yw, y_odd):
    """xw, yw: (N, 8) BE pubkey words; y_odd: (N,) bool.
    Returns (h160c, h160u): (N, 5) LE digest words each."""
    n = xw.shape[0]
    assert n % TILE == 0
    nb = n // TILE
    xw4 = xw.T.reshape(8, nb, 8, 128)
    yw4 = yw.T.reshape(8, nb, 8, 128)
    par = y_odd.astype(jnp.uint32).reshape(nb, 8, 128)
    hc, hu = _hash160_call(n)(xw4, yw4, par)
    return hc.reshape(5, n).T, hu.reshape(5, n).T
