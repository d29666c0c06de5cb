"""Tile-layout derive pipeline: no HBM transposes between kernels.

The standard path shuffles (N, words) <-> (words, nb, 8, 128) around every
Pallas kernel (~70ms of pure relayout at 2^20).  This pipeline keeps
everything limb/word-major: keygen -> normalize -> digits -> scalar-mul ->
batched inversion (a scan over the tile axis using the same row-list field
ops as the kernel) -> affine -> hash160 -> match fragments, with a single
narrow transpose at the very end for the (N, 5) hash160s.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import ref
from .pallas_smul import (_add_t, _carry_rows, _mul_t, _neg_t, _reduce_rows,
                          _sub_t, scalar_mul_zz_pallas, _smul_call, _table_f32)


def use_smul13() -> bool:
    """13-bit-limb scalar-mul kernel (~1.9x the 16-bit one with odd digits
    + the high-first reduce — see tools/bench_smul13.py; affine-equal
    outputs, bit-exact vs the host oracle) unless disabled via env."""
    import os
    return os.environ.get("VUKE_TPU_SMUL13", "1") not in ("0", "false", "no")


def window_bits() -> int:
    """Scalar-mul window width (13-bit kernel only; 16-bit kernel is
    byte-window-only).  Wider windows = fewer point adds but bigger tables
    and lookup cost; with int8 two-plane lookups w10 measures fastest
    (15.0ms vs 15.7 w8 vs 17.8 f32-w8 per 2^17 on v5e)."""
    import os
    if not use_smul13():
        return 8
    return int(os.environ.get("VUKE_TPU_WINBITS", "10"))


def lookup_mode() -> str:
    """Window-table lookup: 'i8' two-plane int8 MXU dots (8x the f32 MXU
    rate; lookups were ~17% of the w8 kernel in f32) or 'f32' one-hot."""
    import os
    return os.environ.get("VUKE_TPU_LOOKUP", "i8")


def signed_digits():
    """Digit recoding mode: "odd" (default — zero-free odd digits, no d=0
    skip or infinity tracking in the kernel), True (signed digits,
    |d| <= 2^(wbits-1)), or False (unsigned windows).  Both recodings need
    wbits leaving >= 2 spare top bits (any wbits >= 9; w8 stays unsigned).
    Env: VUKE_TPU_DIGITS=odd|signed|unsigned (VUKE_TPU_SIGNED=0 still
    forces unsigned for back-compat)."""
    import os
    if window_bits() * (-(-256 // window_bits())) < 258:
        return False
    mode = os.environ.get("VUKE_TPU_DIGITS")
    if mode is not None:
        return {"odd": "odd", "signed": True}.get(mode, False)
    if os.environ.get("VUKE_TPU_SIGNED") in ("0", "false", "no"):
        return False
    return "odd"

_N_WORDS = np.array([(ref.N >> (32 * (7 - i))) & 0xFFFFFFFF for i in range(8)],
                    dtype=np.uint32)


def _fe_inv_rows(a_rows):
    """Fermat inversion on a row-list field element (any common row shape)."""

    def mul(x, y):
        return _mul_t(x, y)

    def sqr_k(x, k):
        def body(_, v):
            vs = [v[i] for i in range(16)]
            out = _mul_t(vs, vs)
            return jnp.stack(out, axis=0)
        v = jnp.stack(x, axis=0)
        v = jax.lax.fori_loop(0, k, body, v)
        return [v[i] for i in range(16)]

    x1 = a_rows
    x2 = mul(sqr_k(x1, 1), x1)
    x3 = mul(sqr_k(x2, 1), x1)
    x6 = mul(sqr_k(x3, 3), x3)
    x9 = mul(sqr_k(x6, 3), x3)
    x11 = mul(sqr_k(x9, 2), x2)
    x22 = mul(sqr_k(x11, 11), x11)
    x44 = mul(sqr_k(x22, 22), x22)
    x88 = mul(sqr_k(x44, 44), x44)
    x176 = mul(sqr_k(x88, 88), x88)
    x220 = mul(sqr_k(x176, 44), x44)
    x223 = mul(sqr_k(x220, 3), x3)
    t = mul(sqr_k(x223, 23), x22)
    t = mul(sqr_k(t, 5), x1)
    t = mul(sqr_k(t, 3), x2)
    t = mul(sqr_k(t, 2), x1)
    return t


def _use_associative_scan() -> bool:
    # bit-exact and validated on TPU, but the log-depth unrolled graph
    # compiles so slowly it blew the bench-stage window (>700s vs ~170s)
    # for at best a fraction-of-a-ms runtime win — default off
    import os
    return os.environ.get("VUKE_TPU_ASCAN", "0") not in ("0", "false", "no")


def _inv_groups(nb: int) -> int:
    """Scan-group count for _batch_inverse_tiles: the sequential Montgomery
    scan costs 2*nb tiny dependent steps whose per-step overhead dominated
    the stage; running g groups side by side (each scan step multiplies a
    g-wide batch) cuts the dependent-step count to 2*nb/g + O(g) for the
    same total field-mul work.  VUKE_TPU_INVGROUP overrides (1 = legacy
    sequential scan)."""
    import os
    g = int(os.environ.get("VUKE_TPU_INVGROUP", "16"))
    while g > 1 and nb % g:
        g //= 2
    return max(1, min(g, nb))


def _batch_inverse_tiles(z):
    """Montgomery inversion over the tile axis.

    z: (16, nb, 8, 128) uint32 -> elementwise inverses, same shape.

    Default: grouped Montgomery scans (see _inv_groups) — g independent
    in-group prefix scans batched into one lax.scan of length nb/g, a
    tiny sequential cross-group prefix/suffix combine over the g group
    totals, ONE Fermat inversion of the grand total, then the batched
    backward scans seeded per group with inv(total_j) = G_j*ig*S_j.
    VUKE_TPU_ASCAN=1 instead uses log-depth associative scans (bit-exact
    but the unrolled graph compiles >700s); VUKE_TPU_INVGROUP=1 reverts
    to the plain sequential scan.
    """
    nb = z.shape[1]
    zc = jnp.moveaxis(z, 1, 0)                     # (nb, 16, 8, 128)

    g = _inv_groups(nb)
    if g > 1 and not _use_associative_scan():
        m = nb // g
        zg = zc.reshape(g, m, 16, 8, 128).transpose(1, 0, 2, 3, 4)

        def mulg(a, b):                            # (g, 16, 8, 128) muls
            return jnp.stack(_mul_t([a[:, i] for i in range(16)],
                                    [b[:, i] for i in range(16)]), axis=1)

        def mul1(a, b):                            # (16, 8, 128) muls
            return jnp.stack(_mul_t([a[i] for i in range(16)],
                                    [b[i] for i in range(16)]), axis=0)

        def fwd(acc, zk):
            return mulg(acc, zk), acc

        oneg = (zg[0] * np.uint32(0)).at[:, 0].set(1)
        totals, prefixes = jax.lax.scan(fwd, oneg, zg)  # (g,..), (m,g,..)

        one1 = (totals[0] * np.uint32(0)).at[0].set(1)
        pres = [one1]                              # G_j = total_0..total_{j-1}
        for j in range(1, g):
            pres.append(mul1(pres[-1], totals[j - 1]))
        sufs = [one1] * g                          # S_j = total_{j+1}..
        for j in range(g - 2, -1, -1):
            sufs[j] = mul1(sufs[j + 1], totals[j + 1])
        grand = mul1(pres[-1], totals[-1])
        ig = jnp.stack(_fe_inv_rows([grand[i] for i in range(16)]), axis=0)
        G = jnp.stack(pres, axis=0)
        S = jnp.stack(sufs, axis=0)
        it = mulg(mulg(G, S), jnp.broadcast_to(ig[None], G.shape))

        def bwd(ia, xs):
            zk, pref = xs
            return mulg(ia, zk), mulg(ia, pref)

        _, invg = jax.lax.scan(bwd, it, (zg, prefixes), reverse=True)
        inv = invg.transpose(1, 0, 2, 3, 4).reshape(nb, 16, 8, 128)
        return jnp.moveaxis(inv, 0, 1)

    if _use_associative_scan() and nb > 1:
        def mulp(a, b):
            # a, b: (k, 16, 8, 128) — elementwise field mul over the batch
            return jnp.stack(_mul_t([a[:, i] for i in range(16)],
                                    [b[:, i] for i in range(16)]), axis=1)

        P = jax.lax.associative_scan(mulp, zc)             # P_k = z_0..z_k
        S = jax.lax.associative_scan(mulp, zc, reverse=True)
        total = P[-1]
        inv_total = jnp.stack(
            _fe_inv_rows([total[i] for i in range(16)]), axis=0)
        one = (zc[:1] * np.uint32(0)).at[:, 0].set(1)
        Pm1 = jnp.concatenate([one, P[:-1]], axis=0)       # P_{k-1}
        Sp1 = jnp.concatenate([S[1:], one], axis=0)        # S_{k+1}
        outer = mulp(Pm1, Sp1)
        inv = mulp(outer, jnp.broadcast_to(inv_total[None], outer.shape))
        return jnp.moveaxis(inv, 0, 1)

    def fwd(acc, zk):
        acc_rows = [acc[i] for i in range(16)]
        zk_rows = [zk[i] for i in range(16)]
        nxt = jnp.stack(_mul_t(acc_rows, zk_rows), axis=0)
        return nxt, acc

    one = (zc[0] * np.uint32(0)).at[0].set(1)
    total, prefixes = jax.lax.scan(fwd, one, zc)

    inv_total = jnp.stack(_fe_inv_rows([total[i] for i in range(16)]), axis=0)

    def bwd(inv_acc, xs):
        zk, pref = xs
        ia = [inv_acc[i] for i in range(16)]
        inv_zk = jnp.stack(_mul_t(ia, [pref[i] for i in range(16)]), axis=0)
        nxt = jnp.stack(_mul_t(ia, [zk[i] for i in range(16)]), axis=0)
        return nxt, inv_zk

    _, inv = jax.lax.scan(bwd, inv_total, (zc, prefixes), reverse=True)
    return jnp.moveaxis(inv, 0, 1)                 # (16, nb, 8, 128)


def _fe_inv_rows13(a_rows):
    """Fermat inversion on 13-bit limb rows (same chain as _fe_inv_rows)."""
    from .pallas_smul13 import L13, _mul13, _sqr13

    def mul(x, y):
        return _mul13(x, y)

    def sqr_k(x, k):
        def body(_, v):
            return jnp.stack(_sqr13([v[i] for i in range(L13)]), axis=0)
        v = jnp.stack(x, axis=0)
        v = jax.lax.fori_loop(0, k, body, v)
        return [v[i] for i in range(L13)]

    x1 = a_rows
    x2 = mul(sqr_k(x1, 1), x1)
    x3 = mul(sqr_k(x2, 1), x1)
    x6 = mul(sqr_k(x3, 3), x3)
    x9 = mul(sqr_k(x6, 3), x3)
    x11 = mul(sqr_k(x9, 2), x2)
    x22 = mul(sqr_k(x11, 11), x11)
    x44 = mul(sqr_k(x22, 22), x22)
    x88 = mul(sqr_k(x44, 44), x44)
    x176 = mul(sqr_k(x88, 88), x88)
    x220 = mul(sqr_k(x176, 44), x44)
    x223 = mul(sqr_k(x220, 3), x3)
    t = mul(sqr_k(x223, 23), x22)
    t = mul(sqr_k(t, 5), x1)
    t = mul(sqr_k(t, 3), x2)
    t = mul(sqr_k(t, 2), x1)
    return t


def _batch_inverse_tiles13(z):
    """Montgomery inversion over the tile axis in 13-bit limbs.

    z: (20, nb, 8, 128) uint32 -> elementwise inverses, same shape."""
    from .pallas_smul13 import L13, _mul13

    nb = z.shape[1]
    zc = jnp.moveaxis(z, 1, 0)                     # (nb, 20, 8, 128)

    def fwd(acc, zk):
        nxt = jnp.stack(_mul13([acc[i] for i in range(L13)],
                               [zk[i] for i in range(L13)]), axis=0)
        return nxt, acc

    one = (zc[0] * np.uint32(0)).at[0].set(1)
    total, prefixes = jax.lax.scan(fwd, one, zc)

    inv_total = jnp.stack(
        _fe_inv_rows13([total[i] for i in range(L13)]), axis=0)

    def bwd(inv_acc, xs):
        zk, pref = xs
        ia = [inv_acc[i] for i in range(L13)]
        inv_zk = jnp.stack(_mul13(ia, [pref[i] for i in range(L13)]), axis=0)
        nxt = jnp.stack(_mul13(ia, [zk[i] for i in range(L13)]), axis=0)
        return nxt, inv_zk

    _, inv = jax.lax.scan(bwd, inv_total, (zc, prefixes), reverse=True)
    return jnp.moveaxis(inv, 0, 1)                 # (20, nb, 8, 128)


def _normalize_words_t(words_t):
    """(8, ...) BE-word scalars -> reduced into [1, n-1] (limbwise ge/sub)."""
    ge = jnp.zeros(words_t.shape[1:], dtype=bool)
    decided = jnp.zeros(words_t.shape[1:], dtype=bool)
    for i in range(8):
        ni = _N_WORDS[i]
        gt = words_t[i] > ni
        lt = words_t[i] < ni
        ge = jnp.where(~decided & gt, True, ge)
        decided = decided | gt | lt
    ge = ge | ~decided
    sub = []
    borrow = jnp.zeros(words_t.shape[1:], dtype=jnp.uint32)
    for i in range(7, -1, -1):
        a = words_t[i]
        b = np.uint32(_N_WORDS[i])
        t = a - b
        b1 = (a < b).astype(jnp.uint32)
        t2 = t - borrow
        b2 = (t < borrow).astype(jnp.uint32)
        sub.append(t2)
        borrow = b1 | b2
    sub = jnp.stack(sub[::-1], axis=0)
    out = jnp.where(ge[None], sub, words_t)
    zero = jnp.all(out == 0, axis=0)
    out = out.at[7].set(jnp.where(zero, np.uint32(1), out[7]))
    return out


def _digits_t(words_t, wbits: int = 8, signed=False):
    """(8, ...) BE words -> (n_windows, ...) wbits-wide windows, LSB first.

    Window w covers scalar bits [wbits*w, wbits*(w+1)); widths that don't
    divide 32 straddle word boundaries (hence the two-word stitch).
    ``signed``: recode into |d| | sign<<15 signed digits (half tables);
    ``signed == "odd"``: zero-free odd-digit recoding (works from the full
    words, so the windowed slicing is skipped)."""
    if signed == "odd":
        from .pallas_smul13 import odd_encode_rows
        return jnp.stack(
            odd_encode_rows([words_t[i] for i in range(8)], wbits), axis=0)
    windows = -(-256 // wbits)
    mask = np.uint32((1 << wbits) - 1)
    digs = []
    for w in range(windows):
        b = wbits * w
        wi = 7 - b // 32
        off = b % 32
        v = words_t[wi] >> np.uint32(off)
        if off + wbits > 32 and wi >= 1:
            v = v | (words_t[wi - 1] << np.uint32(32 - off))
        digs.append(v & mask)
    if signed:
        from .pallas_smul13 import signed_encode
        digs = signed_encode(digs, wbits)
    return jnp.stack(digs, axis=0)


def _limbs_to_words_t(rows):
    """16 limb rows -> 8 BE-word rows (word j = limb[15-2j]<<16|limb[14-2j])."""
    return jnp.stack(
        [(rows[15 - 2 * j] << np.uint32(16)) | rows[14 - 2 * j] for j in range(8)],
        axis=0)


def _fe_normalize_rows(rows):
    """Canonical representative.  Inputs are _mul_t/_rows13_to16 outputs,
    always < 2^256 < 2p, so ONE conditional subtract of p suffices."""
    P_LIMBS = [np.uint32((ref.P >> (16 * i)) & 0xFFFF) for i in range(16)]
    out = rows
    for _ in range(1):
        ge = jnp.zeros_like(out[0], dtype=bool)
        decided = jnp.zeros_like(out[0], dtype=bool)
        for i in range(15, -1, -1):
            gt = out[i] > P_LIMBS[i]
            lt = out[i] < P_LIMBS[i]
            ge = jnp.where(~decided & gt, True, ge)
            decided = decided | gt | lt
        ge = ge | ~decided
        sub = []
        borrow = jnp.zeros_like(out[0])
        for i in range(16):
            t = out[i] - P_LIMBS[i] - borrow
            sub.append(t & np.uint32(0xFFFF))
            borrow = (t >> np.uint32(16)) & np.uint32(1)
        out = [jnp.where(ge, sub[i], out[i]) for i in range(16)]
    return out


def derive_hash160s_tiled(seeds):
    """Fused milksad-seed -> hash160 fragments, all in tile layout.

    seeds: (N,) uint32, N % 1024 == 0.  Returns dict with h160c/h160u as
    (N, 5) LE words plus fragment (hi, lo) arrays (N,).
    """
    from ..cores.pallas_kernels import _mt_call

    n = seeds.shape[0]
    assert n % 1024 == 0
    nb = n // 1024

    kw_t = _mt_call(n)(seeds.reshape(nb, 8, 128))      # (8, nb, 8, 128)
    norm_t = _normalize_words_t(kw_t)
    return _derive_core_t(norm_t, n, nb)


def derive_tiled_from_words(words):
    """Tile-layout derive for (N, 8) BE-word scalars (the scan hot path).

    One entry transpose (words -> tile layout) and narrow exits replace
    the per-kernel lane<->tile relayouts and lane-major chunked inversion
    of the standard path.  Returns the _derive_core_t dict plus
    ``norm`` — the normalized scalars back in (N, 8) lane-major form.
    """
    n = words.shape[0]
    assert n % 1024 == 0
    nb = n // 1024
    words_t = words.T.reshape(8, nb, 8, 128)
    norm_t = _normalize_words_t(words_t)
    out = _derive_core_t(norm_t, n, nb)
    out["norm"] = norm_t.reshape(8, n).T
    return out


def _affine16(X, Y, ZZ, ZZZ):
    """(X, Y, ZZ, ZZZ) 16-limb rows (stacked or lists) -> canonical affine
    (x, y) row lists via one shared Montgomery batch inversion.

    On Mosaic-capable backends this dispatches to the Pallas kernels
    (ecc/pallas_inv.py): bit-identical outputs, but the XLA graph below
    cold-compiles for ~30 minutes while the kernels compile in seconds
    (.bench_logs/compile_profile_r4.*).  The XLA form remains the
    CPU/fallback path."""
    from .pallas_inv import affine16_pallas, use_pallas_inv
    if use_pallas_inv():
        return affine16_pallas(X, Y, ZZ, ZZZ)
    rowsof = lambda a: [a[i] for i in range(16)]
    T = _mul_t(rowsof(ZZ), rowsof(ZZZ))
    iT = _batch_inverse_tiles(jnp.stack(T, axis=0))
    iT_rows = rowsof(iT)
    x = _mul_t(_mul_t(rowsof(X), iT_rows), rowsof(ZZZ))
    y = _mul_t(_mul_t(rowsof(Y), iT_rows), rowsof(ZZ))
    return _fe_normalize_rows(x), _fe_normalize_rows(y)


def _hash_tail_t(x, y, n, nb):
    """Canonical affine (x, y) limb-row lists -> hash160s + match
    fragments (the shared pipeline tail)."""
    from ..cores.pallas_kernels import _hash160_call
    from ..cores.common import byteswap32

    xw_t = _limbs_to_words_t(x)                        # (8, nb, 8, 128)
    yw_t = _limbs_to_words_t(y)
    y_odd = (y[0] & np.uint32(1))                      # (nb, 8, 128)

    hc_t, hu_t = _hash160_call(n)(xw_t, yw_t, y_odd)   # (5, nb, 8, 128) x2

    frag_c_hi = byteswap32(hc_t[0]).reshape(n)
    frag_c_lo = byteswap32(hc_t[1]).reshape(n)
    frag_u_hi = byteswap32(hu_t[0]).reshape(n)
    frag_u_lo = byteswap32(hu_t[1]).reshape(n)

    return {
        "h160c": hc_t.reshape(5, n).T,
        "h160u": hu_t.reshape(5, n).T,
        "frag_c": (frag_c_hi, frag_c_lo),
        "frag_u": (frag_u_hi, frag_u_lo),
    }


def affine_points_tiled(words):
    """(N, 8) BE-word scalars -> canonical affine (x, y) stacked limb rows
    (16, nb, 8, 128) each, via the full tiled scalar-mul pipeline.  Used to
    build the sequential-scan offset table (ecc/incremental.py)."""
    n = words.shape[0]
    assert n % 1024 == 0
    nb = n // 1024
    words_t = words.T.reshape(8, nb, 8, 128)
    norm_t = _normalize_words_t(words_t)
    x, y = _affine_core_t(norm_t, n, nb)
    return jnp.stack(x, axis=0), jnp.stack(y, axis=0)


def _derive_core_t(norm_t, n, nb):
    """normalized (8, nb, 8, 128) scalars -> hash160s + match fragments."""
    x, y = _affine_core_t(norm_t, n, nb)
    return _hash_tail_t(x, y, n, nb)


def _affine_core_t(norm_t, n, nb):
    """normalized (8, nb, 8, 128) scalars -> canonical affine (x, y) rows."""
    inv13 = False  # measured SLOWER e2e (9.60 vs 10.44 M/s): 13-bit muls at
    # the XLA level fuse worse than 16-bit _mul_t; VUKE_TPU_INV13=1 re-tests
    import os
    if os.environ.get("VUKE_TPU_INV13") in ("1", "true", "yes"):
        inv13 = True

    if use_smul13() and inv13:
        from .pallas_smul13 import (L13, _mul13, _rows13_to16, _smul13_call,
                                    _table13_f32, _table13_i8)
        wbits, lookup, signed = window_bits(), lookup_mode(), signed_digits()
        digits_t = _digits_t(norm_t, wbits, signed)    # (n_windows, nb, 8, 128)
        table = jnp.asarray(_table13_i8(wbits, signed) if lookup == "i8"
                            else _table13_f32(wbits, signed))
        X, Y, ZZ, ZZZ = _smul13_call(n, 1024, wbits, lookup=lookup,
                                     signed=signed, out13=True)(
            digits_t, table)                           # (20, nb, 8, 128) x4
        r20 = lambda a: [a[i] for i in range(L13)]
        T = _mul13(r20(ZZ), r20(ZZZ))
        iT = _batch_inverse_tiles13(jnp.stack(T, axis=0))
        iT_rows = r20(iT)
        x13 = _mul13(_mul13(r20(X), iT_rows), r20(ZZZ))
        y13 = _mul13(_mul13(r20(Y), iT_rows), r20(ZZ))
        x = _fe_normalize_rows(_rows13_to16(x13))
        y = _fe_normalize_rows(_rows13_to16(y13))
    else:
        if use_smul13():
            from .pallas_smul13 import (_smul13_call, _table13_f32,
                                        _table13_i8)
            wbits, lookup, signed = (window_bits(), lookup_mode(),
                                     signed_digits())
            digits_t = _digits_t(norm_t, wbits, signed)
            table = jnp.asarray(_table13_i8(wbits, signed) if lookup == "i8"
                                else _table13_f32(wbits, signed))
            X, Y, ZZ, ZZZ = _smul13_call(n, 1024, wbits, lookup=lookup,
                                         signed=signed)(digits_t, table)
        else:
            digits_t = _digits_t(norm_t)               # (32, nb, 8, 128)
            table = jnp.asarray(_table_f32())
            X, Y, ZZ, ZZZ = _smul_call(n, 1024)(digits_t, table)

        x, y = _affine16(X, Y, ZZ, ZZZ)

    return x, y
