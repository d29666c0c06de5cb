"""secp256k1 Jacobian point arithmetic and batched scalar multiplication.

TPU-first shape: all ops are elementwise over a batch of points, each point a
``(..., 16)``-limbed field-element triple (X, Y, Z); Z == 0 encodes the point
at infinity.  Fixed-base multiplication uses 32 byte-windows into a
precomputed table ``T[w][d] = d * 2^(8w) * G``, so the per-key work is 32
mixed (Jacobian+affine) additions and **zero doublings** — with this window
scheme the doubling/equal-operand exceptional case is impossible (acc after
w windows equals ``(k mod 2^(8w)) * G`` with value < 2^(8w), while the added
term is ``d * 2^(8w) * G`` with d >= 1, so the operands can never be equal);
the only selects needed are digit==0 and acc==infinity.

Affine conversion uses a chunked Montgomery batch inversion: the batch is
reshaped to (K, M) and scanned along K, so the sequential chain is K deep
while every step stays M lanes wide — one Fermat inversion total.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ref
from .field import fe_add, fe_inv, fe_mul, fe_select, fe_sqr, fe_sub

WINDOWS = 32  # byte windows over a 256-bit scalar
TABLE_SIZE = 256


@functools.lru_cache(maxsize=1)
def fixed_base_table() -> np.ndarray:
    """(32, 256, 2, 16) uint32: affine (x, y) limbs of d * 2^(8w) * G.

    Entry d=0 is (0, 0) — never selected (digit-0 lanes keep the accumulator).
    """
    table = np.zeros((WINDOWS, TABLE_SIZE, 2, 16), dtype=np.uint32)
    base = (ref.GX, ref.GY)
    for w in range(WINDOWS):
        acc = None
        for d in range(1, TABLE_SIZE):
            acc = ref.point_add(acc, base)
            x, y = acc
            for i in range(16):
                table[w, d, 0, i] = (x >> (16 * i)) & 0xFFFF
                table[w, d, 1, i] = (y >> (16 * i)) & 0xFFFF
        # base for next window = 256 * base
        for _ in range(8):
            base = ref.point_add(base, base)
    return table


def point_add_mixed(X1, Y1, Z1, x2, y2):
    """(X1,Y1,Z1) + (x2,y2,1), no exceptional-case handling (see module doc).

    8M + 3S Jacobian/affine mixed addition.
    """
    Z1Z1 = fe_sqr(Z1)
    U2 = fe_mul(x2, Z1Z1)
    S2 = fe_mul(y2, fe_mul(Z1, Z1Z1))
    H = fe_sub(U2, X1)
    R = fe_sub(S2, Y1)
    HH = fe_sqr(H)
    HHH = fe_mul(H, HH)
    V = fe_mul(X1, HH)
    X3 = fe_sub(fe_sub(fe_sqr(R), HHH), fe_add(V, V))
    Y3 = fe_sub(fe_mul(R, fe_sub(V, X3)), fe_mul(Y1, HHH))
    Z3 = fe_mul(Z1, H)
    return X3, Y3, Z3


def point_double(X1, Y1, Z1):
    """Jacobian doubling (a=0), 2M + 5S (dbl-2009-l)."""
    A = fe_sqr(X1)
    B = fe_sqr(Y1)
    C = fe_sqr(B)
    t = fe_sqr(fe_add(X1, B))
    D = fe_sub(fe_sub(t, A), C)
    D = fe_add(D, D)
    E = fe_add(fe_add(A, A), A)
    F = fe_sqr(E)
    X3 = fe_sub(F, fe_add(D, D))
    eightC = fe_add(C, C)
    eightC = fe_add(eightC, eightC)
    eightC = fe_add(eightC, eightC)
    Y3 = fe_sub(fe_mul(E, fe_sub(D, X3)), eightC)
    Z3 = fe_mul(fe_add(Y1, Y1), Z1)
    return X3, Y3, Z3


def point_add_general(X1, Y1, Z1, X2, Y2, Z2):
    """Complete-ish Jacobian addition with select-based handling of
    infinity operands and the doubling case (used by BIP32/general paths,
    not the fixed-base hot loop)."""
    Z1Z1 = fe_sqr(Z1)
    Z2Z2 = fe_sqr(Z2)
    U1 = fe_mul(X1, Z2Z2)
    U2 = fe_mul(X2, Z1Z1)
    S1 = fe_mul(Y1, fe_mul(Z2, Z2Z2))
    S2 = fe_mul(Y2, fe_mul(Z1, Z1Z1))
    H = fe_sub(U2, U1)
    R = fe_sub(S2, S1)

    from .field import fe_is_zero
    h_zero = fe_is_zero(H)
    r_zero = fe_is_zero(R)
    p1_inf = fe_is_zero(Z1)
    p2_inf = fe_is_zero(Z2)

    HH = fe_sqr(H)
    HHH = fe_mul(H, HH)
    V = fe_mul(U1, HH)
    X3 = fe_sub(fe_sub(fe_sqr(R), HHH), fe_add(V, V))
    Y3 = fe_sub(fe_mul(R, fe_sub(V, X3)), fe_mul(S1, HHH))
    Z3 = fe_mul(fe_mul(Z1, Z2), H)

    dX, dY, dZ = point_double(X1, Y1, Z1)
    dbl_case = h_zero & r_zero & ~p1_inf & ~p2_inf
    inf_case = h_zero & ~r_zero & ~p1_inf & ~p2_inf  # P + (-P) = infinity

    X3 = fe_select(dbl_case, dX, X3)
    Y3 = fe_select(dbl_case, dY, Y3)
    Z3 = fe_select(dbl_case, dZ, Z3)
    Z3 = fe_select(inf_case, jnp.zeros_like(Z3), Z3)
    X3 = fe_select(p1_inf, X2, X3)
    Y3 = fe_select(p1_inf, Y2, Y3)
    Z3 = fe_select(p1_inf, Z2, Z3)
    X3 = fe_select(p2_inf, X1, X3)
    Y3 = fe_select(p2_inf, Y1, Y3)
    Z3 = fe_select(p2_inf, Z1, Z3)
    return X3, Y3, Z3


def scalar_mul_base(digits):
    """Fixed-base scalar multiplication.

    digits: (..., 32) uint32 in [0, 255] — byte windows of the scalar,
    least-significant first.  Returns Jacobian (X, Y, Z) with batch shape.
    Scalars must be in [1, n-1] (normalized upstream); the result is never
    infinity.
    """
    table = jnp.asarray(fixed_base_table())
    batch_shape = digits.shape[:-1]
    # init carries derived from the (possibly shard_map-varying) input so
    # the scan carry's varying manual axes match its outputs
    vzero = digits[..., :1] * np.uint32(0)               # (..., 1) zeros
    X = vzero + jnp.zeros(batch_shape + (16,), dtype=jnp.uint32)
    Y = X
    Z = X
    acc_inf = (digits[..., 0] | np.uint32(1)) > 0        # all-True, varying

    digits_t = jnp.moveaxis(digits, -1, 0)  # (32, ...)

    def body(carry, xs):
        X, Y, Z, acc_inf = carry
        table_w, d = xs
        entry = jnp.take(table_w, d, axis=0)  # (..., 2, 16)
        x2 = entry[..., 0, :]
        y2 = entry[..., 1, :]
        nX, nY, nZ = point_add_mixed(X, Y, Z, x2, y2)
        d_zero = d == 0
        # acc was infinity: take the affine point directly
        one = jnp.zeros_like(x2).at[..., 0].set(1)
        nX = fe_select(acc_inf, x2, nX)
        nY = fe_select(acc_inf, y2, nY)
        nZ = fe_select(acc_inf, one, nZ)
        # digit 0: keep the accumulator
        X = fe_select(d_zero, X, nX)
        Y = fe_select(d_zero, Y, nY)
        Z = fe_select(d_zero, Z, nZ)
        acc_inf = acc_inf & d_zero
        return (X, Y, Z, acc_inf), None

    # unroll amortizes scan overhead on TPU; on CPU it quadruples the LLVM
    # compile of the already-huge point-add body for no runtime benefit
    # (the fast test tier's wall clock is XLA:CPU compiles)
    unroll = 4 if jax.devices()[0].platform != "cpu" else 1
    (X, Y, Z, _), _ = jax.lax.scan(body, (X, Y, Z, acc_inf), (table, digits_t),
                                   unroll=unroll)
    return X, Y, Z


def batch_inverse(z, chunk: int = 32):
    """Montgomery batch inversion of (N, 16) field elements, chunked.

    Reshapes to (chunk, N//chunk) so the sequential prefix chain is only
    ``chunk`` deep while staying N//chunk lanes wide.  N must be divisible
    by ``chunk`` (pad upstream with ones).
    """
    n = z.shape[0]
    assert n % chunk == 0, "batch not divisible by inversion chunk"
    m = n // chunk
    zc = z.reshape(chunk, m, 16)

    def fwd(acc, zk):
        return fe_mul(acc, zk), acc  # emit exclusive prefix

    one = (zc[0] * np.uint32(0)).at[:, 0].set(1)  # varying-safe ones
    total, prefixes = jax.lax.scan(fwd, one, zc)
    inv_total = fe_inv(total)

    def bwd(inv_acc, xs):
        zk, pref = xs
        inv_zk = fe_mul(inv_acc, pref)
        return fe_mul(inv_acc, zk), inv_zk

    _, inv_rev = jax.lax.scan(bwd, inv_total, (zc, prefixes), reverse=True)
    return inv_rev.reshape(n, 16)


def to_affine(X, Y, Z, chunk: int = 32):
    """Jacobian (N-batch) -> affine (x, y) via chunked batch inversion."""
    zi = batch_inverse(Z.reshape(-1, 16), chunk).reshape(Z.shape)
    zi2 = fe_sqr(zi)
    x = fe_mul(X, zi2)
    y = fe_mul(Y, fe_mul(zi, zi2))
    return x, y
