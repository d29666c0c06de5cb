// vuke-tpu native host library: batch secp256k1 key -> hash160 derivation.
//
// The TPU owns the production compute path (Pallas kernels); this unit is
// the CPU-backend equivalent of the accelerator pipeline: 32-byte private
// keys -> normalize mod n -> fixed-window scalar-mul -> Montgomery batch
// inversion -> compressed + uncompressed hash160.  The reference gets this
// for free by linking libsecp256k1 (/root/reference/src/derive.rs:97-118);
// the XLA:CPU fallback graph both compiles (~160s) and runs (~3ms/key)
// orders of magnitude too slow for the "--no-tpu scans start instantly"
// contract, so the host path is native like the reference's.
//
// Field arithmetic: 5x52-bit limbs in uint64 with unsigned __int128
// products (the representation libsecp256k1 popularized; implementation
// here is written fresh against the pseudo-Mersenne identity
// 2^256 ≡ 2^32 + 977 (mod p)).  Every field op returns weak-normalized
// limbs (n[0..3] < 2^52 + eps, n[4] < 2^48 + eps), so operand bounds are
// uniform: adds/subs stay < 2^55 per limb and 25-product columns stay
// far below 2^128.
//
// Exposed as a C ABI for ctypes; parity is pinned against the pure-Python
// oracle (vuke_tpu/ecc/ref.py) in tests/test_native_ecc.py.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

typedef unsigned __int128 u128;

constexpr uint64_t M52 = 0xFFFFFFFFFFFFFULL;
constexpr uint64_t M48 = 0xFFFFFFFFFFFFULL;
constexpr uint64_t C0 = 0x1000003D1ULL;        // 2^256 mod p
constexpr uint64_t C16 = 0x1000003D10ULL;      // 2^260 mod p = 16 * C0

struct Fe { uint64_t n[5]; };

// p in 5x52 limbs
constexpr uint64_t P52[5] = {0xFFFFEFFFFFC2FULL, 0xFFFFFFFFFFFFFULL,
                             0xFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFULL,
                             0xFFFFFFFFFFFFULL};
// 4p with limbs raised for borrow-free subtraction: every limb exceeds any
// weak-normalized operand limb (n[0..3] < 2^53, n[4] < 2^49).
// Derived from 2*(2P52 raised) — value check in tests via parity vectors.
constexpr uint64_t NEG4P[5] = {0x5FFFFBFFFFF0BCULL, 0x5FFFFFFFFFFFFAULL,
                               0x5FFFFFFFFFFFFAULL, 0x5FFFFFFFFFFFFAULL,
                               0x3FFFFFFFFFFFAULL};

inline void fe_norm_weak(Fe& a) {
    uint64_t c;
    c = a.n[0] >> 52; a.n[0] &= M52;
    a.n[1] += c; c = a.n[1] >> 52; a.n[1] &= M52;
    a.n[2] += c; c = a.n[2] >> 52; a.n[2] &= M52;
    a.n[3] += c; c = a.n[3] >> 52; a.n[3] &= M52;
    a.n[4] += c;
    uint64_t x = a.n[4] >> 48; a.n[4] &= M48;
    a.n[0] += x * C0;   // < 2^52 + 2^38: stays weak-normalized
}

inline Fe fe_add(const Fe& a, const Fe& b) {
    Fe r;
    for (int i = 0; i < 5; i++) r.n[i] = a.n[i] + b.n[i];
    fe_norm_weak(r);
    return r;
}

inline Fe fe_sub(const Fe& a, const Fe& b) {
    Fe r;  // a + (4p - b), borrow-free: NEG4P limbs exceed weak-normalized b
    for (int i = 0; i < 5; i++) r.n[i] = a.n[i] + (NEG4P[i] - b.n[i]);
    fe_norm_weak(r);
    return r;
}

inline Fe fe_mul(const Fe& a, const Fe& b) {
    u128 t[9] = {};
    for (int i = 0; i < 5; i++) {
        u128 ai = a.n[i];
        for (int j = 0; j < 5; j++) t[i + j] += ai * b.n[j];
    }
    // carry into 52-bit limbs
    uint64_t l[9];
    u128 c = 0;
    for (int k = 0; k < 9; k++) {
        c += t[k];
        l[k] = (uint64_t)c & M52;
        c >>= 52;
    }
    uint64_t c9 = (uint64_t)c;
    // fold H = l[5..8] + c9*2^208 at 2^260: value += H * C16
    uint64_t h[5] = {l[5], l[6], l[7], l[8], c9};
    Fe r;
    u128 cc = 0;
    for (int i = 0; i < 5; i++) {
        cc += (u128)l[i] + (u128)h[i] * C16;
        r.n[i] = (uint64_t)cc & M52;
        cc >>= 52;
    }
    // spill at 2^260 again: cc <= ~2^38, so cc*C16 <= ~2^75 — MUST go
    // through u128 and propagate into limb 1 (a uint64 product here
    // silently wrapped; caught by the p+1 parity vector)
    u128 f = (u128)r.n[0] + (u128)((uint64_t)cc) * C16;
    r.n[0] = (uint64_t)f & M52;
    r.n[1] += (uint64_t)(f >> 52);
    fe_norm_weak(r);
    return r;
}

inline Fe fe_sqr(const Fe& a) { return fe_mul(a, a); }

// canonical representative in [0, p); input weak-normalized
inline void fe_norm_full(Fe& a) {
    fe_norm_weak(a);
    fe_norm_weak(a);
    for (int pass = 0; pass < 2; pass++) {
        bool ge = true;
        for (int i = 4; i >= 0; i--) {
            if (a.n[i] > P52[i]) break;
            if (a.n[i] < P52[i]) { ge = false; break; }
        }
        if (!ge) break;
        uint64_t borrow = 0;
        for (int i = 0; i < 5; i++) {
            uint64_t t = a.n[i] - P52[i] - borrow;
            borrow = (t >> 63) & 1;  // limbs < 2^53, wrap detectable at bit 63
            a.n[i] = t & M52;
        }
        (void)borrow;  // a >= p so the final borrow is always zero
    }
}

Fe fe_inv(const Fe& a) {
    // a^(p-2): the standard secp256k1 addition chain (as in ecc/field.py)
    auto pow2k = [](Fe x, int k) { for (int i = 0; i < k; i++) x = fe_sqr(x); return x; };
    Fe x1 = a;
    Fe x2 = fe_mul(pow2k(x1, 1), x1);
    Fe x3 = fe_mul(pow2k(x2, 1), x1);
    Fe x6 = fe_mul(pow2k(x3, 3), x3);
    Fe x9 = fe_mul(pow2k(x6, 3), x3);
    Fe x11 = fe_mul(pow2k(x9, 2), x2);
    Fe x22 = fe_mul(pow2k(x11, 11), x11);
    Fe x44 = fe_mul(pow2k(x22, 22), x22);
    Fe x88 = fe_mul(pow2k(x44, 44), x44);
    Fe x176 = fe_mul(pow2k(x88, 88), x88);
    Fe x220 = fe_mul(pow2k(x176, 44), x44);
    Fe x223 = fe_mul(pow2k(x220, 3), x3);
    Fe t = fe_mul(pow2k(x223, 23), x22);
    t = fe_mul(pow2k(t, 5), x1);
    t = fe_mul(pow2k(t, 3), x2);
    t = fe_mul(pow2k(t, 2), x1);
    return t;
}

inline Fe fe_from_be(const uint8_t b[32]) {
    uint64_t w[4];
    for (int i = 0; i < 4; i++)
        w[i] = ((uint64_t)b[8 * i] << 56) | ((uint64_t)b[8 * i + 1] << 48) |
               ((uint64_t)b[8 * i + 2] << 40) | ((uint64_t)b[8 * i + 3] << 32) |
               ((uint64_t)b[8 * i + 4] << 24) | ((uint64_t)b[8 * i + 5] << 16) |
               ((uint64_t)b[8 * i + 6] << 8) | (uint64_t)b[8 * i + 7];
    // w[0] most significant
    Fe r;
    r.n[0] = w[3] & M52;
    r.n[1] = ((w[3] >> 52) | (w[2] << 12)) & M52;
    r.n[2] = ((w[2] >> 40) | (w[1] << 24)) & M52;
    r.n[3] = ((w[1] >> 28) | (w[0] << 36)) & M52;
    r.n[4] = w[0] >> 16;
    return r;
}

inline void fe_to_be(const Fe& a_in, uint8_t out[32]) {
    Fe a = a_in;
    fe_norm_full(a);
    uint64_t w[4];  // w[0] most significant
    w[3] = a.n[0] | (a.n[1] << 52);
    w[2] = (a.n[1] >> 12) | (a.n[2] << 40);
    w[1] = (a.n[2] >> 24) | (a.n[3] << 28);
    w[0] = (a.n[3] >> 36) | (a.n[4] << 16);
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 8; j++)
            out[8 * i + j] = (uint8_t)(w[i] >> (56 - 8 * j));
}

inline bool fe_is_odd(const Fe& a_in) {
    Fe a = a_in;
    fe_norm_full(a);
    return a.n[0] & 1;
}

// ---------------------------------------------------------------------------
// Points
// ---------------------------------------------------------------------------

struct Aff { Fe x, y; };
struct Jac { Fe X, Y, Z; bool inf; };

// Mixed Jacobian + affine addition, 8M + 3S.  The fixed-window structure
// guarantees the operands are never equal or negations (see
// vuke_tpu/ecc/point.py module doc for the scalar-disjointness argument),
// so no exceptional-case handling is needed in the hot loop.
inline void madd(Jac& P, const Fe& x2, const Fe& y2) {
    Fe z2 = fe_sqr(P.Z);
    Fe u2 = fe_mul(x2, z2);
    Fe s2 = fe_mul(y2, fe_mul(P.Z, z2));
    Fe h = fe_sub(u2, P.X);
    Fe r = fe_sub(s2, P.Y);
    Fe hh = fe_sqr(h);
    Fe hhh = fe_mul(h, hh);
    Fe v = fe_mul(P.X, hh);
    Fe x3 = fe_sub(fe_sub(fe_sqr(r), hhh), fe_add(v, v));
    Fe y3 = fe_sub(fe_mul(r, fe_sub(v, x3)), fe_mul(P.Y, hhh));
    P.X = x3;
    P.Y = y3;
    P.Z = fe_mul(P.Z, h);
}

// Jacobian doubling (a = 0), used only in table construction where the
// d=2 entry is acc + acc (the hot loop never doubles — see madd note).
inline void jdouble(Jac& P) {
    Fe A = fe_sqr(P.X);
    Fe B = fe_sqr(P.Y);
    Fe C = fe_sqr(B);
    Fe t = fe_sqr(fe_add(P.X, B));
    Fe D = fe_sub(fe_sub(t, A), C);
    D = fe_add(D, D);
    Fe E = fe_add(fe_add(A, A), A);
    Fe F = fe_sqr(E);
    Fe X3 = fe_sub(F, fe_add(D, D));
    Fe eightC = fe_add(C, C);
    eightC = fe_add(eightC, eightC);
    eightC = fe_add(eightC, eightC);
    Fe Y3 = fe_sub(fe_mul(E, fe_sub(D, X3)), eightC);
    Fe Z3 = fe_mul(fe_add(P.Y, P.Y), P.Z);
    P.X = X3; P.Y = Y3; P.Z = Z3;
}

// ---------------------------------------------------------------------------
// Fixed-base window table: T[w][d-1] = d * 2^(8w) * G, affine, d in 1..255
// ---------------------------------------------------------------------------

constexpr uint64_t GX52[5] = {0x2815B16F81798ULL, 0xDB2DCE28D959FULL,
                              0xE870B07029BFCULL, 0xBBAC55A06295CULL,
                              0x79BE667EF9DCULL};
constexpr uint64_t GY52[5] = {0x7D08FFB10D4B8ULL, 0x48A68554199C4ULL,
                              0xE1108A8FD17B4ULL, 0xC4655DA4FBFC0ULL,
                              0x483ADA7726A3ULL};

std::vector<Aff> g_table;  // 32 * 255 entries
std::once_flag g_table_once;

void batch_to_affine(Jac* pts, Aff* out, int n) {
    // Montgomery batch inversion of all Z's (none infinity by construction)
    std::vector<Fe> pref(n);
    Fe acc;
    acc.n[0] = 1; acc.n[1] = acc.n[2] = acc.n[3] = acc.n[4] = 0;
    for (int i = 0; i < n; i++) {
        pref[i] = acc;               // exclusive prefix
        acc = fe_mul(acc, pts[i].Z);
    }
    Fe inv = fe_inv(acc);
    for (int i = n - 1; i >= 0; i--) {
        Fe zi = fe_mul(inv, pref[i]);
        inv = fe_mul(inv, pts[i].Z);
        Fe zi2 = fe_sqr(zi);
        out[i].x = fe_mul(pts[i].X, zi2);
        out[i].y = fe_mul(pts[i].Y, fe_mul(zi, zi2));
    }
}

void build_table() {
    g_table.resize(32 * 255);
    Aff base;
    memcpy(base.x.n, GX52, sizeof(GX52));
    memcpy(base.y.n, GY52, sizeof(GY52));
    std::vector<Jac> jac(256);
    std::vector<Aff> aff(256);
    for (int w = 0; w < 32; w++) {
        // entries d = 1..255 as Jacobian chain, plus d = 256 (next base)
        Jac acc;
        acc.X = base.x; acc.Y = base.y;
        acc.Z.n[0] = 1; acc.Z.n[1] = acc.Z.n[2] = acc.Z.n[3] = acc.Z.n[4] = 0;
        jac[0] = acc;
        for (int d = 2; d <= 256; d++) {
            if (d == 2) jdouble(acc);  // acc == base: the one doubling case
            else madd(acc, base.x, base.y);
            jac[d - 1] = acc;
        }
        batch_to_affine(jac.data(), aff.data(), 256);
        for (int d = 1; d <= 255; d++) g_table[w * 255 + d - 1] = aff[d - 1];
        base = aff[255];  // 256 * old base
    }
}

// ---------------------------------------------------------------------------
// Scalar normalization mod n (group order), zero -> 1
// ---------------------------------------------------------------------------

constexpr uint64_t N64[4] = {0xBFD25E8CD0364141ULL, 0xBAAEDCE6AF48A03BULL,
                             0xFFFFFFFFFFFFFFFEULL, 0xFFFFFFFFFFFFFFFFULL};

void normalize_scalar_be(const uint8_t in[32], uint8_t out[32]) {
    uint64_t w[4];  // little-endian u64 words
    for (int i = 0; i < 4; i++) {
        const uint8_t* b = in + 8 * (3 - i);
        w[i] = ((uint64_t)b[0] << 56) | ((uint64_t)b[1] << 48) |
               ((uint64_t)b[2] << 40) | ((uint64_t)b[3] << 32) |
               ((uint64_t)b[4] << 24) | ((uint64_t)b[5] << 16) |
               ((uint64_t)b[6] << 8) | (uint64_t)b[7];
    }
    bool ge = true;
    for (int i = 3; i >= 0; i--) {
        if (w[i] > N64[i]) break;
        if (w[i] < N64[i]) { ge = false; break; }
    }
    if (ge) {  // value < 2^256 < 2n, so one subtract suffices
        u128 borrow = 0;
        for (int i = 0; i < 4; i++) {
            u128 t = (u128)w[i] - N64[i] - borrow;
            w[i] = (uint64_t)t;
            borrow = (t >> 64) & 1;
        }
    }
    if ((w[0] | w[1] | w[2] | w[3]) == 0) w[0] = 1;
    for (int i = 0; i < 4; i++) {
        uint8_t* b = out + 8 * (3 - i);
        for (int j = 0; j < 8; j++) b[j] = (uint8_t)(w[i] >> (56 - 8 * j));
    }
}

// ---------------------------------------------------------------------------
// SHA-256 (fixed-size inputs) + RIPEMD-160 for hash160
// ---------------------------------------------------------------------------

const uint32_t SK[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

inline uint32_t rotr32(uint32_t x, int k) { return (x >> k) | (x << (32 - k)); }
inline uint32_t rotl32(uint32_t x, int k) { return (x << k) | (x >> (32 - k)); }

void sha256_compress(uint32_t h[8], const uint8_t block[64]) {
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
        w[i] = ((uint32_t)block[4 * i] << 24) | ((uint32_t)block[4 * i + 1] << 16) |
               ((uint32_t)block[4 * i + 2] << 8) | (uint32_t)block[4 * i + 3];
    for (int i = 16; i < 64; i++) {
        uint32_t s0 = rotr32(w[i - 15], 7) ^ rotr32(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = rotr32(w[i - 2], 17) ^ rotr32(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3],
             e = h[4], f = h[5], g = h[6], hh = h[7];
    for (int i = 0; i < 64; i++) {
        uint32_t S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = hh + S1 + ch + SK[i] + w[i];
        uint32_t S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
        uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = S0 + maj;
        hh = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
}

void sha256_fixed(const uint8_t* data, int len, uint8_t out[32]) {
    // len <= 119 (at most two blocks) — covers the 33/65-byte pubkeys
    uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                     0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    uint8_t block[128] = {};
    memcpy(block, data, len);
    block[len] = 0x80;
    int blocks = (len + 9 + 63) / 64;
    uint64_t bits = (uint64_t)len * 8;
    for (int j = 0; j < 8; j++)
        block[blocks * 64 - 1 - j] = (uint8_t)(bits >> (8 * j));
    for (int b = 0; b < blocks; b++) sha256_compress(h, block + 64 * b);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (uint8_t)(h[i] >> 24);
        out[4 * i + 1] = (uint8_t)(h[i] >> 16);
        out[4 * i + 2] = (uint8_t)(h[i] >> 8);
        out[4 * i + 3] = (uint8_t)h[i];
    }
}

// RIPEMD-160 (single 64-byte block input: the 32-byte sha256 digest)
const int RR[80] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13};
const int RRp[80] = {
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11};
const int RS[80] = {
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6};
const int RSp[80] = {
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11};

inline uint32_t rmd_f(int j, uint32_t x, uint32_t y, uint32_t z) {
    if (j < 16) return x ^ y ^ z;
    if (j < 32) return (x & y) | (~x & z);
    if (j < 48) return (x | ~y) ^ z;
    if (j < 64) return (x & z) | (y & ~z);
    return x ^ (y | ~z);
}

void ripemd160_of_sha(const uint8_t digest[32], uint8_t out[20]) {
    uint8_t block[64] = {};
    memcpy(block, digest, 32);
    block[32] = 0x80;
    uint64_t bits = 256;
    for (int j = 0; j < 8; j++) block[56 + j] = (uint8_t)(bits >> (8 * j));
    uint32_t x[16];
    for (int i = 0; i < 16; i++)
        x[i] = (uint32_t)block[4 * i] | ((uint32_t)block[4 * i + 1] << 8) |
               ((uint32_t)block[4 * i + 2] << 16) | ((uint32_t)block[4 * i + 3] << 24);
    const uint32_t KL[5] = {0, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc, 0xa953fd4e};
    const uint32_t KR[5] = {0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9, 0};
    uint32_t h0 = 0x67452301, h1 = 0xefcdab89, h2 = 0x98badcfe,
             h3 = 0x10325476, h4 = 0xc3d2e1f0;
    uint32_t al = h0, bl = h1, cl = h2, dl = h3, el = h4;
    uint32_t ar = h0, br = h1, cr = h2, dr = h3, er = h4;
    for (int j = 0; j < 80; j++) {
        uint32_t t = rotl32(al + rmd_f(j, bl, cl, dl) + x[RR[j]] + KL[j / 16],
                            RS[j]) + el;
        al = el; el = dl; dl = rotl32(cl, 10); cl = bl; bl = t;
        t = rotl32(ar + rmd_f(79 - j, br, cr, dr) + x[RRp[j]] + KR[j / 16],
                   RSp[j]) + er;
        ar = er; er = dr; dr = rotl32(cr, 10); cr = br; br = t;
    }
    uint32_t t = h1 + cl + dr;
    h1 = h2 + dl + er; h2 = h3 + el + ar; h3 = h4 + al + br;
    h4 = h0 + bl + cr; h0 = t;
    uint32_t h[5] = {h0, h1, h2, h3, h4};
    for (int i = 0; i < 5; i++) {
        out[4 * i] = (uint8_t)h[i];
        out[4 * i + 1] = (uint8_t)(h[i] >> 8);
        out[4 * i + 2] = (uint8_t)(h[i] >> 16);
        out[4 * i + 3] = (uint8_t)(h[i] >> 24);
    }
}

inline void hash160(const uint8_t* data, int len, uint8_t out[20]) {
    uint8_t d[32];
    sha256_fixed(data, len, d);
    ripemd160_of_sha(d, out);
}

// ---------------------------------------------------------------------------
// Batch derive
// ---------------------------------------------------------------------------

void derive_chunk(const uint8_t* keys, int n, uint8_t* h160c, uint8_t* h160u,
                  uint8_t* norm_out, uint8_t* pub_out) {
    std::vector<Jac> pts(n);
    std::vector<uint8_t> norm_local;
    const uint8_t* norm = norm_out;
    if (!norm_out) {
        norm_local.resize((size_t)n * 32);
        norm_out = norm_local.data();
        norm = norm_out;
    }
    for (int i = 0; i < n; i++) {
        normalize_scalar_be(keys + 32 * i, norm_out + 32 * i);
        const uint8_t* k = norm_out + 32 * i;
        Jac acc;
        acc.inf = true;
        for (int w = 0; w < 32; w++) {
            int d = k[31 - w];  // byte w = scalar bits [8w, 8w+8), LSB first
            if (!d) continue;
            const Aff& e = g_table[w * 255 + d - 1];
            if (acc.inf) {
                acc.X = e.x; acc.Y = e.y;
                acc.Z.n[0] = 1;
                acc.Z.n[1] = acc.Z.n[2] = acc.Z.n[3] = acc.Z.n[4] = 0;
                acc.inf = false;
            } else {
                madd(acc, e.x, e.y);
            }
        }
        pts[i] = acc;  // scalars in [1, n-1] => never infinity here
    }
    std::vector<Aff> aff(n);
    batch_to_affine(pts.data(), aff.data(), n);
    uint8_t pub[65];
    for (int i = 0; i < n; i++) {
        fe_to_be(aff[i].x, pub + 1);
        uint8_t ybytes[32];
        fe_to_be(aff[i].y, ybytes);
        pub[0] = 0x02 | (ybytes[31] & 1);
        if (h160c) hash160(pub, 33, h160c + 20 * i);
        pub[0] = 0x04;
        memcpy(pub + 33, ybytes, 32);
        if (h160u) hash160(pub, 65, h160u + 20 * i);
        if (pub_out) memcpy(pub_out + 65 * (size_t)i, pub, 65);
    }
    (void)norm;
}

}  // namespace

extern "C" {

// Batch key -> hash160 derivation (the CPU-backend pipeline core).
//   keys:  n * 32 bytes, big-endian raw private keys (normalized mod n
//          internally; zero -> 1 — derive.rs:79-93 semantics)
//   h160c: n * 20 bytes out, hash160(compressed pubkey)
//   h160u: n * 20 bytes out, hash160(uncompressed pubkey)
//   norm_out: optional n * 32 bytes out — the normalized keys (nullable)
//   n_threads: <= 0 means hardware concurrency
static void batch_derive_impl(const uint8_t* keys, int n, int n_threads,
                              uint8_t* h160c, uint8_t* h160u,
                              uint8_t* norm_out, uint8_t* pub_out) {
    std::call_once(g_table_once, build_table);
    if (n <= 0) return;
    unsigned hw = std::thread::hardware_concurrency();
    int T = n_threads > 0 ? n_threads : (hw ? (int)hw : 4);
    if (T > n / 64) T = n / 64 ? n / 64 : 1;  // keep chunks big enough
    if (T <= 1) {
        derive_chunk(keys, n, h160c, h160u, norm_out, pub_out);
        return;
    }
    std::vector<std::thread> threads;
    int per = (n + T - 1) / T;
    for (int t = 0; t < T; t++) {
        int lo = t * per;
        int hi = lo + per < n ? lo + per : n;
        if (lo >= hi) break;
        threads.emplace_back([=]() {
            derive_chunk(keys + 32 * (size_t)lo, hi - lo,
                         h160c ? h160c + 20 * (size_t)lo : nullptr,
                         h160u ? h160u + 20 * (size_t)lo : nullptr,
                         norm_out ? norm_out + 32 * (size_t)lo : nullptr,
                         pub_out ? pub_out + 65 * (size_t)lo : nullptr);
        });
    }
    for (auto& th : threads) th.join();
}

void vuke_batch_derive_h160(const uint8_t* keys, int n, int n_threads,
                            uint8_t* h160c, uint8_t* h160u,
                            uint8_t* norm_out) {
    batch_derive_impl(keys, n, n_threads, h160c, h160u, norm_out, nullptr);
}

// Batch uncompressed pubkeys (0x04 || x || y, 65 bytes each) for host
// full-derive paths (WIF/address/pubkey string columns).  Keys normalized
// mod n internally like vuke_batch_derive_h160.
void vuke_batch_pubkey(const uint8_t* keys, int n, int n_threads,
                       uint8_t* pub65_out, uint8_t* norm_out) {
    batch_derive_impl(keys, n, n_threads, nullptr, nullptr, norm_out,
                      pub65_out);
}

int vuke_ecc_version() { return 1; }

}  // extern "C"
