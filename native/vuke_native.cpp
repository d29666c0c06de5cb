// vuke-tpu native host library: batch Bitcoin encodings.
//
// The TPU owns the compute path (JAX/XLA); this C++ library owns the
// host-side string hot paths the reference implements in Rust — base58check
// (WIF, P2PKH) and bech32 (P2WPKH) encoding at scale for generate-mode
// output and hit formatting (/root/reference/src/derive.rs:121-147 uses the
// bitcoin crate's native encoders; Python-level encoding is ~30x slower).
//
// Exposed as a C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstring>

namespace {

// ---------------------------------------------------------------------------
// SHA-256 (for base58check checksums)
// ---------------------------------------------------------------------------

const uint32_t K[64] = {
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

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

void sha256(const uint8_t* data, size_t len, uint8_t out[32]) {
    uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                     0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    size_t total = len + 1 + 8;
    size_t blocks = (total + 63) / 64;
    for (size_t b = 0; b < blocks; b++) {
        uint8_t chunk[64];
        for (int i = 0; i < 64; i++) {
            size_t pos = b * 64 + i;
            if (pos < len) chunk[i] = data[pos];
            else if (pos == len) chunk[i] = 0x80;
            else if (pos >= blocks * 64 - 8) {
                uint64_t bits = (uint64_t)len * 8;
                chunk[i] = (uint8_t)(bits >> (8 * (blocks * 64 - 1 - pos)));
            } else chunk[i] = 0;
        }
        uint32_t w[64];
        for (int i = 0; i < 16; i++)
            w[i] = (uint32_t(chunk[4 * i]) << 24) | (uint32_t(chunk[4 * i + 1]) << 16) |
                   (uint32_t(chunk[4 * i + 2]) << 8) | uint32_t(chunk[4 * i + 3]);
        for (int i = 16; i < 64; i++) {
            uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
            uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
            w[i] = w[i - 16] + s0 + w[i - 7] + s1;
        }
        uint32_t a = h[0], bb = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
                 g = h[6], hh = h[7];
        for (int i = 0; i < 64; i++) {
            uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
            uint32_t ch = (e & f) ^ (~e & g);
            uint32_t t1 = hh + S1 + ch + K[i] + w[i];
            uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
            uint32_t maj = (a & bb) ^ (a & c) ^ (bb & c);
            uint32_t t2 = S0 + maj;
            hh = g; g = f; f = e; e = d + t1; d = c; c = bb; bb = a; a = t1 + t2;
        }
        h[0] += a; h[1] += bb; h[2] += c; h[3] += d;
        h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
    }
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (uint8_t)(h[i] >> 24);
        out[4 * i + 1] = (uint8_t)(h[i] >> 16);
        out[4 * i + 2] = (uint8_t)(h[i] >> 8);
        out[4 * i + 3] = (uint8_t)h[i];
    }
}

const char B58[] = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz";
const char BECH32[] = "qpzry9x8gf2tvdw0s3jn54khce6mua7l";

// base58check of payload (<= 40 bytes). Returns length written.
int b58check(const uint8_t* payload, int len, char* out, int outcap) {
    uint8_t data[48];
    memcpy(data, payload, len);
    uint8_t h1[32], h2[32];
    sha256(payload, len, h1);
    sha256(h1, 32, h2);
    memcpy(data + len, h2, 4);
    int dlen = len + 4;

    // count leading zeros
    int zeros = 0;
    while (zeros < dlen && data[zeros] == 0) zeros++;

    // big-number base conversion (repeated div-mod 58 on byte string)
    char buf[96];
    int blen = 0;
    uint8_t num[48];
    memcpy(num, data, dlen);
    int start = zeros;
    while (start < dlen) {
        int rem = 0;
        for (int i = start; i < dlen; i++) {
            int v = rem * 256 + num[i];
            num[i] = (uint8_t)(v / 58);
            rem = v % 58;
        }
        buf[blen++] = B58[rem];
        while (start < dlen && num[start] == 0) start++;
    }
    int olen = zeros + blen;
    if (olen >= outcap) return -1;
    for (int i = 0; i < zeros; i++) out[i] = '1';
    for (int i = 0; i < blen; i++) out[zeros + i] = buf[blen - 1 - i];
    out[olen] = 0;
    return olen;
}

uint32_t bech32_polymod(const uint8_t* values, int len) {
    static const uint32_t gen[5] = {0x3b6a57b2, 0x26508e6d, 0x1ea119fa,
                                    0x3d4233dd, 0x2a1462b3};
    uint32_t chk = 1;
    for (int i = 0; i < len; i++) {
        uint32_t top = chk >> 25;
        chk = ((chk & 0x1ffffff) << 5) ^ values[i];
        for (int j = 0; j < 5; j++)
            if ((top >> j) & 1) chk ^= gen[j];
    }
    return chk;
}

// bech32 v0 address for a 20-byte program with hrp "bc" (mainnet) etc.
int bech32_v0(const char* hrp, const uint8_t* prog20, char* out, int outcap) {
    int hlen = (int)strlen(hrp);
    // data part: witness version 0 + 32 x 5-bit groups
    uint8_t data[33];
    data[0] = 0;
    int bits = 0, acc = 0, di = 1;
    for (int i = 0; i < 20; i++) {
        acc = (acc << 8) | prog20[i];
        bits += 8;
        while (bits >= 5) {
            bits -= 5;
            data[di++] = (acc >> bits) & 31;
        }
    }
    if (bits) data[di++] = (acc << (5 - bits)) & 31;
    // checksum
    uint8_t values[128];
    int vi = 0;
    for (int i = 0; i < hlen; i++) values[vi++] = hrp[i] >> 5;
    values[vi++] = 0;
    for (int i = 0; i < hlen; i++) values[vi++] = hrp[i] & 31;
    for (int i = 0; i < di; i++) values[vi++] = data[i];
    for (int i = 0; i < 6; i++) values[vi++] = 0;
    uint32_t pm = bech32_polymod(values, vi) ^ 1;

    int olen = hlen + 1 + di + 6;
    if (olen >= outcap) return -1;
    int o = 0;
    for (int i = 0; i < hlen; i++) out[o++] = hrp[i];
    out[o++] = '1';
    for (int i = 0; i < di; i++) out[o++] = BECH32[data[i]];
    for (int i = 0; i < 6; i++) out[o++] = BECH32[(pm >> (5 * (5 - i))) & 31];
    out[o] = 0;
    return olen;
}

}  // namespace

extern "C" {

// Batch P2PKH addresses: n hash160s (20 bytes each, contiguous) -> base58
// strings written at out + i*stride (NUL-terminated).
void vuke_batch_p2pkh(const uint8_t* h160s, int n, uint8_t version,
                      char* out, int stride) {
    uint8_t payload[21];
    payload[0] = version;
    for (int i = 0; i < n; i++) {
        memcpy(payload + 1, h160s + 20 * i, 20);
        b58check(payload, 21, out + (size_t)i * stride, stride);
    }
}

// Batch P2WPKH (bech32 v0) addresses.
void vuke_batch_p2wpkh(const uint8_t* h160s, int n, const char* hrp,
                       char* out, int stride) {
    for (int i = 0; i < n; i++)
        bech32_v0(hrp, h160s + 20 * i, out + (size_t)i * stride, stride);
}

// Batch WIF: n 32-byte keys -> WIF strings (compressed flag appended if set).
void vuke_batch_wif(const uint8_t* keys, int n, uint8_t version,
                    int compressed, char* out, int stride) {
    uint8_t payload[34];
    payload[0] = version;
    int plen = compressed ? 34 : 33;
    for (int i = 0; i < n; i++) {
        memcpy(payload + 1, keys + 32 * i, 32);
        if (compressed) payload[33] = 0x01;
        b58check(payload, plen, out + (size_t)i * stride, stride);
    }
}

// Single base58check encode (for tests / generic payloads).
int vuke_b58check_encode(const uint8_t* payload, int len, char* out, int outcap) {
    if (len > 40) return -1;
    return b58check(payload, len, out, outcap);
}

int vuke_native_version() { return 1; }

}  // extern "C"
