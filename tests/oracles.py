"""Pure-Python oracle implementations used to verify the JAX cores.

Independent re-implementations with Python ints (not jnp), pinned to
published known-answer vectors where available:
  - std::mt19937 default seed 5489: 10000th output == 4123659995 (C++ std)
  - std::mt19937_64 default seed 5489: 10000th output == 9981545732273789042
  - glibc-style LCG srand(1): 1103527590, 377401575, 662824084
    (/root/reference/src/lcg.rs tests)
"""

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


class MT19937:
    def __init__(self, seed: int):
        self.mt = [0] * 624
        self.mt[0] = seed & M32
        for i in range(1, 624):
            self.mt[i] = (1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30)) + i) & M32
        self.mti = 624

    def _twist(self):
        for i in range(624):
            y = (self.mt[i] & 0x80000000) | (self.mt[(i + 1) % 624] & 0x7FFFFFFF)
            x = self.mt[(i + 397) % 624] ^ (y >> 1)
            if y & 1:
                x ^= 0x9908B0DF
            self.mt[i] = x
        self.mti = 0

    def next_u32(self) -> int:
        if self.mti >= 624:
            self._twist()
        y = self.mt[self.mti]
        self.mti += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680 & M32
        y ^= (y << 15) & 0xEFC60000 & M32
        y ^= y >> 18
        return y & M32

    def fill_bytes(self, n: int) -> bytes:
        # rand_mt semantics: successive u32 outputs, little-endian each
        out = b""
        while len(out) < n:
            out += self.next_u32().to_bytes(4, "little")
        return out[:n]


class MT19937_64:
    def __init__(self, seed: int):
        self.mt = [0] * 312
        self.mt[0] = seed & M64
        for i in range(1, 312):
            self.mt[i] = (6364136223846793005 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 62)) + i) & M64
        self.mti = 312

    def _twist(self):
        for i in range(312):
            y = (self.mt[i] & 0xFFFFFFFF80000000) | (self.mt[(i + 1) % 312] & 0x7FFFFFFF)
            x = self.mt[(i + 156) % 312] ^ (y >> 1)
            if y & 1:
                x ^= 0xB5026F5AA96619E9
            self.mt[i] = x
        self.mti = 0

    def next_u64(self) -> int:
        if self.mti >= 312:
            self._twist()
        y = self.mt[self.mti]
        self.mti += 1
        y ^= (y >> 29) & 0x5555555555555555
        y ^= (y << 17) & 0x71D67FFFEDA60000
        y ^= (y << 37) & 0xFFF7EEE000000000
        y ^= y >> 43
        return y & M64

    def fill_bytes(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            out += self.next_u64().to_bytes(8, "little")
        return out[:n]


def lcg_key(seed: int, a: int, c: int, m: int, big_endian: bool) -> bytes:
    state = seed
    out = b""
    for _ in range(8):
        state = (a * state + c) % m
        out += (state & M32).to_bytes(4, "big" if big_endian else "little")
    return out


def splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return x ^ (x >> 31)


def xorshift64_key(seed: int) -> bytes:
    s = seed if seed != 0 else 1
    out = b""
    for _ in range(4):
        s ^= (s << 13) & M64
        s ^= s >> 7
        s ^= (s << 17) & M64
        out += s.to_bytes(8, "big")
    return out


def xorshift128_key(seed: int) -> bytes:
    seed = seed if seed != 0 else 1
    x = seed & M32
    y = (seed >> 32) & M32
    z = (seed & M32) ^ 0x12345678
    w = ((seed >> 32) ^ 0x87654321) & M32
    out = b""
    for _ in range(8):
        t = (x ^ (x << 11)) & M32
        x, y, z = y, z, w
        w = ((w ^ (w >> 19)) ^ (t ^ (t >> 8))) & M32
        out += w.to_bytes(4, "big")
    return out


def _xoroshiro_seed(seed: int):
    seed = seed if seed != 0 else 1
    s0 = splitmix64(seed)
    s1 = splitmix64(s0)
    return s0, s1


def _xoroshiro_advance(s0: int, s1: int):
    s1 ^= s0
    new_s0 = (((s0 << 24) | (s0 >> 40)) & M64) ^ s1 ^ ((s1 << 16) & M64)
    new_s1 = ((s1 << 37) | (s1 >> 27)) & M64
    return new_s0, new_s1


def xorshift128plus_key(seed: int) -> bytes:
    s0, s1 = _xoroshiro_seed(seed)
    out = b""
    for _ in range(4):
        out += ((s0 + s1) & M64).to_bytes(8, "big")
        s0, s1 = _xoroshiro_advance(s0, s1)
    return out


def xoroshiro128starstar_key(seed: int) -> bytes:
    s0, s1 = _xoroshiro_seed(seed)
    out = b""
    for _ in range(4):
        r = (s0 * 5) & M64
        r = ((r << 7) | (r >> 57)) & M64
        r = (r * 9) & M64
        out += r.to_bytes(8, "big")
        s0, s1 = _xoroshiro_advance(s0, s1)
    return out
