"""Bit-exact primitive cores (hashes, PRNG keystreams) over uint32 lanes."""

from . import common, lcg, md5, mt19937, ripemd160, sha256, sha256_chain, xorshift  # noqa: F401
