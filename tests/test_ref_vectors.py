"""Reference inline-test vector parity.

Vector-for-vector ports of the reference's inline #[cfg(test)] suites that
were not yet covered elsewhere:

| Reference test mod | Count | Here |
|---|---|---|
| analyze/key_parser.rs:231-401 (parse + cascade grammar) | 25 | TestKeyParser |
| output/query_format.rs:269-418 (json/csv/table formatting) | 12* | TestQueryFormat |

(*) query_format vectors that map onto this design: OutputFormat::from_str is
click's Choice validation (tests/test_cli.py covers rejection), and the
Value::Timestamp/Row plumbing is pyarrow/duckdb's — the formatting behaviors
(escaping, empties, binary hex, widths) are what carries over.

The PRNG/transform vector mass (lcg.rs, xorshift.rs, sha256_chain.rs,
mt19937 anchors) lives in tests/test_cores.py against independent host
oracles; the wallet vectors (electrum.rs:216-285, multibit.rs:404+) in
tests/test_wallets.py.
"""

import json

import pytest

from vuke_tpu.analyze.key_parser import (ParseError, apply_mask, parse_cascade,
                                         parse_private_key)
from vuke_tpu.storage.query import format_results


class TestKeyParser:
    """analyze/key_parser.rs:231-401, one test per reference vector."""

    HEX = "c4bbcb1fbec99d65bf59d85c8cb62ee2db963f0fe106f483d9afa73bd4e39a8a"

    def test_parse_hex(self):
        key = parse_private_key(self.HEX)
        assert key[0] == 0xC4 and key[31] == 0x8A

    def test_parse_hex_with_prefix(self):
        assert parse_private_key("0x" + self.HEX)[0] == 0xC4

    def test_parse_short_hex_5_bits(self):
        key = parse_private_key("0x15")
        assert key[31] == 0x15 and key[30] == 0 and key[0] == 0

    def test_parse_short_hex_10_bits(self):
        key = parse_private_key("0x202")
        assert key[31] == 0x02 and key[30] == 0x02

    def test_parse_short_hex_20_bits(self):
        key = parse_private_key("0xd2c55")
        assert key[31] == 0x55 and key[30] == 0x2C and key[29] == 0x0D

    def test_parse_short_hex_without_prefix(self):
        assert parse_private_key("1f")[31] == 0x1F

    def test_parse_wif_uncompressed(self):
        wif = "5KJvsngHeMpm884wtkJNzQGaCErckhHJBGFsvd3VyK5qMZXj3hS"
        assert parse_private_key(wif)[0] == 0xC4

    def test_parse_wif_compressed(self):
        wif = "L3p8oAcQTtuokSCRHQ7i4MhjWc9zornvpJLfmg62sYpLRJF9woSu"
        assert parse_private_key(wif)[0] == 0xC4

    def test_parse_decimal(self):
        key = parse_private_key("1")
        assert key[31] == 1 and key[0] == 0

    def test_parse_decimal_large(self):
        # n - 1, the largest valid scalar
        dec = ("11579208923731619542357098500868790785283756427907"
               "4904382605163141518161494336")
        assert parse_private_key(dec) != b"\x00" * 32

    def test_parse_decimal_out_of_range(self):
        dec = ("11579208923731619542357098500868790785283756427907"
               "4904382605163141518161494337")  # n
        with pytest.raises(ParseError):
            parse_private_key(dec)

    def test_parse_invalid(self):
        for bad in ("not a key", "", "zzzz"):
            with pytest.raises(ParseError):
                parse_private_key(bad)

    def test_parse_cascade_hex(self):
        assert parse_cascade("5:0x15,10:0x202") == [(5, 0x15), (10, 0x202)]

    def test_parse_cascade_decimal(self):
        assert parse_cascade("5:21,10:514") == [(5, 21), (10, 514)]

    def test_parse_cascade_mixed(self):
        assert parse_cascade("5:0x15,10:514,20:0xd2c55") == [
            (5, 0x15), (10, 514), (20, 0xD2C55)]

    def test_parse_cascade_sorts_by_bits(self):
        result = parse_cascade("20:0xd2c55,5:0x15,10:0x202")
        assert [b for b, _ in result] == [5, 10, 20]

    def test_parse_cascade_with_spaces(self):
        assert len(parse_cascade(" 5:0x15 , 10:0x202 ")) == 2

    def test_parse_cascade_single_target_fails(self):
        with pytest.raises(ParseError):
            parse_cascade("5:0x15")

    def test_parse_cascade_empty_fails(self):
        with pytest.raises(ParseError):
            parse_cascade("")

    def test_parse_cascade_invalid_format(self):
        for bad in ("5-0x15,10-0x202", "5:,10:0x202", ":0x15,10:0x202"):
            with pytest.raises(ParseError):
                parse_cascade(bad)

    def test_parse_cascade_bits_out_of_range(self):
        for bad in ("0:0x15,10:0x202", "65:0x15,10:0x202"):
            with pytest.raises(ParseError):
                parse_cascade(bad)

    def test_parse_cascade_target_exceeds_bits(self):
        with pytest.raises(ParseError):
            parse_cascade("5:0x20,10:0x202")

    def test_parse_cascade_high_bit_not_set(self):
        with pytest.raises(ParseError):
            parse_cascade("5:0x05,10:0x202")

    def test_parse_cascade_skips_empty_segments(self):
        assert parse_cascade("5:0x15,,10:0x202") == [(5, 0x15), (10, 0x202)]

    def test_parse_cascade_duplicate_target_fails(self):
        with pytest.raises(ParseError):
            parse_cascade("5:0x15,5:0x15,10:0x202")

    def test_apply_mask_formula(self):
        # (low-8-bytes & mask) | high_bit — milksad.rs:146-189
        key = bytes(24) + (0x0123456789ABCDEF).to_bytes(8, "big")
        assert apply_mask(key, 8) == (0xEF & 0xFF) | 0x80
        assert apply_mask(key, 64) == 0x0123456789ABCDEF | (1 << 63)


class TestQueryFormat:
    """output/query_format.rs:269-418 formatting vectors."""

    def test_format_json_empty(self):
        assert json.loads(format_results([], ["a"], "json")) == []

    def test_format_json_single_row(self):
        out = format_results([("test", 42)], ["source", "count"], "json")
        data = json.loads(out)
        assert data == [{"source": "test", "count": 42}]

    def test_format_json_escapes_strings(self):
        out = format_results([('hello\n"world"',)], ["text"], "json")
        assert "\\n" in out and '\\"' in out
        assert json.loads(out)[0]["text"] == 'hello\n"world"'

    def test_format_json_binary_as_hex(self):
        out = format_results([(b"\xde\xad",)], ["blob"], "json")
        assert json.loads(out)[0]["blob"] == "dead"

    def test_format_json_null(self):
        out = format_results([(None,)], ["v"], "json")
        assert json.loads(out)[0]["v"] is None

    def test_format_csv_empty(self):
        assert format_results([], ["a", "b"], "csv") == ""

    def test_format_csv_with_data(self):
        out = format_results([("test", 42)], ["source", "count"], "csv")
        lines = out.splitlines()
        assert lines[0] == "source,count"
        assert lines[1] == "test,42"

    def test_format_csv_escapes_commas(self):
        out = format_results([("hello, world",)], ["text"], "csv")
        assert '"hello, world"' in out

    def test_format_csv_escapes_quotes(self):
        out = format_results([('say "hello"',)], ["text"], "csv")
        assert '"say ""hello"""' in out

    def test_format_table_empty(self):
        out = format_results([], [], "table")
        assert out == "(no results)"

    def test_format_table_with_data(self):
        out = format_results([("test", 42)], ["source", "count"], "table")
        for s in ("source", "count", "test", "42"):
            assert s in out
        assert out.endswith("1 row(s)")

    def test_format_table_binary_as_hex(self):
        out = format_results([(b"\xde\xad",)], ["k"], "table")
        assert "dead" in out

    def test_output_format_from_str(self):
        # query_format.rs:269-284: case-insensitive, unknown rejected
        from vuke_tpu.storage.query import parse_output_format
        for s in ("table", "TABLE", "json", "JSON", "csv", "CSV"):
            assert parse_output_format(s) == s.lower()
        with pytest.raises(ValueError, match="Unknown format"):
            parse_output_format("xml")

    def test_escape_json_string_special_chars(self):
        # query_format.rs:358-366: quote/backslash/newline/tab escaped
        out = format_results([('"\\\n\t',)], ["text"], "json")
        assert '\\"' in out and "\\\\" in out and "\\n" in out and "\\t" in out
        assert json.loads(out)[0]["text"] == '"\\\n\t'

    def test_escape_csv_field_variants(self):
        # query_format.rs:367-381: plain passthrough, comma and quote quoting
        assert "hello" in format_results([("hello",)], ["t"], "csv")
        assert '"a,b"' in format_results([("a,b",)], ["t"], "csv")
        assert '"say ""hi"""' in format_results([('say "hi"',)], ["t"], "csv")

    def test_format_value_json_types(self):
        # query_format.rs:382-396 + 127-145: null/int/string/binary and
        # non-finite floats -> null
        out = json.loads(format_results(
            [(None, 42, 100, "test", b"\xde\xad", float("nan"), float("inf"))],
            ["n", "i", "u", "s", "b", "nan", "inf"], "json"))
        assert out == [{"n": None, "i": 42, "u": 100, "s": "test",
                        "b": "dead", "nan": None, "inf": None}]

    def test_format_value_json_timestamp_rfc3339(self):
        # query_format.rs:397-405: timestamps render as quoted RFC3339
        import datetime
        ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
        out = format_results([(ts,)], ["ts"], "json")
        v = json.loads(out)[0]["ts"]
        assert isinstance(v, str) and v.startswith("2024-01-01")
        # naive timestamps (no tz) are still quoted strings (rs:406-413)
        naive = json.loads(format_results(
            [(datetime.datetime(2024, 1, 1),)], ["ts"], "json"))[0]["ts"]
        assert isinstance(naive, str)

    def test_format_table_truncation(self):
        # query_format.rs:414-421: long cells truncated with "..."
        long_cell = "\U0001F511" * 50 + "x" * 60
        out = format_results([(long_cell,)], ["key"], "table")
        assert "\U0001F511" in out
        assert "..." in out

    def test_format_schema_displays_columns(self):
        # query_format.rs:423-443 shape over the real 19-column schema
        from vuke_tpu.storage.query import format_schema
        from vuke_tpu.storage.records import result_schema
        out = format_schema(result_schema())
        assert "Schema: results (19 columns)" in out
        for s in ("Column", "Type", "Nullable", "Yes", "No",
                  "source", "transform", "private_key_raw"):
            assert s in out


# ---------------------------------------------------------------------------
# lcg.rs inline vectors (mod tests + mod parse_tests, 18 vectors)
# ---------------------------------------------------------------------------

import hashlib

import numpy as np
import jax.numpy as jnp

from vuke_tpu.cores import lcg as lcg_core
from vuke_tpu.cores import sha256_chain as chain_core
from vuke_tpu.cores import xorshift as xs_core
from vuke_tpu.cores.common import words_be_to_bytes
from vuke_tpu.transforms import registry
from vuke_tpu.transforms.registry import _parse_chain, _parse_lcg, _parse_xorshift


def _lcg_steps(seed, variant, n):
    state = jnp.asarray(np.array([seed], np.uint32))
    out = []
    for _ in range(n):
        state = lcg_core.lcg_next(state, variant)
        out.append(int(np.asarray(state)[0]))
    return out


def _lcg_key(seed, variant, big_endian=True):
    w = lcg_core.lcg_key_words(np.array([seed], np.uint32), variant, big_endian)
    return words_be_to_bytes(np.asarray(w)[0])


class TestLcgVectors:
    """lcg.rs:131-233 (tests) + lcg.rs:300-370 (parse_tests)."""

    def test_glibc_sequence(self):
        assert _lcg_steps(1, lcg_core.GLIBC, 3) == [1103527590, 377401575, 662824084]

    def test_minstd_sequence(self):
        assert _lcg_steps(1, lcg_core.MINSTD, 2) == [16807, 282475249]

    def test_msvc_sequence(self):
        assert _lcg_steps(1, lcg_core.MSVC, 1) == [2745024]

    def test_borland_sequence(self):
        assert _lcg_steps(1, lcg_core.BORLAND, 1) == [22695478]

    def test_generate_key_deterministic(self):
        assert _lcg_key(12345, lcg_core.GLIBC) == _lcg_key(12345, lcg_core.GLIBC)

    def test_generate_key_different_seeds(self):
        assert _lcg_key(1, lcg_core.GLIBC) != _lcg_key(2, lcg_core.GLIBC)

    def test_generate_key_different_variants(self):
        assert _lcg_key(1, lcg_core.GLIBC) != _lcg_key(1, lcg_core.MINSTD)

    def test_generate_key_different_endian(self):
        assert _lcg_key(1, lcg_core.GLIBC, True) != _lcg_key(1, lcg_core.GLIBC, False)

    def test_variant_from_str(self):
        for name, v in [("glibc", lcg_core.GLIBC), ("minstd", lcg_core.MINSTD),
                        ("msvc", lcg_core.MSVC), ("borland", lcg_core.BORLAND)]:
            assert lcg_core.VARIANTS_BY_NAME[name] is v
            # case-insensitive through the CLI grammar
            assert _parse_lcg(f"lcg:{name}".lower())[0] is v
        assert "unknown" not in lcg_core.VARIANTS_BY_NAME

    def test_endian_from_str(self):
        assert _parse_lcg("lcg:be") == (None, "be")
        assert _parse_lcg("lcg:le") == (None, "le")
        assert _parse_lcg("lcg:big") == (None, "be")
        assert _parse_lcg("lcg:little") == (None, "le")
        with pytest.raises(ValueError):
            _parse_lcg("lcg:invalid")

    def test_max_seed(self):
        assert lcg_core.GLIBC.max_seed == (1 << 31) - 1
        assert lcg_core.MINSTD.max_seed == (1 << 31) - 2
        assert lcg_core.MSVC.max_seed == (1 << 32) - 1
        assert lcg_core.BORLAND.max_seed == (1 << 32) - 1

    # ---- LcgConfig::parse ----

    def test_parse_lcg_only(self):
        assert _parse_lcg("lcg") == (None, "be")

    def test_parse_lcg_with_endian(self):
        assert _parse_lcg("lcg:le") == (None, "le")

    def test_parse_lcg_with_variant(self):
        assert _parse_lcg("lcg:glibc") == (lcg_core.GLIBC, "be")

    def test_parse_lcg_with_variant_and_endian(self):
        assert _parse_lcg("lcg:minstd:le") == (lcg_core.MINSTD, "le")

    def test_parse_trailing_colon_trimmed(self):
        assert _parse_lcg("lcg:") == (None, "be")

    def test_parse_case_insensitive(self):
        spec = registry.parse_transform("LCG:GLIBC:BE")
        assert spec.name == "lcg"

    def test_parse_invalid_variant(self):
        with pytest.raises(ValueError, match="Invalid LCG variant or endian"):
            _parse_lcg("lcg:invalid")

    def test_parse_invalid_endian(self):
        with pytest.raises(ValueError, match="Invalid endian"):
            _parse_lcg("lcg:glibc:invalid")


# ---------------------------------------------------------------------------
# xorshift.rs inline vectors (mod tests, 18 vectors)
# ---------------------------------------------------------------------------

def _xs_key(seed, variant):
    hi = np.array([seed >> 32], np.uint32)
    lo = np.array([seed & 0xFFFFFFFF], np.uint32)
    w = xs_core.KEY_FNS[variant](hi, lo)
    return words_be_to_bytes(np.asarray(w)[0])


class TestXorshiftVectors:
    """xorshift.rs:214-380, one test per reference vector."""

    def test_xorshift64_deterministic(self):
        assert _xs_key(12345, "xorshift64") == _xs_key(12345, "xorshift64")

    def test_xorshift64_different_seeds(self):
        assert _xs_key(1, "xorshift64") != _xs_key(2, "xorshift64")

    def test_xorshift64_zero_seed_handled(self):
        assert _xs_key(0, "xorshift64") != b"\x00" * 32

    def test_xorshift64_sequence(self):
        ks = xs_core.xorshift64_keystream_words(
            np.array([0], np.uint32), np.array([1], np.uint32), 2)
        ks = np.asarray(ks)[0]
        first, second = words_be_to_bytes(ks[0]), words_be_to_bytes(ks[1])
        assert first[:8] != (1).to_bytes(8, "big")
        assert first != second
        ks2 = np.asarray(xs_core.xorshift64_keystream_words(
            np.array([0], np.uint32), np.array([1], np.uint32), 2))[0]
        assert words_be_to_bytes(ks2[0]) == first
        assert words_be_to_bytes(ks2[1]) == second

    def test_xorshift128_deterministic(self):
        assert _xs_key(12345, "xorshift128") == _xs_key(12345, "xorshift128")

    def test_xorshift128_different_seeds(self):
        assert _xs_key(1, "xorshift128") != _xs_key(2, "xorshift128")

    def test_xorshift128plus_deterministic(self):
        assert _xs_key(12345, "xorshift128+") == _xs_key(12345, "xorshift128+")

    def test_xorshift128plus_different_seeds(self):
        assert _xs_key(1, "xorshift128+") != _xs_key(2, "xorshift128+")

    def test_xoroshiro128starstar_deterministic(self):
        assert _xs_key(12345, "xoroshiro128**") == _xs_key(12345, "xoroshiro128**")

    def test_xoroshiro128starstar_different_seeds(self):
        assert _xs_key(1, "xoroshiro128**") != _xs_key(2, "xoroshiro128**")

    def test_different_variants_produce_different_keys(self):
        keys = [_xs_key(42, v) for v in xs_core.VARIANT_NAMES]
        assert len(set(keys)) == len(keys)

    def test_variant_from_str(self):
        assert _parse_xorshift("xorshift:64") == "xorshift64"
        assert _parse_xorshift("xorshift:xorshift64") == "xorshift64"
        assert _parse_xorshift("xorshift:128") == "xorshift128"
        assert _parse_xorshift("xorshift:128plus") == "xorshift128+"
        assert _parse_xorshift("xorshift:128+") == "xorshift128+"
        assert _parse_xorshift("xorshift:plus") == "xorshift128+"
        assert _parse_xorshift("xorshift:xoroshiro") == "xoroshiro128**"
        assert _parse_xorshift("xorshift:starstar") == "xoroshiro128**"
        with pytest.raises(ValueError):
            _parse_xorshift("xorshift:invalid")

    def test_variant_is_128bit(self):
        # the 128-bit variants consume the full (hi, lo) seed: a seed with
        # only high bits set must change their output but not xorshift64's
        # initial state collapse (hi ignored only for =0 handling)
        for v in ("xorshift128", "xorshift128+", "xoroshiro128**"):
            assert _xs_key(1 << 32, v) != _xs_key(0, v)

    def test_config_parse(self):
        assert _parse_xorshift("xorshift") is None
        assert _parse_xorshift("xorshift:64") == "xorshift64"
        assert _parse_xorshift("xorshift:128plus") == "xorshift128+"
        assert _parse_xorshift("xorshift:xoroshiro") == "xoroshiro128**"
        with pytest.raises(ValueError):
            _parse_xorshift("xorshift:invalid")

    def test_config_parse_case_insensitive(self):
        spec = registry.parse_transform("XORSHIFT:64")
        assert spec.name == "xorshift"

    def test_config_parse_trailing_colon(self):
        assert _parse_xorshift("xorshift:") is None

    def test_splitmix64(self):
        one = (np.zeros(1, np.uint32), np.ones(1, np.uint32))
        s0 = xs_core.splitmix64(one)
        s1 = xs_core.splitmix64(s0)
        v0 = (int(np.asarray(s0[0])[0]) << 32) | int(np.asarray(s0[1])[0])
        v1 = (int(np.asarray(s1[0])[0]) << 32) | int(np.asarray(s1[1])[0])
        assert v0 != 1 and v1 != v0

    def test_key_length(self):
        for v in xs_core.VARIANT_NAMES:
            assert len(_xs_key(42, v)) == 32, v


# ---------------------------------------------------------------------------
# sha256_chain.rs inline vectors (mod tests, 28 vectors)
# ---------------------------------------------------------------------------

def _chain_keys(seed_u32, variant, depth):
    w = chain_core.chain_words(np.array([seed_u32], np.uint32), variant, depth)
    return [words_be_to_bytes(k) for k in np.asarray(w)[0]]


def _host_chain(seed: bytes, variant: str, depth: int):
    out = []
    if variant == "iterated":
        k = seed
        for _ in range(depth):
            k = hashlib.sha256(k).digest()
            out.append(k)
    elif variant in ("indexed:be", "indexed:le"):
        order = "big" if variant.endswith("be") else "little"
        for n in range(depth):
            out.append(hashlib.sha256(seed + n.to_bytes(4, order)).digest())
    elif variant == "counter":
        for n in range(depth):
            out.append(hashlib.sha256(seed + str(n).encode()).digest())
    return out


class TestSha256ChainVectors:
    """sha256_chain.rs:190-430, one test per reference vector."""

    def test_endian_from_str(self):
        assert _parse_chain("sha256_chain:indexed:be")[0] == "indexed:be"
        assert _parse_chain("sha256_chain:indexed:le")[0] == "indexed:le"
        assert _parse_chain("sha256_chain:indexed:big")[0] == "indexed:be"
        assert _parse_chain("sha256_chain:indexed:little")[0] == "indexed:le"
        with pytest.raises(ValueError):
            _parse_chain("sha256_chain:indexed:invalid")

    def test_endian_as_str(self):
        assert "indexed:be" in chain_core.VARIANTS
        assert "indexed:le" in chain_core.VARIANTS

    def test_variant_from_str(self):
        assert _parse_chain("sha256_chain:iterated")[0] == "iterated"
        assert _parse_chain("sha256_chain:indexed")[0] == "indexed:be"
        assert _parse_chain("sha256_chain:indexed:be")[0] == "indexed:be"
        assert _parse_chain("sha256_chain:indexed:le")[0] == "indexed:le"
        assert _parse_chain("sha256_chain:counter")[0] == "counter"
        assert registry.parse_transform("SHA256_CHAIN:ITERATED").name == \
            "sha256_chain:iterated"
        with pytest.raises(ValueError):
            _parse_chain("sha256_chain:unknown")

    def test_variant_name(self):
        # Transform display names carry the reference's Variant::name() strings
        assert registry.parse_transform("sha256_chain:iterated").name == \
            "sha256_chain:iterated"
        assert registry.parse_transform("sha256_chain:indexed").name == \
            "sha256_chain:indexed:be"
        assert registry.parse_transform("sha256_chain:indexed:le").name == \
            "sha256_chain:indexed:le"
        assert registry.parse_transform("sha256_chain:counter").name == \
            "sha256_chain:counter"

    def test_generate_key_iterated_deterministic(self):
        assert _chain_keys(77, "iterated", 1) == _chain_keys(77, "iterated", 1)

    def test_zero_depth_chain(self):
        # sha256_chain.rs test_zero_depth_chain: depth 0 emits nothing
        from vuke_tpu.transforms.strings import make_string_sha256_chain
        t = make_string_sha256_chain("iterated", 0)
        assert t.fn(["seed"]).shape == (1, 0, 8)

    def test_generate_key_iterated_chain(self):
        seed = (12345).to_bytes(4, "big")
        keys = _chain_keys(12345, "iterated", 3)
        k0 = hashlib.sha256(seed).digest()
        k1 = hashlib.sha256(k0).digest()
        k2 = hashlib.sha256(k1).digest()
        assert keys == [k0, k1, k2]

    def test_generate_key_indexed_binary(self):
        seed = (7).to_bytes(4, "big")
        kbe = _chain_keys(7, "indexed:be", 6)[5]
        kle = _chain_keys(7, "indexed:le", 6)[5]
        assert kbe != kle
        assert kbe == hashlib.sha256(seed + (5).to_bytes(4, "big")).digest()
        assert kle == hashlib.sha256(seed + (5).to_bytes(4, "little")).digest()

    def test_generate_key_indexed_string(self):
        seed = (7).to_bytes(4, "big")
        k42 = _chain_keys(7, "counter", 43)[42]
        assert k42 == hashlib.sha256(seed + b"42").digest()

    def test_generate_chain_length(self):
        assert len(_chain_keys(1, "iterated", 5)) == 5
        assert len(_chain_keys(1, "indexed:be", 10)) == 10

    def test_generate_chain_consistency(self):
        keys = _chain_keys(9, "iterated", 5)
        assert keys == _host_chain((9).to_bytes(4, "big"), "iterated", 5)

    def test_generate_chain_from_u32(self):
        # u32 seeds hash as their 4 BE bytes (generate_chain_from_u32)
        assert _chain_keys(12345, "iterated", 3) == \
            _host_chain((12345).to_bytes(4, "big"), "iterated", 3)

    def test_generate_chain_from_string(self):
        from vuke_tpu.transforms.strings import make_string_sha256_chain
        t = make_string_sha256_chain("iterated", 3)
        w = t.fn(["password123"])
        keys = [words_be_to_bytes(k) for k in np.asarray(w)[0]]
        assert keys == _host_chain(b"password123", "iterated", 3)

    def test_different_seeds_different_keys(self):
        assert _chain_keys(1, "iterated", 1) != _chain_keys(2, "iterated", 1)

    def test_different_variants_different_keys(self):
        ks = [_chain_keys(5, v, 2)[1] for v in chain_core.VARIANTS]
        assert len(set(ks)) == len(ks)

    def test_empty_seed(self):
        from vuke_tpu.transforms.strings import make_string_sha256_chain
        t = make_string_sha256_chain("iterated", 1)
        w = t.fn([""])
        assert words_be_to_bytes(np.asarray(w)[0][0]) == hashlib.sha256(b"").digest()

    # ---- Sha256ChainConfig::parse ----

    def test_parse_sha256_chain_only(self):
        assert _parse_chain("sha256_chain") == (None, chain_core.DEFAULT_CHAIN_DEPTH)

    def test_parse_sha256_chain_iterated(self):
        assert _parse_chain("sha256_chain:iterated")[0] == "iterated"

    def test_parse_sha256_chain_indexed(self):
        assert _parse_chain("sha256_chain:indexed")[0] == "indexed:be"

    def test_parse_sha256_chain_indexed_be(self):
        assert _parse_chain("sha256_chain:indexed:be")[0] == "indexed:be"

    def test_parse_sha256_chain_indexed_le(self):
        assert _parse_chain("sha256_chain:indexed:le")[0] == "indexed:le"

    def test_parse_sha256_chain_counter(self):
        assert _parse_chain("sha256_chain:counter")[0] == "counter"

    def test_parse_chain_case_insensitive(self):
        assert registry.parse_transform("SHA256_CHAIN:ITERATED").name == \
            "sha256_chain:iterated"

    def test_parse_chain_trailing_colon(self):
        assert _parse_chain("sha256_chain:") == (None, chain_core.DEFAULT_CHAIN_DEPTH)

    def test_parse_chain_invalid_variant(self):
        with pytest.raises(ValueError, match="Invalid SHA256 chain variant"):
            _parse_chain("sha256_chain:invalid")

    def test_parse_chain_invalid_endian(self):
        with pytest.raises(ValueError, match="Invalid endian"):
            _parse_chain("sha256_chain:indexed:xyz")

    def test_variants_to_test_all(self):
        spec = registry.parse_transform("sha256_chain")
        # 4 variants x depth slots, string + binary chains
        assert len(chain_core.VARIANTS) == 4
        assert len(spec.numeric.slots) == 2 * 4 * chain_core.DEFAULT_CHAIN_DEPTH

    def test_variants_to_test_specific(self):
        spec = registry.parse_transform("sha256_chain:iterated")
        assert len(spec.numeric.slots) == 2 * chain_core.DEFAULT_CHAIN_DEPTH
