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
