"""Result records + the flat 19-column Arrow schema.

Schema mirrors /root/reference/src/storage/schema.rs:18-117 column-for-column
(names, types, nullability).  ``repr`` of records redacts private key
material like the reference's Debug impl (storage/mod.rs:43-55).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import List, Optional

import pyarrow as pa


def result_schema() -> pa.Schema:
    return pa.schema([
        pa.field("source", pa.string(), nullable=False),
        pa.field("transform", pa.string(), nullable=False),
        pa.field("chain", pa.string(), nullable=False),
        pa.field("timestamp", pa.timestamp("ms", tz="UTC"), nullable=False),
        pa.field("matched_target", pa.string(), nullable=True),
        pa.field("private_key_raw", pa.binary(32), nullable=False),
        pa.field("private_key_hex", pa.string(), nullable=False),
        pa.field("private_key_decimal", pa.string(), nullable=False),
        pa.field("private_key_binary", pa.string(), nullable=False),
        pa.field("private_key_bit_length", pa.uint16(), nullable=False),
        pa.field("private_key_hamming_weight", pa.uint16(), nullable=False),
        pa.field("private_key_leading_zeros", pa.uint8(), nullable=False),
        pa.field("pubkey_compressed", pa.string(), nullable=True),
        pa.field("pubkey_uncompressed", pa.string(), nullable=True),
        pa.field("address_p2pkh_compressed", pa.string(), nullable=True),
        pa.field("address_p2pkh_uncompressed", pa.string(), nullable=True),
        pa.field("address_p2wpkh", pa.string(), nullable=True),
        pa.field("wif_compressed", pa.string(), nullable=True),
        pa.field("wif_uncompressed", pa.string(), nullable=True),
    ])


@dataclass
class ResultRecord:
    source: str
    transform: str
    private_key_raw: bytes
    private_key_hex: str
    private_key_decimal: str
    private_key_binary: str
    private_key_bit_length: int
    private_key_hamming_weight: int
    private_key_leading_zeros: int
    chain: str = "bitcoin"
    timestamp: Optional[_dt.datetime] = None
    matched_target: Optional[str] = None
    pubkey_compressed: Optional[str] = None
    pubkey_uncompressed: Optional[str] = None
    address_p2pkh_compressed: Optional[str] = None
    address_p2pkh_uncompressed: Optional[str] = None
    address_p2wpkh: Optional[str] = None
    wif_compressed: Optional[str] = None
    wif_uncompressed: Optional[str] = None

    def __post_init__(self):
        if self.timestamp is None:
            self.timestamp = _dt.datetime.now(_dt.timezone.utc)

    def __repr__(self):  # private key material redacted (storage/mod.rs:43-55)
        return (f"ResultRecord(source={self.source!r}, transform={self.transform!r}, "
                f"private_key=<redacted>, matched_target={self.matched_target!r})")

    @classmethod
    def from_derived(cls, source: str, transform: str, derived,
                     matched_target: Optional[str] = None) -> "ResultRecord":
        return cls(
            source=source,
            transform=transform,
            matched_target=matched_target,
            private_key_raw=derived.raw,
            private_key_hex=derived.private_key_hex,
            private_key_decimal=derived.private_key_decimal,
            private_key_binary=derived.private_key_binary,
            private_key_bit_length=derived.bit_length,
            private_key_hamming_weight=derived.hamming_weight,
            private_key_leading_zeros=derived.leading_zeros,
            pubkey_compressed=derived.pubkey_compressed,
            pubkey_uncompressed=derived.pubkey_uncompressed,
            address_p2pkh_compressed=derived.p2pkh_compressed,
            address_p2pkh_uncompressed=derived.p2pkh_uncompressed,
            address_p2wpkh=derived.p2wpkh,
            wif_compressed=derived.wif_compressed,
            wif_uncompressed=derived.wif_uncompressed,
        )


def records_to_batch(records: List[ResultRecord]) -> pa.RecordBatch:
    schema = result_schema()
    cols = []
    for f in schema:
        vals = [getattr(r, f.name) for r in records]
        if f.name == "timestamp":
            cols.append(pa.array(vals, type=f.type))
        else:
            cols.append(pa.array(vals, type=f.type))
    return pa.RecordBatch.from_arrays(cols, schema=schema)
