"""Ported reference storage-layer inline tests.

Vector-for-vector ports of the test mods in
/root/reference/src/storage/parquet_backend.rs (20 tests),
storage/query.rs (16), storage/mod.rs (10), output/storage.rs (8) —
adapted to the repo's API shape (one backend manages a writer per
transform partition; QueryExecutor returns plain row tuples).
"""

import datetime as dt
import os

import pytest
import pyarrow.parquet as pq

from vuke_tpu.derive import KeyDeriver
from vuke_tpu.storage import (ParquetBackend, ResultRecord, StorageOutput,
                              result_schema)
from vuke_tpu.storage.query import QueryExecutor


@pytest.fixture(scope="module")
def derived():
    return KeyDeriver().derive(b"\xab" * 32)


def _records(derived, n, transform="sha256", matched=0):
    out = []
    for i in range(n):
        out.append(ResultRecord.from_derived(
            f"source_{i}", transform, derived,
            matched_target="1TargetAddr" if i < matched else None))
    return out


# --- parquet_backend.rs test mod ------------------------------------------

class TestParquetBackend:
    def test_new_creates_backend(self, tmp_path):
        b = ParquetBackend(tmp_path)
        assert b.max_records == 1_000_000
        assert b.max_bytes == 100 * 1024 * 1024

    def test_schema_returns_result_schema(self, tmp_path):
        assert ParquetBackend(tmp_path).schema == result_schema()

    def test_with_compression_sets_compression(self, tmp_path):
        assert ParquetBackend(tmp_path, compression="snappy").compression == "SNAPPY"

    def test_default_compression_is_zstd(self, tmp_path):
        b = ParquetBackend(tmp_path)
        assert b.compression == "ZSTD" and b.compression_level == 3

    def test_with_chunk_records_sets_threshold(self, tmp_path):
        assert ParquetBackend(tmp_path, max_records_per_chunk=42).max_records == 42

    def test_with_chunk_bytes_sets_threshold(self, tmp_path):
        assert ParquetBackend(tmp_path, max_bytes_per_chunk=1000).max_bytes == 1000

    def test_zero_threshold_disables_chunking(self, tmp_path):
        # parquet_backend.rs:380-386
        b = ParquetBackend(tmp_path, max_records_per_chunk=0,
                           max_bytes_per_chunk=0)
        assert b.max_records is None and b.max_bytes is None

    def test_write_empty_batch_succeeds(self, tmp_path):
        b = ParquetBackend(tmp_path)
        b.write_batch([])
        assert b.close() == []

    def test_write_single_record(self, tmp_path, derived):
        b = ParquetBackend(tmp_path)
        b.write_batch(_records(derived, 1))
        paths = b.close()
        assert len(paths) == 1
        assert pq.read_metadata(paths[0]).num_rows == 1

    def test_write_multiple_batches(self, tmp_path, derived):
        b = ParquetBackend(tmp_path)
        for _ in range(3):
            b.write_batch(_records(derived, 5))
        paths = b.close()
        assert sum(pq.read_metadata(p).num_rows for p in paths) == 15

    def test_flush_returns_paths(self, tmp_path, derived):
        b = ParquetBackend(tmp_path)
        b.write_batch(_records(derived, 2))
        paths = b.close()
        assert all(os.path.exists(p) for p in paths)

    def test_flush_without_write_returns_empty(self, tmp_path):
        assert ParquetBackend(tmp_path).close() == []

    def test_chunk_rotation_by_records(self, tmp_path, derived):
        b = ParquetBackend(tmp_path, max_records_per_chunk=3)
        b.write_batch(_records(derived, 10))
        paths = b.close()
        assert len(paths) >= 2

    def test_chunk_rotation_by_bytes(self, tmp_path, derived):
        # parquet_backend.rs:481-497: tiny byte threshold forces rotation
        b = ParquetBackend(tmp_path, max_records_per_chunk=0,
                           max_bytes_per_chunk=1000)
        for i in range(10):
            b.write_batch(_records(derived, 1))
        paths = b.close()
        assert len(paths) >= 2, paths

    def test_chunk_paths_returns_completed_chunks(self, tmp_path, derived):
        b = ParquetBackend(tmp_path, max_records_per_chunk=2)
        b.write_batch(_records(derived, 5))
        completed = b.chunk_paths()
        assert len(completed) >= 2
        assert all(os.path.exists(p) for p in completed)
        b.close()

    def test_write_and_read_parquet_roundtrip(self, tmp_path, derived):
        b = ParquetBackend(tmp_path)
        b.write_batch(_records(derived, 3, matched=1))
        paths = b.close()
        t = pq.read_table(paths[0])
        assert t.num_rows == 3
        assert t.column("source").to_pylist() == [f"source_{i}" for i in range(3)]
        assert t.column("matched_target").to_pylist() == ["1TargetAddr", None, None]
        assert t.column("private_key_raw").to_pylist()[0] == b"\xab" * 32

    def test_compression_affects_file_size(self, tmp_path, derived):
        d1, d2 = tmp_path / "z", tmp_path / "n"
        recs = _records(derived, 200)
        bz = ParquetBackend(d1, compression="zstd")
        bz.write_batch(recs)
        bn = ParquetBackend(d2, compression="none")
        bn.write_batch(recs)
        sz = sum(os.path.getsize(p) for p in bz.close())
        sn = sum(os.path.getsize(p) for p in bn.close())
        assert sz < sn

    def test_read_all_chunks_integration(self, tmp_path, derived):
        b = ParquetBackend(tmp_path, max_records_per_chunk=4)
        b.write_batch(_records(derived, 10))
        paths = b.close()
        total = sum(pq.read_table(p).num_rows for p in paths)
        assert total == 10

    def test_creates_hive_partitioned_structure(self, tmp_path, derived):
        b = ParquetBackend(tmp_path)
        b.write_batch(_records(derived, 1, transform="milksad"))
        (path,) = b.close()
        rel = os.path.relpath(path, tmp_path)
        parts = rel.split(os.sep)
        assert parts[0] == "transform=milksad"
        assert parts[1].startswith("date=")
        assert parts[2].startswith("chunk_") and parts[2].endswith(".parquet")


# --- storage/query.rs test mod ---------------------------------------------

def _make_storage(path, derived, n, matched=0, transform="sha256"):
    b = ParquetBackend(path)
    b.write_batch(_records(derived, n, transform=transform, matched=matched))
    return b.close()


class TestQueryExecutor:
    def test_new_creates_executor_with_empty_storage(self, tmp_path):
        ex = QueryExecutor(tmp_path)
        assert not ex.has_data()

    def test_new_creates_executor_with_data(self, tmp_path, derived):
        _make_storage(tmp_path, derived, 5)
        assert QueryExecutor(tmp_path).has_data()

    def test_query_count_returns_correct_count(self, tmp_path, derived):
        _make_storage(tmp_path, derived, 10)
        ex = QueryExecutor(tmp_path)
        assert ex.scalar("SELECT COUNT(*) FROM results") == 10

    def test_query_empty_storage_returns_empty(self, tmp_path):
        rows, _ = QueryExecutor(tmp_path).query("SELECT * FROM results")
        assert rows == []

    def test_query_with_transform_filter(self, tmp_path, derived):
        _make_storage(tmp_path, derived, 4, transform="sha256")
        _make_storage(tmp_path, derived, 3, transform="milksad")
        ex = QueryExecutor(tmp_path)
        assert ex.scalar(
            "SELECT COUNT(*) FROM results WHERE transform = 'milksad'") == 3

    def test_query_group_by_transform(self, tmp_path, derived):
        _make_storage(tmp_path, derived, 4, transform="sha256")
        _make_storage(tmp_path, derived, 3, transform="milksad")
        rows, _ = QueryExecutor(tmp_path).query(
            "SELECT transform, COUNT(*) FROM results GROUP BY transform "
            "ORDER BY transform")
        assert [(r[0], int(r[1])) for r in rows] == [
            ("milksad", 3), ("sha256", 4)]

    def test_query_matched_targets_not_null(self, tmp_path, derived):
        # query.rs:586-597
        _make_storage(tmp_path, derived, 10, matched=3)
        ex = QueryExecutor(tmp_path)
        assert ex.scalar(
            "SELECT COUNT(*) FROM results WHERE matched_target IS NOT NULL") == 3

    def test_query_returns_rows_and_columns(self, tmp_path, derived):
        # analogue of query_arrow_returns_record_batches
        _make_storage(tmp_path, derived, 5)
        rows, cols = QueryExecutor(tmp_path).query(
            "SELECT source, transform FROM results")
        assert len(rows) == 5 and cols == ["source", "transform"]

    def test_discovered_files_lists_parquet_files(self, tmp_path, derived):
        _make_storage(tmp_path, derived, 5)
        files = QueryExecutor(tmp_path).discovered_files()
        assert files and all(f.endswith(".parquet") for f in files)

    def test_schema_returns_result_schema(self, tmp_path, derived):
        _make_storage(tmp_path, derived, 1)
        text = QueryExecutor(tmp_path).schema_text()
        assert "results" in text and "private_key_hex" in text

    def test_schema_empty_storage(self, tmp_path):
        text = QueryExecutor(tmp_path).schema_text()
        assert "results" in text

    def test_refresh_updates_view(self, tmp_path, derived):
        # query.rs:682-695
        ex = QueryExecutor(tmp_path)
        assert not ex.has_data()
        _make_storage(tmp_path, derived, 5)
        ex.refresh()
        assert ex.has_data()
        assert ex.scalar("SELECT COUNT(*) FROM results") == 5

    def test_storage_path_returns_path(self, tmp_path):
        assert QueryExecutor(tmp_path).directory == str(tmp_path)


# --- storage/mod.rs test mod ------------------------------------------------

class TestRecords:
    def test_result_record_creation(self, derived):
        r = ResultRecord.from_derived("1", "sha256", derived)
        assert r.source == "1" and r.transform == "sha256"
        assert r.chain == "bitcoin"
        assert len(r.private_key_raw) == 32
        assert r.private_key_hex == derived.private_key_hex
        assert r.timestamp is not None
        assert r.timestamp.tzinfo is not None

    def test_result_record_matched_target(self, derived):
        r = ResultRecord.from_derived("1", "sha256", derived,
                                      matched_target="1Addr")
        assert r.matched_target == "1Addr"

    def test_record_address_fields(self, derived):
        r = ResultRecord.from_derived("1", "sha256", derived)
        assert r.address_p2pkh_compressed == derived.p2pkh_compressed
        assert r.address_p2pkh_uncompressed == derived.p2pkh_uncompressed
        assert r.address_p2wpkh == derived.p2wpkh
        assert r.wif_compressed == derived.wif_compressed
        assert r.wif_uncompressed == derived.wif_uncompressed

    def test_record_stat_fields(self, derived):
        r = ResultRecord.from_derived("1", "sha256", derived)
        assert r.private_key_bit_length == derived.bit_length
        assert r.private_key_hamming_weight == derived.hamming_weight
        assert r.private_key_leading_zeros == derived.leading_zeros

    def test_debug_redacts_sensitive_data(self, derived):
        # storage/mod.rs:43-55 — Debug must not leak key material
        r = ResultRecord.from_derived("1", "sha256", derived)
        s = repr(r)
        assert "<redacted>" in s
        assert derived.private_key_hex not in s
        assert derived.wif_compressed not in s
        assert derived.private_key_decimal not in s


# --- output/storage.rs test mod ----------------------------------------------

class TestStorageOutput:
    def test_write_single_key(self, tmp_path, derived):
        out = StorageOutput(ParquetBackend(tmp_path))
        out.key("1", "sha256", derived)
        summary = out.finish()
        assert summary.records_written == 1
        assert len(summary.paths) == 1

    def test_write_multiple_keys(self, tmp_path, derived):
        out = StorageOutput(ParquetBackend(tmp_path))
        for i in range(7):
            out.key(str(i), "sha256", derived)
        assert out.finish().records_written == 7

    def test_write_hit_with_matched_target(self, tmp_path, derived):
        class MI:
            address = "1SomeTarget"
            address_type = "p2pkh_compressed"
        out = StorageOutput(ParquetBackend(tmp_path))
        out.hit("5", "milksad", derived, MI())
        summary = out.finish()
        t = pq.read_table(summary.paths[0])
        assert t.column("matched_target").to_pylist() == ["1SomeTarget"]

    def test_chunk_rotation(self, tmp_path, derived):
        out = StorageOutput(ParquetBackend(tmp_path, max_records_per_chunk=2))
        for i in range(5):
            out.key(str(i), "sha256", derived)
        assert len(out.finish().paths) >= 2

    def test_records_written_counter(self, tmp_path, derived):
        out = StorageOutput(ParquetBackend(tmp_path))
        for i in range(3):
            out.key(str(i), "sha256", derived)
        out.flush()
        assert out.finish().records_written == 3

    def test_custom_chain(self, tmp_path, derived):
        out = StorageOutput(ParquetBackend(tmp_path))
        out.key("1", "sha256", derived)
        summary = out.finish()
        t = pq.read_table(summary.paths[0])
        assert t.column("chain").to_pylist() == ["bitcoin"]

    def test_shared_backend_shares_state(self, tmp_path, derived):
        # output/storage.rs clone_shares_state: two handles, one backend
        backend = ParquetBackend(tmp_path)
        a, b = StorageOutput(backend), StorageOutput(backend)
        a.key("1", "sha256", derived)
        b.key("2", "sha256", derived)
        a.flush(), b.flush()
        paths = backend.close()
        assert sum(pq.read_table(p).num_rows for p in paths) == 2

    def test_with_compression_creates_smaller_files(self, tmp_path, derived):
        o1 = StorageOutput(ParquetBackend(tmp_path / "z", compression="zstd"))
        o2 = StorageOutput(ParquetBackend(tmp_path / "n", compression="none"))
        for i in range(200):
            o1.key(str(i), "sha256", derived)
            o2.key(str(i), "sha256", derived)
        s1, s2 = o1.finish(), o2.finish()
        assert (sum(os.path.getsize(p) for p in s1.paths)
                < sum(os.path.getsize(p) for p in s2.paths))


# --- storage/schema.rs test mod (schema.rs:270-560) ---------------------------

class TestArrowSchema:
    def test_schema_has_19_fields(self):
        assert len(result_schema()) == 19

    def test_schema_field_names(self):
        assert result_schema().names == [
            "source", "transform", "chain", "timestamp", "matched_target",
            "private_key_raw", "private_key_hex", "private_key_decimal",
            "private_key_binary", "private_key_bit_length",
            "private_key_hamming_weight", "private_key_leading_zeros",
            "pubkey_compressed", "pubkey_uncompressed",
            "address_p2pkh_compressed", "address_p2pkh_uncompressed",
            "address_p2wpkh", "wif_compressed", "wif_uncompressed"]

    def test_schema_field_types(self):
        import pyarrow as pa
        s = result_schema()
        for i in (0, 1, 2, 4, 6, 7, 8):
            assert s.field(i).type == pa.string()
        assert s.field(3).type == pa.timestamp("ms", tz="UTC")
        assert s.field(5).type == pa.binary(32)
        assert s.field(9).type == pa.uint16()
        assert s.field(10).type == pa.uint16()
        assert s.field(11).type == pa.uint8()
        for i in range(12, 19):
            assert s.field(i).type == pa.string()

    def test_schema_nullable_flags(self):
        s = result_schema()
        for i in (0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11):
            assert not s.field(i).nullable, i
        for i in (4, 12, 13, 14, 15, 16, 17, 18):
            assert s.field(i).nullable, i

    def test_records_to_batch_empty(self):
        from vuke_tpu.storage.records import records_to_batch
        assert records_to_batch([]).num_rows == 0

    def test_records_to_batch_single_record(self, derived):
        from vuke_tpu.storage.records import records_to_batch
        batch = records_to_batch(_records(derived, 1))
        assert batch.num_rows == 1
        assert batch.column(0).to_pylist() == ["source_0"]

    def test_records_to_batch_matched_target_null_and_set(self, derived):
        from vuke_tpu.storage.records import records_to_batch
        batch = records_to_batch(_records(derived, 2, matched=1))
        assert batch.column(4).to_pylist() == ["1TargetAddr", None]

    def test_records_to_batch_empty_slices(self, derived):
        # schema.rs:541-560: missing derivations land as nulls
        from vuke_tpu.storage.records import records_to_batch
        r = _records(derived, 1)[0]
        r.pubkey_compressed = None
        r.address_p2pkh_compressed = None
        r.wif_uncompressed = None
        batch = records_to_batch([r])
        assert batch.column(12).to_pylist() == [None]
        assert batch.column(14).to_pylist() == [None]
        assert batch.column(18).to_pylist() == [None]

    def test_records_to_batch_multiple_records(self, derived):
        from vuke_tpu.storage.records import records_to_batch
        batch = records_to_batch(_records(derived, 5))
        assert batch.num_rows == 5
        assert batch.column(5).to_pylist() == [b"\xab" * 32] * 5


# --- storage/iceberg/schema.rs test mod ---------------------------------------

class TestIcebergSchema:
    def _fields(self):
        from vuke_tpu.storage.iceberg import iceberg_schema_json
        return iceberg_schema_json()["fields"]

    def test_build_schema_succeeds(self):
        fields = self._fields()
        assert len(fields) == 19

    def test_schema_field_names_match_arrow(self):
        assert [f["name"] for f in self._fields()] == result_schema().names

    def test_required_fields_not_nullable(self):
        req = {f["name"] for f in self._fields() if f["required"]}
        arrow_req = {f.name for f in result_schema() if not f.nullable}
        assert req == arrow_req

    def test_private_key_raw_is_binary(self):
        (f,) = [f for f in self._fields() if f["name"] == "private_key_raw"]
        assert f["type"] == "binary" and f["required"]

    def test_timestamp_is_timestamptz(self):
        (f,) = [f for f in self._fields() if f["name"] == "timestamp"]
        assert f["type"] == "timestamptz"

    def test_field_ids_sequential(self):
        assert [f["id"] for f in self._fields()] == list(range(1, 20))

    def test_partition_spec_source_ids(self):
        # identity(transform)=field 2, day(timestamp)=field 4
        from vuke_tpu.storage.iceberg import partition_spec_json
        spec = partition_spec_json()["fields"]
        assert spec[0]["transform"] == "identity" and spec[0]["source-id"] == 2
        assert spec[1]["transform"] == "day" and spec[1]["source-id"] == 4


# --- storage/cloud/mod.rs test mod (cloud/mod.rs:109-158) ----------------------

class TestCloudConfig:
    def test_cloud_config_defaults(self):
        from vuke_tpu.storage.cloud import CloudConfig
        c = CloudConfig(bucket="test-bucket")
        assert c.bucket == "test-bucket"
        assert c.endpoint is None and c.prefix is None
        assert not c.delete_local
        assert c.max_retries == 5
        assert not c.fail_fast

    def test_cloud_config_builder(self):
        from vuke_tpu.storage.cloud import CloudConfig
        c = CloudConfig(bucket="my-bucket", endpoint="https://s3.example.com",
                        prefix="vuke/results", delete_local=True,
                        max_retries=3, fail_fast=True)
        assert (c.bucket, c.endpoint, c.prefix) == (
            "my-bucket", "https://s3.example.com", "vuke/results")
        assert c.delete_local and c.fail_fast and c.max_retries == 3

    def test_cloud_path_url_with_endpoint(self):
        from vuke_tpu.storage.cloud import CloudPath
        assert (CloudPath("bucket", "a/b.parquet").url("https://e.com")
                == "https://e.com/bucket/a/b.parquet")

    def test_cloud_path_url_without_endpoint(self):
        from vuke_tpu.storage.cloud import CloudPath
        assert CloudPath("bucket", "k").url() == "s3://bucket/k"

    def test_cloud_path_url_strips_trailing_slash(self):
        from vuke_tpu.storage.cloud import CloudPath
        assert (CloudPath("bucket", "file.parquet").url("https://example.com/")
                == "https://example.com/bucket/file.parquet")
