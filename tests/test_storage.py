"""Storage stack tests: Parquet layout/rotation, query, cloud sync fakes.

Mirrors the reference's storage test tiers (parquet_backend.rs:389+,
sync.rs:169-262, s3.rs:303-371 — tempdirs and in-memory uploader fakes;
no real network).
"""

import os

import pytest

from vuke_tpu.derive import KeyDeriver
from vuke_tpu.storage import ParquetBackend, ResultRecord, StorageOutput, result_schema
from vuke_tpu.storage.cloud import CloudConfig, CloudPath, UploadStats, sync_files
from vuke_tpu.storage.cloud.s3 import InMemoryUploader
from vuke_tpu.storage.query import QueryExecutor, format_results


@pytest.fixture(scope="module")
def derived():
    return KeyDeriver().derive(b"\x01" * 32)


def _records(derived, n, transform="milksad"):
    return [ResultRecord.from_derived(str(i), transform, derived) for i in range(n)]


def test_schema_has_19_columns():
    assert len(result_schema()) == 19


def test_parquet_write_and_layout(tmp_path, derived):
    backend = ParquetBackend(tmp_path)
    backend.write_batch(_records(derived, 10))
    backend.write_batch(_records(derived, 5, transform="sha256"))
    paths = backend.close()
    assert len(paths) == 2
    for p in paths:
        assert "transform=" in p and "date=" in p and p.endswith(".parquet")
    import pyarrow.parquet as pq
    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == 15


def test_parquet_rotation_by_records(tmp_path, derived):
    backend = ParquetBackend(tmp_path, max_records_per_chunk=4)
    backend.write_batch(_records(derived, 10))
    paths = backend.close()
    # 10 records with rotation at >=4: chunks of [4..] -> at least 2 completed
    assert len(paths) >= 2
    names = sorted(os.path.basename(p) for p in paths)
    assert names[0] == "chunk_0001.parquet"


def test_storage_output_finish(tmp_path, derived):
    from vuke_tpu.matcher import AddressType, MatchInfo
    out = StorageOutput(ParquetBackend(tmp_path))
    out.key("1", "milksad", derived)
    out.hit("2", "milksad", derived,
            MatchInfo(AddressType.P2PKH_COMPRESSED, derived.p2pkh_compressed))
    summary = out.finish()
    assert summary.records_written == 2
    assert len(summary.paths) == 1
    qe = QueryExecutor(str(tmp_path))
    rows, cols = qe.query(
        "SELECT source, matched_target FROM results ORDER BY source")
    assert len(rows) == 2
    assert rows[1][1] == derived.p2pkh_compressed


def test_query_executor_sql(tmp_path, derived):
    out = StorageOutput(ParquetBackend(tmp_path))
    for i in range(7):
        out.key(str(i), "milksad" if i % 2 else "sha256", derived)
    out.finish()
    qe = QueryExecutor(str(tmp_path))
    n = qe.scalar("SELECT COUNT(*) FROM results")
    assert n == 7
    rows, cols = qe.query(
        "SELECT transform, COUNT(*) AS c FROM results GROUP BY transform "
        "ORDER BY transform")
    assert [r[0] for r in rows] == ["milksad", "sha256"]
    assert sum(r[1] for r in rows) == 7


def test_query_empty_dir(tmp_path):
    qe = QueryExecutor(str(tmp_path))
    rows, cols = qe.query("SELECT * FROM results")
    assert rows == []


def test_query_formatting():
    rows = [("a", 1), ("b", 2)]
    cols = ["name", "n"]
    t = format_results(rows, cols, "table")
    assert "name" in t and "2 row(s)" in t
    import json
    j = json.loads(format_results(rows, cols, "json"))
    assert j[0] == {"name": "a", "n": 1}
    c = format_results(rows, cols, "csv")
    assert c.splitlines()[0] == "name,n"


def test_cloud_sync_in_memory(tmp_path):
    files = []
    for i in range(3):
        d = tmp_path / f"transform=milksad/date=2026-01-01"
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"chunk_{i:04d}.parquet"
        p.write_bytes(b"data" * (i + 1))
        files.append(str(p))
    up = InMemoryUploader()
    cfg = CloudConfig(bucket="test-bucket", prefix="results")
    stats = UploadStats()
    uploaded, failed = sync_files(up, files, str(tmp_path), cfg, stats)
    assert len(uploaded) == 3 and not failed
    assert stats.completed == 3
    # remote keys preserve partition components (s3.rs:61-80)
    assert any(k.startswith("results/transform=milksad/date=2026-01-01/chunk_")
               for k in up.objects)


def test_cloud_sync_retry_and_failure(tmp_path):
    p = tmp_path / "transform=x/date=y"
    p.mkdir(parents=True)
    f1 = p / "a.parquet"
    f1.write_bytes(b"1")
    f2 = p / "b.parquet"
    f2.write_bytes(b"2")
    key_a = "transform=x/date=y/a.parquet"
    # transient failure: fails twice then succeeds
    up = InMemoryUploader(fail_keys=[key_a], fail_times=2)
    cfg = CloudConfig(bucket="b", max_retries=5, base_retry_delay=0.001)
    stats = UploadStats()
    uploaded, failed = sync_files(up, [str(f1), str(f2)], str(tmp_path), cfg, stats)
    assert len(uploaded) == 2 and not failed
    assert stats.retries >= 2

    # permanent failure: continue-and-report (not fail_fast)
    up = InMemoryUploader(fail_keys=[key_a], fail_times=-1)
    stats = UploadStats()
    uploaded, failed = sync_files(up, [str(f1), str(f2)], str(tmp_path),
                                  CloudConfig(bucket="b", max_retries=1,
                                              base_retry_delay=0.001), stats)
    assert len(failed) == 1 and len(uploaded) == 1


def test_cloud_delete_local(tmp_path):
    p = tmp_path / "transform=x/date=y"
    p.mkdir(parents=True)
    f1 = p / "a.parquet"
    f1.write_bytes(b"1")
    up = InMemoryUploader()
    cfg = CloudConfig(bucket="b", delete_local=True)
    sync_files(up, [str(f1)], str(tmp_path), cfg)
    assert not f1.exists()


def test_cloud_path_url():
    cp = CloudPath("bucket", "k/v.parquet")
    assert cp.url(None) == "s3://bucket/k/v.parquet"
    assert cp.url("https://e.example.com/") == "https://e.example.com/bucket/k/v.parquet"


def test_record_repr_redacts_key(derived):
    r = ResultRecord.from_derived("1", "milksad", derived)
    assert "redacted" in repr(r)
    assert derived.private_key_hex not in repr(r)


def test_iceberg_catalog_flow(tmp_path, derived):
    """REST interactions against a recording fake session."""
    from vuke_tpu.storage.iceberg import (FileMetadata, IcebergConfig,
                                          RestCatalogClient, file_metadata_for)

    class FakeResp:
        def __init__(self, status):
            self.status_code = status
            self.text = ""

    class FakeSession:
        def __init__(self):
            self.calls = []

        def get(self, url, **kw):
            self.calls.append(("GET", url))
            return FakeResp(404)

        def post(self, url, json=None, **kw):
            self.calls.append(("POST", url, json))
            return FakeResp(200)

    sess = FakeSession()
    client = RestCatalogClient(IcebergConfig("http://cat.example/api"), session=sess)
    client.ensure_namespace()
    assert not client.table_exists()
    client.create_table()
    posts = [c for c in sess.calls if c[0] == "POST"]
    assert posts[0][1].endswith("/v1/namespaces")
    assert posts[1][1].endswith("/v1/namespaces/vuke/tables")
    body = posts[1][2]
    assert body["name"] == "results"
    assert len(body["schema"]["fields"]) == 19
    assert body["partition-spec"]["fields"][0]["transform"] == "identity"
    assert body["partition-spec"]["fields"][1]["transform"] == "day"

    # file metadata extraction from hive paths
    backend = ParquetBackend(tmp_path)
    backend.write_batch(_records(derived, 3))
    paths = backend.close()
    metas = file_metadata_for(paths, str(tmp_path))
    assert metas[0].record_count == 3
    assert metas[0].transform == "milksad"
    assert metas[0].timestamp_day is not None


def test_multipart_split_streams_parts(tmp_path):
    """Files over the threshold must upload as multiple streamed parts
    (s3.rs:89-167 WriteMultipart parity; r1 shipped single whole-file PUTs)."""
    big = tmp_path / "big.parquet"
    payload = os.urandom(1024) * 10  # 10 KB
    big.write_bytes(payload)
    small = tmp_path / "small.parquet"
    small.write_bytes(b"tiny")

    up = InMemoryUploader(part_size=4096, multipart_threshold=8192)
    cfg = CloudConfig(bucket="b")
    uploaded, failed = sync_files(up, [str(big), str(small)], str(tmp_path), cfg)
    assert not failed
    assert up.multipart_parts["big.parquet"] == 3  # 10240 / 4096 -> 3 parts
    assert "small.parquet" not in up.multipart_parts
    assert up.objects["big.parquet"] == payload
    assert up.objects["small.parquet"] == b"tiny"


def test_iceberg_registration_carries_real_stats(tmp_path, derived):
    """The CLI tail must register non-zero size/record-count per file
    (main.rs:1144-1266; r1 registered zeros)."""
    from vuke_tpu.storage.iceberg import join_uploaded_metadata, stat_local_files

    backend = ParquetBackend(tmp_path)
    backend.write_batch(_records(derived, 5))
    paths = backend.close()

    by_key = stat_local_files(paths, str(tmp_path))
    up = InMemoryUploader()
    uploaded, failed = sync_files(up, paths, str(tmp_path),
                                  CloudConfig(bucket="b", delete_local=True))
    assert not failed and not os.path.exists(paths[0])

    metas = join_uploaded_metadata(by_key, uploaded, endpoint=None)
    assert len(metas) == len(uploaded)
    assert metas[0].record_count == 5
    assert metas[0].file_size > 0
    assert metas[0].transform == "milksad"
    assert metas[0].uri.startswith("s3://test-bucket/")
