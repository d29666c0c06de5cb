"""Storage stack: Parquet backend, SQL query, cloud sync, Iceberg catalog.

pyarrow-based port of the reference's storage layer with identical schema
and layout (/root/reference/src/storage/): the flat 19-column Arrow schema,
Hive partitioning ``transform=X/date=Y/chunk_NNNN.parquet``, and rotation
at record/byte thresholds.
"""

from .records import ResultRecord, result_schema  # noqa: F401
from .parquet_backend import ParquetBackend  # noqa: F401
from .output import StorageOutput, StorageSummary  # noqa: F401
