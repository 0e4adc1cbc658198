"""Named sources and sinks (SURVEY.md §2.1, S1-S9)."""

from batchprocessingetl_spark.sources.readers import (
    read_csv,
    read_jdbc,
    read_json,
    read_parquet,
    write_parquet,
)

__all__ = ["read_csv", "read_jdbc", "read_json", "read_parquet", "write_parquet"]
