"""S6 extension: parquet bloom-filter sink (sources/readers.py::
write_parquet_bloom). pyarrow's metadata API in this container does
not surface bloom_filter_offset, so the evidence is structural (the
bloom-enabled file carries the extra footer bytes of a sized filter;
byte-identical data otherwise) plus functional (pushed point lookups
on the filtered column return exact results)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from batchprocessingetl_spark.sources.readers import write_parquet, write_parquet_bloom


def _one_file(path: str) -> str:
    return glob.glob(os.path.join(path, "part-*.parquet"))[0]


def test_bloom_sink_writes_filter_and_preserves_lookups(spark, tmp_path):
    df = spark.range(100_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("h")
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    write_parquet(df, plain, target_files=1)
    write_parquet_bloom(df, bloomed, ["h"], ndv=100_000, target_files=1)

    sz_plain = os.path.getsize(_one_file(plain))
    sz_bloom = os.path.getsize(_one_file(bloomed))
    # a 100k-NDV bloom filter at the default FPP is ~120 KB of footer;
    # data pages are identical, so the delta IS the filter
    assert sz_bloom > sz_plain + 50_000, (sz_plain, sz_bloom)

    needle = df.filter(F.col("id") == 54_321).select("h").first()["h"]
    got = (
        spark.read.parquet(bloomed)
        .filter(F.col("h") == needle)
        .select("id")
        .collect()
    )
    assert [r["id"] for r in got] == [54_321]
    plan = (
        spark.read.parquet(bloomed)
        .filter(F.col("h") == needle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "EqualTo(h," in plan
