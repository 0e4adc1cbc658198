"""Real JDBC round-trip against embedded Derby (shipped in PySpark's
jars/), closing the S1/S8 gap the sandbox otherwise leaves at
import-level: the reference's primary source and sink are JDBC
(raw_layer.py:54-67 reads Postgres with query pushdown;
curated_layer.py:89-145 writes four tables back).

Derby runs inside the Spark JVM (jdbc:derby:memory:...), so write ->
read round-trips, query pushdown, Spark-side filter pushdown
(PushedFilters in the plan), and partitioned parallel reads are all
exercised for real.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessingetl_spark.sources.readers import (
    read_jdbc,
    read_jdbc_table,
    write_jdbc,
)

URL = "jdbc:derby:memory:bpetl_test;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _seed(spark, table: str, n: int = 100):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("row_"), F.col("id")).alias("name"),
    )
    write_jdbc(df, URL, table, mode="overwrite", properties=PROPS)
    return df


def test_jdbc_write_read_roundtrip_with_query_pushdown(spark):
    _seed(spark, "t_roundtrip")
    back = read_jdbc(
        spark, URL, 'SELECT "k", "v", "name" FROM t_roundtrip WHERE "k" >= 90', properties=PROPS
    )
    rows = sorted((r["k"], r["v"], r["name"]) for r in back.collect())
    assert len(rows) == 10
    assert rows[0] == (90, 180, "row_90")
    assert rows[-1] == (99, 198, "row_99")


def test_jdbc_append_mode_accumulates(spark):
    df = _seed(spark, "t_append", n=10)
    write_jdbc(df, URL, "t_append", mode="append", properties=PROPS)
    back = read_jdbc(spark, URL, 'SELECT "k" FROM t_append', properties=PROPS)
    assert back.count() == 20
    assert back.distinct().count() == 10  # same keys, re-delivered


def test_jdbc_spark_filter_reaches_relation_as_pushed_filter(spark):
    _seed(spark, "t_pushdown")
    scan = read_jdbc_table(spark, URL, "t_pushdown", properties=PROPS)
    filtered = scan.filter(F.col("k") >= 95).select("k", "v")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # the predicate must reach the JDBC relation, not run as a Spark
    # post-filter over a full table scan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(K,95)" in plan.replace("k,", "K,")
    assert filtered.count() == 5
    # projection pruning: untouched column absent from the read schema
    assert "NAME" not in plan.upper().split("PUSHEDFILTERS")[0].split("READSCHEMA")[-1]


def test_jdbc_partitioned_parallel_read(spark):
    _seed(spark, "t_part")
    scan = read_jdbc_table(
        spark,
        URL,
        "t_part",
        properties=PROPS,
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert scan.rdd.getNumPartitions() == 4  # 4 parallel range queries
    assert scan.count() == 100  # bounds split, never filter
    # rows outside [lower, upper) still arrive (bounds are not a WHERE)
    scan_narrow = read_jdbc_table(
        spark, URL, "t_part", properties=PROPS,
        partition_column="k", lower_bound=40, upper_bound=60, num_partitions=3,
    )
    assert scan_narrow.count() == 100


def test_jdbc_partitioned_query_pushdown_read(spark):
    _seed(spark, "t_partq")
    got = read_jdbc(
        spark,
        URL,
        'SELECT "k", "v" FROM t_partq WHERE "k" < 50',
        properties=PROPS,
        partition_column='"k"',
        lower_bound=0,
        upper_bound=50,
        num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 50 and got.agg(F.max("k")).first()[0] == 49


def test_streaming_jdbc_writeback(spark, tmp_path):
    """Stream -> foreachBatch -> JDBC: the curated-layer writeback as a
    streaming drain, against real embedded Derby."""
    import datetime as dt

    from pyspark.sql import Row

    from batchprocessingetl_spark.streaming.jobs import stream_events, stream_to_jdbc

    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1, i % 4), user_id=i % 3,
            event_type="click", value=float(i), props="{}")
        for i in range(40)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows).write.parquet(src)

    stream = stream_events(spark, src).select("event_id", "user_id", "value")
    stream_to_jdbc(
        stream, str(tmp_path / "ckpt"), URL, "t_stream_sink", properties=PROPS
    )
    back = read_jdbc_table(spark, URL, "t_stream_sink", properties=PROPS)
    assert back.count() == 40
    assert back.agg(F.sum("value")).first()[0] == sum(float(i) for i in range(40))

    # a second drain with the SAME checkpoint re-processes nothing
    stream_to_jdbc(
        stream, str(tmp_path / "ckpt"), URL, "t_stream_sink", properties=PROPS
    )
    assert read_jdbc_table(spark, URL, "t_stream_sink", properties=PROPS).count() == 40
