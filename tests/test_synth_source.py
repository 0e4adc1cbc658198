"""Custom Python DataSource (Spark 4 API): registration, options,
partition-parallel reads, determinism, and pushdown posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.sources.synth_source import SynthDocsDataSource, synth_doc


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SynthDocsDataSource)


def test_reads_requested_rows_with_schema(spark):
    df = (
        spark.read.format("bpetl_synth")
        .option("n_rows", 500)
        .option("n_partitions", 8)
        .load()
    )
    assert df.count() == 500
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.select(F.min("doc_id"), F.max("doc_id")).first() == (0, 499)


def test_rows_match_closed_form_and_are_layout_independent(spark):
    a = (
        spark.read.format("bpetl_synth")
        .option("n_rows", 64).option("n_partitions", 3).load().collect()
    )
    b = (
        spark.read.format("bpetl_synth")
        .option("n_rows", 64).option("n_partitions", 13).load().collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) == [
        synth_doc(i) for i in range(64)
    ]


def test_partition_parallelism(spark):
    df = (
        spark.read.format("bpetl_synth")
        .option("n_rows", 100).option("n_partitions", 7).load()
    )
    assert df.rdd.getNumPartitions() == 7
    # no partition produces more than ceil(100/7) rows
    sizes = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert len(sizes) == 7 and max(r["count"] for r in sizes) == 15


def test_composes_with_engine_operators(spark):
    from batchprocessingetl_spark.operators.text import build_vocab

    df = (
        spark.read.format("bpetl_synth")
        .option("n_rows", 300).option("n_partitions", 4).load()
    )
    vocab = build_vocab(df, "text", min_count=1)
    assert vocab.count() > 0
    # generated vocabulary is the declared closed-form vocabulary
    from batchprocessingetl_spark.sources.synth_source import _VOCAB

    assert {r["term"] for r in vocab.collect()} <= set(_VOCAB)


def test_bad_options_fail_loudly(spark):
    with pytest.raises(Exception, match="n_rows|n_partitions"):
        (
            spark.read.format("bpetl_synth")
            .option("n_rows", 10).option("n_partitions", 0).load().count()
        )
