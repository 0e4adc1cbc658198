"""End-to-end medallion pipeline (SURVEY.md §5.3): CSV ingest -> raw ->
incremental merge -> staging clean -> star schema -> the reference's
dashboard query shapes (Q1/Q2, dashboard.py:29-68) — on a synthetic
inventory fixture with the FIXTURES.md A1 quirks (duplicates, null
dates/attrs, junk category, price drift per product, total_sales
mismatch rows)."""

from __future__ import annotations

import csv as csv_mod
import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from batchprocessingetl_spark.pipeline.incremental import incremental_load
from batchprocessingetl_spark.pipeline.staging import clean_inventory
from batchprocessingetl_spark.pipeline.star import build_star
from batchprocessingetl_spark.schemas import INVENTORY_SCHEMA
from batchprocessingetl_spark.sources.readers import read_csv, write_parquet

BATCH_TS = "2024-01-01 00:00:00"


def _make_rows(n=200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        date = dt.datetime(2023, rng.randint(1, 12), rng.randint(1, 28))
        qty = rng.randint(1, 100)
        price = round(rng.uniform(1, 200), 2)
        cat = rng.choice(["Food", "Toys", "Dum"])  # junk category present
        total = round(qty * price, 2) if i != 17 else 999.99  # one mismatch row
        rows.append(
            (
                f"TXN{i:06d}",
                None if i % 50 == 3 else date,  # some null dates
                f"ST{i % 10:03d}",
                f"City{i % 10}",
                f"P{i % 20:04d}",
                cat,
                qty,
                price,
                total,
                None if i % 30 == 7 else rng.randint(0, 300),
                rng.randint(10, 80),
                rng.randint(1, 10),
                round(rng.uniform(1, 20), 2),
                round(rng.uniform(0, 1), 3),
                round(rng.uniform(1, 10), 2),
            )
        )
    rows.extend(rows[:5])  # exact duplicate rows (~2.5%)
    return rows


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("e2e")
    csv_path = str(work / "inventory.csv")
    rows = _make_rows()
    with open(csv_path, "w", newline="") as f:
        w = csv_mod.writer(f)
        w.writerow([f.name for f in INVENTORY_SCHEMA.fields])
        for r in rows:
            w.writerow(["" if v is None else (v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v) for v in r])

    # raw layer: CSV ingest with declared schema -> incremental merge -> parquet
    src = read_csv(spark, csv_path, INVENTORY_SCHEMA)
    merged = incremental_load(spark, src, None, "date", str(work / "wm"))
    write_parquet(merged, str(work / "raw"), target_files=2)

    staged = clean_inventory(spark.read.parquet(str(work / "raw")))
    return build_star(staged, BATCH_TS), staged, rows


def test_raw_merge_dedups_redelivery(star):
    _, staged, rows = star
    # 200 unique rows, 5 duplicated; null-date rows (4 of the 200) dropped
    n_null_dates = sum(1 for r in rows[:200] if r[1] is None)
    assert staged.count() == 200 - n_null_dates


def test_star_q1_revenue_by_month_location(star):
    tables, staged, _ = star
    fact, dim_date, dim_store = tables["fact_sales"], tables["dim_date"], tables["dim_store"]
    q1 = (
        fact.join(dim_date, fact.date == dim_date.date_id)
        .join(dim_store.filter(F.col("is_current")), "store_id")
        .groupBy("year", "month", "store_location")
        .agg(F.sum("total_sales").alias("total"))
    )
    got = q1.collect()
    assert len(got) > 0
    # no fan-out: joining current dims must preserve the fact row count
    joined = (
        fact.join(dim_date, fact.date == dim_date.date_id)
        .join(dim_store.filter(F.col("is_current")), "store_id")
        .count()
    )
    assert joined == fact.count()


def test_star_q2_product_sales(star):
    tables, _, _ = star
    fact, dim_product = tables["fact_sales"], tables["dim_product"]
    q2 = (
        fact.join(dim_product.filter(F.col("is_current")), "product_id")
        .groupBy("product_id", "product_category")
        .agg(F.sum("quantity_sold").alias("total_qty"))
        .orderBy(F.desc("total_qty"))
    )
    got = q2.collect()
    assert len(got) == 20  # exactly one row per product (unique dim grain)


def test_fact_totals_survive_pipeline(star):
    tables, staged, _ = star
    fact_total = tables["fact_sales"].agg(F.sum("total_sales")).collect()[0][0]
    staged_total = staged.agg(F.sum("total_sales")).collect()[0][0]
    assert fact_total == staged_total


def test_csv_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from batchprocessingetl_spark.sources.readers import read_csv_quarantine

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("n", T.DoubleType(), True),
        ]
    )
    p = tmp_path / "in.csv"
    p.write_text("id,n\n1,2.5\nnot_an_int,oops\n3,4.0\n")
    good, bad = read_csv_quarantine(spark, str(p), schema)
    assert sorted(map(tuple, good.collect())) == [(1, 2.5), (3, 4.0)]
    quarantined = bad.collect()
    assert len(quarantined) == 1 and "not_an_int" in quarantined[0][0]


def test_json_reader_roundtrip(spark, tmp_path):
    from batchprocessingetl_spark.sources.readers import read_json

    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, name string")
    path = str(tmp_path / "j")
    df.write.json(path)
    back = read_json(spark, path, df.schema)
    assert sorted(map(tuple, back.collect())) == [(1, "x"), (2, None)]
    assert back.schema == df.schema


def test_json_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from batchprocessingetl_spark.sources.readers import read_json_quarantine

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("n", T.DoubleType(), True),
        ]
    )
    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "n": 2.5}\n'
        "this is not json at all\n"
        '{"id": 3, "n": 4.0}\n'
        '{"id": "stringy", "n": []}\n'
    )
    good, bad = read_json_quarantine(spark, str(p), schema)
    assert sorted(map(tuple, good.collect())) == [(1, 2.5), (3, 4.0)]
    quarantined = sorted(r[0] for r in bad.collect())
    assert len(quarantined) == 2
    assert any("not json" in q for q in quarantined)
    assert any("stringy" in q for q in quarantined)
