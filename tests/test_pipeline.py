"""Staging cleaner, star builder, and incremental loader semantics
(reference parity per SURVEY.md §2.11/§3, corrected per §7.2-7.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from batchprocessingetl_spark.pipeline.incremental import (
    compute_watermark,
    extract_increment,
    incremental_load,
    merge_increment,
)
from batchprocessingetl_spark.pipeline.staging import clean_inventory, duplicate_report
from batchprocessingetl_spark.pipeline.star import (
    build_dim_date,
    build_fact_sales,
    build_star,
    distinct_dim,
    snapshot_dim,
)
from batchprocessingetl_spark.schemas import INVENTORY_SCHEMA
from tests.conftest import ts

BATCH_TS = "2024-01-01 00:00:00"


def _inv_row(txn, date, store="ST001", loc="NYC", prod="P0001", cat="Food", qty=2,
             price=10.0, total=None, stock=50, reorder=20, lead=3, carry=1.0,
             risk=0.1, turn=2.0):
    return (
        txn,
        dt.datetime.fromisoformat(date) if date else None,
        store, loc, prod, cat, qty, price,
        total if total is not None else (qty * price if qty is not None and price is not None else None),
        stock, reorder, lead, carry, risk, turn,
    )


def _inventory(spark, rows):
    return spark.createDataFrame(rows, INVENTORY_SCHEMA)


def test_clean_inventory_full_chain(spark):
    rows = [
        _inv_row("T1", "2023-01-01T10:00:00"),
        _inv_row("T1", "2023-01-01T10:00:00"),            # exact duplicate
        _inv_row("T2", None),                              # null date -> dropped
        _inv_row("T3", "2023-01-02T00:00:00", stock=None, reorder=None),  # fillna
        _inv_row("T4", "2023-01-03T00:00:00", qty=3, price=4.0, total=20.0),  # margin
        _inv_row("T5", "2023-01-04T00:00:00", stock=5, reorder=30),  # restock
    ]
    out = clean_inventory(_inventory(spark, rows))
    got = {r["transaction_id"]: r for r in out.collect()}
    assert set(got) == {"T1", "T3", "T4", "T5"}
    assert str(out.schema["unit_price"].dataType) == "DecimalType(10,2)"
    assert str(out.schema["total_sales"].dataType) == "DecimalType(15,2)"
    assert got["T3"]["stock_level"] == 0 and got["T3"]["reorder_point"] == 0
    assert float(got["T4"]["profit_margin"]) == 20.0 - 3 * 4.0
    assert got["T5"]["is_restock_needed"] == "Yes"
    assert got["T4"]["is_restock_needed"] == "No"


def test_duplicate_report(spark):
    rows = [_inv_row("T1", "2023-01-01T00:00:00")] * 3 + [_inv_row("T2", "2023-01-02T00:00:00")]
    rep = duplicate_report(_inventory(spark, rows)).collect()
    assert len(rep) == 1 and rep[0]["count"] == 3


def test_dim_date_unique_and_parts(spark):
    rows = [
        _inv_row("T1", "2023-03-05T00:00:00"),
        _inv_row("T2", "2023-03-05T00:00:00"),
        _inv_row("T3", "2023-11-30T00:00:00"),
    ]
    dim = build_dim_date(clean_inventory(_inventory(spark, rows)))
    got = sorted(dim.collect(), key=lambda r: r["date_id"])
    assert len(got) == 2  # unique on date_id
    assert (got[0]["year"], got[0]["month"], got[0]["day"]) == (2023, 3, 5)
    assert (got[1]["year"], got[1]["month"], got[1]["day"]) == (2023, 11, 30)


def test_snapshot_dim_one_row_per_key_latest_wins(spark):
    rows = [
        _inv_row("T1", "2023-01-01T00:00:00", prod="P1", cat="Old", price=1.0),
        _inv_row("T2", "2023-06-01T00:00:00", prod="P1", cat="New", price=2.0),
        _inv_row("T3", "2023-01-01T00:00:00", prod="P2", cat="X", price=3.0),
    ]
    staged = clean_inventory(_inventory(spark, rows))
    snap = snapshot_dim(staged, "product_id", ["product_category", "unit_price"])
    got = {r["product_id"]: r for r in snap.collect()}
    assert len(got) == 2
    assert got["P1"]["product_category"] == "New"  # latest by date
    # reference's literal distinct() build keeps BOTH P1 variants
    lit = distinct_dim(staged, "product_id", ["product_category", "unit_price"])
    assert lit.filter(F.col("product_id") == "P1").count() == 2


def test_build_star_shapes(spark):
    rows = [_inv_row(f"T{i}", f"2023-01-0{1+i%5}T00:00:00", prod=f"P{i%3}") for i in range(10)]
    star = build_star(clean_inventory(_inventory(spark, rows)), BATCH_TS)
    assert set(star) == {"dim_date", "dim_store", "dim_product", "fact_sales"}
    fact = star["fact_sales"]
    assert fact.columns == [
        "transaction_id", "date", "store_id", "product_id",
        "quantity_sold", "total_sales", "stock_level",
    ]
    assert fact.count() == 10
    dim_p = star["dim_product"]
    assert dim_p.filter(F.col("is_current")).groupBy("product_id").count().filter(
        F.col("count") > 1
    ).count() == 0
    assert all(r["start_date"] == ts(BATCH_TS) for r in dim_p.collect())


def test_extract_increment_and_merge_idempotent(spark):
    ev = spark.createDataFrame(
        [Row(id=i, t=dt.datetime(2023, 1, 1 + i)) for i in range(6)]
    )
    inc = extract_increment(ev, "t", "2023-01-03 00:00:00")
    assert inc.count() == 3  # strictly after
    # re-delivery of the same increment is a no-op
    merged_once = merge_increment(ev.filter("id < 3"), inc)
    merged_twice = merge_increment(merged_once, inc)
    assert merged_once.count() == merged_twice.count() == 6


def test_full_load_equals_composed_increments(spark, tmp_path):
    ev = spark.createDataFrame(
        [Row(id=i, t=dt.datetime(2023, 1, 1, i)) for i in range(24)]
    )
    wm = str(tmp_path / "wm")
    # cycle 1: only first 10 hours exist
    m1 = incremental_load(spark, ev.filter("id < 10"), None, "t", wm)
    # cycle 2: full source visible; increment picks up the rest (plus a
    # few re-delivered rows at the boundary are absorbed by the merge)
    m2 = incremental_load(spark, ev, m1, "t", wm)
    assert m2.count() == 24
    assert sorted(r["id"] for r in m2.collect()) == list(range(24))


def test_watermark_full_precision(spark):
    ev = spark.createDataFrame([Row(id=1, t=dt.datetime(2023, 5, 5, 13, 45, 59))])
    got = compute_watermark(ev, "t").collect()[0]["last_processed"]
    # reference truncates to day (raw_layer.py:73); ours keeps time
    assert got == "2023-05-05 13:45:59"


def test_incremental_load_data_persists_before_watermark(spark, tmp_path):
    # Durability ordering: a failing sink must abort the cycle BEFORE
    # the watermark advances, so no rows are ever skipped on retry.
    import pytest

    from batchprocessingetl_spark.pipeline.incremental import read_watermark

    ev = spark.createDataFrame(
        [Row(id=i, t=dt.datetime(2023, 1, 1, i)) for i in range(10)]
    )
    wm = str(tmp_path / "wm")

    def failing_sink(df):
        raise IOError("disk full")

    with pytest.raises(IOError):
        incremental_load(spark, ev, None, "t", wm, sink=failing_sink)
    assert read_watermark(spark, wm) is None  # watermark NOT advanced

    # retry with a working sink: nothing was skipped
    sunk = []
    m = incremental_load(spark, ev, None, "t", wm, sink=lambda df: sunk.append(df.count()))
    assert sunk == [10] and m.count() == 10
    assert read_watermark(spark, wm) == "2023-01-01 09:00:00"


def test_orc_roundtrip_with_pushdown_and_partition_pruning(spark, tmp_path):
    """ORC source/sink: value-exact round-trip, predicate pushdown into
    the ORC scan, and partition pruning on a partitioned ORC sink —
    the same posture tests the parquet path has."""
    import pyspark.sql.functions as F

    from batchprocessingetl_spark.catalog import load_table
    from batchprocessingetl_spark.sources.readers import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    flat = str(tmp_path / "flat_orc")
    write_orc(li, flat, target_files=2)
    back = read_orc(spark, flat)
    assert back.count() == li.count()
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b

    filtered = back.filter(F.col("l_quantity") > 30.0)
    scan = next(
        ln
        for ln in filtered._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan orc" in ln
    )
    assert "PushedFilters" in scan and "l_quantity" in scan.split("PushedFilters")[1][:120]

    part = str(tmp_path / "part_orc")
    write_orc(li.withColumn("ship_year", F.year("l_shipdate")), part, partition_by=["ship_year"])
    pruned = read_orc(spark, part).filter(F.col("ship_year") == 1997)
    scan = next(
        ln
        for ln in pruned._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan orc" in ln
    )
    assert "ship_year" in scan.split("PartitionFilters")[1][:120]
    assert pruned.count() == li.filter(F.year("l_shipdate") == 1997).count()


def test_check_constraints_mixed_outcomes(spark):
    from batchprocessingetl_spark.operators.quality import check_constraints

    rows = [
        (1, "a", 5.0),
        (2, "b", 50.0),   # range violation
        (2, "c", 7.0),    # duplicate id
        (None, "a", 8.0),  # null id
        (4, "x", 9.0),    # bad domain value
    ]
    df = spark.createDataFrame(rows, "id long, flag string, v double")
    rep = {
        (r["rule"], r["target"]): r
        for r in check_constraints(
            df,
            not_null=("id",),
            unique=(("id",),),
            ranges={"v": (0.0, 10.0)},
            accepted={"flag": ("a", "b", "c")},
        ).collect()
    }
    assert rep[("not_null", "id")]["n_violations"] == 1
    # 5 rows, 3 distinct NON-NULL ids: the dup AND the null-key row
    # both violate uniqueness (PK semantics)
    assert rep[("unique", "id")]["n_violations"] == 2
    assert rep[("range", "v")]["n_violations"] == 1
    assert rep[("accepted", "flag")]["n_violations"] == 1
    assert not any(r["passed"] for r in rep.values())

    clean = check_constraints(df.limit(1), not_null=("id",), ranges={"v": (0.0, 10.0)})
    assert all(r["passed"] for r in clean.collect())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no rules"):
        check_constraints(df)


def test_unique_rule_oracle_shape_matches_on_nullable_keys(spark):
    """The q90 oracle's null-aware COUNT(DISTINCT CASE ...) form must
    equal Spark's countDistinct-based rule on keys that actually
    contain nulls — and the naive COUNT(DISTINCT (a,b)) must NOT
    (DuckDB counts a row with a null field as its own distinct value),
    which is why the oracle spells out the PK semantics (ADVICE r3)."""
    import duckdb

    from batchprocessingetl_spark.operators.quality import check_constraints

    rows = [(1, 1), (1, 1), (2, None), (3, None), (None, 5), (4, 6)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["rule"], r["target"]): r["n_violations"]
        for r in check_constraints(df, unique=(("a", "b"),)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    aware = con.execute(
        "SELECT COUNT(*) - COUNT(DISTINCT CASE WHEN a IS NOT NULL"
        " AND b IS NOT NULL THEN (a, b) END) FROM t"
    ).fetchone()[0]
    naive = con.execute("SELECT COUNT(*) - COUNT(DISTINCT (a, b)) FROM t").fetchone()[0]
    assert got[("unique", "a,b")] == aware == 4
    assert naive != aware


def test_check_constraints_single_pass_plan(spark):
    # all rules must evaluate in ONE aggregate over ONE scan
    from batchprocessingetl_spark.catalog import load_table
    from batchprocessingetl_spark.operators.quality import check_constraints
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    rep = check_constraints(
        li,
        not_null=("l_orderkey",),
        unique=(("l_orderkey", "l_linenumber"),),
        ranges={"l_quantity": (1.0, 40.0)},
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    """Z-order clustering must reduce the number of files containing
    rows matching a 2-D box, versus the same rows in arrival order —
    measured from actual file membership, not assumed."""
    import pyspark.sql.functions as F

    from batchprocessingetl_spark.catalog import load_table
    from batchprocessingetl_spark.sources.readers import write_zorder_parquet, zorder_value
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.hour("ts").alias("h"), F.pmod("user_id", F.lit(32)).alias("ub"), "value"
    )
    plain_path, z_path = str(tmp_path / "plain"), str(tmp_path / "zord")
    ev.repartition(16).write.parquet(plain_path)
    write_zorder_parquet(ev, z_path, "h", "ub", n_files=16, bits=6)

    box = (F.col("h").between(3, 4)) & (F.col("ub").between(5, 6))

    def files_with_matches(path):
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    n_plain, n_z = files_with_matches(plain_path), files_with_matches(z_path)
    # same matching rows either way
    assert (
        spark.read.parquet(z_path).filter(box).count()
        == spark.read.parquet(plain_path).filter(box).count()
        > 0
    )
    assert n_z < n_plain, (n_z, n_plain)
    assert n_z <= 4

    # interleave sanity: (a=0b11, b=0) -> 0b0101; (a=0, b=0b11) -> 0b1010
    row = (
        spark.range(1)
        .select(
            zorder_value(F.lit(3), F.lit(0), bits=4).alias("za"),
            zorder_value(F.lit(0), F.lit(3), bits=4).alias("zb"),
        )
        .first()
    )
    assert (row["za"], row["zb"]) == (0b0101, 0b1010)
