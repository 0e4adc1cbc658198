"""Mergeable frequency sketch: Count-Min with guarantee-checked reads.

The GK quantile sketch (q74) and HLL (q57) cover rank and cardinality;
this adds the third classic mergeable summary — frequency. A Count-Min
sketch (Cormode & Muthukrishnan 2005) is a d x w counter grid; each
item increments one counter per row (row i uses hash_i), and a point
query reads the MIN of its d counters: an overestimate by at most
eps*N with probability 1 - delta for w = ceil(e/eps), d = ceil(ln
1/delta).

Spark-first decomposition — the sketch IS a grouped aggregation:

- build: explode d (row, bucket) pairs per input row -> one hash
  aggregate on (row, bucket). The result is d*w rows REGARDLESS of
  input size, mergeable across shards/streams by simple addition
  (union + re-aggregate), exactly how sketch state should live in a
  warehouse table.
- probe: hash each query key to its d buckets, equi-join against the
  sketch, take min per key. Broadcast-sized whenever d*w is small.

Hashes are the repo's engine-independent md5 idiom, so a DuckDB
oracle replays the identical sketch — the differential check pins the
actual CM guarantee (true <= est <= true + eps*N), not just shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX15 = float(16**15)
MAX_DEPTH = 4  # md5 yields 32 hex chars = 4 independent 8-hex chunks


def ams_sign(i_col: Column, key_col: Column) -> Column:
    """+-1 Tug-of-War sign for AMS estimator ``i`` and ``key``:
    md5('ams{i}:{key}') first-hex parity. The ONE definition shared by
    the batch sketch (q345), the streaming fold
    (streaming/jobs.py::ams_f2_rollup_stream) and the epoch replay
    (q369) — their oracles replicate it as
    ``('0x'||substr(md5('ams'||i||':'||key),1,1))::INT % 2``, and the
    q369==q345 pytest pin depends on all three agreeing."""
    first_hex = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ams"),
                    i_col.cast("string"),
                    F.lit(":"),
                    key_col.cast("string"),
                )
            ),
            1,
            1,
        ),
        16,
        10,
    ).cast("int")
    return F.when(first_hex % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def _bucket(h: Column, row: Column, width: int) -> Column:
    """Row ``i``'s bucket is the i-th 8-hex (32-bit) chunk of ONE md5
    of the key, mod width — one hash evaluation serves all d rows
    (4x cheaper than hashing per row; the chunks of a cryptographic
    digest are as pairwise-independent as separate hashes for CM
    purposes). Caps depth at 4."""
    return F.conv(F.substring(h, row * 8 + 1, F.lit(8)), 16, 10).cast("long") % width


def _check_depth(depth: int) -> None:
    if not 1 <= depth <= MAX_DEPTH:
        raise ValueError(f"depth must be in [1, {MAX_DEPTH}], got {depth}")


def cms_build(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 1024,
    shard_col: Column | None = None,
) -> DataFrame:
    """Count-Min sketch of ``key``'s frequency distribution: returns
    the (row, bucket, c) counter table, d*w rows max. One md5 per
    input row (computed BELOW the generate, so the explode replicates
    the 32-hex digest, not the hash work), a narrow explode (factor
    d), then one hash aggregate; map-side combine shrinks every
    partition to <= d*w counters before the shuffle.

    ``shard_col`` (optional) builds PER-SHARD partial grids in the
    same single pass — output (shard, row, bucket, c) — the
    1000-shard / per-epoch form whose cell-wise addition
    (streaming/jobs.py::cms_cells_collapse) equals the unsharded
    sketch exactly, by linearity; this is how the sketch state ships
    from distributed writers (q374 pins the algebra)."""
    _check_depth(depth)
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    shard = [shard_col.alias("shard")] if shard_col is not None else []
    shard_names = ["shard"] if shard_col is not None else []
    return (
        df.select(*shard, key.cast("string").alias("__k"))
        .filter(F.col("__k").isNotNull())
        .select(*shard_names, F.md5(F.concat(F.lit("cms:"), F.col("__k"))).alias("__h"))
        .select(*shard_names, rows, F.col("__h"))
        .select(
            *shard_names,
            "row",
            _bucket(F.col("__h"), F.col("row"), width).alias("bucket"),
        )
        .groupBy(*shard_names, "row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_point_estimates(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query a CM sketch for every row of ``keys``: joins each
    key's d (row, bucket) probes against the counter table and takes
    the min — returns (key_col, est). Missing counters read as 0."""
    _check_depth(depth)
    probes = (
        keys.select(F.col(key_col).cast("string").alias("__k"))
        .distinct()
        .select(
            "__k", F.md5(F.concat(F.lit("cms:"), F.col("__k"))).alias("__h")
        )
        .select(
            "__k",
            "__h",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        )
        .select("__k", "row", _bucket(F.col("__h"), F.col("row"), width).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
        .select(F.col("__k").alias(key_col), "est")
    )


def cms_sql_duckdb(
    source_sql: str, key_sql: str, depth: int = 4, width: int = 1024
) -> str:
    """DuckDB CTE fragment computing the identical sketch counters as
    :func:`cms_build` (name it in a WITH clause)."""
    _check_depth(depth)
    return f"""
        SELECT row, ('0x' || substr(h, row * 8 + 1, 8))::BIGINT
                   % {width} AS bucket,
               COUNT(*) AS c
        FROM (
            SELECT md5('cms:' || CAST({key_sql} AS VARCHAR)) AS h,
                   unnest(range(0, {depth}))::INT AS row
            FROM {source_sql}
            WHERE {key_sql} IS NOT NULL
        )
        GROUP BY 1, 2
    """

def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int | None = None
) -> DataFrame:
    """Join-size estimation from two Count-Min sketches (Cormode &
    Muthukrishnan 2005 §4.2): |A join_k B| = sum_k f_A(k)*f_B(k) is
    estimated by min over rows of sum_b cA[row,b]*cB[row,b]. Always an
    OVERestimate (colliding keys add non-negative cross terms); within
    eps*N_A*N_B of truth with probability 1-delta. Both operands are
    <= d*w counter tables, so the equi-join broadcasts — this is the
    shuffle-free way to cost a join before running it: sketches merge
    by addition across shards, and the estimate reads two sketch
    tables instead of rescanning either input. Returns 1 row (est).

    The min runs over an explicit 0..depth-1 row spine (left join +
    COALESCE 0), not over the inner-join survivors: a depth-row where
    the two sketches share no populated buckets means that row's true
    inner product is 0, so dropping it would inflate the min — and two
    fully disjoint sketches must estimate 0, not NULL.

    ``depth`` defaults to the depth the sketches were BUILT with,
    derived as max(row)+1 from the operands themselves (one tiny
    aggregate per sketch — each is <= d*w rows). Passing it explicitly
    is validated the same way: a depth larger than the build depth
    would zero-fill phantom spine rows and force est=0, a smaller one
    would drop rows and inflate the min (ADVICE r6), so both sketches
    must populate exactly rows 0..depth-1."""
    spark = sketch_a.sparkSession

    def _row_span(sketch: DataFrame, side: str) -> int:
        row = sketch.agg(
            F.min("row").alias("lo"), F.max("row").alias("hi")
        ).collect()[0]
        if row["hi"] is None:
            raise ValueError(f"sketch_{side} is empty — build it with cms_build")
        if row["lo"] != 0:
            raise ValueError(f"sketch_{side} rows start at {row['lo']}, expected 0")
        return int(row["hi"]) + 1

    span_a, span_b = _row_span(sketch_a, "a"), _row_span(sketch_b, "b")
    if span_a != span_b:
        raise ValueError(
            f"sketch depths differ: a={span_a} b={span_b} — "
            "inner product needs identically-parameterized sketches"
        )
    if depth is None:
        depth = span_a
    elif depth != span_a:
        raise ValueError(
            f"depth={depth} does not match the sketches' build depth {span_a}"
        )
    _check_depth(depth)
    prod = sketch_a.alias("a").join(
        F.broadcast(sketch_b.alias("b")), ["row", "bucket"]
    )
    per_row = prod.groupBy("row").agg(
        F.sum(F.col("a.c") * F.col("b.c")).alias("ip")
    )
    spine = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    filled = spine.join(F.broadcast(per_row), "row", "left").select(
        F.coalesce("ip", F.lit(0)).alias("ip")
    )
    return filled.agg(F.min("ip").alias("est"))
