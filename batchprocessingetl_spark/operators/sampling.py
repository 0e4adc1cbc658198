"""Deterministic corpus sampling for training-data pipelines (beyond
the reference — no sampling surface exists there; this rounds out the
curation toolkit next to dedup/quality/similarity).

Two surfaces:

- ``stratified_sample``: EXACT n-per-stratum sampling with a
  deterministic, engine-independent order (md5 of a seed + the row
  key), so the same corpus always yields the same sample on any
  cluster layout — unlike ``df.sampleBy``, which is per-row Bernoulli
  (approximate counts) and partition-layout-sensitive in practice.
  Plan: one hash-shuffle on the stratum key + per-stratum window
  row_number <= n. At 100 TB this is the standard "cap every source /
  language / domain at N documents" step; the shuffle carries only
  (stratum, rank-hash, payload-pruned columns).

- ``split_train_holdout``: deterministic hash-split (md5 range cut) —
  every row lands in exactly one split, stable across runs and engines,
  no RNG state. A narrow map, no shuffle at all.

Both orderings use md5 (identical in Spark and DuckDB/ANSI SQL), so a
differential oracle can replicate the exact sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_hash(key: Column, seed: str) -> Column:
    """Deterministic engine-independent pseudo-random order: md5 of the
    seed-prefixed key rendered as a string. Changing the seed reshuffles
    the order; the same (seed, key) always sorts identically."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str,
    seed: str = "s0",
) -> DataFrame:
    """Keep exactly min(n, |stratum|) rows per stratum, chosen by the
    deterministic rank hash — exact counts, reproducible everywhere.
    ``key_col`` must be unique per row (it also tie-breaks the rank)."""
    w = Window.partitionBy(stratum_col).orderBy(
        rank_hash(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum Bernoulli-style downsampling with DETERMINISTIC
    membership: keep a row iff its md5 rank-hash falls below its
    stratum's fraction cut. This is the domain-mixture weighting step
    (e.g. keep 100% of books, 30% of web, 5% of logs) applied before
    training; unlike ``df.sampleBy`` the decision is a pure function of
    (seed, key), so membership is reproducible across runs, engines,
    and partition layouts, and stable under corpus growth.

    Strata absent from ``fractions`` are kept in full (fraction 1.0).
    Plan: a narrow map + filter — NO shuffle, no RNG state; the
    fractions dict enters the plan as a small CASE expression. At
    100 TB this runs at scan speed and composes with
    ``stratified_sample`` (hard caps) and ``split_train_holdout``.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    bucket = F.conv(F.substring(rank_hash(F.col(key_col), seed), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    )
    cut = None
    for k, v in fractions.items():
        lit_cut = F.lit(int(v * (16**15))).cast("decimal(20,0)")
        cut = F.when(F.col(stratum_col) == k, lit_cut) if cut is None else cut.when(
            F.col(stratum_col) == k, lit_cut
        )
    cut = F.lit(int(16**15)).cast("decimal(20,0)") if cut is None else cut.otherwise(
        F.lit(int(16**15)).cast("decimal(20,0)")
    )
    return df.filter(bucket < cut)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "w0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows, probability
    proportional to ``weight_col`` — the exponential-sort construction
    (Efraimidis-Spirtsis A-ES): draw u_i ~ Uniform(0,1], keep the k
    smallest values of -ln(u_i)/w_i. Inclusion probability is exactly
    proportional to weight; no replacement bookkeeping, no rejection.

    u_i is NOT an RNG draw: it derives from the first 15 md5(seed:key)
    hex digits (60 bits, same granularity as mixture_sample /
    split_train_holdout — coarser uniforms would collide between
    distinct keys at ~n^2/2^bits and distort the draw), so the sample
    is a pure function of (seed, key, weight) — reproducible across
    runs, engines, and partition layouts, which is what a
    training-mixture pipeline needs for auditable corpus builds
    (re-materializing the corpus yields byte-identical membership).

    Plan: narrow projection to compute the sort key, then global top-k
    via orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    partial top-k heaps, only k rows per partition reach the driver-side
    merge), NOT a full sort or shuffle of the corpus. Linear scan cost
    at 100 TB. Rows with weight <= 0 are excluded (zero mass)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    v = F.conv(
        F.substring(rank_hash(F.col(key_col), seed), 1, 15), 16, 10
    ).cast("decimal(20,0)")
    u = (v + F.lit(1)).cast("double") / F.lit(float(16**15))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__aes", key)
        .orderBy(F.col("__aes").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__aes")
    )


def temperature_resample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float,
    target_rows: int,
    seed: str = "t0",
) -> DataFrame:
    """Temperature-weighted mixture resampling: keep each stratum with
    probability f_i = min(1, target * w_i / n_i) where
    w_i = n_i^alpha / sum_j n_j^alpha — the standard multinomial
    temperature reweighting for multilingual / multi-source training
    mixtures (alpha=1 preserves natural proportions, alpha=0 equalizes
    strata, alpha~0.3-0.7 up-samples the tail). Expected output size is
    ~``target_rows`` while no stratum saturates at f_i = 1.

    Unlike :func:`mixture_sample` (caller-supplied fractions), the
    fractions derive from corpus counts IN-PLAN: a per-stratum count
    aggregate, a 1-row normalizer aggregate (broadcast via cross
    join), and a broadcast join back — no driver-side collect at any
    corpus size. Membership stays the deterministic md5-uniform rule
    (pure function of seed+key), so the draw is reproducible and
    engine-replicable; fractions round to 12 dp so both engines
    compare against the identical cut."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).cast("double").alias("__n"))
    norm = counts.agg(F.sum(F.pow(F.col("__n"), F.lit(float(alpha)))).alias("__z"))
    frac = counts.crossJoin(F.broadcast(norm)).select(
        stratum_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.pow(F.col("__n"), F.lit(float(alpha)))
                / F.col("__z")
                / F.col("__n"),
            ),
            12,
        ).alias("__f"),
    )
    v = F.conv(F.substring(rank_hash(F.col(key_col), seed), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    )
    u = (v + F.lit(1)).cast("double") / F.lit(float(16**15))
    return df.join(F.broadcast(frac), stratum_col).filter(u < F.col("__f")).drop("__f")


def split_train_holdout(
    df: DataFrame,
    key_col: str,
    holdout_fraction: float,
    seed: str = "s0",
) -> DataFrame:
    """Add a ``split`` column ('train' | 'holdout') by cutting the md5
    hash space: rows whose rank-hash falls in the lowest
    ``holdout_fraction`` of the hex range go to holdout. Deterministic
    per (seed, key): re-runs, engines, and partitionings all agree, and
    membership is stable as the corpus grows (a row never migrates)."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError(f"holdout_fraction must be in [0,1], got {holdout_fraction}")
    # first 15 hex chars -> 60-bit int, uniform over [0, 16^15)
    bucket = F.conv(F.substring(rank_hash(F.col(key_col), seed), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    )
    cut = F.lit(int(holdout_fraction * (16**15))).cast("decimal(20,0)")
    return df.withColumn(
        "split", F.when(bucket < cut, F.lit("holdout")).otherwise(F.lit("train"))
    )


def negative_pairs(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 4,
    n_buckets: int = 32,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic contrastive NEGATIVE sampling: for every anchor
    row, up to ``k`` negative keys drawn from OTHER groups (same-group
    rows are potential positives — same near-dup cluster, same source —
    and must never be served as negatives).

    Scheme (bucket representatives, O(n*k) not O(n^2)): every row gets
    a ring position and a bucket from two INDEPENDENT md5 streams; each
    (bucket, group) keeps one representative — its min-(pos, key) row,
    a tiny B x |groups| frame. Anchor i-th draw targets bucket
    md5(seed:key:i) % B and takes the minimum-pos representative whose
    group differs from the anchor's. Everything is a broadcast join of
    anchors x k against the representative frame — no corpus
    self-join, no RNG state, replayable on any engine (md5 is the only
    entropy source, per the oracle-parity playbook). A draw whose
    bucket holds only same-group representatives yields no row (both
    engines drop it identically); with |groups| >> 1 and B sized so
    buckets hold several groups this is rare.

    At 100 TB: the representative frame stays B x |groups| regardless
    of corpus size — the only full-corpus work is one hash aggregate."""
    if k < 1 or n_buckets < 1:
        raise ValueError(f"need k >= 1 and n_buckets >= 1, got {k}, {n_buckets}")
    key = F.col(key_col).cast("string")
    pos = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "p:"), key)), 1, 15), 16, 10
    ).cast("long")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "b:"), key)), 1, 15), 16, 10
    ).cast("long") % n_buckets
    base = df.select(
        F.col(key_col).alias("__key"),
        F.col(group_col).alias("__grp"),
        pos.alias("__pos"),
        bucket.alias("__bkt"),
    )
    reps = (
        base.groupBy("__bkt", "__grp")
        .agg(F.min(F.struct("__pos", "__key")).alias("__rep"))
        .select(
            "__bkt",
            F.col("__grp").alias("rep_grp"),
            F.col("__rep.__pos").alias("rep_pos"),
            F.col("__rep.__key").alias("rep_key"),
        )
    )
    draws = base.select(
        F.col("__key").alias("anchor"),
        F.col("__grp").alias("anchor_grp"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("draw"),
    ).withColumn(
        "__bkt",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + "t:"),
                        F.col("anchor").cast("string"),
                        F.lit(":"),
                        F.col("draw").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets,
    )
    return (
        draws.join(F.broadcast(reps), "__bkt")
        .filter(F.col("rep_grp") != F.col("anchor_grp"))
        .groupBy("anchor", "anchor_grp", "draw")
        .agg(F.min(F.struct("rep_pos", "rep_key")).alias("__neg"))
        .select(
            "anchor",
            "anchor_grp",
            "draw",
            F.col("__neg.rep_key").alias("negative"),
        )
    )
