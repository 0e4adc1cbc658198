"""Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
the MOSS local fingerprinting algorithm).

Pipeline: character k-grams -> 60-bit engine-independent hash per gram
(md5 prefix as integer, so a SQL oracle reproduces it bit-for-bit) ->
for every window of ``w`` consecutive gram hashes pick the minimum
(leftmost on ties) -> the distinct selected (position, hash) pairs are
the document's fingerprints. Guarantees: any shared substring of
length >= k + w - 1 between two documents yields at least one shared
fingerprint, which makes the fingerprint set a local, position-robust
near-dup/containment signal (plagiarism-style matching) — stronger
than whole-doc hashes (q35) and complementary to shingle Jaccard.

Relational plan (scales linearly, two shuffles on doc id):
1. explode gram start positions; hash each gram               (narrow)
2. per-doc forward window min over gram hashes                (shuffle)
3. join window-min back to positions to resolve the argmin
   (leftmost tie) and dedupe selected positions               (shuffle)

No HOF lambdas anywhere — every step is codegen'd expression work or
a plain window/join (see operators/dedup.py docstrings for why that
matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gram_hashes(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """(id, pos, h): 60-bit hash of each k-character gram. Engine-
    independent: h = int(md5(gram)[:15], 16) — reproducible in any
    SQL engine with md5 + hex conversion."""
    n_grams = F.length(F.col("__t")) - k + 1
    grams = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .filter(F.length("__t") >= k)
        .select("id", "__t", F.explode_outer(F.sequence(F.lit(1), n_grams)).alias("pos"))
        .filter(F.col("pos").isNotNull())
        .select("id", "pos", F.expr(f"substring(__t, pos, {k})").alias("gram"))
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
    return grams.select("id", "pos", h.alias("h"))


def winnow(df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing-selected fingerprints: (id, pos, fp) — distinct
    positions whose gram hash is the minimum of at least one window of
    ``w`` consecutive grams (leftmost position on hash ties).

    The per-window leftmost-argmin is ONE lexicographic struct-min over
    the forward window frame — min(struct(h, pos)) orders by hash then
    position, which IS "minimum hash, leftmost on ties". That removes
    the self-join + re-aggregate an explicit argmin resolution needs
    (measured ~2x on the sf0.1 corpus); the whole operator is one
    hash-partition by doc + one distinct."""
    hashes = gram_hashes(df, id_col, text_col, k)
    fwd = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    n = Window.partitionBy("id")
    return (
        hashes.withColumn("m", F.min(F.struct("h", "pos")).over(fwd))
        .withColumn("__n", F.max("pos").over(n))
        .filter(F.col("pos") <= F.col("__n") - w + 1)  # full windows only
        .select("id", F.col("m.pos").alias("pos"), F.col("m.h").alias("fp"))
        .distinct()
    )


def shared_fingerprints(fp_a: DataFrame, fp_b: DataFrame) -> DataFrame:
    """Documents sharing fingerprints across two fingerprint sets:
    (id_a, id_b, n_shared) — the containment/plagiarism join."""
    a = fp_a.select(F.col("id").alias("id_a"), "fp")
    b = fp_b.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("fp").alias("n_shared"))
    )
