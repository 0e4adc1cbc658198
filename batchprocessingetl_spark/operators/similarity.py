"""Embedding similarity search (approximate-nearest-neighbor surface).

Brute-force cosine top-k as the exactness baseline, plus an LSH
(random-hyperplane-style) bucketed variant as the scale path. All
vector math uses built-in higher-order array functions
(``zip_with``/``aggregate`` — JVM-side, codegen), so the hot path never
crosses into Python.

Scale notes (100 TB / billions of vectors):
- brute force is one broadcast of the query batch + a single scan:
  O(N*d) work, embarrassingly parallel, no shuffle — correct baseline
  but linear per query;
- the LSH variant prunes the scan to one bucket per query: bucket
  assignment is a narrow map, the bucket join is an equi-join Catalyst
  can hash-partition, and recall/cost is tuned by n_planes. Hyperplanes
  are data-derived (fixed sample rows), so bucketing is deterministic —
  no RNG in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    """array<float> -> array<double> so all math is double-precision
    (matches any double-based oracle bit-for-bit on sequential sums)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a single query vector.

    ``query_df`` must have one row with column ``qvec`` (array<double>).
    The query side broadcasts; the scan side is never shuffled — the
    final top-k is a TakeOrdered (no full sort) on (cosine DESC, id).
    """
    e = as_double(F.col(vec_col))
    q = F.col("qvec")
    return (
        df.crossJoin(F.broadcast(query_df))
        .select(
            id_col,
            "label",
            F.round(cosine(e, q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def similar_pairs_exact(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All vector pairs with cosine >= threshold (exact, O(n^2) dots).

    The smaller projection (id, vec) broadcasts; the quadratic loop
    stays executor-side with no shuffle. This is the correctness
    baseline — at corpus scale, prune candidates first (sign-LSH
    buckets via :func:`lsh_bucket`, or IVF cells via :func:`ivf_topk`'s
    assignment) and verify only within buckets."""
    e = df.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    centroids: list[list[float]],
    k: int,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its nearest
    centroid (one narrow pass), search only the query's ``nprobe``
    closest cells.

    Centroids are a driver-side list (model parameters — k x dim
    floats), embedded as literals so assignment is pure expression
    work; with k cells and nprobe probes the scan shrinks ~k/nprobe-
    fold. Recall is tuned by nprobe. Deterministic given centroids."""
    def nearest_cells(vec: Column, n: int) -> Column:
        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        scored = F.transform(
            cents, lambda c: F.struct(cosine(vec, c).alias("cos"), F.lit(0).alias("pad"))
        )
        # rank cells by similarity: sort (cos, index) pairs descending
        idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
        pairs = F.zip_with(scored, idx, lambda s, i: F.struct(s["cos"].alias("cos"), i.alias("cell")))
        top = F.slice(F.reverse(F.array_sort(pairs)), 1, n)
        return F.transform(top, lambda p: p["cell"])

    e = as_double(F.col(vec_col))
    assigned = df.withColumn("__cell", F.element_at(nearest_cells(e, 1), 1))
    q = query_df.withColumn("__cells", nearest_cells(F.col("qvec"), nprobe)).select(
        "qvec", F.explode("__cells").alias("__cell")
    )
    return (
        assigned.join(F.broadcast(q), "__cell")
        .select(id_col, "label", F.round(cosine(e, F.col("qvec")), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(dot(vec, plane_i)) packed into a
    long. Narrow (per-row) computation."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def cosine_topk_lsh(
    df: DataFrame,
    query_df: DataFrame,
    planes: list[list[float]],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket.

    With b planes the candidate set shrinks ~2^b-fold; recall is traded
    via b. The bucket filter prunes *before* any join, so the expensive
    cosine only runs on candidates."""
    e = as_double(F.col(vec_col))
    bucketed = df.withColumn("__bucket", lsh_bucket(e, planes))
    q_bucketed = query_df.withColumn("__qbucket", lsh_bucket(F.col("qvec"), planes))
    return (
        bucketed.join(
            F.broadcast(q_bucketed),
            bucketed["__bucket"] == q_bucketed["__qbucket"],
        )
        .select(
            id_col,
            "label",
            F.round(cosine(e, F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
