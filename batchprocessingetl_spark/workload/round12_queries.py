"""Round-12 pipeline-health shelf (q345-q352): the audits an engine
runs over ITS OWN scale machinery and corpus before a 100 TB campaign
— sketch-accuracy, ANN recall, index health, sampling design, group
fairness, context-budget planning, per-dimension drift, and
per-source style divergence.

Every query follows the house parity discipline (workload/parity.py):
hash-aggregate collapse first, exact integer/decimal arithmetic up to
one final double op (sqrt is IEEE-exact; ln rounds to 12 dp before
any decimal sum), md5-derived pseudo-randomness only (engine-
independent), and deterministic tie-breaks — so every plan, including
the approximate ones, is pinned by a plain DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators import similarity as S
from batchprocessingetl_spark.operators.text import TOKENS_SQL_DUCKDB, tokens

# ---------------------------------------------------------------------------
# q345: AMS (Tug-of-War) second-frequency-moment sketch vs exact F2
# ---------------------------------------------------------------------------

AMS_ESTIMATORS = 16


def q345_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS / Tug-of-War sketch of the second frequency moment of user
    activity (Alon-Matias-Szegedy, STOC'96): F2 = sum_k c_k^2 measures
    workload/self-join skew; the sketch estimates it in O(estimators)
    space. Estimator i is (sum_k sign_i(k) * c_k)^2 with 4-wise-ish
    signs derived from md5("ams{i}:" + key) parity — engine-
    independent, so the WHOLE sketch (not just the exact twin) is
    oracle-pinned. The estimate is the median of 16 estimators
    (median of 16 = mean of order stats 8 and 9, computed explicitly
    so both engines agree at any tie).

    Plan: one hash aggregate to per-key counts (the only corpus-sized
    pass), a 16-way explode of the KEY frame (not the fact table),
    and a 16-row aggregate — the sketch side's shuffle carries
    estimators, not rows. Exact F2 rides the same count frame. At
    100 TB only the first aggregate sees data; everything after is
    constant-size. Sum of signed counts is bounded by total rows
    (|sum| <= N), so the squared estimator fits a BIGINT at any
    realistic scale (N < 3e9 per key-domain shard)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    est = counts.select(
        "user_id", "c", F.explode(F.sequence(F.lit(0), F.lit(AMS_ESTIMATORS - 1))).alias("i")
    )
    first_hex = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ams"),
                    F.col("i").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            1,
        ),
        16,
        10,
    ).cast("int")
    signed = est.select(
        "i",
        (F.when(first_hex % 2 == 0, F.lit(1)).otherwise(F.lit(-1)) * F.col("c")).alias(
            "sc"
        ),
    )
    ests = (
        signed.groupBy("i")
        .agg(F.sum("sc").alias("s"))
        .select("i", (F.col("s") * F.col("s")).alias("est"))
    )
    w = Window.orderBy(F.asc("est"), F.asc("i"))  # 16 rows — bounded
    med = (
        ests.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").isin(AMS_ESTIMATORS // 2, AMS_ESTIMATORS // 2 + 1))
        .agg((F.sum("est") / F.lit(2.0)).alias("f2_estimate"))
    )
    exact = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).alias("f2_exact"),
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "n_keys",
        "f2_exact",
        F.round("f2_estimate", 1).alias("f2_estimate"),
        F.round(
            (F.col("f2_estimate") - F.col("f2_exact"))
            / F.col("f2_exact").cast("double")
            * 100.0,
            4,
        ).alias("rel_error_pct"),
    )


# ---------------------------------------------------------------------------
# q346: ANN recall audit — sign-LSH cell path vs exact ground truth
# ---------------------------------------------------------------------------

RECALL_K = 10


def q346_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the q335/q66 sign-LSH cell candidate path against
    the exact cosine top-10, per test query — the in-engine version of
    tools/ann_recall.py: before trusting cell-local ANN at 100 TB,
    measure what the cells actually recall on THIS corpus. Query set
    is the bounded KS_TEST_IDS panel (q332's); cells use q335's
    adaptive plane count, so this audit tracks exactly the shipped
    candidate generator.

    Both arms are deterministic (6dp-rounded cosine, id tie-break,
    md5-free data-derived planes), so recall itself is oracle-pinned —
    an approximate index whose QUALITY metric is exactly reproducible.
    Exact arm cost is Q-bounded (8 queries x corpus scan with
    WindowGroupLimit partial top-k); cell arm is one equi-join."""
    from batchprocessingetl_spark.workload.vectors import (
        KS_TEST_IDS,
        _noise_planes_b,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    b = _noise_planes_b(emb.count())
    rows = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= b))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    planes = [[float(x) for x in r["embedding"]] for r in rows]
    corp = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    tests = emb.filter(F.col("vec_id").isin(*KS_TEST_IDS)).select(
        F.col("vec_id").alias("qid"), S.as_double(F.col("embedding")).alias("qv")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = (
        corp.crossJoin(F.broadcast(tests))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(S.cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RECALL_K)
        .select("qid", "vec_id")
    )
    cells = corp.withColumn("cell", S.lsh_bucket(F.col("v"), planes))
    qcells = tests.withColumn("cell", S.lsh_bucket(F.col("qv"), planes))
    cand = (
        qcells.join(cells, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(S.cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    )
    n_cand = cand.groupBy("qid").agg(F.count(F.lit(1)).alias("n_candidates"))
    approx = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RECALL_K)
        .select("qid", "vec_id")
    )
    hits = (
        exact.join(approx.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
    )
    base = tests.select("qid")
    return (
        base.join(n_cand, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(RECALL_K)), 6
            ).alias("recall_at_10"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# q347: group-fairness audit over market segments
# ---------------------------------------------------------------------------

FAIR_THRESHOLD_CENTS = 25_000_000  # decision: order value > $250k
FAIR_POS = ("1-URGENT", "2-HIGH")  # outcome: expedited priority


def q347_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a deterministic decision rule across
    customer market segments: D = (order value > $250k), outcome
    Y = (priority urgent/high). Per segment: selection rate P(D)
    (demographic-parity component), TPR P(D|Y=1) and FPR P(D|Y=0)
    (equalized-odds components) — the standard pre-deployment audit
    for any selection/filtering rule a pipeline applies to grouped
    data (Hardt et al., NeurIPS'16 framing). Everything is four
    exact-integer contingency counts per segment from ONE hash
    aggregate over the fact table (broadcast dim join); the three
    rates are final double divisions. At 100 TB: one map + one
    aggregate, shuffle carries |segments| rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    labeled = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        "c_mktsegment",
        (cents > FAIR_THRESHOLD_CENTS).cast("long").alias("d"),
        F.col("o_orderpriority").isin(*FAIR_POS).cast("long").alias("y"),
    )
    return (
        labeled.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("n_selected"),
            F.sum("y").alias("n_pos"),
            F.sum(F.col("d") * F.col("y")).alias("n_tp"),
            F.sum(F.col("d") * (1 - F.col("y"))).alias("n_fp"),
        )
        .select(
            "c_mktsegment",
            "n",
            "n_selected",
            F.round(F.col("n_selected") / F.col("n").cast("double"), 6).alias(
                "selection_rate"
            ),
            F.round(F.col("n_tp") / F.col("n_pos").cast("double"), 6).alias("tpr"),
            F.round(
                F.col("n_fp") / (F.col("n") - F.col("n_pos")).cast("double"), 6
            ).alias("fpr"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q348: Neyman allocation for stratified corpus sampling
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 1000


def q348_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over order
    priority strata: n_h proportional to N_h * S_h minimizes the
    variance of the stratified mean at fixed budget (the textbook
    design for sampling a 100 TB corpus for human eval — allocate
    review capacity where mass x dispersion is). Per-stratum
    population sd comes from the exact-integer identity
    N*Sxx - Sx^2 over cents (DECIMAL(38,0) sums — cents^2 overflows
    BIGINT at sf0.1 scale), one IEEE sqrt (exact, not libm) per
    stratum, allocation shares over a 6dp-rounded DECIMAL(28,6)
    denominator so the 5-term sum is order-independent. One hash
    aggregate total; the allocation algebra runs on |strata| rows."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = (
        o.select(F.col("o_orderpriority").alias("priority"), cents.alias("x"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        )
    )
    var_pop = (
        (
            F.col("n_rows").cast("decimal(38,0)") * F.col("sxx")
            - F.col("sx") * F.col("sx")
        ).cast("double")
        / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
    )
    sized = per.select(
        "priority", "n_rows", F.sqrt(var_pop).alias("sd_cents")
    ).withColumn(
        "term", F.round(F.col("n_rows") * F.col("sd_cents"), 6).cast("decimal(28,6)")
    )
    denom = sized.agg(
        F.sum("term").alias("den"), F.sum("n_rows").alias("n_total")
    )
    return (
        sized.crossJoin(F.broadcast(denom))
        .select(
            "priority",
            "n_rows",
            F.round("sd_cents", 6).alias("sd_cents"),
            F.round(
                F.col("term").cast("double") / F.col("den").cast("double"), 6
            ).alias("neyman_share"),
            F.floor(
                F.lit(NEYMAN_BUDGET)
                * F.col("term").cast("double")
                / F.col("den").cast("double")
            )
            .cast("long")
            .alias("neyman_n"),
            F.floor(
                F.lit(NEYMAN_BUDGET) * F.col("n_rows") / F.col("n_total").cast("double")
            )
            .cast("long")
            .alias("proportional_n"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q349: per-dimension embedding drift (Cohen's d grid)
# ---------------------------------------------------------------------------

DRIFT_LABEL_A = 0
DRIFT_LABEL_B = 1
DRIFT_TOP = 10


def q349_embedding_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift between two label populations of the
    embedding table: Cohen's d = (m_a - m_b) / s_pooled for each of
    the 64 dimensions, top-10 by |d| — the coordinate-level
    complement to q333/q334's whole-distribution tests (WHICH
    dimensions moved, not just whether the distributions differ;
    feeds quantization/rotation decisions). Moments accumulate in
    DECIMAL(28,18) over a posexplode (exact, order-free); the d
    computation is one double expression per dimension on identical
    inputs; ranking rounds d to 6dp first so both engines order the
    same values. Shuffle carries dims x 2 partial rows — corpus-size
    independent."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isin(DRIFT_LABEL_A, DRIFT_LABEL_B)
    )
    dims = emb.select(
        "label", F.posexplode(S.as_double(F.col("embedding"))).alias("i", "x")
    )
    mom = dims.groupBy("i", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,18)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,18)")).alias("sxx"),
    )
    a = mom.filter(F.col("label") == DRIFT_LABEL_A).select(
        "i",
        F.col("n").alias("na"),
        F.col("sx").cast("double").alias("sxa"),
        F.col("sxx").cast("double").alias("sxxa"),
    )
    bb = mom.filter(F.col("label") == DRIFT_LABEL_B).select(
        "i",
        F.col("n").alias("nb"),
        F.col("sx").cast("double").alias("sxb"),
        F.col("sxx").cast("double").alias("sxxb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma, mb = F.col("sxa") / na, F.col("sxb") / nb
    ssa = F.col("sxxa") - F.col("sxa") * F.col("sxa") / na
    ssb = F.col("sxxb") - F.col("sxb") * F.col("sxb") / nb
    pooled = F.sqrt((ssa + ssb) / (na + nb - 2.0))
    d = F.round((ma - mb) / pooled, 6)
    ranked = a.join(bb, "i").select(
        "i",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        d.alias("cohens_d"),
    )
    w = Window.orderBy(F.desc(F.abs(F.col("cohens_d"))), F.asc("i"))
    return (
        ranked.withColumn("drift_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("drift_rank") <= DRIFT_TOP)
        .orderBy("drift_rank")
    )


# ---------------------------------------------------------------------------
# q350: context-length budget curve
# ---------------------------------------------------------------------------

CTX_SIZES = (128, 256, 512, 1024)


def q350_context_length_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length planning curve: for each candidate training
    context size, the exact padding loss (tokens of dead space when
    every document is chunked to ceil(t/ctx) windows) and truncation
    loss (tokens beyond the first window under a truncate-to-one-
    window policy) over the whole corpus — the two ends of the
    packing spectrum that bound any real packer (q71 sits between).
    Pure integer arithmetic per document (whitespace token counts,
    the corpus-wide token discipline), a 4-way explode of the DOC
    frame, one hash aggregate; two final divisions for the
    percentage columns. Linear at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.size(tokens(F.col("text")))
    base = docs.select(t.alias("t")).withColumn(
        "ctx", F.explode(F.array(*[F.lit(c) for c in CTX_SIZES]))
    )
    chunks = F.ceil(F.col("t") / F.col("ctx")).cast("long")
    per = base.select(
        "ctx",
        "t",
        chunks.alias("chunks"),
        (chunks * F.col("ctx") - F.col("t")).alias("pad"),
        F.greatest(F.col("t") - F.col("ctx"), F.lit(0)).alias("trunc"),
    )
    return (
        per.groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("total_tokens"),
            F.sum("chunks").alias("total_chunks"),
            F.sum("pad").alias("pad_tokens"),
            F.sum("trunc").alias("trunc_tokens"),
        )
        .select(
            "ctx",
            "n_docs",
            "total_tokens",
            "total_chunks",
            "pad_tokens",
            F.round(
                F.col("pad_tokens")
                / (F.col("total_chunks") * F.col("ctx")).cast("double"),
                6,
            ).alias("pad_frac"),
            "trunc_tokens",
            F.round(
                F.col("trunc_tokens") / F.col("total_tokens").cast("double"), 6
            ).alias("trunc_frac"),
        )
        .orderBy("ctx")
    )


# ---------------------------------------------------------------------------
# q351: LSH blocking-index health (bucket-size audit)
# ---------------------------------------------------------------------------

LSH_BANDS, LSH_WIDTH = 4, 15  # q47/q225's 60-bit SimHash band split


def q351_lsh_bucket_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity audit of the SimHash blocking index (q47/q225's
    4 x 15-bit bands): per band — bucket count, the largest bucket,
    and the exact candidate-pair mass sum c*(c-1)/2 with its fraction
    of the O(n^2) pair space. THE pre-flight check before running a
    banded dedup at 100 TB: a single hot bucket turns the band
    equi-join into an accidental cross join, and this query is how
    you see it coming (the skew twin of q225's recall-side audit).
    Signatures are the engine-independent md5 SimHash, so every
    number is oracle-pinned. One signature pass, one explode to 4
    band rows/doc, two nested hash aggregates; shuffle carries
    bucket-grain rows."""
    from batchprocessingetl_spark.operators.dedup import simhash60_md5

    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash60_md5(docs, "doc_id", "text")
    mask = (1 << LSH_WIDTH) - 1
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("simhash"), i * LSH_WIDTH)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band_idx", "b.band_val")
    buckets = banded.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        buckets.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("c").alias("n_docs"),
            F.max("c").alias("max_bucket"),
            F.sum(F.expr("c * (c - 1) div 2")).alias("candidate_pairs"),
        )
        .select(
            "band_idx",
            "n_buckets",
            "n_docs",
            "max_bucket",
            "candidate_pairs",
            F.round(
                F.col("candidate_pairs")
                / F.expr("n_docs * (n_docs - 1) div 2").cast("double"),
                6,
            ).alias("pair_frac"),
        )
        .orderBy("band_idx")
    )


# ---------------------------------------------------------------------------
# q352: per-source character-trigram KL divergence to the corpus
# ---------------------------------------------------------------------------


def q352_source_trigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source style divergence: KL(source trigram distribution ||
    corpus trigram distribution) over character trigrams — the
    cheap, tokenizer-free "which source writes differently" screen
    run before mixing sources into a training corpus (a source with
    near-zero KL adds no stylistic diversity; an extreme one needs a
    quality pass). Each source's support is a subset of the corpus
    support, so the KL is finite and exact: every term is
    c_st * ln((c_st * C) / (C_s * c_t)) with the log of an exact
    BIGINT-product ratio rounded to 12 dp, summed in DECIMAL(28,18),
    one division by C_s at the end. Trigram frames collapse map-side
    (hash aggregates on (source, trigram) then (trigram)); nothing
    quadratic, nothing engine-specific.

    Plan notes (measured at the 10x probe): trigrams come from a
    per-row CHAR ARRAY (split once, element_at is O(1)) rather than
    substring(text, i, 3) per index — substring seeks from the string
    head, making the naive form O(len^2) per document (2x wall). The
    doc frame repartitions to defaultParallelism before the explode
    (band_signatures' discipline): the explode is the expensive pass,
    and a single-file scan otherwise runs it on one core (20x wall at
    the probe; at 100 TB the many-file scan parallelizes naturally
    and the repartition is a no-op-sized shuffle of narrow rows)."""
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    chars = docs.repartition(par).select(
        "source", F.split(F.col("text"), "").alias("cs")
    )
    tris = chars.select(
        "source",
        F.explode(
            F.expr(
                """
                CASE WHEN size(cs) >= 3 THEN
                    transform(sequence(0, size(cs) - 3),
                              i -> concat(element_at(cs, i + 1),
                                          element_at(cs, i + 2),
                                          element_at(cs, i + 3)))
                ELSE array() END
                """
            )
        ).alias("tri"),
    )
    st = tris.groupBy("source", "tri").agg(F.count(F.lit(1)).alias("c_st"))
    src_tot = st.groupBy("source").agg(F.sum("c_st").alias("c_s"))
    tri_tot = st.groupBy("tri").agg(F.sum("c_st").alias("c_t"))
    corpus_tot = st.agg(F.sum("c_st").alias("c_all"))
    term = (
        F.col("c_st")
        * F.round(
            F.log(
                (F.col("c_st") * F.col("c_all")).cast("double")
                / (F.col("c_s") * F.col("c_t")).cast("double")
            ),
            12,
        )
    ).cast("decimal(28,18)")
    return (
        st.join(tri_tot, "tri")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(corpus_tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_trigram_types"),
            F.max("c_s").alias("total_trigrams"),
            F.round(
                F.sum(term).cast("double") / F.max("c_s").cast("double"), 9
            ).alias("kl_nats"),
        )
        .orderBy("source")
    )


QUERIES: dict = {}

EXTRA_QUERIES = {
    "q345_ams_f2_sketch": q345_ams_f2_sketch,
    "q346_ann_recall_audit": q346_ann_recall_audit,
    "q347_fairness_audit": q347_fairness_audit,
    "q348_neyman_allocation": q348_neyman_allocation,
    "q349_embedding_dim_drift": q349_embedding_dim_drift,
    "q350_context_length_curve": q350_context_length_curve,
    "q351_lsh_bucket_health": q351_lsh_bucket_health,
    "q352_source_trigram_kl": q352_source_trigram_kl,
}

_TOKENS = TOKENS_SQL_DUCKDB.format(col="text")

_Q346_COS = """ROUND(
    list_dot_product(c.v, q.qv)
    / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))),
    6)"""


def _q346_oracle() -> str:
    from batchprocessingetl_spark.workload.vectors import KS_TEST_IDS

    ids = ", ".join(str(i) for i in KS_TEST_IDS)
    return f"""
    WITH nn AS (
        SELECT COUNT(*) AS n FROM embeddings
    ), bsel AS (
        SELECT COALESCE(MIN(b), 16) AS b FROM range(2, 17) t(b), nn
        WHERE (1::BIGINT << b) * 128 >= nn.n
    ), p AS (
        SELECT vec_id AS pid, list_transform(embedding, x -> x::DOUBLE) AS pv
        FROM embeddings, bsel WHERE vec_id >= 1 AND vec_id <= bsel.b
    ), e AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings
    ), cell AS (
        SELECT e.vec_id, e.v,
               CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) > 0
                        THEN (1::BIGINT << (p.pid - 1)) ELSE 0 END) AS BIGINT) AS cell
        FROM e CROSS JOIN p GROUP BY e.vec_id, e.v
    ), q AS (
        SELECT vec_id AS qid, v AS qv, cell FROM cell WHERE vec_id IN ({ids})
    ), exact AS (
        SELECT q.qid, c.vec_id
        FROM q JOIN e c ON c.vec_id <> q.qid
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY q.qid ORDER BY {_Q346_COS} DESC, c.vec_id ASC
        ) <= {RECALL_K}
    ), cand AS (
        SELECT q.qid, c.vec_id, {_Q346_COS} AS cos
        FROM q JOIN cell c ON q.cell = c.cell AND c.vec_id <> q.qid
    ), ncand AS (
        SELECT qid, COUNT(*) AS n_candidates FROM cand GROUP BY 1
    ), approx AS (
        SELECT qid, vec_id FROM cand
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id ASC
        ) <= {RECALL_K}
    ), hits AS (
        SELECT x.qid, COUNT(a.vec_id) AS n_hits
        FROM exact x LEFT JOIN approx a USING (qid, vec_id)
        GROUP BY 1
    )
    SELECT q.qid, COALESCE(n_candidates, 0) AS n_candidates,
           COALESCE(n_hits, 0) AS n_hits,
           ROUND(COALESCE(n_hits, 0) / {float(RECALL_K)}, 6) AS recall_at_10
    FROM q LEFT JOIN ncand USING (qid) LEFT JOIN hits USING (qid)
    ORDER BY qid
"""


def _q351_oracle() -> str:
    from batchprocessingetl_spark.workload.textops import _SIMHASH_SIG_CTES

    mask = (1 << LSH_WIDTH) - 1
    return f"""
    WITH {_SIMHASH_SIG_CTES},
    bands AS (
        SELECT s.doc_id, i.i AS band_idx,
               (s.simhash >> (i.i * {LSH_WIDTH})) & {mask} AS band_val
        FROM sig s CROSS JOIN (SELECT unnest(range(0, {LSH_BANDS})) AS i) i
    ), buckets AS (
        SELECT band_idx, band_val, COUNT(*) AS c FROM bands GROUP BY 1, 2
    )
    SELECT band_idx, COUNT(*) AS n_buckets, CAST(SUM(c) AS BIGINT) AS n_docs,
           MAX(c) AS max_bucket,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs,
           ROUND(SUM(c * (c - 1) // 2)
                 / CAST(SUM(c) * (SUM(c) - 1) // 2 AS DOUBLE), 6) AS pair_frac
    FROM buckets GROUP BY 1 ORDER BY 1
"""


ORACLE: dict = {}

EXTRA_ORACLE = {
    "q345_ams_f2_sketch": f"""
    WITH counts AS (
        SELECT user_id, COUNT(*) AS c FROM events
        WHERE user_id IS NOT NULL GROUP BY 1
    ), signed AS (
        SELECT i.i,
               SUM(CASE WHEN ('0x' || substr(
                        md5('ams' || i.i || ':' || user_id), 1, 1))::INT % 2 = 0
                    THEN c ELSE -c END) AS s
        FROM counts CROSS JOIN (SELECT unnest(range(0, {AMS_ESTIMATORS})) AS i) i
        GROUP BY 1
    ), ests AS (
        SELECT i, s * s AS est,
               ROW_NUMBER() OVER (ORDER BY s * s ASC, i ASC) AS rn
        FROM signed
    ), med AS (
        SELECT SUM(est) / 2.0 AS f2_estimate FROM ests
        WHERE rn IN ({AMS_ESTIMATORS // 2}, {AMS_ESTIMATORS // 2 + 1})
    ), exact AS (
        SELECT COUNT(*) AS n_keys, CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM counts
    )
    SELECT n_keys, f2_exact, ROUND(f2_estimate, 1) AS f2_estimate,
           ROUND((f2_estimate - f2_exact) / CAST(f2_exact AS DOUBLE) * 100.0, 4)
               AS rel_error_pct
    FROM exact, med
""",
    "q347_fairness_audit": f"""
    WITH labeled AS (
        SELECT c.c_mktsegment,
               CASE WHEN CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
                        > {FAIR_THRESHOLD_CENTS} THEN 1 ELSE 0 END AS d,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(d) AS BIGINT) AS n_selected,
           ROUND(SUM(d) / CAST(COUNT(*) AS DOUBLE), 6) AS selection_rate,
           ROUND(SUM(d * y) / CAST(SUM(y) AS DOUBLE), 6) AS tpr,
           ROUND(SUM(d * (1 - y)) / CAST(COUNT(*) - SUM(y) AS DOUBLE), 6) AS fpr
    FROM labeled GROUP BY 1 ORDER BY 1
""",
    "q348_neyman_allocation": f"""
    WITH per AS (
        SELECT o_orderpriority AS priority, COUNT(*) AS n_rows,
               SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS DECIMAL(38,0))) AS sx,
               SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS DECIMAL(38,0))) AS sxx
        FROM orders GROUP BY 1
    ), sized AS (
        SELECT priority, n_rows,
               sqrt(CAST(CAST(n_rows AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
                    / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)))
                   AS sd_cents,
               CAST(ROUND(n_rows * sqrt(
                    CAST(CAST(n_rows AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
                    / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))), 6)
                    AS DECIMAL(28,6)) AS term
        FROM per
    ), den AS (
        SELECT SUM(term) AS den, SUM(n_rows) AS n_total FROM sized
    )
    SELECT priority, n_rows, ROUND(sd_cents, 6) AS sd_cents,
           ROUND(CAST(term AS DOUBLE) / CAST(den AS DOUBLE), 6) AS neyman_share,
           CAST(FLOOR({NEYMAN_BUDGET} * CAST(term AS DOUBLE) / CAST(den AS DOUBLE))
                AS BIGINT) AS neyman_n,
           CAST(FLOOR({NEYMAN_BUDGET} * n_rows / CAST(n_total AS DOUBLE))
                AS BIGINT) AS proportional_n
    FROM sized, den ORDER BY priority
""",
    "q349_embedding_dim_drift": f"""
    WITH dims AS (
        SELECT label, i, CAST(embedding[i + 1] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r
        WHERE label IN ({DRIFT_LABEL_A}, {DRIFT_LABEL_B})
    ), mom AS (
        SELECT i, label, COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(28,18))) AS sx,
               SUM(CAST(x * x AS DECIMAL(28,18))) AS sxx
        FROM dims GROUP BY 1, 2
    ), ab AS (
        SELECT a.i,
               a.n AS na, CAST(a.sx AS DOUBLE) AS sxa, CAST(a.sxx AS DOUBLE) AS sxxa,
               b.n AS nb, CAST(b.sx AS DOUBLE) AS sxb, CAST(b.sxx AS DOUBLE) AS sxxb
        FROM mom a JOIN mom b ON a.i = b.i
        WHERE a.label = {DRIFT_LABEL_A} AND b.label = {DRIFT_LABEL_B}
    ), dd AS (
        SELECT i,
               ROUND(sxa / na, 6) AS mean_a,
               ROUND(sxb / nb, 6) AS mean_b,
               ROUND((sxa / na - sxb / nb)
                     / sqrt(((sxxa - sxa * sxa / na) + (sxxb - sxb * sxb / nb))
                            / (na + nb - 2.0)), 6) AS cohens_d
        FROM ab
    )
    SELECT i, mean_a, mean_b, cohens_d,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(cohens_d) DESC, i ASC) AS INT)
               AS drift_rank
    FROM dd
    QUALIFY drift_rank <= {DRIFT_TOP}
    ORDER BY drift_rank
""",
    "q350_context_length_curve": f"""
    WITH toks AS (
        SELECT len({_TOKENS}) AS t FROM documents
    ), per AS (
        SELECT ctx.ctx, t,
               CAST(CEIL(t / CAST(ctx.ctx AS DOUBLE)) AS BIGINT) AS chunks,
               GREATEST(t - ctx.ctx, 0) AS trunc
        FROM toks CROSS JOIN (
            SELECT unnest([{", ".join(str(c) for c in CTX_SIZES)}]) AS ctx
        ) ctx
    )
    SELECT ctx, COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS total_tokens,
           CAST(SUM(chunks) AS BIGINT) AS total_chunks,
           CAST(SUM(chunks * ctx - t) AS BIGINT) AS pad_tokens,
           ROUND(SUM(chunks * ctx - t)
                 / CAST(SUM(chunks) * ctx AS DOUBLE), 6) AS pad_frac,
           CAST(SUM(trunc) AS BIGINT) AS trunc_tokens,
           ROUND(SUM(trunc) / CAST(SUM(t) AS DOUBLE), 6) AS trunc_frac
    FROM per GROUP BY ctx ORDER BY ctx
""",
    "q352_source_trigram_kl": """
    WITH tris AS (
        SELECT d.source, substr(d.text, r.i, 3) AS tri
        FROM documents d
        JOIN LATERAL (
            SELECT unnest(range(1, GREATEST(len(d.text) - 1, 1))) AS i
        ) r ON TRUE
        WHERE len(d.text) >= 3
    ), st AS (
        SELECT source, tri, COUNT(*) AS c_st FROM tris GROUP BY 1, 2
    ), src_tot AS (
        SELECT source, SUM(c_st) AS c_s FROM st GROUP BY 1
    ), tri_tot AS (
        SELECT tri, SUM(c_st) AS c_t FROM st GROUP BY 1
    ), corpus AS (
        SELECT SUM(c_st) AS c_all FROM st
    )
    SELECT st.source, COUNT(*) AS n_trigram_types,
           CAST(MAX(c_s) AS BIGINT) AS total_trigrams,
           ROUND(CAST(SUM(CAST(c_st * ROUND(ln(
                     CAST(c_st * c_all AS DOUBLE)
                     / CAST(c_s * c_t AS DOUBLE)), 12)
                 AS DECIMAL(28,18))) AS DOUBLE) / CAST(MAX(c_s) AS DOUBLE), 9)
               AS kl_nats
    FROM st
    JOIN tri_tot USING (tri)
    JOIN src_tot USING (source)
    CROSS JOIN corpus
    GROUP BY st.source ORDER BY st.source
""",
}

EXTRA_ORACLE["q346_ann_recall_audit"] = _q346_oracle()
EXTRA_ORACLE["q351_lsh_bucket_health"] = _q351_oracle()
