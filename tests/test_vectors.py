"""Vector-family operators: tiled exact pair GEMM, learned-centroid
IVF, and the no-driver-materialization contract.

The sf0.001 embeddings corpus is ~uniform random unit vectors (no
label/cluster geometry), so pruned-probe ANN recall is a data property
near chance level; the operator properties tested here are the ones
that hold for ANY corpus: laziness, block-count invariance, partition
completeness, and exhaustive-probe exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
    learn_ivf_centroids,
    similar_pairs_exact,
)
from batchprocessingetl_spark.workload.vectors import _query_df
from tests.conftest import SF_SMOKE


def test_similar_pairs_is_lazy_no_driver_materialization(spark):
    # Building the operator must not run any job or collect data to the
    # driver: an exploding upstream stage only fires if something forces
    # execution. (The r1 implementation ran df.count() + collect() at
    # call time — this pins the fix.)
    import pytest

    def bomb(batches):
        raise RuntimeError("operator construction forced execution")
        yield  # pragma: no cover

    src = load_table(spark, SF_SMOKE, "embeddings").mapInPandas(
        bomb, schema="vec_id long, embedding array<float>, label int"
    )
    out = similar_pairs_exact(src, 0.5)  # must not raise
    assert set(out.columns) == {"id_a", "id_b", "cosine"}
    with pytest.raises(Exception, match="forced execution"):
        out.count()  # the bomb is live — only an action detonates it


def test_tiled_pairs_invariant_to_block_count(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(120)
    base = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in similar_pairs_exact(emb, 0.3, n_blocks=1).collect()
    }
    assert base  # nonempty at this threshold
    for n_blocks in (3, 8):
        got = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in similar_pairs_exact(emb, 0.3, n_blocks=n_blocks).collect()
        }
        assert got == base, f"n_blocks={n_blocks} changed the pair set"


def test_ivf_exhaustive_probe_equals_exact_at_k64(spark):
    # recall == 1.0 when probing all 64 learned cells — the partition
    # loses and duplicates nothing, for any realized centroids.
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.col("vec_id") != 0)
    model = learn_ivf_centroids(base, k=64, seed=1)
    q = _query_df(spark, SF_SMOKE)
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(base, q, 10).collect()]
    full = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(base, q, model, 10, nprobe=64).collect()
    ]
    assert full == exact


def test_ivf_assignment_partitions_corpus(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.col("vec_id") != 0)
    model = learn_ivf_centroids(base, k=16, seed=42)
    assigned = ivf_assign(base, model)
    assert assigned.count() == base.count()  # one row per vector
    stats = assigned.agg(
        F.min("__cell").alias("lo"),
        F.max("__cell").alias("hi"),
        F.countDistinct("__cell").alias("n_cells"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < 16
    assert 1 <= stats["n_cells"] <= 16


def test_ivf_pruned_probe_returns_true_cosines(spark):
    # nprobe < k prunes the candidate set but must never fabricate or
    # perturb a cosine: every returned (vec_id, cosine) appears in the
    # full brute-force ranking.
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.col("vec_id") != 0)
    n = base.count()
    model = learn_ivf_centroids(base, k=16, seed=42)
    q = _query_df(spark, SF_SMOKE)
    truth = {
        (r["vec_id"], r["cosine"]) for r in cosine_topk(base, q, n).collect()
    }
    pruned = ivf_topk(base, q, model, 10, nprobe=4).collect()
    assert len(pruned) == 10
    assert all((r["vec_id"], r["cosine"]) in truth for r in pruned)


def test_multiprobe_lsh_recall_dominates_single_bucket(spark):
    # Hamming-1 multi-probe must return a superset-or-equal quality
    # top-k: its candidate pool contains the single-bucket pool, so
    # recall vs the exact top-k can only improve.
    from batchprocessingetl_spark.operators.similarity import cosine_topk_lsh

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planes_rows = (
        emb.filter(F.col("vec_id").isin([1, 2, 3, 4]))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    planes = [[float(x) for x in r["embedding"]] for r in planes_rows]
    base = emb.filter(~F.col("vec_id").isin([0, 1, 2, 3, 4]))
    q = _query_df(spark, SF_SMOKE)
    exact = {r["vec_id"] for r in cosine_topk(base, q, 10).collect()}
    single = {r["vec_id"] for r in cosine_topk_lsh(base, q, planes, 10).collect()}
    multi = {
        r["vec_id"] for r in cosine_topk_lsh(base, q, planes, 10, multiprobe=1).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    # on this corpus the 5 probed buckets (of 16) lift recall strictly
    assert len(multi & exact) > len(single & exact)
