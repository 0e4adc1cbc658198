"""BM25 scoring semantics: tf saturation, idf ordering, length
normalization — on a hand-built corpus with known statistics."""

from __future__ import annotations

import math

from batchprocessingetl_spark.operators.retrieval import bm25_term_scores


def _scores(spark, rows, terms):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_term_scores(df, "doc_id", "text", terms).collect()
    return {(r["id"], r["term"]): r for r in out}


def test_bm25_tf_increases_and_saturates(spark):
    s = _scores(
        spark,
        [(1, "x a b c"), (2, "x x a b"), (3, "x x x a"), (4, "a b c d")],
        ("x",),
    )
    s1, s2, s3 = (s[(i, "x")]["score"] for i in (1, 2, 3))
    assert s1 < s2 < s3
    # saturation: the second occurrence adds less than the first
    assert (s3 - s2) < (s2 - s1)
    assert (4, "x") not in s  # non-matching doc yields no row


def test_bm25_rare_term_outscores_common_term(spark):
    # 'r' in 1 of 4 docs, 'c' in all 4; equal tf and equal dl
    rows = [(1, "r c a b"), (2, "c a b d"), (3, "c a b d"), (4, "c a b d")]
    s = _scores(spark, rows, ("r", "c"))
    assert s[(1, "r")]["score"] > s[(1, "c")]["score"]


def test_bm25_matches_closed_form(spark):
    # one matching doc: N=2, df=1, dl=2, avgdl=3 -> exact expectation
    rows = [(1, "x y"), (2, "a b c d")]
    s = _scores(spark, rows, ("x",))
    k1, b = 1.2, 0.75
    idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
    sat = (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 2 / 3.0))
    assert abs(s[(1, "x")]["score"] - idf * sat) < 1e-12


def test_bm25_length_normalization_prefers_short_doc(spark):
    # same tf=1; shorter doc scores higher
    rows = [(1, "x a"), (2, "x a b c d e f g")]
    s = _scores(spark, rows, ("x",))
    assert s[(1, "x")]["score"] > s[(2, "x")]["score"]


def test_bm25_topk_join_shape_and_ranks(spark):
    from batchprocessingetl_spark.operators.retrieval import bm25_topk_join
    from batchprocessingetl_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    queries = spark.createDataFrame(
        [(1, ["dup", "vector"]), (2, ["customer"])], "qid int, terms array<string>"
    )
    rows = bm25_topk_join(docs, queries, 5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {1, 2}
    for qid, rs in by_q.items():
        assert len(rs) <= 5
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        scores = [r["bm25"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["bm25"] > 0 for r in rs)


def test_bm25_topk_join_single_term_matches_term_scores(spark):
    # a 1-term query's ranking must equal bm25_term_scores' own ordering
    from batchprocessingetl_spark.operators.retrieval import bm25_term_scores, bm25_topk_join
    from batchprocessingetl_spark.catalog import load_table
    from tests.conftest import SF_SMOKE
    import pyspark.sql.functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    queries = spark.createDataFrame([(7, ["scan"])], "qid int, terms array<string>")
    got = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_join(docs, queries, 8).orderBy("rank").collect()
    ]
    want = [
        (r["id"], round(r["score"], 6))
        for r in bm25_term_scores(docs, "doc_id", "text", ("scan",))
        .orderBy(F.desc(F.round("score", 6)), F.asc("id"))
        .limit(8)
        .collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-6
