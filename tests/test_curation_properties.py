"""Hypothesis property tests for corpus-hygiene operators: randomized
corpora must satisfy the operator contracts no example can enumerate —
bloom incremental dedup is EXACTLY the content anti-join (no false
negatives ever, false positives always caught by the verify join), and
repetition signals agree with a direct Python recomputation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batchprocessingetl_spark.operators.curation import (
    bloom_incremental_dedup,
    repetition_signals,
)

# small alphabet => frequent cross-row content collisions, the regime
# that stresses dedup
word_st = st.sampled_from(["aa", "bb", "cc", "dd"])
text_st = st.lists(word_st, min_size=0, max_size=6).map(" ".join)
corpus_st = st.lists(text_st, min_size=0, max_size=8)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=corpus_st, new=corpus_st)
def test_bloom_dedup_equals_exact_anti_join(spark, corpus, new):
    corpus_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    new_df = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(new)], "doc_id long, text string"
    )
    # tiny filter => false positives are common; exactness must survive
    got = sorted(
        r["doc_id"]
        for r in bloom_incremental_dedup(
            new_df, corpus_df, "text", "doc_id", n_bits=64, n_hashes=2
        ).collect()
    )
    corpus_texts = set(corpus)
    want = sorted(1000 + i for i, t in enumerate(new) if t not in corpus_texts)
    assert got == want


line_st = st.lists(st.sampled_from(["x", "y", "x x", ""]), min_size=0, max_size=6)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(lines=line_st)
def test_repetition_signals_match_python_recompute(spark, lines):
    text = "\n".join(lines)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_signals(df, "text").collect()[0]

    kept = [l.strip() for l in text.split("\n") if l.strip()]
    toks = text.split()
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    assert row["n_lines"] == len(kept)
    if kept:
        assert row["dup_line_frac"] == round(
            (len(kept) - len(set(kept))) / len(kept), 6
        )
        assert row["max_line_repeat"] == max(kept.count(l) for l in set(kept))
    else:
        assert row["dup_line_frac"] is None
        assert row["max_line_repeat"] == 0
    if grams:
        assert row["top_bigram_frac"] == round(
            max(grams.count(g) for g in set(grams)) / len(grams), 6
        )
    else:
        assert row["top_bigram_frac"] is None
