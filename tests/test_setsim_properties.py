"""Hypothesis property tests for the round-5 pair-mining operators:
randomized corpora must satisfy contracts no fixed example enumerates —
the prefix-filtered set-similarity join is EXACTLY the brute-force
Jaccard pair set at any threshold (the AllPairs cut loses nothing),
and A-priori co-purchase mining is exactly brute-force basket pairing.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batchprocessingetl_spark.operators.baskets import copurchase_pairs
from batchprocessingetl_spark.operators.dedup import setsim_join_prefix

# tiny vocabulary => dense near-dup structure, shingle collisions, and
# ties in the global document-frequency order (the prefix rule's
# hardest regime: a wrong tie-break silently drops pairs)
word_st = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc_st = st.lists(word_st, min_size=0, max_size=8).map(" ".join)
corpus_st = st.lists(doc_st, min_size=0, max_size=8)


def _shingles(text: str, n: int = 3) -> frozenset:
    toks = [t for t in text.split() if t]
    if len(toks) < n:
        return frozenset()  # mirrors shingles_of_tokens: short docs -> empty
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=corpus_st, threshold=st.sampled_from([0.2, 0.5, 0.9]))
def test_prefix_join_equals_bruteforce(spark, corpus, threshold):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim_join_prefix(
            df, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(corpus)}
    want = set()
    for a, b in combinations(range(len(corpus)), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= threshold:
            want.add((a, b))
    assert got == want


basket_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 6)), min_size=0, max_size=25
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=basket_st, minsup=st.sampled_from([1, 2, 3]))
def test_copurchase_equals_bruteforce(spark, rows, minsup):
    df = spark.createDataFrame(rows or [(99, 99)], "basket long, item long")
    data = rows or [(99, 99)]
    got = {
        (r["item_a"], r["item_b"], r["support"])
        for r in copurchase_pairs(df, "basket", "item", minsup).collect()
    }
    baskets: dict[int, set[int]] = {}
    for b, i in data:
        baskets.setdefault(b, set()).add(i)
    counts: dict[tuple, int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = {(a, b, n) for (a, b), n in counts.items() if n >= minsup}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=corpus_st, threshold=st.sampled_from([0.4, 0.5, 1.0]))
def test_containment_join_equals_bruteforce(spark, corpus, threshold):
    from batchprocessingetl_spark.operators.dedup import containment_join_prefix

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_join_prefix(
            df, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(corpus)}
    want = set()
    for a in range(len(corpus)):
        for b in range(len(corpus)):
            if a == b or not sh[a]:
                continue
            # mirror the operator: compare the 6dp-rounded ratio
            c = round(len(sh[a] & sh[b]) / len(sh[a]), 6)
            if len(sh[a] & sh[b]) > 0 and c >= threshold:
                want.add((a, b))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=basket_st, minsup=st.sampled_from([1, 2]))
def test_association_rules_equal_bruteforce(spark, rows, minsup):
    from batchprocessingetl_spark.operators.baskets import association_rules

    data = rows or [(99, 99)]
    df = spark.createDataFrame(data, "basket long, item long")
    got = {
        (r["item_a"], r["item_b"]): (
            r["support"], r["sup_a"], r["sup_b"],
            r["conf_a_to_b"], r["conf_b_to_a"], r["lift"],
        )
        for r in association_rules(df, "basket", "item", minsup).collect()
    }
    baskets: dict[int, set[int]] = {}
    for b, i in data:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    isup: dict[int, int] = {}
    for items in baskets.values():
        for i in items:
            isup[i] = isup.get(i, 0) + 1
    want = {}
    pair_sup: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            pair_sup[(a, b)] = pair_sup.get((a, b), 0) + 1
    for (a, b), s in pair_sup.items():
        if s >= minsup:
            want[(a, b)] = (
                s, isup[a], isup[b],
                s / isup[a], s / isup[b], s * n / (isup[a] * isup[b]),
            )
    assert got == want
