"""Hypothesis property tests for CDC changelog compaction and the new
round-4 array/graph operators, each checked against an independent
pure-Python reference implementation — randomized inputs cover the
orderings and slicings example tests can't enumerate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batchprocessingetl_spark.operators.cdc import apply_changelog, compact_changelog

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# changelog entries: (key, version, op, val); versions unique per key
# are NOT enforced — ties exercise the deterministic struct tie-break
entry_st = st.tuples(
    st.integers(0, 4),  # key
    st.integers(0, 5),  # version
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["a", "b", "c"]),
)
log_st = st.lists(entry_st, min_size=1, max_size=14)


def _py_apply(entries):
    """Reference compaction: max (version, op, val) tuple per key —
    the same lexicographic tie-break the struct-max computes."""
    best: dict[int, tuple] = {}
    for k, v, op, val in entries:
        cand = (v, op, val)
        if k not in best or cand > best[k]:
            best[k] = cand
    return {
        k: (op, val) for k, (v, op, val) in best.items() if op != "D"
    }


@settings(**SETTINGS)
@given(log=log_st)
def test_cdc_compaction_matches_python_reference(spark, log):
    df = spark.createDataFrame(log, "k long, version long, op string, val string")
    got = {r["k"]: (None, r["val"]) for r in apply_changelog(df, ["k"]).collect()}
    want = {k: (None, val) for k, (op, val) in _py_apply(log).items()}
    assert got == want


@settings(**SETTINGS)
@given(log=log_st, cut=st.integers(0, 14))
def test_cdc_compaction_is_sliceable(spark, log, cut):
    """compact(compact(A) ∪ B) == compact(A ∪ B) for any slice point —
    the associativity the streaming compactor relies on."""
    cut = min(cut, len(log))
    a, b = log[:cut], log[cut:]
    whole = spark.createDataFrame(log, "k long, version long, op string, val string")
    want = sorted(map(tuple, compact_changelog(whole, ["k"]).collect()))
    if not a or not b:
        got = want  # trivial slice; still assert the call round-trips
    else:
        fa = compact_changelog(
            spark.createDataFrame(a, "k long, version long, op string, val string"),
            ["k"],
        )
        fb = spark.createDataFrame(b, "k long, version long, op string, val string")
        got = sorted(
            map(tuple, compact_changelog(fa.unionByName(fb), ["k"]).collect())
        )
    assert got == want


# small random graphs for the triangle counter
edge_st = st.tuples(st.integers(0, 7), st.integers(0, 7))
graph_st = st.lists(edge_st, min_size=0, max_size=18)


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for v in (a, b, c):
                        counts[v] = counts.get(v, 0) + 1
    return counts


@settings(**SETTINGS)
@given(edges=graph_st)
def test_triangle_counts_match_python_reference(spark, edges):
    from batchprocessingetl_spark.operators.graph import triangle_counts

    want = _py_triangles(edges)
    if not edges:
        edges = [(0, 0)]  # createDataFrame needs >= 1 row; self-loop drops out
        want = {}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == want


@settings(**SETTINGS)
@given(
    toks=st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10),
    phrase=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3),
)
def test_phrase_count_matches_python_reference(spark, toks, phrase):
    from pyspark.sql import functions as F

    from batchprocessingetl_spark.operators.text import phrase_count

    want = sum(
        1
        for i in range(len(toks) - len(phrase) + 1)
        if toks[i : i + len(phrase)] == phrase
    )
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(
        phrase_count(F.col("toks"), tuple(phrase)).alias("n")
    ).collect()[0]["n"]
    assert got == want
