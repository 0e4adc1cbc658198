"""PageRank operator: textbook semantics on crafted graphs."""

from __future__ import annotations

import pytest

from batchprocessingetl_spark.operators.graph import (
    pagerank,
    pagerank_scope,
    release_pagerank,
)


def _reference_pagerank(edges, iterations=5, damping=0.85):
    """Driver-side reference implementation (dict arithmetic)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = float(len(nodes))
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dm = sum(r[v] for v in nodes if v not in outw)
        nxt = {}
        for v in nodes:
            in_sum = sum(
                r[s] * (w / outw[s]) for s, d, w in edges if d == v
            )
            nxt[v] = (1.0 - damping) / n + damping * (in_sum + dm / n)
        r = nxt
    return r


EDGES = [
    ("a", "b", 1.0),
    ("a", "c", 3.0),
    ("b", "c", 1.0),
    ("c", "a", 1.0),
    ("c", "d", 1.0),
    # d is dangling: no out-edges, its mass redistributes uniformly
]


def test_pagerank_matches_reference_with_dangling(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w double")
    out = pagerank(df, weight_col="w", iterations=5)
    got = {r["id"]: r["rank"] for r in out.collect()}
    want = _reference_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # mass conservation: dangling redistribution keeps ranks summing to 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert release_pagerank(out) >= 3
    assert release_pagerank(out) >= 0  # idempotent


def test_pagerank_unweighted_and_scope_releases(spark):
    df = spark.createDataFrame(
        [(s, d) for s, d, _ in EDGES], "src string, dst string"
    )
    with pagerank_scope(df, iterations=3) as out:
        want = _reference_pagerank([(s, d, 1.0) for s, d, _ in EDGES], iterations=3)
        got = {r["id"]: r["rank"] for r in out.collect()}
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)
    # after scope exit the cached graph frames are released
    assert release_pagerank(out) == 0 or all(
        lv.storageLevel.useMemory is False
        for lv in getattr(out, "_bpetl_persisted_levels", [])
    )


def test_pagerank_rejects_bad_iterations(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_triangle_counts_k4_minus_edge(spark):
    from batchprocessingetl_spark.operators.graph import triangle_counts

    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4} only; noisy
    # input — duplicates, reversed duplicates, a self-loop
    edges = [(1, 2), (2, 1), (1, 3), (2, 3), (1, 4), (2, 4), (1, 2), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_triangle_free(spark):
    from batchprocessingetl_spark.operators.graph import triangle_counts

    # star graph + a 4-cycle: zero triangles
    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (12, 13), (13, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_counts(df).count() == 0


def test_triangle_counts_skewed_hub(spark):
    from batchprocessingetl_spark.operators.graph import triangle_counts

    # hub node 0 connected to everyone, plus a chain 1-2, 3-4: the
    # degree orientation must point edges AWAY from low-degree leaves
    # into the hub, and counts must still be exact
    edges = [(0, i) for i in range(1, 8)] + [(1, 2), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_pagerank_reliable_checkpoint_parity(spark, tmp_path):
    """checkpoint_dir (reliable barrier) must not change the numbers,
    and must actually write checkpoint state into the dir."""
    edges = spark.createDataFrame(EDGES, "src string, dst string, w double")
    plain = pagerank(edges, weight_col="w", iterations=4)
    reliable = pagerank(
        edges, weight_col="w", iterations=4, checkpoint_dir=str(tmp_path / "ckpt")
    )
    a = {r["id"]: r["rank"] for r in plain.collect()}
    b = {r["id"]: r["rank"] for r in reliable.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
    release_pagerank(plain)
    release_pagerank(reliable)
    assert any((tmp_path / "ckpt").rglob("*")), "no reliable checkpoint written"


def test_bfs_hops_distances_and_truncation(spark):
    """Known line-graph distances: seeds at 0; chain 0-1-2-3-4 plus an
    isolated edge 10-11 (unreachable). k=2 must truncate the frontier
    at 2 hops; k=4 reaches the chain end. Undirectedness: edges are
    given in one direction only."""
    from batchprocessingetl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n10", "n11")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("n0",)], "node string")
    got2 = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 2).collect()}
    assert got2 == {"n0": 0, "n1": 1, "n2": 2}
    got4 = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 4).collect()}
    assert got4 == {"n0": 0, "n1": 1, "n2": 2, "n3": 3, "n4": 4}
    # multi-source: nearer seed wins; revisiting never increases hops
    seeds2 = spark.createDataFrame([("n0",), ("n4",)], "node string")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds2, 4).collect()}
    assert got["n2"] == 2 and got["n3"] == 1 and got["n1"] == 1


def test_bfs_hops_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir threads through to the per-round barrier
    (ADVICE r6): reliable-checkpoint BFS equals the localCheckpoint
    run and actually writes checkpoint files."""
    from batchprocessingetl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n2", "n3")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("n0",)], "node string")
    local = sorted(map(tuple, bfs_hops(edges, seeds, 3).collect()))
    ckpt = str(tmp_path / "bfs_ckpt")
    reliable = sorted(
        map(tuple, bfs_hops(edges, seeds, 3, checkpoint_dir=ckpt).collect())
    )
    assert reliable == local
    assert any((tmp_path / "bfs_ckpt").rglob("*")), "no reliable checkpoint written"
