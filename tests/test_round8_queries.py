"""Algebraic properties of the round-8 additions (q268-q280) —
invariants the DuckDB value-parity gate can't express: cross-query
consistency, conservation, and monotonicity on the smoke fixture."""

from __future__ import annotations

import math

import pytest

from batchprocessingetl_spark.workload import (
    collect_extra_queries,
    collect_queries,
)
from tests.conftest import SF_SMOKE

# rotation-proof: q268-q280 moved into the driver registry in round 9
EXTRA = {**collect_queries(), **collect_extra_queries()}


def test_kmv_set_ops_bounds(spark):
    """Estimates are positive; the exact intersection never exceeds
    min(|A|,|B|) implied by union algebra; Jaccard is in [0, 1]."""
    rows = EXTRA["q268_kmv_set_ops"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_union_exact >= r.n_inter_exact >= 0
        assert r.kmv_union_est > 0
        assert 0.0 <= r.kmv_jaccard <= 1.0
        assert r.kmv_inter_est <= r.kmv_union_est + 1e-9


def test_ransac_exactly_one_best(spark):
    rows = EXTRA["q269_ransac_line"](spark, SF_SMOKE).collect()
    assert sum(1 for r in rows if r.is_best) == 1
    best = next(r for r in rows if r.is_best)
    assert best.n_inliers == max(r.n_inliers for r in rows)


def test_aqp_sample_consistency(spark):
    rows = EXTRA["q270_aqp_sample_estimate"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_sample <= r.n_pop
        assert r.se >= 0.0
        # est is the scaled sample sum, so exact == est iff the group's
        # mass is fully inside/outside the sample at these sizes; the
        # audit flag must agree with the arithmetic it summarizes
        assert r.within_2se == (abs(r.est_cents - r.exact_cents) <= 2.0 * r.se)


def test_ipf_marginals_approach_targets(spark):
    """After the final COLUMN step, every source marginal equals the
    column target up to integer-floor slack (one unit of scale per
    cell); row marginals are within the mass moved by that last step."""
    from batchprocessingetl_spark.workload.textops import IPF_SCALE

    rows = EXTRA["q271_ipf_raking"](spark, SF_SMOKE).collect()
    total = sum(r.n for r in rows)
    sources = {r.source for r in rows}
    col_target = (total * IPF_SCALE) // len(sources)
    by_source: dict[str, int] = {}
    for r in rows:
        by_source[r.source] = by_source.get(r.source, 0) + r.w_scaled
    for src, w in by_source.items():
        n_cells = sum(1 for r in rows if r.source == src)
        assert col_target - n_cells * IPF_SCALE <= w <= col_target, src


def test_merkle_descent_consistent_with_audit(spark):
    """q277's version-A shard fingerprints must equal q272's (same
    leaf definition, same shard partitioning), and every differing
    shard localizes at least one corrupt leaf inside its id range."""
    audit = {
        r.shard: r.fingerprint
        for r in EXTRA["q272_merkle_shard_audit"](spark, SF_SMOKE).collect()
        if r.shard >= 0
    }
    diff = EXTRA["q277_merkle_diff_localization"](spark, SF_SMOKE).collect()
    assert diff, "corruption fixture must hit at least one shard"
    for r in diff:
        assert audit[r.shard] == r.fp_a, r.shard
        assert r.fp_a != r.fp_b
        assert r.n_corrupt >= 1
        assert r.first_corrupt_id <= r.last_corrupt_id


def test_kneser_ney_is_distribution_like(spark):
    """Per context: every probability positive, and the sum over SEEN
    continuations stays strictly below 1 whenever the context has any
    discounted mass (the reserved mass backs off to unseen words)."""
    rows = EXTRA["q274_kneser_ney"](spark, SF_SMOKE).collect()
    per_ctx: dict[str, float] = {}
    for r in rows:
        assert r.p_kn > 0.0
        assert r.p_num > 0
        per_ctx[r.context] = per_ctx.get(r.context, 0.0) + r.p_kn
    assert per_ctx
    for ctx, s in per_ctx.items():
        assert s <= 1.0 + 1e-6, ctx


def test_setcover_gains_monotone(spark):
    """Greedy max-coverage gains are non-increasing (submodularity)
    and the covered total is their running sum."""
    rows = EXTRA["q275_setcover_selection"](spark, SF_SMOKE).collect()
    assert [r.round for r in rows] == list(range(1, len(rows) + 1))
    gains = [r.gain for r in rows]
    assert gains == sorted(gains, reverse=True)
    run = 0
    for r in rows:
        run += r.gain
        assert r.covered == run


def test_relational_division_requires_all_classes(spark):
    from batchprocessingetl_spark.catalog import load_table

    n_classes = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderpriority")
        .distinct()
        .count()
    )
    rows = EXTRA["q276_relational_division"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.n_orders >= n_classes, r.o_custkey


def test_pq_members_conserved(spark):
    """Every vector is assigned exactly once per subspace."""
    from batchprocessingetl_spark.catalog import load_table
    from batchprocessingetl_spark.workload.vectors import PQ_SUB

    n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
    rows = EXTRA["q278_product_quantization"](spark, SF_SMOKE).collect()
    per_sub: dict[int, int] = {}
    for r in rows:
        assert r.sq_err_scaled >= 0
        per_sub[r.subspace] = per_sub.get(r.subspace, 0) + r.n_members
    assert set(per_sub) == set(range(PQ_SUB))
    assert all(v == n_vec for v in per_sub.values())


def test_fk_audit_matches_direct_anti_join(spark):
    from pyspark.sql import functions as F

    from batchprocessingetl_spark.catalog import load_table

    rows = {
        r.edge: r
        for r in EXTRA["q279_fk_integrity_audit"](spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    direct = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey",
            "left_anti",
        ).count()
        + li.filter(F.col("l_orderkey").isNull()).count()
    )
    edge = rows["lineitem.l_orderkey->orders.o_orderkey"]
    assert edge.n_orphans == direct
    assert edge.orphan_rate == pytest.approx(direct / edge.n_child, abs=1e-6)


def test_column_profile_entropy_bounds(spark):
    """0 <= H <= log2(n_distinct); modal share consistent."""
    rows = EXTRA["q280_column_profile"](spark, SF_SMOKE).collect()
    assert {r.column for r in rows} == {
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
        "o_totalprice",
    }
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 1 <= r.n_distinct <= r.n_rows
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_distinct) + 1e-6
        assert 1 <= r.modal_count <= r.n_rows
