"""Algebraic / replication properties of the round-9 and round-10
statistics additions (q281-q294) — invariants and independent
re-derivations (pandas / exact fractions / hashlib md5) the DuckDB
value-parity gate can't express."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

import pandas as pd

from batchprocessingetl_spark.workload import (
    collect_extra_queries,
    collect_queries,
)
from tests.conftest import SF_SMOKE

# rotation-proof: look the queries up across both registries
EXTRA = {**collect_queries(), **collect_extra_queries()}


def _lineitem_pdf(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_linestatus",
        )
        .toPandas()
    )


def test_stochastic_setcover_accounting(spark):
    """Picked docs are distinct, gains are positive, and the covered
    column is the exact running sum of gains; the stochastic run never
    out-covers exact greedy at the final round."""
    rows = EXTRA["q281_stochastic_setcover"](spark, SF_SMOKE).collect()
    assert rows
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    run = 0
    for r in rows:
        assert r.gain > 0
        run += r.gain
        assert r.covered == run
    exact = EXTRA["q275_setcover_selection"](spark, SF_SMOKE).collect()
    if exact and len(exact) == len(rows):
        assert rows[-1].covered <= exact[-1].covered


def test_kendall_tau_bounds_and_pair_accounting(spark):
    """tau_b in [-1, 1]; concordant + discordant pairs never exceed the
    total pair count; tie corrections are bounded by it too."""
    rows = EXTRA["q282_kendall_tau"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n0 = r.n_rows * (r.n_rows - 1) // 2
        assert -1.0 <= r.tau_b <= 1.0
        assert 0 <= r.c_pairs + r.d_pairs <= n0
        assert 0 <= r.ties_x <= n0 and 0 <= r.ties_y <= n0


def test_benford_grid_is_complete_and_consistent(spark):
    """Every (priority, digit 1..9) cell is present (empty digits
    contribute expected mass), Benford masses sum to ~1 per priority,
    and chi2 equals the sum of that priority's contributions."""
    rows = EXTRA["q283_benford_audit"](spark, SF_SMOKE).collect()
    by_p: dict[str, list] = {}
    for r in rows:
        by_p.setdefault(r.priority, []).append(r)
    for p, grp in by_p.items():
        assert sorted(g.d for g in grp) == list(range(1, 10))
        assert abs(sum(g.p_exp for g in grp) - 1.0) < 1e-6
        chi2 = grp[0].chi2
        assert all(abs(g.chi2 - chi2) < 1e-9 for g in grp)
        assert abs(chi2 - sum(g.contrib for g in grp)) < 1e-6


def test_spearman_matches_pandas(spark):
    """q284's contingency-midrank Spearman equals pandas' direct
    rank-correlation on the raw rows, per group."""
    got = {
        r.g: r.rho_s for r in EXTRA["q284_spearman_rho"](spark, SF_SMOKE).collect()
    }
    pdf = _lineitem_pdf(spark)
    pdf["x"] = pdf["l_quantity"].astype(int)
    pdf["y"] = (pdf["l_discount"] * 100 + 0.5).apply(math.floor).astype(int)
    for g, grp in pdf.groupby("l_returnflag"):
        # spearman = pearson on average ranks (scipy-free form)
        rx = grp["x"].rank(method="average")
        ry = grp["y"].rank(method="average")
        expect = rx.corr(ry, method="pearson")
        assert abs(got[g] - expect) < 1e-9, (g, got[g], expect)


def _pav_exact(levels: list[tuple[int, int, int]]) -> list[Fraction]:
    """Pool-adjacent-violators on (q, count, cents-sum) levels sorted by
    q, exact Fraction arithmetic; returns the fitted mean per level."""
    blocks: list[list] = []  # [sum, cnt, n_levels]
    for _, c, s in levels:
        blocks.append([Fraction(s), Fraction(c), 1])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
        ):
            s2, c2, k2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += c2
            blocks[-1][2] += k2
    out: list[Fraction] = []
    for s, c, k in blocks:
        out.extend([s / c] * k)
    return out


def test_isotonic_equals_exact_pav(spark):
    """q285's minimax closed form equals the sequential PAV solution:
    fit_fp == floor(1e6 * PAV block mean) level by level (floor
    commutes with min/max, so the fixed-point minimax IS the floored
    exact solution); the fit is nondecreasing."""
    rows = EXTRA["q285_isotonic_regression"](spark, SF_SMOKE).collect()
    assert rows
    fits = [r.fit_fp for r in rows]
    assert fits == sorted(fits)
    pdf = _lineitem_pdf(spark)
    pdf["q"] = pdf["l_quantity"].astype(int)
    pdf["cents"] = (pdf["l_extendedprice"] * 100 + 0.5).apply(math.floor)
    lv = (
        pdf.groupby("q")["cents"]
        .agg(["count", "sum"])
        .reset_index()
        .sort_values("q")
    )
    levels = [(int(r.q), int(r["count"]), int(r["sum"])) for _, r in lv.iterrows()]
    pav = _pav_exact(levels)
    assert len(pav) == len(rows)
    for r, v in zip(rows, pav):
        assert r.fit_fp == (v * 1_000_000).__floor__(), (r.quantity, r.fit_fp)


def test_decision_stump_one_best_and_counts(spark):
    rows = EXTRA["q286_decision_stump"](spark, SF_SMOKE).collect()
    assert rows
    assert sum(1 for r in rows if r.is_best) == 1
    best = next(r for r in rows if r.is_best)
    assert best.gain == max(r.gain for r in rows)
    for r in rows:
        assert 0 <= r.pos_left <= r.n_left
        assert 0 <= r.pos_right <= r.n_right
        assert r.gain >= -1e-9


def test_theil_sen_matches_direct_replay(spark):
    """Re-derive q287 in plain python: same md5 coreset draw, all
    pairwise slopes rounded 9dp, lower median by (slope, h_a, h_b)."""
    row = EXTRA["q287_theil_sen"](spark, SF_SMOKE).collect()[0]
    pdf = _lineitem_pdf(spark)
    pts = []
    for t in pdf.itertuples():
        k = f"ts:{t.l_orderkey}:{t.l_linenumber}"
        pts.append(
            (
                hashlib.md5(k.encode()).hexdigest(),
                float(t.l_quantity),
                float(t.l_extendedprice),
            )
        )
    pts = sorted(pts)[:256]
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            # the query pairs on h_a < h_b: duplicate (orderkey,
            # linenumber) keys share an md5, so equal-h pairs drop out
            if a[0] != b[0] and a[1] != b[1]:
                slopes.append((round((b[2] - a[2]) / (b[1] - a[1]), 9), a[0], b[0]))
    slopes.sort()
    assert row.n_pairs == len(slopes)
    assert row.median_slope == slopes[(len(slopes) + 1) // 2 - 1][0]


def test_mann_whitney_matches_pandas_ranks(spark):
    """q288's doubled-midrank U equals the U computed from pandas
    average ranks on the raw rows, per line status."""
    rows = {
        r.g: r for r in EXTRA["q288_mann_whitney_u"](spark, SF_SMOKE).collect()
    }
    pdf = _lineitem_pdf(spark)
    pdf["v"] = pdf["l_quantity"].astype(int)
    for g, grp in pdf.groupby("l_linestatus"):
        ranks = grp["v"].rank(method="average")
        is_a = grp["l_returnflag"] == "R"
        na = int(is_a.sum())
        r1a = float(ranks[is_a].sum())
        u_a = r1a - na * (na + 1) / 2.0
        r = rows[g]
        assert r.n_a == na and r.n_b == len(grp) - na
        assert abs(r.u2_a - 2.0 * u_a) < 1e-6
        assert math.isfinite(r.z)


def test_cramers_v_matches_pandas_crosstab(spark):
    """q289's full-grid chi-square equals the pandas crosstab
    computation (including zero cells) for the lineitem-local pair;
    V stays in [0, 1] for all pairs."""
    rows = {
        r.pair: r
        for r in EXTRA["q289_cramers_v_matrix"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"rf:ls", "os:op", "rf:op"}
    for r in rows.values():
        assert 0.0 <= r.cramers_v <= 1.0 and r.chi2 >= 0.0
    pdf = _lineitem_pdf(spark)
    ct = pd.crosstab(pdf["l_returnflag"], pdf["l_linestatus"])
    n = ct.values.sum()
    chi2 = 0.0
    for a in ct.index:
        for b in ct.columns:
            o = ct.loc[a, b]
            e = ct.loc[a].sum() * ct[b].sum() / n
            chi2 += (o - e) ** 2 / e
    r = rows["rf:ls"]
    assert r.n_tot == n and r.r_levels == ct.shape[0] and r.c_levels == ct.shape[1]
    assert abs(r.chi2 - chi2) < 1e-3


def test_mahalanobis_outlier_accounting(spark):
    rows = EXTRA["q290_mahalanobis_outliers"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_rows
        assert r.max_d2 >= 0.0
        assert abs(r.outlier_frac - round(r.n_outliers / r.n_rows, 9)) < 1e-12


def test_cochran_armitage_consistency(spark):
    """5 priority rows share one z; rates in [0,1]; totals add up."""
    rows = EXTRA["q291_cochran_armitage"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert len({r.z_trend for r in rows}) == 1
    assert sum(r.n for r in rows) == rows[0].n_total
    assert sum(r.r for r in rows) == rows[0].r_total
    for r in rows:
        assert 0.0 <= r.rate <= 1.0
        assert 1 <= r.s <= 5


def test_brown_forsythe_matches_direct_computation(spark):
    """Re-derive W from the raw rows in pandas: lower-median absolute
    deviations, classic Levene/BF formula."""
    rows = EXTRA["q292_brown_forsythe"](spark, SF_SMOKE).collect()
    w_got = rows[0].w_bf
    pdf = _lineitem_pdf(spark)
    pdf["v"] = pdf["l_quantity"].astype(int)
    groups = []
    for g, grp in pdf.groupby("l_returnflag"):
        vs = sorted(grp["v"])
        med = vs[(len(vs) + 1) // 2 - 1]  # lower median
        z = (grp["v"] - med).abs()
        groups.append(z)
        r = next(x for x in rows if x.g == g)
        assert r.med_v == med and r.n_g == len(grp)
        assert abs(r.zbar - z.mean()) < 1e-6
    n = sum(len(z) for z in groups)
    k = len(groups)
    zbar = sum(z.sum() for z in groups) / n
    ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in groups)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in groups)
    w_exp = (n - k) / (k - 1) * ssb / ssw
    assert abs(w_got - w_exp) < 1e-5


def test_kaplan_meier_is_valid_survival_curve(spark):
    """S is nonincreasing in [0,1]; risk sets shrink over time; the
    first row's S equals its own factor 1 - d/n."""
    rows = EXTRA["q293_kaplan_meier"](spark, SF_SMOKE).collect()
    assert rows
    last_s, last_n = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r.s_km <= last_s + 1e-9
        last_s = r.s_km
        if last_n is not None:
            assert r.n_risk <= last_n
        last_n = r.n_risk
    r0 = rows[0]
    assert abs(r0.s_km - (1.0 - r0.d / r0.n_risk)) < 1e-5


def test_runs_test_accounting(spark):
    """Run count bounds: 1 <= runs <= n1+n2, runs <= 2*min(n1,n2)+1."""
    r = EXTRA["q294_runs_test"](spark, SF_SMOKE).collect()[0]
    n = r.n_above + r.n_below
    assert 1 <= r.n_runs <= n
    assert r.n_runs <= 2 * min(r.n_above, r.n_below) + 1
    assert math.isfinite(r.z)


def test_jonckheere_matches_pairwise_u_sum(spark):
    """2*JT equals the sum over ordered group pairs of the pairwise
    Mann-Whitney 2U (greater counts doubled + ties), re-derived in
    pandas from the raw rows."""
    row = EXTRA["q295_jonckheere_terpstra"](spark, SF_SMOKE).collect()[0]
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    pdf = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            od.o_orderpriority.substr(1, 1).cast("int").alias("g"),
            li.l_quantity.cast("int").alias("v"),
        )
        .toPandas()
    )
    from collections import Counter

    counts = {g: Counter(grp["v"]) for g, grp in pdf.groupby("g")}
    gs = sorted(counts)
    jt2 = 0
    for i, ga in enumerate(gs):
        for gb in gs[i + 1 :]:
            for va, na in counts[ga].items():
                for vb, nb in counts[gb].items():
                    if vb > va:
                        jt2 += 2 * na * nb
                    elif vb == va:
                        jt2 += na * nb
    assert row.jt2 == jt2
    assert row.k_groups == len(gs)
    assert math.isfinite(row.z)


def test_friedman_rank_sums_account(spark):
    """Per-block doubled ranks of k treatments sum to k(k+1)... doubled:
    each block contributes Σ2R = 2*(1+..+k) when untied, so the total
    over treatments equals b*k*(k+1); chi2 is finite and shared."""
    rows = EXTRA["q296_friedman_test"](spark, SF_SMOKE).collect()
    k = rows[0].k
    b = rows[0].n_blocks
    assert len(rows) == k
    assert len({r.chi2_f for r in rows}) == 1
    assert sum(r.rank_sum2 for r in rows) == b * k * (k + 1)
    assert math.isfinite(rows[0].chi2_f) and rows[0].chi2_f >= -1e-9


def test_mantel_haenszel_pooled_within_stratum_range(spark):
    """All cells positive here, so OR_MH must lie within the min..max
    of the per-stratum odds ratios (it is a weighted combination)."""
    rows = EXTRA["q297_mantel_haenszel"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    ors = [r.or_stratum for r in rows]
    assert len({r.or_mh for r in rows}) == 1
    assert min(ors) - 1e-9 <= rows[0].or_mh <= max(ors) + 1e-9
    for r in rows:
        assert r.a >= 0 and r.b >= 0 and r.c >= 0 and r.d >= 0


def test_kruskal_wallis_matches_pandas_ranks(spark):
    """Re-derive tie-corrected H from pandas average ranks."""
    row = EXTRA["q298_kruskal_wallis"](spark, SF_SMOKE).collect()[0]
    pdf = _lineitem_pdf(spark)
    pdf["v"] = pdf["l_quantity"].astype(int)
    pdf["rank"] = pdf["v"].rank(method="average")
    n = len(pdf)
    s = 0.0
    for g, grp in pdf.groupby("l_returnflag"):
        s += grp["rank"].sum() ** 2 / len(grp)
    h_u = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    t = pdf.groupby("v").size()
    corr = 1.0 - ((t**3 - t).sum()) / (n**3 - n)
    assert abs(row.h_stat - h_u / corr) < 1e-6
    assert row.n_total == n and row.k_groups == 3


def test_cohens_kappa_matches_direct(spark):
    """Re-derive kappa per stratum from the 2x2 cells the query itself
    reports: kappa = (po - pe)/(1 - pe); kappa <= po and in [-1, 1]."""
    rows = EXTRA["q299_cohens_kappa"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        n = r.a + r.b + r.c + r.d
        po = (r.a + r.d) / n
        pe = ((r.a + r.b) * (r.a + r.c) + (r.c + r.d) * (r.b + r.d)) / n**2
        assert abs(r.p_observed - po) < 1e-9
        assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-9
        assert -1.0 - 1e-9 <= r.kappa <= 1.0 + 1e-9


def test_pages_trend_consistent_with_friedman_frame(spark):
    """L2 is bounded by the extreme orderings: b*k*(k+1)... the minimum
    (reverse order) and maximum (aligned order) of sum(s*2R) over
    complete blocks; block/group counts match q296's."""
    row = EXTRA["q300_pages_trend"](spark, SF_SMOKE).collect()[0]
    f = EXTRA["q296_friedman_test"](spark, SF_SMOKE).collect()
    assert row.n_blocks == f[0].n_blocks and row.k_groups == f[0].k
    b, k = row.n_blocks, row.k_groups
    # untied doubled ranks are 2..2k step 2; extremes of sum(s*2r)
    lo = b * sum((i + 1) * 2 * (k - i) for i in range(k))
    hi = b * sum((i + 1) * 2 * (i + 1) for i in range(k))
    assert lo <= row.l2 <= hi
    assert math.isfinite(row.z)


def test_theils_u_information_inequalities(spark):
    """0 <= H(Y|X) <= H(Y) (conditioning never increases entropy), so
    U in [0, 1]; the lineitem-local pair re-derived in pandas."""
    rows = {r.pair: r for r in EXTRA["q301_theils_u"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"rf:ls", "os:op", "rf:op"}
    for r in rows.values():
        assert -1e-9 <= r.h_y_given_x <= r.h_y + 1e-9
        assert -1e-9 <= r.u_yx <= 1.0 + 1e-9
    pdf = _lineitem_pdf(spark)
    ct = pd.crosstab(pdf["l_returnflag"], pdf["l_linestatus"])
    n = ct.values.sum()
    hy = sum(
        -(ct[b].sum() / n) * math.log(ct[b].sum() / n) for b in ct.columns
    )
    hyx = 0.0
    for a in ct.index:
        ra = ct.loc[a].sum()
        for b in ct.columns:
            o = ct.loc[a, b]
            if o:
                hyx += (o / n) * math.log(ra / o)
    r = rows["rf:ls"]
    assert abs(r.h_y - hy) < 1e-6 and abs(r.h_y_given_x - hyx) < 1e-6


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 20), st.integers(0, 100000)),
        min_size=1,
        max_size=10,
    )
)
def test_pav_minimax_identity(levels):
    """The two mathematical facts q285 rests on, pinned over random
    weighted level sets with exact Fraction arithmetic:
    (1) the sequential PAV solution equals the closed minimax form
        fit(k) = max_{i<=k} min_{j>=k} avg(i..j);
    (2) floor (to micro-units) commutes through that minimax, so the
        engine's fixed-point DIV comparisons compute the floored
        exact solution, never a reordered winner."""
    pav = _pav_exact([(i, c, s) for i, (c, s) in enumerate(levels)])
    n = len(levels)
    pre_s, pre_c = [0], [0]
    for c, s in levels:
        pre_s.append(pre_s[-1] + s)
        pre_c.append(pre_c[-1] + c)
    for k in range(n):
        best, best_fp = None, None
        for i in range(k + 1):
            mn, mn_fp = None, None
            for j in range(k, n):
                a = Fraction(pre_s[j + 1] - pre_s[i], pre_c[j + 1] - pre_c[i])
                afp = (a * 1_000_000).__floor__()
                mn = a if mn is None else min(mn, a)
                mn_fp = afp if mn_fp is None else min(mn_fp, afp)
            best = mn if best is None else max(best, mn)
            best_fp = mn_fp if best_fp is None else max(best_fp, mn_fp)
        assert best == pav[k]
        assert best_fp == (pav[k] * 1_000_000).__floor__()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 5)),
        min_size=2,
        max_size=60,
    )
)
def test_contingency_pair_counts_match_bruteforce(rows):
    """The cell-grid pair algebra q282/q295 use — concordant and
    discordant counts as Σ n_a*n_b over cell pairs — equals the
    brute-force O(n²) pair scan on random (x, y) data."""
    from collections import Counter

    cells = Counter(rows)
    c_grid = d_grid = 0
    for (xa, ya), na in cells.items():
        for (xb, yb), nb in cells.items():
            if xb > xa and yb > ya:
                c_grid += na * nb
            elif xb > xa and yb < ya:
                d_grid += na * nb
    c_bf = d_bf = 0
    for i in range(len(rows)):
        for j in range(len(rows)):
            if i == j:
                continue
            (xa, ya), (xb, yb) = rows[i], rows[j]
            if xb > xa and yb > ya:
                c_bf += 1
            elif xb > xa and yb < ya:
                d_bf += 1
    assert (c_grid, d_grid) == (c_bf, d_bf)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(0, 8)),
        min_size=2,
        max_size=60,
    )
)
def test_doubled_midrank_u_matches_bruteforce(rows):
    """q288/q295's doubled-midrank rank sum — Σ c_a(v)*(2*below+t+1)
    over the value margins — equals twice the brute-force Wilcoxon
    rank sum (greater pairs + half ties + self-rank base)."""
    from collections import Counter

    vals = Counter(v for _, v in rows)
    ca = Counter(v for is_a, v in rows if is_a)
    below = 0
    r2a = 0
    for v in sorted(vals):
        t = vals[v]
        r2 = 2 * below + t + 1
        r2a += ca.get(v, 0) * r2
        below += t
    # brute force: rank of each A-row = 1 + #smaller + (#ties-1)/2
    # over the combined sample; doubled to stay integral
    r2a_bf = 0
    all_v = [v for _, v in rows]
    for is_a, v in rows:
        if not is_a:
            continue
        smaller = sum(1 for u in all_v if u < v)
        ties = sum(1 for u in all_v if u == v)
        r2a_bf += 2 + 2 * smaller + (ties - 1)
    assert r2a == r2a_bf
