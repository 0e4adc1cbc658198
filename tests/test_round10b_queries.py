"""Replication / algebraic properties of the q302-q312 inference and
retrieval additions — independent re-derivations (pandas / numpy /
pure-python integer replays) of each statistic, the evidence layer the
DuckDB value-parity gate can't express."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from batchprocessingetl_spark.workload import (
    collect_extra_queries,
    collect_queries,
)
from tests.conftest import SF_SMOKE

EXTRA = {**collect_queries(), **collect_extra_queries()}


def _li_pdf(spark, cols):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(*cols).toPandas()


def _cents(s: pd.Series) -> np.ndarray:
    return np.floor(s.to_numpy(dtype="float64") * 100 + 0.5).astype("int64")


def test_logrank_matches_direct_replay(spark):
    """q302's z replays from a pure-python suffix-sum pass over the
    (t, group, event) frame built independently with pandas."""
    row = EXTRA["q302_logrank_test"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(
        spark, ["l_orderkey", "l_shipdate", "l_returnflag"]
    )
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .toPandas()
    )
    df = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    t = (
        pd.to_datetime(df["l_shipdate"]).dt.normalize()
        - pd.to_datetime(df["o_orderdate"]).dt.normalize()
    ).dt.days.to_numpy()
    hi = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
    ev = (df["l_returnflag"] != "R").to_numpy()
    order = np.argsort(t)
    t, hi, ev = t[order], hi[order], ev[order]
    uniq = np.unique(t)
    # suffix at-risk counts per unique time
    o1 = e1 = v = 0.0
    events_hi = events_lo = 0
    for ut in uniq:
        at_risk = t >= ut
        here = t == ut
        n = int(at_risk.sum())
        n1 = int((at_risk & hi).sum())
        d = int((here & ev).sum())
        d1 = int((here & ev & hi).sum())
        if d == 0:
            continue
        events_hi += d1
        events_lo += d - d1
        o1 += d1
        e1 += round(d * n1 / n, 9)
        if n > 1:
            v += round(d * n1 * (n - n1) * (n - d) / (n * n * (n - 1)), 9)
    assert row.events_hi == events_hi and row.events_lo == events_lo
    z = (o1 - e1) / math.sqrt(v)
    assert abs(row.z - z) < 1e-5
    assert abs(row.chi2 - z * z) < 1e-4


def test_ordinal_association_shares_q282_pair_counts(spark):
    """q303 reuses q282's contingency machinery: identical C/D pair
    counts per group, and each measure obeys its bound / ordering
    (|tau_c| <= |gamma|; Somers' D lies between tau-b and gamma in
    magnitude when C != D)."""
    q282 = {r.g: r for r in EXTRA["q282_kendall_tau"](spark, SF_SMOKE).collect()}
    rows = EXTRA["q303_ordinal_association"](spark, SF_SMOKE).collect()
    assert rows and set(q282) == {r.g for r in rows}
    for r in rows:
        k = q282[r.g]
        assert (r.c_pairs, r.d_pairs, r.n_rows) == (k.c_pairs, k.d_pairs, k.n_rows)
        assert -1.0 <= r.gamma <= 1.0
        assert abs(r.tau_c) <= abs(r.gamma) + 1e-12
        # tau_b is the geometric mean of the two Somers' D directions
        assert abs(k.tau_b * k.tau_b - r.somers_d_yx * r.somers_d_xy) < 1e-7
        lo = min(abs(r.somers_d_yx), abs(r.somers_d_xy))
        hi = max(abs(r.somers_d_yx), abs(r.somers_d_xy))
        assert lo - 1e-9 <= abs(k.tau_b) <= hi + 1e-9
        assert hi <= abs(r.gamma) + 1e-12


def test_wasserstein_matches_numpy_cdf_integral(spark):
    """q304's W1 equals the numpy CDF-gap integral over the same two
    daily-revenue samples; the KS column matches the sup norm."""
    row = EXTRA["q304_wasserstein_daily_revenue"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    day = pd.to_datetime(li["l_shipdate"]).dt.normalize()
    li = li.assign(day=day, cents=_cents(li["l_extendedprice"]))
    li = li[day.dt.year.isin([1995, 1996])]
    daily = li.groupby("day")["cents"].sum()
    a = np.sort(daily[daily.index.year == 1995].to_numpy())
    b = np.sort(daily[daily.index.year == 1996].to_numpy())
    assert (row.n_a, row.n_b) == (len(a), len(b))
    grid = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(grid))) / 100.0
    ks = float(np.max(np.abs(fa - fb)))
    assert abs(row.w1_dollars - w1) < 1e-4
    assert abs(row.ks_stat - ks) < 1e-9


def test_serial_correlation_matches_numpy(spark):
    """q305's Durbin-Watson and lag-1 autocorrelation replay from the
    demeaned numpy daily series (the n-scaling cancels)."""
    row = EXTRA["q305_serial_correlation"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    y = li.groupby("day")["cents"].sum().sort_index().to_numpy(dtype="float64")
    assert row.n_days == len(y)
    e = y - y.mean()
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e * e))
    r1 = float(np.sum(e[1:] * e[:-1]) / np.sum(e * e))
    assert abs(row.durbin_watson - dw) < 1e-7
    assert abs(row.lag1_autocorr - r1) < 1e-7
    # end-effect-loose DW/r1 identity
    assert abs(row.durbin_watson - (2.0 - 2.0 * row.lag1_autocorr)) < 0.1


def test_anova_matches_numpy_group_stats(spark):
    """q306's F and eta^2 replay from numpy per-priority moments."""
    row = EXTRA["q306_anova_oneway"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_orderkey", "l_quantity"])
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .toPandas()
    )
    df = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    x = df["l_quantity"].to_numpy(dtype="float64")
    g = df["o_orderpriority"]
    grand = x.mean()
    ssb = sum(
        len(grp) * (grp.mean() - grand) ** 2
        for _, s in df.groupby("o_orderpriority")["l_quantity"]
        for grp in [s.to_numpy(dtype="float64")]
    )
    ssw = sum(
        float(((grp - grp.mean()) ** 2).sum())
        for _, s in df.groupby("o_orderpriority")["l_quantity"]
        for grp in [s.to_numpy(dtype="float64")]
    )
    k, n = g.nunique(), len(x)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row.k_groups, row.n_rows) == (k, n)
    assert abs(row.ss_between - ssb) < max(1e-6 * ssb, 1e-3)
    assert abs(row.ss_within - ssw) < max(1e-6 * ssw, 1e-3)
    assert abs(row.f_stat - f) < 1e-5 * max(1.0, f)
    assert 0.0 <= row.eta_sq <= 1.0
    assert abs(row.eta_sq - ssb / (ssb + ssw)) < 1e-9


def test_wilcoxon_matches_scipy_free_replay(spark):
    """q307's doubled rank sum and z replay from a pandas midrank
    construction of the same paired (nation, month) differences."""
    row = EXTRA["q307_wilcoxon_signed_rank"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_orderkey", "l_shipdate", "l_extendedprice"])
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .toPandas()
    )
    cu = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .toPandas()
    )
    na = (
        spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        .select("n_nationkey", "n_name")
        .toPandas()
    )
    df = (
        li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
    )
    day = pd.to_datetime(df["l_shipdate"]).dt.normalize()
    df = df.assign(yr=day.dt.year, mth=day.dt.month, cents=_cents(df["l_extendedprice"]))
    df = df[df["yr"].isin([1995, 1996])]
    piv = df.pivot_table(
        index=["n_name", "mth"],
        columns="yr",
        values="cents",
        aggfunc=["sum", "count"],
        fill_value=0,
    )
    both = piv[(piv[("count", 1995)] > 0) & (piv[("count", 1996)] > 0)]
    d = (both[("sum", 1996)] - both[("sum", 1995)]).to_numpy(dtype="int64")
    d = d[d != 0]
    assert row.n_pairs == len(d)
    assert row.n_pos == int((d > 0).sum()) and row.n_neg == int((d < 0).sum())
    ad = np.abs(d)
    vals = Counter(ad.tolist())
    below, r2 = 0, {}
    for v in sorted(vals):
        r2[v] = 2 * below + vals[v] + 1
        below += vals[v]
    w2 = sum(r2[abs(x)] for x in d if x > 0)
    assert row.w_plus_x2 == w2
    n = len(d)
    tie_cube = sum(t**3 - t for t in vals.values())
    z = (w2 - n * (n + 1) / 2) / math.sqrt(
        (2 * n * (n + 1) * (2 * n + 1) - tie_cube) / 12.0
    )
    assert abs(row.z - z) < 1e-7


def test_hodges_lehmann_matches_bruteforce_walsh(spark):
    """q308's doubled HL point equals the lower median of the full
    brute-force Walsh multiset (i <= j) per group."""
    rows = EXTRA["q308_hodges_lehmann"](spark, SF_SMOKE).collect()
    li = _li_pdf(spark, ["l_returnflag", "l_quantity"])
    for r in rows:
        x = np.sort(
            li[li["l_returnflag"] == r.g]["l_quantity"].to_numpy(dtype="int64")
        )
        assert r.n_rows == len(x)
        walsh = (x[:, None] + x[None, :])[np.triu_indices(len(x))]
        walsh.sort()
        assert r.n_walsh == len(walsh)
        # lower weighted median: min s with 2*cum >= W
        w = len(walsh)
        idx = int(np.searchsorted(np.arange(1, w + 1) * 2, w, side="left"))
        assert r.hl_x2 == int(walsh[idx])
        assert r.hl_estimate == walsh[idx] / 2.0


def test_cochran_q_matches_integer_replay(spark):
    """q309's Q replays exactly from per-order integer flags."""
    row = EXTRA["q309_cochran_q"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(
        spark, ["l_orderkey", "l_shipdate", "l_returnflag", "l_discount"]
    )
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderdate")
        .toPandas()
    )
    df = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        pd.to_datetime(df["l_shipdate"]).dt.normalize()
        - pd.to_datetime(df["o_orderdate"]).dt.normalize()
    ).dt.days
    df = df.assign(
        ret=(df["l_returnflag"] == "R").astype(int),
        disc=(df["l_discount"] >= 0.06).astype(int),
        slow=(lag > 20).astype(int),
    )
    per = df.groupby("l_orderkey")[["ret", "disc", "slow"]].max()
    c = per.sum()
    rsum = per.sum(axis=1)
    t = int(rsum.sum())
    q = (
        2
        * (3 * int((c**2).sum()) - t * t)
        / (3 * t - int((rsum**2).sum()))
    )
    assert row.n_orders == len(per)
    assert (row.n_returned, row.n_deep_discount, row.n_slow_ship) == (
        int(c["ret"]),
        int(c["disc"]),
        int(c["slow"]),
    )
    assert abs(row.cochran_q - q) < 1e-9


def test_partial_correlation_matches_numpy(spark):
    """q310's pairwise and partial correlations replay via numpy on
    the same integer grids."""
    row = EXTRA["q310_partial_correlation"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_quantity", "l_extendedprice", "l_discount"])
    x = li["l_quantity"].to_numpy(dtype="float64")
    y = _cents(li["l_extendedprice"]).astype("float64")
    z = np.floor(li["l_discount"].to_numpy(dtype="float64") * 100 + 0.5)
    r = np.corrcoef(np.vstack([x, y, z]))
    assert abs(row.r_xy - r[0, 1]) < 1e-7
    assert abs(row.r_xz - r[0, 2]) < 1e-7
    assert abs(row.r_yz - r[1, 2]) < 1e-7
    part = (r[0, 1] - r[0, 2] * r[1, 2]) / math.sqrt(
        (1 - r[0, 2] ** 2) * (1 - r[1, 2] ** 2)
    )
    assert abs(row.r_xy_given_z - part) < 1e-6


def test_chow_matches_numpy_ols(spark):
    """q311's segment SSRs and F replay from numpy least squares on
    the same daily series and fixed split."""
    row = EXTRA["q311_chow_break_test"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    daily = li.groupby("day")["cents"].sum().sort_index()
    t = (daily.index - pd.Timestamp("1998-07-01")).days.to_numpy(dtype="float64")
    y = daily.to_numpy(dtype="float64")
    pre = t < 0

    def ssr(tt, yy):
        a = np.vstack([tt, np.ones_like(tt)]).T
        res = yy - a @ np.linalg.lstsq(a, yy, rcond=None)[0]
        return float(res @ res)

    s_p, s_a, s_b = ssr(t, y), ssr(t[pre], y[pre]), ssr(t[~pre], y[~pre])
    n = len(y)
    f = ((s_p - s_a - s_b) / 2.0) / ((s_a + s_b) / (n - 4.0))
    assert (row.n_days, row.n_pre) == (n, int(pre.sum()))
    assert abs(row.ssr_pooled_e12 - s_p / 1e12) < max(1e-5, 1e-6 * s_p / 1e12)
    assert abs(row.ssr_pre_e12 - s_a / 1e12) < max(1e-5, 1e-6 * s_a / 1e12)
    assert abs(row.ssr_post_e12 - s_b / 1e12) < max(1e-5, 1e-6 * s_b / 1e12)
    assert abs(row.chow_f - f) < 1e-3 * max(1.0, abs(f))


def test_matryoshka_funnel_matches_numpy_replay(spark):
    """q312's two-stage funnel (prefix top-32 shortlist, full-dim
    top-5) replays exactly — ids, ranks, and 6dp cosines — from a
    numpy implementation of the same rounding and tie-break rules."""
    rows = EXTRA["q312_matryoshka_rerank"](spark, SF_SMOKE).collect()
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype("float64")
    qmask = ids % 100 == 0
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.vec_id, r.cosine))

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    for qi in np.where(qmask)[0]:
        qid = int(ids[qi])
        cids, cvs = ids[~qmask], mat[~qmask]
        coarse = np.round(
            [cos(v[:8], mat[qi][:8]) for v in cvs], 6
        )
        order = np.lexsort((cids, -coarse))[:32]
        full = np.round([cos(cvs[i], mat[qi]) for i in order], 6)
        fin = np.lexsort((cids[order], -full))[:5]
        expect = [
            (rk + 1, int(cids[order][i]), float(full[i]))
            for rk, i in enumerate(fin)
        ]
        assert got[qid] == expect


def test_binary_hamming_funnel_matches_numpy_replay(spark):
    """q313's 1-bit funnel (Hamming top-32 shortlist, full-dim top-5)
    replays exactly from a numpy implementation of the same sign,
    distance, and tie-break rules."""
    rows = EXTRA["q313_binary_hamming_rerank"](spark, SF_SMOKE).collect()
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype("float64")
    qmask = ids % 100 == 0
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.vec_id, r.hamming, r.cosine))

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    signs = mat > 0
    for qi in np.where(qmask)[0]:
        qid = int(ids[qi])
        cids, cvs, csg = ids[~qmask], mat[~qmask], signs[~qmask]
        ham = (csg != signs[qi]).sum(axis=1)
        order = np.lexsort((cids, ham))[:32]
        full = np.round([cos(cvs[i], mat[qi]) for i in order], 6)
        fin = np.lexsort((cids[order], -full))[:5]
        expect = [
            (rk + 1, int(cids[order][i]), int(ham[order][i]), float(full[i]))
            for rk, i in enumerate(fin)
        ]
        assert got[qid] == expect


def test_ljung_box_matches_numpy(spark):
    """q314's per-lag autocorrelations and portmanteau replay from the
    demeaned numpy daily series; lag 1 agrees with q305."""
    row = EXTRA["q314_ljung_box"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    y = li.groupby("day")["cents"].sum().sort_index().to_numpy(dtype="float64")
    n = len(y)
    assert row.n_days == n
    e = y - y.mean()
    ss = float(e @ e)
    rs = [float(e[k:] @ e[:-k]) / ss for k in range(1, 8)]
    assert abs(row.r1 - rs[0]) < 1e-7
    assert abs(row.r2 - rs[1]) < 1e-7
    assert abs(row.r3 - rs[2]) < 1e-7
    qlb = n * (n + 2) * sum(r * r / (n - k) for k, r in enumerate(rs, start=1))
    assert abs(row.q_lb - qlb) < 1e-3 * max(1.0, qlb)
    q305 = EXTRA["q305_serial_correlation"](spark, SF_SMOKE).collect()[0]
    assert abs(row.r1 - q305.lag1_autocorr) < 1e-9


def test_agreement_family_matches_direct_and_orders(spark):
    """q315's kappa/pi/AC1 replay from the q299 cells; kappa matches
    q299 exactly; pi <= kappa always (pooled marginals penalize)."""
    rows = {r.stratum: r for r in EXTRA["q315_agreement_family"](spark, SF_SMOKE).collect()}
    q299 = {r.stratum: r for r in EXTRA["q299_cohens_kappa"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(q299)
    for s, r in rows.items():
        k = q299[s]
        a, b, c, d = k.a, k.b, k.c, k.d
        n = a + b + c + d
        po = (a + d) / n
        assert abs(r.p_observed - k.p_observed) < 1e-9
        assert abs(r.kappa - k.kappa) < 1e-9
        p = ((a + b) + (a + c)) / (2 * n)
        pe_pi = p * p + (1 - p) * (1 - p)
        pi = (po - pe_pi) / (1 - pe_pi)
        assert abs(r.scotts_pi - pi) < 1e-7
        pe_g = 2 * p * (1 - p)
        ac1 = (po - pe_g) / (1 - pe_g)
        assert abs(r.gwet_ac1 - ac1) < 1e-7
        assert r.scotts_pi <= r.kappa + 1e-12


def test_cross_correlation_matches_numpy(spark):
    """q316's CCF at every lag replays from the demeaned numpy daily
    (revenue, count) series; lag 0 is the plain Pearson r of the two
    series; the r_k grid is symmetric under series swap + lag flip."""
    rows = {r.lag: r for r in EXTRA["q316_cross_correlation"](spark, SF_SMOKE).collect()}
    assert sorted(rows) == [-3, -2, -1, 0, 1, 2, 3]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    g = li.groupby("day").agg(rev=("cents", "sum"), cnt=("cents", "size")).sort_index()
    e = g["rev"].to_numpy(dtype="float64")
    f = g["cnt"].to_numpy(dtype="float64")
    e -= e.mean()
    f -= f.mean()
    den = math.sqrt(float(e @ e) * float(f @ f))
    for k, r in rows.items():
        assert r.n_days == len(e)
        if k < 0:
            x = float(e[-k:] @ f[:k])
        elif k > 0:
            x = float(e[:-k] @ f[k:])
        else:
            x = float(e @ f)
        assert abs(r.ccf - x / den) < 1e-7, k


def test_pacf_matches_statsmodels_free_levinson(spark):
    """q317's pacf replays from a pure-python Durbin-Levinson on the
    same numpy autocorrelations; pacf1 == r1 exactly."""
    row = EXTRA["q317_pacf"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    y = li.groupby("day")["cents"].sum().sort_index().to_numpy(dtype="float64")
    e = y - y.mean()
    ss = float(e @ e)
    r = [float(e[k:] @ e[:-k]) / ss for k in (1, 2, 3)]
    assert abs(row.r1 - r[0]) < 1e-7
    assert row.pacf1 == row.r1
    # Durbin-Levinson
    phi = {(1, 1): r[0]}
    v = 1 - r[0] ** 2
    for m in (2, 3):
        num = r[m - 1] - sum(phi[(m - 1, j)] * r[m - 1 - j] for j in range(1, m))
        phi[(m, m)] = num / v
        for j in range(1, m):
            phi[(m, j)] = phi[(m - 1, j)] - phi[(m, m)] * phi[(m - 1, m - j)]
        v *= 1 - phi[(m, m)] ** 2
    assert abs(row.pacf2 - phi[(2, 2)]) < 1e-6
    assert abs(row.pacf3 - phi[(3, 3)]) < 1e-6


def test_markov_entropy_rate_composition(spark):
    """q318 composes q185 exactly: its per-state stationary masses
    equal q185's output; row entropies are bounded by log2(k); the
    total row is the pi-weighted sum of row entropies computed from
    the published columns."""
    rows = EXTRA["q318_markov_entropy_rate"](spark, SF_SMOKE).collect()
    per = [r for r in rows if r.from_type != "__total__"]
    tot = [r for r in rows if r.from_type == "__total__"][0]
    q185 = {
        r.event_type: r.stationary
        for r in EXTRA["q185_markov_stationary"](spark, SF_SMOKE).collect()
    }
    assert {r.from_type for r in per} <= set(q185)
    k = len(per)
    for r in per:
        assert abs(r.stationary - q185[r.from_type]) < 1e-9
        assert -1e-9 <= r.h_row <= math.log2(max(k, 2)) + 1e-6
        # contribution ~ pi * h_row (per-term rounding: loose bound)
        assert abs(r.contribution - r.stationary * r.h_row) < 1e-4
    assert abs(tot.h_row - sum(r.h_row for r in per)) < 1e-6
    assert abs(tot.contribution - sum(r.contribution for r in per)) < 1e-6
    assert 0.0 <= tot.contribution <= math.log2(max(k, 2)) + 1e-6


def test_hamming_knn_join_operator_direct(spark):
    """hamming_knn_join pins against a per-pair python popcount on
    synthetic packed words, INCLUDING words with bit 63 set (negative
    BIGINT — q313's packing never sets the sign bit, but the operator
    must handle arbitrary words, and the numpy int64-XOR → uint8-view
    popcount path must agree with the python replay's unsigned mask)."""
    from batchprocessingetl_spark.operators.similarity import hamming_knn_join

    corpus = [(i, (i * 2654435761) % (2**31), (i * 40503) % (2**31)) for i in range(40)]
    corpus += [
        (40, -(2**63) + 12345, -1),          # sign bit set; all-ones word
        (41, -98765, 2**62 + 7),             # negative low word, large positive high
    ]
    queries = [(100 + j, (j * 97 + 5) % (2**31), (j * 31 + 7) % (2**31)) for j in range(3)]
    queries += [(103, -5, -(2**63))]         # negative query words, incl. min int64
    cdf = spark.createDataFrame(corpus, "id long, w0 long, w1 long")
    qdf = spark.createDataFrame(queries, "qid long, qw0 long, qw1 long")
    got = {
        (r.qid, r.rank): (r.id, r.hamming)
        for r in hamming_knn_join(cdf, qdf, 4).collect()
    }
    for qid, qw0, qw1 in queries:
        scored = sorted(
            (bin((w0 ^ qw0) & (2**64 - 1)).count("1")
             + bin((w1 ^ qw1) & (2**64 - 1)).count("1"), i)
            for i, w0, w1 in corpus
        )
        for rank, (h, i) in enumerate(scored[:4], start=1):
            assert got[(qid, rank)] == (i, h), (qid, rank)


def test_modularity_matches_direct_replay(spark):
    """q319's modularity replays from a direct python computation on
    q251's own labels and the same edge frame; coverage and Q obey
    their bounds."""
    from batchprocessingetl_spark.workload.relational import _lpa_edges_labels

    row = EXTRA["q319_modularity_score"](spark, SF_SMOKE).collect()[0]
    e, und, lab = _lpa_edges_labels(spark, SF_SMOKE)
    edges = [(r.src, r.dst) for r in e.collect()]
    labels = {r.node: r.label for r in lab.collect()}
    m = len(edges)
    assert row.n_edges == m
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    d_c = Counter()
    for n, d in deg.items():
        d_c[labels[n]] += d
    e_c = Counter()
    for a, b in edges:
        if labels[a] == labels[b]:
            e_c[labels[a]] += 1
    assert row.n_communities == len(d_c)
    q = sum(4 * m * e_c.get(c, 0) - d * d for c, d in d_c.items()) / (4 * m * m)
    cov = sum(e_c.values()) / m
    assert abs(row.modularity - q) < 1e-9
    assert abs(row.coverage - cov) < 1e-9
    assert -0.5 <= row.modularity <= 1.0 and 0.0 <= row.coverage <= 1.0


# ---- hypothesis pins of the q302-q319 algebra (no Spark needed) ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=40))
def test_walsh_grid_median_matches_bruteforce(xs):
    """q308's grid construction — Walsh multiplicities n_a*n_b off the
    diagonal and n(n+1)/2 on it, lower weighted median by doubled sum
    — equals the brute-force median over all i <= j Walsh averages."""
    grid = Counter(xs)
    cells = []
    vals = sorted(grid)
    for i, va in enumerate(vals):
        for vb in vals[i:]:
            w = (
                grid[va] * (grid[va] + 1) // 2
                if va == vb
                else grid[va] * grid[vb]
            )
            cells.append((va + vb, w))
    agg = Counter()
    for s, w in cells:
        agg[s] += w
    total = sum(agg.values())
    cum = 0
    hl_grid = None
    for s in sorted(agg):
        cum += agg[s]
        if 2 * cum >= total:
            hl_grid = s
            break
    xs_sorted = sorted(xs)
    walsh = sorted(
        xs_sorted[i] + xs_sorted[j]
        for i in range(len(xs))
        for j in range(i, len(xs))
    )
    assert total == len(walsh)
    idx = next(i for i in range(len(walsh)) if 2 * (i + 1) >= len(walsh))
    assert hl_grid == walsh[idx]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=30),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=30),
)
def test_wasserstein_grid_integral_matches_sorted_matching(a, b):
    """q304's merged-grid CDF integral equals the optimal-transport
    sorted-sample matching when |a| == |b| (restrict to the common
    prefix length), and is always >= |mean(a) - mean(b)|."""
    n = min(len(a), len(b))
    a, b = sorted(a[:n]), sorted(b[:n])
    grid = sorted(set(a) | set(b))
    w1 = 0.0
    for lo, hi in zip(grid, grid[1:]):
        fa = sum(1 for x in a if x <= lo) / n
        fb = sum(1 for x in b if x <= lo) / n
        w1 += abs(fa - fb) * (hi - lo)
    match = sum(abs(x - y) for x, y in zip(a, b)) / n
    assert abs(w1 - match) < 1e-9
    assert w1 >= abs(sum(a) / n - sum(b) / n) - 1e-9


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
def test_cochran_q_cleared_form_matches_classical(rows):
    """q309's integer-cleared Q = (k-1)(k*sum C_j^2 - T^2)/(kT - sum
    R_i^2) equals the classical column-deviation form whenever the
    denominator is nonzero."""
    k = 3
    c = [sum(int(r[j]) for r in rows) for j in range(k)]
    rsum = [sum(int(v) for v in r) for r in rows]
    t = sum(rsum)
    den = k * t - sum(x * x for x in rsum)
    if den == 0:
        return
    cleared = (k - 1) * (k * sum(x * x for x in c) - t * t) / den
    classical = (
        k * (k - 1) * sum((x - t / k) ** 2 for x in c) / den
    )
    assert abs(cleared - classical) < 1e-6 * max(1.0, abs(classical))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=8,
        max_size=60,
    )
)
def test_pacf_closed_forms_match_levinson_recursion(ys):
    """q317's closed pacf2/pacf3 expressions equal the general
    Durbin-Levinson recursion on any series' sample autocorrelations
    (guarding the degenerate |r1| ~ 1 cases the query's data never
    hits)."""
    y = np.array(ys)
    e = y - y.mean()
    ss = float(e @ e)
    if ss < 1e-6:
        return
    r = [float(e[k:] @ e[:-k]) / ss for k in (1, 2, 3)]
    if abs(1 - r[0] ** 2) < 1e-6:
        return
    phi22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    a21 = r[0] * (1 - r[1]) / (1 - r[0] ** 2)
    den3 = 1 - a21 * r[0] - phi22 * r[1]
    if abs(den3) < 1e-9:
        return
    phi33 = (r[2] - a21 * r[1] - phi22 * r[0]) / den3
    # general recursion
    phi = {(1, 1): r[0]}
    v = 1 - r[0] ** 2
    for m in (2, 3):
        num = r[m - 1] - sum(phi[(m - 1, j)] * r[m - 1 - j] for j in range(1, m))
        phi[(m, m)] = num / v
        for j in range(1, m):
            phi[(m, j)] = phi[(m - 1, j)] - phi[(m, m)] * phi[(m - 1, m - j)]
        v *= 1 - phi[(m, m)] ** 2
        if abs(v) < 1e-12:
            return
    assert abs(phi22 - phi[(2, 2)]) < 1e-7 * max(1.0, abs(phi[(2, 2)]))
    assert abs(phi33 - phi[(3, 3)]) < 1e-6 * max(1.0, abs(phi[(3, 3)]))


def test_jarque_bera_matches_numpy_moments(spark):
    """q320's skewness/kurtosis/JB replay from numpy central moments
    per return flag."""
    rows = EXTRA["q320_jarque_bera"](spark, SF_SMOKE).collect()
    li = _li_pdf(spark, ["l_returnflag", "l_quantity"])
    for r in rows:
        x = li[li["l_returnflag"] == r.g]["l_quantity"].to_numpy(dtype="float64")
        assert r.n_rows == len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        skew = ((x - m) ** 3).mean() / m2**1.5
        kurt = ((x - m) ** 4).mean() / m2**2 - 3
        jb = len(x) / 6 * (skew**2 + kurt**2 / 4)
        assert abs(r.skewness - skew) < 1e-6
        assert abs(r.excess_kurtosis - kurt) < 1e-6
        assert abs(r.jarque_bera - jb) < 1e-3 * max(1.0, jb)


def test_bhattacharyya_matches_numpy(spark):
    """q321's BC and Hellinger replay from the priority mix shares;
    BC in (0, 1], H = sqrt(1-BC), and H = 0 iff the mixes coincide."""
    rows = EXTRA["q321_bhattacharyya"](spark, SF_SMOKE).collect()
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderpriority", "o_orderdate")
        .toPandas()
    )
    yr = pd.to_datetime(od["o_orderdate"]).dt.year
    p = od[yr == 1995]["o_orderpriority"].value_counts(normalize=True)
    q = od[yr == 1996]["o_orderpriority"].value_counts(normalize=True)
    cats = sorted(set(p.index) | set(q.index))
    bc = sum(math.sqrt(p.get(c, 0) * q.get(c, 0)) for c in cats)
    tot = [r for r in rows if r.priority == "__total__"][0]
    assert abs(tot.bc_term - bc) < 1e-6
    assert abs(tot.hellinger - math.sqrt(max(0.0, 1 - bc))) < 1e-6
    assert 0.0 < tot.bc_term <= 1.0 + 1e-9
    for r in rows:
        if r.priority != "__total__":
            assert r.hellinger is None
            assert abs(r.bc_term - math.sqrt(r.p_1995 * r.p_1996)) < 1e-6


def test_anderson_darling_matches_direct_replay(spark):
    """q322's A2akN replays from a direct python implementation of the
    Scholz-Stephens midrank formula on the same two samples."""
    row = EXTRA["q322_anderson_darling_2s"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    day = pd.to_datetime(li["l_shipdate"]).dt.normalize()
    li = li.assign(day=day, cents=_cents(li["l_extendedprice"]))
    li = li[day.dt.year.isin([1995, 1996])]
    daily = li.groupby("day")["cents"].sum()
    a = daily[daily.index.year == 1995].to_numpy()
    b = daily[daily.index.year == 1996].to_numpy()
    na, nb = len(a), len(b)
    nn = na + nb
    assert (row.n_a, row.n_b) == (na, nb)
    ca, cb = Counter(a.tolist()), Counter(b.tolist())
    cum_a = cum_b = 0
    ta = tb = 0.0
    for v in sorted(set(a) | set(b)):
        la, lb = ca.get(v, 0), cb.get(v, 0)
        ll = la + lb
        cum_a += la
        cum_b += lb
        b2 = 2 * (cum_a + cum_b) - ll
        den = nn * (b2 * (2 * nn - b2) - nn * ll)
        if den > 0:
            ma2 = 2 * cum_a - la
            mb2 = 2 * cum_b - lb
            ta += round(ll * (nn * ma2 - na * b2) ** 2 / den, 9)
            tb += round(ll * (nn * mb2 - nb * b2) ** 2 / den, 9)
    a2 = (nn - 1) / nn * (ta / na + tb / nb)
    assert abs(row.ad_a2 - a2) < 1e-6


def test_mood_scale_matches_integer_replay(spark):
    """q323's T4 and its exact finite-population moments replay from
    pure-python integers on the quantity multiset."""
    row = EXTRA["q323_mood_scale_test"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_returnflag", "l_quantity"])
    va = li[li["l_returnflag"] == "R"]["l_quantity"].astype(int).tolist()
    vb = li[li["l_returnflag"] != "R"]["l_quantity"].astype(int).tolist()
    na, nb = len(va), len(vb)
    nn = na + nb
    assert (row.n_a, row.n_b) == (na, nb)
    pooled = Counter(va) + Counter(vb)
    ca = Counter(va)
    cum = 0
    t4 = s1 = s2 = 0
    for v in sorted(pooled):
        ll = pooled[v]
        cum += ll
        w = (2 * cum - ll) - (nn + 1)
        t4 += ca.get(v, 0) * w * w
        s1 += ll * w * w
        s2 += ll * w**4
    assert row.t4 == t4
    e = na * s1 / nn
    var = na * nb / (nn * (nn - 1)) * (s2 - s1 * s1 / nn)
    assert abs(row.e_t4 - e) < max(1e-6 * e, 1e-3)
    assert abs(row.z - (t4 - e) / math.sqrt(var)) < 1e-6


def test_median_test_matches_chi2_replay(spark):
    """q324's per-group contributions and total replay from a direct
    pooled-lower-median dichotomization."""
    rows = {r.g: r for r in EXTRA["q324_median_test"](spark, SF_SMOKE).collect()}
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    cents = _cents(od["o_totalprice"])
    srt = np.sort(cents)
    n = len(srt)
    med = srt[(n - 1) // 2] if n % 2 else srt[n // 2 - 1]
    # lower median: min value with 2*cum >= n
    idx = next(i for i in range(n) if 2 * (i + 1) >= n)
    med = srt[idx]
    od = od.assign(above=(cents > med).astype(int))
    cells = od.groupby("o_orderpriority")["above"].agg(["sum", "size"])
    r1 = int(cells["sum"].sum())
    nn = int(cells["size"].sum())
    r0 = nn - r1
    chi_tot = 0.0
    for g, (above, ng) in cells.iterrows():
        exp_hi = (nn * above - r1 * ng) ** 2 / (nn * r1 * ng)
        exp_lo = (nn * (ng - above) - r0 * ng) ** 2 / (nn * r0 * ng)
        part = round(exp_hi, 9) + round(exp_lo, 9)
        assert abs(rows[g].chi2_part - part) < 1e-6
        chi_tot += part
    assert abs(rows["__total__"].chi2_part - chi_tot) < 1e-6


def test_cooks_distance_matches_numpy(spark):
    """q325's top-10 influence ranking replays from numpy OLS with the
    hat-matrix leverages."""
    rows = EXTRA["q325_cooks_distance"](spark, SF_SMOKE).collect()
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    daily = li.groupby("day")["cents"].sum().sort_index()
    t = (daily.index - pd.Timestamp("1995-01-01")).days.to_numpy(dtype="float64")
    y = daily.to_numpy(dtype="float64")
    n = len(y)
    a = np.vstack([t, np.ones_like(t)]).T
    beta = np.linalg.lstsq(a, y, rcond=None)[0]
    e = y - a @ beta
    sxx = ((t - t.mean()) ** 2).sum()
    h = 1 / n + (t - t.mean()) ** 2 / sxx
    s2 = (e @ e) / (n - 2)
    cooks = np.round(e**2 * h / (2 * s2 * (1 - h) ** 2), 9)
    days = daily.index.strftime("%Y-%m-%d").to_numpy()
    order = np.lexsort((days, -cooks))[:10]
    for rk, i in enumerate(order, start=1):
        r = rows[rk - 1]
        assert (r.rank, r.day) == (rk, days[i])
        assert abs(r.cooks_d - cooks[i]) < 1e-6
        assert abs(r.leverage - h[i]) < 1e-9


def test_breusch_pagan_matches_numpy(spark):
    """q326's auxiliary R^2 replays (within the 6dp term-rounding
    tolerance) from the numpy regression of e^2 on t."""
    row = EXTRA["q326_breusch_pagan"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    daily = li.groupby("day")["cents"].sum().sort_index()
    t = (daily.index - pd.Timestamp("1995-01-01")).days.to_numpy(dtype="float64")
    y = daily.to_numpy(dtype="float64")
    a = np.vstack([t, np.ones_like(t)]).T
    e = y - a @ np.linalg.lstsq(a, y, rcond=None)[0]
    u = (e / 1e8) ** 2
    r = np.corrcoef(t, u)[0, 1]
    assert row.n_days == len(y)
    assert abs(row.aux_r2 - r * r) < 1e-5
    assert abs(row.bp_lm - len(y) * r * r) < 1e-2
    assert 0.0 <= row.aux_r2 <= 1.0


def test_effect_sizes_match_numpy(spark):
    """q327's d/g/delta replay from numpy group statistics; |g| < |d|
    always (the bias correction shrinks)."""
    row = EXTRA["q327_effect_sizes"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_orderkey", "l_quantity"])
    od = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .toPandas()
    )
    df = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    x1 = df[df["o_orderpriority"] == "1-URGENT"]["l_quantity"].to_numpy(dtype="float64")
    x2 = df[df["o_orderpriority"] == "5-LOW"]["l_quantity"].to_numpy(dtype="float64")
    assert (row.n_urgent, row.n_low) == (len(x1), len(x2))
    v1, v2 = x1.var(ddof=1), x2.var(ddof=1)
    sp = math.sqrt(((len(x1) - 1) * v1 + (len(x2) - 1) * v2) / (len(x1) + len(x2) - 2))
    d = (x1.mean() - x2.mean()) / sp
    g = d * (1 - 3 / (4 * (len(x1) + len(x2)) - 9))
    assert abs(row.cohens_d - d) < 1e-7
    assert abs(row.hedges_g - g) < 1e-7
    assert abs(row.glass_delta - (x1.mean() - x2.mean()) / math.sqrt(v2)) < 1e-7
    assert abs(row.hedges_g) < abs(row.cohens_d)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=5), min_size=2, max_size=9),
    st.integers(min_value=1, max_value=8),
)
def test_mood_finite_population_moments_exhaustive(vals, na):
    """q323's finite-population E/Var formulas equal the EXHAUSTIVE
    enumeration over all C(N, n_a) group assignments of the weight
    multiset — the permutation distribution itself, not an
    approximation."""
    from itertools import combinations

    n = len(vals)
    na = min(na, n - 1)
    pooled = Counter(vals)
    cum = 0
    wmap = {}
    for v in sorted(pooled):
        ll = pooled[v]
        cum += ll
        wmap[v] = ((2 * cum - ll) - (n + 1)) ** 2
    w = [wmap[v] for v in vals]
    s1 = sum(w)
    s2 = sum(x * x for x in w)
    e_formula = na * s1 / n
    var_formula = na * (n - na) / (n * (n - 1)) * (s2 - s1 * s1 / n)
    draws = [sum(c) for c in combinations(w, na)]
    e_exact = sum(draws) / len(draws)
    var_exact = sum((d - e_exact) ** 2 for d in draws) / len(draws)
    assert abs(e_formula - e_exact) < 1e-9 * max(1.0, abs(e_exact))
    assert abs(var_formula - var_exact) < 1e-9 * max(1.0, abs(var_exact))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=25),
    st.lists(st.integers(min_value=0, max_value=6), min_size=2, max_size=25),
)
def test_anderson_darling_integer_clearing_matches_fractional(a, b):
    """q322's integer-cleared cell term l*(N*2M - n_i*2B)^2 /
    (N*((2B)(2N-2B) - N*l)) equals the textbook fractional
    Scholz-Stephens term l/N * (N*M - n_i*B)^2 / (B(N-B) - N*l/4)
    on every grid cell with a positive denominator."""
    na, nb = len(a), len(b)
    nn = na + nb
    ca, cb = Counter(a), Counter(b)
    cum_a = cum_b = 0
    for v in sorted(set(a) | set(b)):
        la, lb = ca.get(v, 0), cb.get(v, 0)
        ll = la + lb
        cum_a += la
        cum_b += lb
        b2 = 2 * (cum_a + cum_b) - ll
        bfrac = (cum_a + cum_b) - ll / 2.0
        den_int = nn * (b2 * (2 * nn - b2) - nn * ll)
        den_frac = bfrac * (nn - bfrac) - nn * ll / 4.0
        assert (den_int > 0) == (den_frac > 1e-12), (v, den_int, den_frac)
        if den_int <= 0:
            continue
        for (cm, ni) in ((cum_a, na), (cum_b, nb)):
            m2 = 2 * cm - (la if ni == na else lb)
            mfrac = cm - (la if ni == na else lb) / 2.0
            t_int = ll * (nn * m2 - ni * b2) ** 2 / den_int
            t_frac = ll / nn * (nn * mfrac - ni * bfrac) ** 2 / den_frac
            assert abs(t_int - t_frac) < 1e-9 * max(1.0, abs(t_frac))


def test_page_hinkley_matches_integer_replay(spark):
    """q328's detector replays exactly from pure-python integers on
    the same burn-in/post split."""
    row = EXTRA["q328_page_hinkley"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    daily = li.groupby("day")["cents"].sum().sort_index()
    burn = daily[daily.index.year == 1995]
    post = daily[daily.index.year > 1995]
    n0, s0 = len(burn), int(burn.sum())
    assert row.n_post_days == len(post)
    cum = 0
    runmin = 0
    ph_max = -1
    peak = alarm = None
    for t, (day, x) in enumerate(post.items(), start=1):
        cum += int(x)
        m = n0 * cum - t * s0
        runmin = min(runmin, m) if t > 1 else min(0, m)
        # running min over m_i for i<=t (include current)
        runmin = min(runmin, m)
        ph = m - runmin
        if ph > ph_max:
            ph_max, peak = ph, day
        if alarm is None and ph > 30 * s0:
            alarm = day
    assert abs(row.ph_max_dollars - round(ph_max / (n0 * 100.0), 2)) < 0.02
    assert row.peak_day == peak.strftime("%Y-%m-%d")
    assert (row.alarm_day is None) == (alarm is None)
    if alarm is not None:
        assert row.alarm_day == alarm.strftime("%Y-%m-%d")


def test_dickey_fuller_matches_numpy_ols(spark):
    """q329's gamma and t-stat replay from the numpy regression of
    delta_y on y_lag (with intercept)."""
    row = EXTRA["q329_dickey_fuller"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    y = li.groupby("day")["cents"].sum().sort_index().to_numpy(dtype="float64")
    x = y[:-1]
    d = np.diff(y)
    n = len(d)
    assert row.n_diffs == n
    a = np.vstack([x, np.ones_like(x)]).T
    beta, res, *_ = np.linalg.lstsq(a, d, rcond=None)
    e = d - a @ beta
    s2 = (e @ e) / (n - 2)
    sxx = ((x - x.mean()) ** 2).sum()
    se = math.sqrt(s2 / sxx)
    assert abs(row.gamma - beta[0]) < 1e-9 * max(1.0, abs(beta[0]))
    assert abs(row.df_stat - beta[0] / se) < 1e-4 * max(1.0, abs(beta[0] / se))
    # revenue series should be strongly mean-reverting, not unit-root
    assert row.df_stat < -5


def test_turning_points_matches_replay(spark):
    """q330's count replays from a direct scan; moments match the
    closed forms."""
    row = EXTRA["q330_turning_points"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    y = li.groupby("day")["cents"].sum().sort_index().to_numpy()
    n = len(y)
    t = sum(
        1
        for i in range(1, n - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1])
        or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    assert (row.n_days, row.turning_points) == (n, t)
    e = 2 * (n - 2) / 3
    assert abs(row.expected - e) < 1e-6
    assert abs(row.z - (t - e) / math.sqrt((16 * n - 29) / 90)) < 1e-6


def test_kpss_matches_numpy(spark):
    """q331's eta replays from numpy partial sums of the demeaned
    series (the n-clearing cancels top and bottom)."""
    row = EXTRA["q331_kpss"](spark, SF_SMOKE).collect()[0]
    li = _li_pdf(spark, ["l_shipdate", "l_extendedprice"])
    li = li.assign(
        day=pd.to_datetime(li["l_shipdate"]).dt.normalize(),
        cents=_cents(li["l_extendedprice"]),
    )
    y = li.groupby("day")["cents"].sum().sort_index().to_numpy(dtype="float64")
    n = len(y)
    e = y - y.mean()
    p = np.cumsum(e)
    eta = float((p @ p) / (n * n * (e @ e) / n) / n)
    # eta = sum(P^2) / (n^2 * sigma2), sigma2 = sum(e^2)/n
    eta = float((p @ p) / (n * n * ((e @ e) / n)))
    assert row.n_days == n
    assert abs(row.kpss_eta - eta) < 1e-7
    assert row.kpss_eta > 0


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=4, max_value=7))
def test_turning_points_null_moments_exhaustive(n):
    """q330's closed-form null moments E[T] = 2(n-2)/3 and
    Var[T] = (16n-29)/90 hold EXACTLY (as fractions) over the uniform
    distribution on all n! orderings of n distinct values."""
    from fractions import Fraction
    from itertools import permutations

    ts = []
    for perm in permutations(range(n)):
        ts.append(
            sum(
                1
                for i in range(1, n - 1)
                if (perm[i] > perm[i - 1] and perm[i] > perm[i + 1])
                or (perm[i] < perm[i - 1] and perm[i] < perm[i + 1])
            )
        )
    e = Fraction(sum(ts), len(ts))
    var = Fraction(sum(t * t for t in ts), len(ts)) - e * e
    assert e == Fraction(2 * (n - 2), 3)
    assert var == Fraction(16 * n - 29, 90)
