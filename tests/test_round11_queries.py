"""Round-11 embedding-diagnostics shelf (q332-q338): independent
numpy / pure-python replications of every query at SF_SMOKE, plus a
hypothesis pin of the q332 integer-scaled Shapley recurrence against
the exact-Fraction closed form. The DuckDB oracles pin cross-engine
parity; these tests pin the MATH — a third implementation that shares
no code with either engine.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pytest

from batchprocessingetl_spark.workload import collect_extra_queries, collect_queries
from tests.conftest import SF_SMOKE

EXTRA = {**collect_queries(), **collect_extra_queries()}


@pytest.fixture(scope="module")
def emb_pdf():
    pdf = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf, mat


def _cos6(mat_a: np.ndarray, mat_b: np.ndarray) -> np.ndarray:
    na = mat_a / np.linalg.norm(mat_a, axis=1, keepdims=True)
    nb = mat_b / np.linalg.norm(mat_b, axis=1, keepdims=True)
    # sequential per-row dot (matches both engines' left-to-right sums
    # closely enough that rounding to 6 dp is stable on this data)
    return np.round(na @ nb.T, 6)


def test_knn_shapley_matches_python_replay(spark, emb_pdf):
    from batchprocessingetl_spark.workload.vectors import (
        KS_K,
        KS_SCALE,
        KS_TEST_IDS,
        KS_TOP,
    )

    pdf, mat = emb_pdf
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    is_test = np.isin(ids, KS_TEST_IDS)
    totals: dict[int, int] = {}
    for tpos in np.where(is_test)[0]:
        cos = _cos6(mat[~is_test], mat[tpos][None, :])[:, 0]
        tr_ids, tr_lab = ids[~is_test], labels[~is_test]
        order = np.lexsort((tr_ids, -cos))
        ind = (tr_lab[order] == labels[tpos]).astype(int)
        n = len(ind)
        terms = []
        for i in range(1, n + 1):  # 1-based rank
            if i == n:
                terms.append((ind[-1] * KS_SCALE) // n)
            else:
                diff = int(ind[i - 1]) - int(ind[i])
                q = (abs(diff) * KS_SCALE) // max(KS_K, i)
                terms.append(q if diff >= 0 else -q)
        suffix = np.cumsum(terms[::-1])[::-1]
        for pos, sval in zip(order, suffix):
            totals[tr_ids[pos]] = totals.get(int(tr_ids[pos]), 0) + int(sval)
    want = sorted(
        (
            (vid, round(tot / (len(KS_TEST_IDS) * KS_SCALE), 9))
            for vid, tot in totals.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:KS_TOP]
    got = [
        (r["vec_id"], r["avg_shapley"])
        for r in EXTRA["q332_knn_shapley"](spark, SF_SMOKE).collect()
    ]
    assert got == want


@pytest.mark.parametrize("k", [1, 3, 5])
def test_shapley_integer_scaling_tracks_exact_fractions(k):
    """The BIGINT-scaled recurrence the engines run differs from the
    exact-Fraction KNN-Shapley by at most n quantization units of
    1e-12 at every rank — the error budget the 9 dp output rounding
    sits 1000x above."""
    import random

    rng = random.Random(k)
    for _ in range(25):
        n = rng.randint(1, 40)
        ind = [rng.randint(0, 1) for _ in range(n)]
        exact = [Fraction(0)] * (n + 1)
        scaled = [0] * (n + 1)
        exact[n - 1 + 1] = Fraction(0)  # sentinel beyond last
        # exact suffix recurrence
        s = Fraction(ind[-1], n)
        exacts = [s]
        for i in range(n - 1, 0, -1):
            s = s + Fraction(ind[i - 1] - ind[i], max(k, i))
            exacts.append(s)
        exacts = exacts[::-1]
        # scaled replica
        M = 10**12
        terms = []
        for i in range(1, n + 1):
            if i == n:
                terms.append((ind[-1] * M) // n)
            else:
                diff = ind[i - 1] - ind[i]
                q = (abs(diff) * M) // max(k, i)
                terms.append(q if diff >= 0 else -q)
        acc = 0
        for i in range(n, 0, -1):
            acc += terms[i - 1]
            assert abs(acc / M - float(exacts[i - 1])) <= (n + 1) / M


def test_mmd_quadratic_matches_numpy(spark, emb_pdf):
    from batchprocessingetl_spark.workload.vectors import (
        TS_LABEL_X,
        TS_LABEL_Y,
        TS_SAMPLE,
    )

    pdf, mat = emb_pdf
    row = EXTRA["q333_mmd_quadratic"](spark, SF_SMOKE).collect()[0]

    def sample(lbl):
        sel = pdf[pdf["label"] == lbl].sort_values("vec_id").head(TS_SAMPLE)
        return np.stack(sel["embedding"].to_numpy()).astype(np.float64)

    X, Y = sample(TS_LABEL_X), sample(TS_LABEL_Y)
    kxx = (X @ X.T) ** 2
    kyy = (Y @ Y.T) ** 2
    kxy = (X @ Y.T) ** 2
    m, n = len(X), len(Y)
    kxx_mean = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    kyy_mean = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    kxy_mean = kxy.mean()
    assert (row["m"], row["n"]) == (m, n)
    assert abs(row["kxx_mean"] - kxx_mean) < 1e-6
    assert abs(row["kyy_mean"] - kyy_mean) < 1e-6
    assert abs(row["kxy_mean"] - kxy_mean) < 1e-6
    assert abs(row["mmd2"] - (kxx_mean + kyy_mean - 2 * kxy_mean)) < 1e-6


def test_energy_distance_matches_numpy(spark, emb_pdf):
    from batchprocessingetl_spark.workload.vectors import (
        TS_LABEL_X,
        TS_LABEL_Y,
        TS_SAMPLE,
    )

    pdf, mat = emb_pdf
    row = EXTRA["q334_energy_distance"](spark, SF_SMOKE).collect()[0]

    def sample(lbl):
        sel = pdf[pdf["label"] == lbl].sort_values("vec_id").head(TS_SAMPLE)
        return np.stack(sel["embedding"].to_numpy()).astype(np.float64)

    X, Y = sample(TS_LABEL_X), sample(TS_LABEL_Y)

    def pdist_mean(A, B, same):
        d = np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2))
        if same:
            m = len(A)
            return (d.sum() - np.trace(d)) / (m * (m - 1))
        return d.mean()

    exx, eyy, exy = (
        pdist_mean(X, X, True),
        pdist_mean(Y, Y, True),
        pdist_mean(X, Y, False),
    )
    assert abs(row["exx_mean"] - exx) < 1e-6
    assert abs(row["eyy_mean"] - eyy) < 1e-6
    assert abs(row["exy_mean"] - exy) < 1e-6
    assert abs(row["energy_dist"] - (2 * exy - exx - eyy)) < 1e-6
    # energy distance of two samples from the SAME generator hovers
    # near zero but its population value is >= 0; the statistic must
    # at least stay far below the within-sample scale
    assert abs(row["energy_dist"]) < 0.2 * row["exy_mean"]


def _label_noise_replay(pdf, mat):
    """Pure numpy replay of the shipped q335 candidate-path plan:
    adaptive sign-LSH cells (planes = embeddings 1..b), exact top-K
    within cell, per-label rollup over ACTUAL scored neighbors."""
    from batchprocessingetl_spark.workload.vectors import (
        NOISE_K,
        _noise_planes_b,
    )

    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    n = len(ids)
    b = _noise_planes_b(n)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    planes = np.stack([mat[id_to_row[i]] for i in range(1, b + 1)])
    bits = (mat @ planes.T) > 0  # (n, b)
    cellv = (bits * (1 << np.arange(b))).sum(axis=1)
    cos = _cos6(mat, mat)
    per_label = {}
    sum_nd = {}
    sum_nb = {}
    for q in range(n):
        cands = [
            c for c in np.lexsort((ids, -cos[:, q]))
            if c != q and cellv[c] == cellv[q]
        ][:NOISE_K]
        nd = int(sum(labels[c] != labels[q] for c in cands))
        nb = len(cands)
        lbl = int(labels[q])
        cnt, flg = per_label.get(lbl, (0, 0))
        per_label[lbl] = (cnt + 1, flg + (1 if nd * 2 > nb else 0))
        sum_nd[lbl] = sum_nd.get(lbl, 0) + nd
        sum_nb[lbl] = sum_nb.get(lbl, 0) + nb
    return {
        lbl: (cnt, sum_nd[lbl] / max(sum_nb[lbl], 1), flg)
        for lbl, (cnt, flg) in per_label.items()
    }


def test_label_noise_matches_cell_replay(spark, emb_pdf):
    pdf, mat = emb_pdf
    want = _label_noise_replay(pdf, mat)
    got = {
        r["label"]: (r["n_points"], r["avg_noise_rate"], r["n_flagged"])
        for r in EXTRA["q335_knn_label_noise"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for lbl, (cnt, rate, flg) in want.items():
        g = got[lbl]
        assert g[0] == cnt
        # engine output rounds to 6 dp; the replay is full-precision
        assert abs(g[1] - rate) <= 5.01e-7
        assert g[2] == flg


def test_label_noise_exact_twin_matches_bruteforce(spark, emb_pdf):
    """Independent numpy pin of the EXACT full-corpus twin — the
    agreement test below compares engine-vs-engine, so the baseline
    itself needs a third implementation (a shared-rollup bug would
    otherwise pass both arms)."""
    from batchprocessingetl_spark.workload.vectors import (
        NOISE_K,
        knn_label_noise_exact,
    )

    pdf, mat = emb_pdf
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    cos = _cos6(mat, mat)
    n = len(ids)
    per_label = {}
    for q in range(n):
        order = [c for c in np.lexsort((ids, -cos[:, q])) if c != q][:NOISE_K]
        nd = int(sum(labels[c] != labels[q] for c in order))
        nb = len(order)
        lbl = int(labels[q])
        tot, tnb, cnt, flg = per_label.get(lbl, (0, 0, 0, 0))
        per_label[lbl] = (
            tot + nd,
            tnb + nb,
            cnt + 1,
            flg + (1 if nd * 2 > nb else 0),
        )
    got = {
        r["label"]: (r["n_points"], r["avg_noise_rate"], r["n_flagged"])
        for r in knn_label_noise_exact(spark, SF_SMOKE).collect()
    }
    for lbl, (tot, tnb, cnt, flg) in per_label.items():
        g = got[lbl]
        assert g[0] == cnt
        assert abs(g[1] - tot / max(tnb, 1)) <= 5.01e-7
        assert g[2] == flg


def test_label_noise_candidate_plan_agrees_with_exact(spark):
    """Agreement twin (VERDICT r11 #1): the shipped cell-candidate
    audit must track the exact full-corpus O(n^2/B) baseline —
    identical label partition/point counts, and disagreement rates
    within a coarse band (cells restrict candidates to the query's
    LSH region, so rates drift but the AUDIT signal — which labels are
    noisy, roughly how much — must survive)."""
    from batchprocessingetl_spark.workload.vectors import (
        knn_label_noise_exact,
    )

    approx = {
        r["label"]: r
        for r in EXTRA["q335_knn_label_noise"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["label"]: r for r in knn_label_noise_exact(spark, SF_SMOKE).collect()
    }
    assert set(approx) == set(exact)
    for lbl in exact:
        assert approx[lbl]["n_points"] == exact[lbl]["n_points"]
        assert abs(
            approx[lbl]["avg_noise_rate"] - exact[lbl]["avg_noise_rate"]
        ) <= 0.30


def test_davies_bouldin_matches_numpy(spark, emb_pdf):
    pdf, mat = emb_pdf
    labels = pdf["label"].to_numpy()
    uniq = sorted(set(int(x) for x in labels))
    cents = {l: mat[labels == l].mean(axis=0) for l in uniq}
    scatter = {
        l: float(np.linalg.norm(mat[labels == l] - cents[l], axis=1).mean())
        for l in uniq
    }
    rows = {
        r["label"]: r for r in EXTRA["q336_davies_bouldin"](spark, SF_SMOKE).collect()
    }
    for l in uniq:
        db = max(
            (scatter[l] + scatter[m]) / float(np.linalg.norm(cents[l] - cents[m]))
            for m in uniq
            if m != l
        )
        assert rows[l]["n_rows"] == int((labels == l).sum())
        assert abs(rows[l]["scatter"] - scatter[l]) < 1e-6
        assert abs(rows[l]["db_component"] - db) < 1e-6


def test_silhouette_matches_numpy_and_bounds(spark, emb_pdf):
    pdf, mat = emb_pdf
    labels = pdf["label"].to_numpy()
    uniq = sorted(set(int(x) for x in labels))
    cents = np.stack([mat[labels == l].mean(axis=0) for l in uniq])
    d = np.sqrt(((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    own = np.array([uniq.index(int(l)) for l in labels])
    a = d[np.arange(len(mat)), own]
    dmask = d.copy()
    dmask[np.arange(len(mat)), own] = np.inf
    b = dmask.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    rows = {
        r["label"]: r
        for r in EXTRA["q337_silhouette_centroid"](spark, SF_SMOKE).collect()
    }
    for i, l in enumerate(uniq):
        want = float(s[labels == l].mean())
        assert abs(rows[l]["avg_silhouette"] - want) < 1e-6
        assert -1.0 - 1e-9 <= rows[l]["avg_silhouette"] <= 1.0 + 1e-9


def test_twonn_matches_numpy(spark, emb_pdf):
    pdf, mat = emb_pdf
    ids = pdf["vec_id"].to_numpy()
    cos = _cos6(mat, mat)
    n = len(ids)
    logs = []
    used = 0
    for q in range(n):
        order = [c for c in np.lexsort((ids, -cos[:, q])) if c != q][:2]
        d1, d2 = 1.0 - cos[order[0], q], 1.0 - cos[order[1], q]
        if d1 > 0:
            used += 1
            logs.append(round(math.log(d2 / d1), 12))
    # at SF_SMOKE the corpus (500) is below TWONN_SAMPLE (512), so the
    # shipped subsample plan degenerates to the exact full-corpus form
    # and the full-precision replay pins it point-for-point
    row = EXTRA["q338_twonn_intrinsic_dim"](spark, SF_SMOKE).collect()[0]
    assert row["n_used"] == used
    assert row["n_excluded"] == n - used
    assert abs(row["sum_log_mu"] - sum(logs)) < 1e-6
    assert abs(row["id_mle"] - used / sum(logs)) < 1e-4
    # random 64-dim gaussians: the estimator must land well above a
    # low-dimensional manifold reading and at/below the ambient dim
    assert 5.0 < row["id_mle"] < 64.0


def test_twonn_subsample_agrees_with_exact(spark):
    """Agreement twin (VERDICT r11 #1) at sf0.1, where the corpus
    (2000) exceeds TWONN_SAMPLE (512) so the shipped plan genuinely
    subsamples: the estimator is sample-consistent, so the 512-point
    MLE must land in a band around the exact full-corpus value, and
    the sample accounting must be exact."""
    from batchprocessingetl_spark.workload.vectors import (
        TWONN_SAMPLE,
        twonn_intrinsic_dim_exact,
    )

    sf = "/root/testdata/sf0.1"
    got = EXTRA["q338_twonn_intrinsic_dim"](spark, sf).collect()[0]
    exact = twonn_intrinsic_dim_exact(spark, sf).collect()[0]
    assert got["n_used"] + got["n_excluded"] == TWONN_SAMPLE
    # d1/d2 are full-corpus distances either way; only the query set
    # shrinks, so the MLE is the same estimator on a uniform subsample
    assert abs(got["id_mle"] - exact["id_mle"]) <= 0.35 * exact["id_mle"]


# ---- q339-q341: seasonality scan, t-closeness, Hurst R/S ----


@pytest.fixture(scope="module")
def daily_cents():
    import duckdb

    return duckdb.sql(
        f"""
        SELECT CAST(l_shipdate AS DATE) AS day,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM read_parquet('{SF_SMOKE}/lineitem.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()


def test_seasonality_scan_matches_numpy(spark, daily_cents):
    rev = daily_cents["rev"].to_numpy().astype(np.int64)
    n = len(rev)
    s = int(rev.sum())
    z = (n * rev.astype(object) - s).astype(np.float64) / float(s)
    t = np.arange(n, dtype=np.float64)
    powers = {}
    for p in range(2, 61):
        a = float(np.sum(np.round(z * np.cos(2 * math.pi * t / p), 12)))
        b = float(np.sum(np.round(z * np.sin(2 * math.pi * t / p), 12)))
        powers[p] = a * a + b * b
    top = sorted(powers.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    tot = sum(powers.values())
    rows = EXTRA["q339_seasonality_scan"](spark, SF_SMOKE).collect()
    assert [r["period_days"] for r in rows] == [p for p, _ in top]
    for r, (p, i) in zip(rows, top):
        assert abs(r["power"] - i) < 1e-5
        assert abs(r["power_share"] - i / tot) < 1e-6
        assert 0.0 < r["power_share"] <= 1.0


def test_t_closeness_matches_python(spark):
    from collections import Counter

    from batchprocessingetl_spark.workload.curation_queries import (
        KANON_BAND,
        KANON_SHIFT,
        TCLOSE_T,
    )

    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    bands = (
        (cust["c_acctbal"] * 100 + 0.5).apply(math.floor).astype(int) + KANON_SHIFT
    ) // KANON_BAND
    keys = list(zip(cust["c_nationkey"], bands))
    sens = cust["c_mktsegment"].tolist()
    ghist = Counter(sens)
    gtot = len(sens)
    per = {}
    for kq, sv in zip(keys, sens):
        per.setdefault(kq, Counter())[sv] += 1
    ts = {}
    for kq, c in per.items():
        k = sum(c.values())
        num = sum(abs(cnt * gtot - ghist[sv] * k) for sv, cnt in c.items())
        num += (gtot - sum(ghist[sv] for sv in c)) * k
        ts[kq] = (num, k)
    tvals = {kq: num / (2 * k * gtot) for kq, (num, k) in ts.items()}
    worst = min(
        (kq for kq in tvals if tvals[kq] == max(tvals.values()))
    )
    row = EXTRA["q340_t_closeness"](spark, SF_SMOKE).collect()[0]
    assert row["n_classes"] == len(per)
    assert abs(row["t_max"] - max(tvals.values())) < 1e-9
    assert row["classes_above_t"] == sum(1 for v in tvals.values() if v > TCLOSE_T)
    assert (row["worst_nation"], row["worst_band"]) == worst
    assert row["worst_k"] == ts[worst][1]
    # variational distance is a probability metric: all t in [0, 1]
    assert 0.0 <= row["t_max"] <= 1.0


def test_hurst_rs_matches_numpy(spark, daily_cents):
    from batchprocessingetl_spark.workload.inference_queries import HURST_WINDOWS

    rev = daily_cents["rev"].to_numpy().astype(object)  # exact ints
    n = len(rev)
    pts = []
    rs_by_w = {}
    for w in HURST_WINDOWS:
        vals = []
        for b in range(n // w):
            blk = rev[b * w : (b + 1) * w]
            sblk = sum(blk)
            cum, run = [], 0
            for x in blk:
                run += w * x - sblk
                cum.append(run)
            r = max(cum) - min(cum)
            v = w * sum(x * x for x in blk) - sblk * sblk
            if v > 0:
                vals.append(round(float(r) / math.sqrt(float(v)), 12))
        rs = sum(vals) / len(vals)
        rs_by_w[w] = rs
        pts.append((round(math.log2(w), 12), round(math.log2(rs), 12)))
    k = len(pts)
    su = sum(u for u, _ in pts)
    sv = sum(v for _, v in pts)
    suv = sum(u * v for u, v in pts)
    suu = sum(u * u for u, _ in pts)
    hurst = (k * suv - su * sv) / (k * suu - su * su)
    row = EXTRA["q341_hurst_rs"](spark, SF_SMOKE).collect()[0]
    for w in HURST_WINDOWS:
        assert abs(row[f"rs_{w}"] - rs_by_w[w]) < 1e-5
    assert abs(row["hurst"] - hurst) < 1e-5
    assert 0.0 < row["hurst"] < 1.2  # R/S estimates live near (0, 1)


# ---- q342-q344: Zipf fit, Heaps' law, overdispersion ----


@pytest.fixture(scope="module")
def doc_tokens():
    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = []
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        toks.append((int(did), [t for t in str(text).strip().split() if t]))
    return toks


def _ols(pts):
    k = len(pts)
    su = sum(u for u, _ in pts)
    sv = sum(v for _, v in pts)
    suv = sum(u * v for u, v in pts)
    suu = sum(u * u for u, _ in pts)
    slope = (k * suv - su * sv) / (k * suu - su * su)
    return slope, (sv - slope * su) / k


def test_zipf_fit_matches_python(spark, doc_tokens):
    from collections import Counter

    from batchprocessingetl_spark.workload.textops import ZIPF_TOP

    freq = Counter()
    for _, toks in doc_tokens:
        freq.update(toks)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    pts = [
        (round(math.log(r), 12), round(math.log(f), 12))
        for r, (_, f) in enumerate(ranked, start=1)
    ]
    slope, _ = _ols(pts)
    row = EXTRA["q342_zipf_fit"](spark, SF_SMOKE).collect()[0]
    assert row["vocab_size"] == len(freq)
    assert row["total_tokens"] == sum(freq.values())
    assert row["ranks_used"] == len(pts)
    assert abs(row["zipf_s"] - (-slope)) < 1e-5
    assert 0.0 <= row["r_squared"] <= 1.0


def test_heaps_law_matches_python(spark, doc_tokens):
    first_doc = {}
    for did, toks in sorted(doc_tokens):
        for t in toks:
            first_doc.setdefault(t, did)
    new_per_doc = {}
    for t, did in first_doc.items():
        new_per_doc[did] = new_per_doc.get(did, 0) + 1
    pts, big_n, v = [], 0, 0
    for did, toks in sorted(doc_tokens):
        big_n += len(toks)
        v += new_per_doc.get(did, 0)
        if big_n > 0 and v > 0:
            pts.append((round(math.log(big_n), 12), round(math.log(v), 12)))
    slope, intercept = _ols(pts)
    row = EXTRA["q343_heaps_law"](spark, SF_SMOKE).collect()[0]
    assert row["n_docs"] == len(doc_tokens)
    assert row["total_tokens"] == sum(len(t) for _, t in doc_tokens)
    assert abs(row["heaps_beta"] - slope) < 1e-5
    assert abs(row["heaps_k"] - math.exp(intercept)) < 1e-4
    # vocabulary growth is sublinear in any real corpus
    assert 0.0 < row["heaps_beta"] < 1.0


def test_overdispersion_matches_python(spark):
    import duckdb

    counts = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/orders.parquet')
                GROUP BY o_orderdate"""
        ).fetchall()
    ]
    n = len(counts)
    s = sum(counts)
    ybar = s / n
    css = sum((y - ybar) ** 2 for y in counts)
    disp = css / (n - 1) / ybar
    ct_z = (css - s) / (ybar * math.sqrt(2 * n))
    row = EXTRA["q344_overdispersion"](spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == n
    assert abs(row["mean_daily_orders"] - ybar) < 1e-5
    assert abs(row["dispersion_index"] - disp) < 1e-6
    assert abs(row["ct_z"] - ct_z) < 1e-5
    assert row["overdispersed"] == (ct_z > 1.645)
