"""Round-12 pipeline-health shelf (q345-q352): independent numpy /
pure-python replications at SF_SMOKE — a third implementation sharing
no code with either engine, pinning the MATH behind each audit (the
DuckDB oracles pin cross-engine parity separately).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from batchprocessingetl_spark.workload import collect_extra_queries, collect_queries
from tests.conftest import SF_SMOKE

EXTRA = {**collect_queries(), **collect_extra_queries()}


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def emb_pdf():
    pdf = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf, mat


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_ams_f2_sketch_matches_python(spark):
    from batchprocessingetl_spark.workload.round12_queries import AMS_ESTIMATORS

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    counts = Counter(int(u) for u in ev["user_id"].dropna())
    f2_exact = sum(c * c for c in counts.values())
    ests = []
    for i in range(AMS_ESTIMATORS):
        s = sum(
            (1 if int(_md5(f"ams{i}:{k}")[0], 16) % 2 == 0 else -1) * c
            for k, c in counts.items()
        )
        ests.append(s * s)
    order = sorted(range(AMS_ESTIMATORS), key=lambda j: (ests[j], j))
    mid = [ests[order[AMS_ESTIMATORS // 2 - 1]], ests[order[AMS_ESTIMATORS // 2]]]
    f2_est = sum(mid) / 2.0
    row = EXTRA["q345_ams_f2_sketch"](spark, SF_SMOKE).collect()[0]
    assert row["n_keys"] == len(counts)
    assert row["f2_exact"] == f2_exact
    assert abs(row["f2_estimate"] - f2_est) <= 0.051
    assert abs(
        row["rel_error_pct"] - (f2_est - f2_exact) / f2_exact * 100.0
    ) <= 5.1e-5
    # an estimate wildly off would mean broken signs, not noise: the
    # median of 16 estimators concentrates within a small factor
    assert 0.1 * f2_exact < row["f2_estimate"] < 10 * f2_exact


def _cos6(mat_a, mat_b):
    na = mat_a / np.linalg.norm(mat_a, axis=1, keepdims=True)
    nb = mat_b / np.linalg.norm(mat_b, axis=1, keepdims=True)
    return np.round(na @ nb.T, 6)


def test_ann_recall_audit_matches_numpy(spark, emb_pdf):
    from batchprocessingetl_spark.workload.round12_queries import RECALL_K
    from batchprocessingetl_spark.workload.vectors import (
        KS_TEST_IDS,
        _noise_planes_b,
    )

    pdf, mat = emb_pdf
    ids = pdf["vec_id"].to_numpy()
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    b = _noise_planes_b(len(ids))
    planes = np.stack([mat[id_to_row[i]] for i in range(1, b + 1)])
    cellv = (((mat @ planes.T) > 0) * (1 << np.arange(b))).sum(axis=1)
    cos = _cos6(mat, mat)
    got = {
        r["qid"]: r for r in EXTRA["q346_ann_recall_audit"](spark, SF_SMOKE).collect()
    }
    assert sorted(got) == sorted(KS_TEST_IDS)
    for qid in KS_TEST_IDS:
        q = id_to_row[qid]
        order = [c for c in np.lexsort((ids, -cos[:, q])) if c != q]
        exact = set(order[:RECALL_K])
        in_cell = [c for c in order if cellv[c] == cellv[q]]
        approx = set(in_cell[:RECALL_K])
        r = got[qid]
        assert r["n_candidates"] == len(in_cell)
        assert r["n_hits"] == len(exact & approx)
        assert abs(r["recall_at_10"] - len(exact & approx) / RECALL_K) < 1e-9


def test_fairness_audit_matches_pandas(spark):
    from batchprocessingetl_spark.workload.round12_queries import (
        FAIR_POS,
        FAIR_THRESHOLD_CENTS,
    )

    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["d"] = (np.floor(j["o_totalprice"] * 100 + 0.5).astype("int64")
              > FAIR_THRESHOLD_CENTS).astype(int)
    j["y"] = j["o_orderpriority"].isin(FAIR_POS).astype(int)
    rows = {
        r["c_mktsegment"]: r
        for r in EXTRA["q347_fairness_audit"](spark, SF_SMOKE).collect()
    }
    for seg, g in j.groupby("c_mktsegment"):
        r = rows[seg]
        n, sel, pos = len(g), int(g["d"].sum()), int(g["y"].sum())
        tp = int((g["d"] * g["y"]).sum())
        fp = int((g["d"] * (1 - g["y"])).sum())
        assert r["n"] == n and r["n_selected"] == sel
        assert abs(r["selection_rate"] - sel / n) <= 5.01e-7
        assert abs(r["tpr"] - tp / pos) <= 5.01e-7
        assert abs(r["fpr"] - fp / (n - pos)) <= 5.01e-7


def test_neyman_allocation_matches_python(spark):
    from batchprocessingetl_spark.workload.round12_queries import NEYMAN_BUDGET

    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    pri = o["o_orderpriority"].to_numpy()
    terms, stats = {}, {}
    for p in sorted(set(pri)):
        x = cents[pri == p]
        n = len(x)
        sx, sxx = int(x.sum()), int((x.astype(object) ** 2).sum())
        sd = math.sqrt((n * sxx - sx * sx) / (n * n))
        stats[p] = (n, sd)
        terms[p] = round(n * sd, 6)
    den = sum(terms.values())
    n_total = sum(n for n, _ in stats.values())
    rows = {
        r["priority"]: r
        for r in EXTRA["q348_neyman_allocation"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(stats)
    for p, (n, sd) in stats.items():
        r = rows[p]
        assert r["n_rows"] == n
        assert abs(r["sd_cents"] - sd) <= 1e-5
        assert abs(r["neyman_share"] - terms[p] / den) <= 5.01e-7
        assert r["neyman_n"] == math.floor(NEYMAN_BUDGET * terms[p] / den)
        assert r["proportional_n"] == math.floor(NEYMAN_BUDGET * n / n_total)
    # allocations sum to <= budget and within |strata| of it (floors)
    total = sum(r["neyman_n"] for r in rows.values())
    assert NEYMAN_BUDGET - len(rows) <= total <= NEYMAN_BUDGET


def test_embedding_dim_drift_matches_numpy(spark, emb_pdf):
    from batchprocessingetl_spark.workload.round12_queries import (
        DRIFT_LABEL_A,
        DRIFT_LABEL_B,
        DRIFT_TOP,
    )

    pdf, mat = emb_pdf
    lab = pdf["label"].to_numpy()
    a, b = mat[lab == DRIFT_LABEL_A], mat[lab == DRIFT_LABEL_B]
    na, nb = len(a), len(b)
    d = np.empty(mat.shape[1])
    for i in range(mat.shape[1]):
        ssa = a[:, i].sum() ** 2 / na
        ssb = b[:, i].sum() ** 2 / nb
        pooled = math.sqrt(
            (((a[:, i] ** 2).sum() - ssa) + ((b[:, i] ** 2).sum() - ssb))
            / (na + nb - 2)
        )
        d[i] = round((a[:, i].mean() - b[:, i].mean()) / pooled, 6)
    order = sorted(range(len(d)), key=lambda i: (-abs(d[i]), i))[:DRIFT_TOP]
    rows = EXTRA["q349_embedding_dim_drift"](spark, SF_SMOKE).collect()
    assert [r["i"] for r in rows] == order
    for rank, r in enumerate(rows, start=1):
        assert r["drift_rank"] == rank
        assert abs(r["cohens_d"] - d[r["i"]]) <= 2e-6


def test_context_length_curve_matches_python(spark, docs_pdf):
    from batchprocessingetl_spark.workload.round12_queries import CTX_SIZES

    toks = [len(t.split()) for t in docs_pdf["text"]]
    rows = {
        r["ctx"]: r
        for r in EXTRA["q350_context_length_curve"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(CTX_SIZES)
    for ctx in CTX_SIZES:
        chunks = [math.ceil(t / ctx) for t in toks]
        pad = [c * ctx - t for c, t in zip(chunks, toks)]
        trunc = [max(t - ctx, 0) for t in toks]
        r = rows[ctx]
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == sum(toks)
        assert r["total_chunks"] == sum(chunks)
        assert r["pad_tokens"] == sum(pad)
        assert r["trunc_tokens"] == sum(trunc)
        assert abs(r["pad_frac"] - sum(pad) / (sum(chunks) * ctx)) <= 5.01e-7
        assert abs(r["trunc_frac"] - sum(trunc) / sum(toks)) <= 5.01e-7
    # monotonicity: larger contexts pad more, truncate less
    ordered = [rows[c] for c in sorted(CTX_SIZES)]
    assert all(
        x["trunc_tokens"] >= y["trunc_tokens"] for x, y in zip(ordered, ordered[1:])
    )


def _simhash60(text: str) -> int:
    toks = set(text.split())
    bits = [0] * 60
    for t in toks:
        h = int(_md5(t)[:15], 16)
        for k in range(60):
            bits[k] += 1 if (h >> k) & 1 else -1
    return sum((1 << k) for k in range(60) if bits[k] > 0)


def test_lsh_bucket_health_matches_python(spark, docs_pdf):
    from batchprocessingetl_spark.workload.round12_queries import (
        LSH_BANDS,
        LSH_WIDTH,
    )

    mask = (1 << LSH_WIDTH) - 1
    per_band: dict[int, Counter] = {i: Counter() for i in range(LSH_BANDS)}
    n_sig = 0
    for t in docs_pdf["text"]:
        if not t.split():
            continue  # simhash of an empty token set is undefined
        n_sig += 1
        sig = _simhash60(t)
        for i in range(LSH_BANDS):
            per_band[i][(sig >> (i * LSH_WIDTH)) & mask] += 1
    rows = {
        r["band_idx"]: r
        for r in EXTRA["q351_lsh_bucket_health"](spark, SF_SMOKE).collect()
    }
    for i in range(LSH_BANDS):
        buckets = per_band[i]
        r = rows[i]
        assert r["n_buckets"] == len(buckets)
        assert r["n_docs"] == n_sig
        assert r["max_bucket"] == max(buckets.values())
        pairs = sum(c * (c - 1) // 2 for c in buckets.values())
        assert r["candidate_pairs"] == pairs
        assert abs(
            r["pair_frac"] - pairs / (n_sig * (n_sig - 1) // 2)
        ) <= 5.01e-7


def test_source_trigram_kl_matches_python(spark, docs_pdf):
    st: dict[tuple, int] = Counter()
    for src, text in zip(docs_pdf["source"], docs_pdf["text"]):
        for i in range(len(text) - 2):
            st[(src, text[i : i + 3])] += 1
    c_s = Counter()
    c_t = Counter()
    for (src, tri), c in st.items():
        c_s[src] += c
        c_t[tri] += c
    c_all = sum(st.values())
    rows = {
        r["source"]: r
        for r in EXTRA["q352_source_trigram_kl"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(c_s)
    for src in c_s:
        terms = [
            c * round(math.log((c * c_all) / (c_s[src] * c_t[tri])), 12)
            for (s2, tri), c in st.items()
            if s2 == src
        ]
        kl = sum(terms) / c_s[src]
        r = rows[src]
        assert r["n_trigram_types"] == sum(1 for (s2, _) in st if s2 == src)
        assert r["total_trigrams"] == c_s[src]
        assert abs(r["kl_nats"] - kl) <= 1e-6
        assert r["kl_nats"] >= -1e-9  # KL is non-negative


# ---- second wave (q353-q360) ----


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF_SMOKE}/orders.parquet")


@pytest.fixture(scope="module")
def daily_rev():
    import duckdb

    return duckdb.sql(
        f"""
        SELECT CAST(l_shipdate AS DATE) AS day,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS y
        FROM read_parquet('{SF_SMOKE}/lineitem.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()


def test_vif_matches_numpy(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    x1 = li["l_quantity"].to_numpy().astype("int64")
    x2 = np.floor(li["l_discount"].to_numpy() * 100 + 0.5).astype("int64")
    x3 = np.floor(li["l_tax"].to_numpy() * 100 + 0.5).astype("int64")
    X = np.stack([x1, x2, x3]).astype(np.float64)
    r = np.corrcoef(X)
    r12, r13, r23 = r[0, 1], r[0, 2], r[1, 2]

    def r2(a, b, c):
        return (a * a + b * b - 2 * a * b * c) / (1 - c * c)

    want = {
        "l_quantity": r2(r12, r13, r23),
        "l_discount": r2(r12, r23, r13),
        "l_tax": r2(r13, r23, r12),
    }
    rows = {
        r_["predictor"]: r_
        for r_ in EXTRA["q353_vif_collinearity"](spark, SF_SMOKE).collect()
    }
    for p, w in want.items():
        assert abs(rows[p]["r2_on_others"] - w) <= 1e-6
        assert abs(rows[p]["vif"] - 1.0 / (1.0 - w)) <= 1e-4
        # synthetic TPC-H-ish columns are near-independent: VIF ~ 1
        assert 0.99 <= rows[p]["vif"] <= 1.5


def test_bartlett_matches_python(spark, orders_pdf):
    cents = np.floor(orders_pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    pri = orders_pdf["o_orderpriority"].to_numpy()
    k, n = 0, 0
    sum_w_ln, sum_ssw, sum_inv = 0.0, 0.0, 0.0
    for g in sorted(set(pri)):
        x = cents[pri == g].astype(object)
        ni = len(x)
        sx, sxx = int(x.sum()), int((x * x).sum())
        s2 = (ni * sxx - sx * sx) / (ni * (ni - 1.0))
        sum_w_ln += round((ni - 1) * round(math.log(s2), 12), 9)
        sum_ssw += round((ni * sxx - sx * sx) / ni, 6)
        sum_inv += round(1.0 / (ni - 1.0), 18)
        k += 1
        n += ni
    sp2 = sum_ssw / (n - k)
    stat = ((n - k) * math.log(sp2) - sum_w_ln) / (
        1.0 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1.0))
    )
    row = EXTRA["q354_bartlett_test"](spark, SF_SMOKE).collect()[0]
    assert row["k"] == k and row["n"] == n and row["df"] == k - 1
    assert abs(row["pooled_var_cents2"] - sp2) <= 1e-9 * sp2
    assert abs(row["bartlett_chi2"] - stat) <= 1e-4


def test_cusum_of_squares_matches_python(spark, daily_rev):
    y = [int(v) for v in daily_rev["y"]]
    n, s = len(y), sum(y)
    e2 = [(n * v - s) ** 2 for v in y]
    total = sum(e2)
    best = None
    cum = 0
    for k, v in enumerate(e2, start=1):
        cum += v
        dev = abs(n * cum - k * total) / (n * total)
        if best is None or dev > best[0]:
            best = (dev, k)
    row = EXTRA["q355_cusum_of_squares"](spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == n
    assert row["argmax_k"] == best[1]
    assert abs(row["max_abs_dev"] - best[0]) <= 5.01e-10
    assert pd.Timestamp(row["argmax_day"]) == pd.Timestamp(
        daily_rev["day"].iloc[best[1] - 1]
    )


def test_fano_factor_matches_pandas(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    h = ev["ts"].dt.floor("h")
    counts = ev.groupby(["event_type", h]).size()
    rows = {
        r["event_type"]: r for r in EXTRA["q356_fano_factor"](spark, SF_SMOKE).collect()
    }
    for et, grp in counts.groupby(level=0):
        c = grp.to_numpy().astype("int64")
        nh = len(c)
        if nh <= 1:
            assert et not in rows
            continue
        mean = c.sum() / nh
        var = (nh * (c * c).sum() - c.sum() ** 2) / (nh * (nh - 1.0))
        r = rows[et]
        assert r["n_hours"] == nh and r["n_events"] == int(c.sum())
        assert abs(r["mean_per_hour"] - mean) <= 5.01e-7
        assert abs(r["var_per_hour"] - var) <= 5.01e-7
        assert abs(r["fano_factor"] - var / mean) <= 5.01e-7


def test_flesch_matches_python(spark, docs_pdf):
    import re

    agg = {}
    for src, text in zip(docs_pdf["source"], docs_pdf["text"]):
        w = len(text.split())
        if w == 0:
            continue
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        dn, dw, ds, dy = agg.get(src, (0, 0, 0, 0))
        agg[src] = (dn + 1, dw + w, ds + s, dy + y)
    rows = {
        r["source"]: r
        for r in EXTRA["q357_flesch_reading_ease"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(agg)
    for src, (dn, dw, ds, dy) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["words"], r["sentences"], r["syllables"]) == (
            dn,
            dw,
            ds,
            dy,
        )
        want = 206.835 - 1.015 * dw / ds - 84.6 * dy / dw
        assert abs(r["flesch_score"] - want) <= 5.01e-7


def test_rmst_matches_python(spark):
    import duckdb

    from batchprocessingetl_spark.workload.round12_queries import RMST_TAU

    cells = duckdb.sql(
        f"""
        SELECT DATE_DIFF('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS t,
               SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS d,
               SUM(CASE WHEN l_returnflag <> 'R' THEN 0 ELSE 1 END) AS c
        FROM read_parquet('{SF_SMOKE}/lineitem.parquet') li
        JOIN read_parquet('{SF_SMOKE}/orders.parquet') od
          ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    t0 = min(t for t, _, _ in cells)
    at_risk = sum(d + c for _, d, c in cells)
    logsum, km = 0.0, []
    for t, d, c in cells:
        if d > 0:
            term = (
                -99.0 if at_risk == d else round(math.log((at_risk - d) / at_risk), 9)
            )
            logsum = round(logsum + term, 9)
            km.append((t, round(math.exp(logsum), 6)))
        at_risk -= d + c
    t1 = km[0][0]
    area = 0.0
    for (t, s_km), nxt in zip(km, km[1:] + [(RMST_TAU, None)]):
        if t < RMST_TAU:
            area += round(s_km * (min(nxt[0], RMST_TAU) - t), 9)
    want = area + (min(t1, RMST_TAU) - t0)
    row = EXTRA["q358_rmst"](spark, SF_SMOKE).collect()[0]
    assert row["tau"] == RMST_TAU and row["t_start"] == t0
    assert abs(row["rmst_days"] - want) <= 1e-5
    # the integral of a [0,1] step function over a window of length L
    # is in [0, L]
    assert 0 <= row["rmst_days"] <= RMST_TAU - t0 + 1e-9


def test_grubbs_matches_python(spark, daily_rev):
    y = [int(v) for v in daily_rev["y"]]
    n, s = len(y), sum(y)
    syy = sum(v * v for v in y)
    sd = math.sqrt((n * syy - s * s) / (n * (n - 1.0)))
    devs = [abs(n * v - s) for v in y]
    g = max(devs) / (n * sd)
    k = devs.index(max(devs))
    row = EXTRA["q359_grubbs_test"](spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == n
    assert abs(row["grubbs_g"] - g) <= 5.01e-7
    assert pd.Timestamp(row["flagged_day"]) == pd.Timestamp(daily_rev["day"].iloc[k])


def test_dedup_token_savings_matches_pandas(spark, docs_pdf):
    g = (
        docs_pdf.assign(tok=[len(t.split()) for t in docs_pdf["text"]])
        .groupby(["source", "text"])
        .agg(n_copies=("tok", "size"), tok=("tok", "max"))
        .reset_index()
    )
    rows = {
        r["source"]: r
        for r in EXTRA["q360_dedup_token_savings"](spark, SF_SMOKE).collect()
    }
    for src, grp in g.groupby("source"):
        r = rows[src]
        total = int((grp["n_copies"] * grp["tok"]).sum())
        saved = int(((grp["n_copies"] - 1) * grp["tok"]).sum())
        assert r["n_docs"] == int(grp["n_copies"].sum())
        assert r["n_unique"] == len(grp)
        assert r["tokens_total"] == total
        assert r["tokens_saved"] == saved
        assert abs(r["savings_frac"] - saved / total) <= 5.01e-7


# ---- third wave (q361-q366) ----


def test_cross_source_dup_matrix_matches_pandas(spark, docs_pdf):
    from itertools import combinations

    per_text = {}
    for src, text in zip(docs_pdf["source"], docs_pdf["text"]):
        srcs, tok = per_text.get(text, (set(), len(text.split())))
        srcs.add(src)
        per_text[text] = (srcs, tok)
    shared = Counter()
    shared_tok = Counter()
    for srcs, tok in per_text.values():
        for a, b in combinations(sorted(srcs), 2):
            shared[(a, b)] += 1
            shared_tok[(a, b)] += tok
    all_srcs = sorted(set(docs_pdf["source"]))
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in EXTRA["q361_cross_source_dup_matrix"](spark, SF_SMOKE).collect()
    }
    assert len(rows) == len(all_srcs) * (len(all_srcs) - 1) // 2
    for pair, r in rows.items():
        assert r["n_shared_texts"] == shared.get(pair, 0)
        assert r["shared_tokens"] == shared_tok.get(pair, 0)


def test_keyness_g2_matches_python(spark, docs_pdf):
    from batchprocessingetl_spark.workload.round12_queries import KEYNESS_TOP

    st = Counter()
    for src, text in zip(docs_pdf["source"], docs_pdf["text"]):
        for t in text.split():
            st[(src, t)] += 1
    na = Counter()
    t_all = Counter()
    for (src, t), a in st.items():
        na[src] += a
        t_all[t] += a
    nn = sum(st.values())
    per_src: dict = {}
    for (src, t), a in st.items():
        b = t_all[t] - a
        tt = t_all[t]
        g2 = a * round(math.log(a * nn / (na[src] * tt)), 12)
        if b:
            g2 += b * round(math.log(b * nn / ((nn - na[src]) * tt)), 12)
        per_src.setdefault(src, []).append((round(2.0 * g2, 9), t, a, b))
    rows = EXTRA["q362_keyness_g2"](spark, SF_SMOKE).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, got in by_src.items():
        want = sorted(per_src[src], key=lambda x: (-x[0], x[1]))[:KEYNESS_TOP]
        assert len(got) == min(KEYNESS_TOP, len(want))
        for r, (g2, t, a, b) in zip(got, want):
            assert (r["token"], r["a"], r["b"]) == (t, a, b)
            assert abs(r["g2"] - g2) <= 2e-9
            assert r["g2"] >= -1e-9  # keyness of the TOP token is >= 0


def test_max_drawdown_matches_python(spark, daily_rev):
    y = [int(v) for v in daily_rev["y"]]
    cum = peak = 0
    best = None
    for i, v in enumerate(y):
        cum += v
        peak = max(peak, cum)
        dd = peak - cum
        if best is None or dd > best[0]:
            best = (dd, i, peak, cum)
    row = EXTRA["q363_max_drawdown"](spark, SF_SMOKE).collect()[0]
    assert row["max_drawdown_cents"] == best[0]
    assert row["peak_cents"] == best[2]
    assert row["trough_cents"] == best[3]
    assert pd.Timestamp(row["trough_day"]) == pd.Timestamp(
        daily_rev["day"].iloc[best[1]]
    )
    assert abs(row["drawdown_frac"] - best[0] / best[2]) <= 5.01e-10


def test_optimal_split_matches_python(spark, daily_rev):
    pairs = sorted(
        zip([int(v) for v in daily_rev["y"]], daily_rev["day"]),
        key=lambda t: (t[0], t[1]),
    )
    y = [v for v, _ in pairs]
    n = len(y)
    best = None
    sx = sxx = 0
    tsx, tsxx = sum(y), sum(v * v for v in y)
    for k in range(1, n):
        sx += y[k - 1]
        sxx += y[k - 1] ** 2
        sse = round(
            (k * sxx - sx * sx) / k
            + ((n - k) * (tsxx - sxx) - (tsx - sx) ** 2) / (n - k),
            3,
        )
        cand = (sse, y[k - 1], k)
        if best is None or cand < best:
            best = cand
    row = EXTRA["q364_optimal_split_1d"](spark, SF_SMOKE).collect()[0]
    assert row["n_low_cluster"] == best[2]
    assert row["split_value_cents"] == best[1]
    assert abs(row["min_sse"] - best[0]) <= 1e-9 * best[0]


def test_decile_gap_matches_python(spark, orders_pdf):
    from batchprocessingetl_spark.workload.round12_queries import QTE_HI, QTE_LO

    cents = np.floor(orders_pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    pri = orders_pdf["o_orderpriority"].to_numpy()

    def deciles(mask):
        xs = sorted(cents[mask])
        n = len(xs)
        return {d: xs[(n - 1) * d // 10] for d in range(1, 10)}

    hi, lo = deciles(pri == QTE_HI), deciles(pri == QTE_LO)
    rows = {r["d"]: r for r in EXTRA["q365_decile_gap"](spark, SF_SMOKE).collect()}
    assert sorted(rows) == list(range(1, 10))
    for d in range(1, 10):
        r = rows[d]
        assert r["q_urgent"] == hi[d]
        assert r["q_low"] == lo[d]
        assert r["gap_cents"] == hi[d] - lo[d]
    # deciles are monotone in d
    qs = [rows[d]["q_urgent"] for d in range(1, 10)]
    assert qs == sorted(qs)


def test_gunning_fog_matches_python(spark, docs_pdf):
    import re

    agg = {}
    for src, text in zip(docs_pdf["source"], docs_pdf["text"]):
        toks = text.split()
        if not toks:
            continue
        w = len(toks)
        cw = sum(1 for t in toks if len(re.findall(r"[aeiouy]+", t.lower())) >= 3)
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        dn, dw, ds, dcw = agg.get(src, (0, 0, 0, 0))
        agg[src] = (dn + 1, dw + w, ds + s, dcw + cw)
    rows = {
        r["source"]: r for r in EXTRA["q366_gunning_fog"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(agg)
    for src, (dn, dw, ds, dcw) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["words"], r["sentences"], r["complex_words"]) == (
            dn,
            dw,
            ds,
            dcw,
        )
        want = 0.4 * (dw / ds + 100.0 * dcw / dw)
        assert abs(r["fog_index"] - want) <= 5.01e-7


# ---- final pair (q367-q368) ----


def test_growth_accounting_matches_python_and_identities(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").dropna(subset=["user_id"])
    ud = sorted(
        {(int(u), d) for u, d in zip(ev["user_id"], ev["ts"].dt.floor("D"))}
    )
    by_user: dict = {}
    for u, d in ud:
        by_user.setdefault(u, []).append(d)
    per_day: dict = {}
    for u, days in by_user.items():
        for i, d in enumerate(days):
            a, nw, rt, rs = per_day.get(d, (0, 0, 0, 0))
            new = 1 if i == 0 else 0
            ret = 1 if i > 0 and days[i - 1] == d - pd.Timedelta(days=1) else 0
            res = 1 if i > 0 and days[i - 1] < d - pd.Timedelta(days=1) else 0
            per_day[d] = (a + 1, nw + new, rt + ret, rs + res)
    rows = EXTRA["q367_growth_accounting"](spark, SF_SMOKE).collect()
    got = {pd.Timestamp(r["day"]): r for r in rows}
    lo, hi = min(per_day), max(per_day)
    assert min(got) == lo and max(got) == hi
    prev_active = 0
    d = lo
    while d <= hi:
        a, nw, rt, rs = per_day.get(d, (0, 0, 0, 0))
        r = got[d]
        assert (r["active"], r["new_users"], r["retained"], r["resurrected"]) == (
            a,
            nw,
            rt,
            rs,
        )
        # the four-way decomposition and the churn balance
        assert r["active"] == r["new_users"] + r["retained"] + r["resurrected"]
        assert r["churned"] == prev_active - r["retained"]
        prev_active = r["active"]
        d += pd.Timedelta(days=1)


def test_littles_law_audit_identities(spark):
    row = EXTRA["q368_littles_law_audit"](spark, SF_SMOKE).collect()[0]
    # the conservation check itself: two independent integrals agree
    assert row["identity_ok"] is True
    assert row["wip_direct"] == row["wip_sweep"]
    # Little's law holds by algebra on the audited quantities
    # lambda and W are independently 6dp-rounded, so the product
    # carries up to ~lambda*5e-7 + W*5e-7 of rounding slack
    assert abs(
        row["lambda_per_day"] * row["w_days"] - row["wip_timeavg"]
    ) <= 1e-3 * row["wip_timeavg"]
    # independent pandas replica of the direct integral
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    comp = li.assign(ship=li["l_shipdate"].dt.floor("D")).groupby("l_orderkey")[
        "ship"
    ].max()
    j = o.assign(arrive=o["o_orderdate"].dt.floor("D")).join(
        comp, on="o_orderkey", how="inner"
    )
    close = j[["ship", "arrive"]].max(axis=1)
    want = int((close - j["arrive"]).dt.days.sum())
    assert row["wip_direct"] == want
    assert row["n_orders"] == len(j)
