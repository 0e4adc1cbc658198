"""Round-13 additions (q369-q374): independent numpy / pure-python
replications at SF_SMOKE — a third implementation sharing no code
with either engine, pinning the MATH behind each component (the
DuckDB oracles pin cross-engine parity separately).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from batchprocessingetl_spark.workload import collect_extra_queries, collect_queries
from tests.conftest import SF_SMOKE

EXTRA = {**collect_queries(), **collect_extra_queries()}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF_SMOKE}/orders.parquet")


def test_ams_stream_estimate_matches_python_and_q345(spark):
    """q369's epoch-decomposed estimate must equal (a) a pure-python
    replay of the per-epoch fold + shared read algebra and (b) q345's
    one-shot estimate EXACTLY — linearity of the AMS sums."""
    from batchprocessingetl_spark.workload.round13_queries import (
        AMS_EPOCHS,
        AMS_ESTIMATORS,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev.dropna(subset=["user_id"])
    partials: dict[tuple[int, int], int] = {}
    for (eid, uid), grp in ev.groupby(
        [
            ev["event_id"].map(lambda e: int(_md5(f"epoch:{int(e)}")[0], 16) % AMS_EPOCHS),
            ev["user_id"].astype(int),
        ]
    ):
        c = len(grp)
        for i in range(AMS_ESTIMATORS):
            sign = 1 if int(_md5(f"ams{i}:{uid}")[0], 16) % 2 == 0 else -1
            partials[(eid, i)] = partials.get((eid, i), 0) + sign * c
    sums = [
        sum(v for (e, i), v in partials.items() if i == k)
        for k in range(AMS_ESTIMATORS)
    ]
    ests = [s * s for s in sums]
    order = sorted(range(AMS_ESTIMATORS), key=lambda j: (ests[j], j))
    f2_est = (ests[order[AMS_ESTIMATORS // 2 - 1]] + ests[order[AMS_ESTIMATORS // 2]]) / 2.0
    counts = Counter(int(u) for u in ev["user_id"])
    row = EXTRA["q369_ams_stream_estimate"](spark, SF_SMOKE).collect()[0]
    assert row["n_epochs"] == AMS_EPOCHS
    assert row["n_keys"] == len(counts)
    assert row["f2_exact"] == sum(c * c for c in counts.values())
    assert abs(row["f2_estimate"] - f2_est) <= 0.051
    q345 = EXTRA["q345_ams_f2_sketch"](spark, SF_SMOKE).collect()[0]
    assert row["f2_estimate"] == q345["f2_estimate"]  # linearity, exact


def _pav_fit(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Textbook sequential pool-adjacent-violators — the algorithm the
    q370 minimax-identity plan must agree with."""
    blocks = [[float(yi), float(wi)] for yi, wi in zip(y, w)]
    sizes = [1] * len(blocks)
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            tw = blocks[i][1] + blocks[i + 1][1]
            avg = (blocks[i][0] * blocks[i][1] + blocks[i + 1][0] * blocks[i + 1][1]) / tw
            blocks[i] = [avg, tw]
            sizes[i] += sizes[i + 1]
            del blocks[i + 1], sizes[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    out = []
    for (avg, _), sz in zip(blocks, sizes):
        out.extend([avg] * sz)
    return np.array(out)


def test_isotonic_calibration_matches_pav(spark, orders_pdf):
    from batchprocessingetl_spark.workload.round13_queries import ISO_BINS

    o = orders_pdf
    p = o["o_totalprice"] / o["o_totalprice"].max()
    y = (o["o_orderpriority"] == "1-URGENT").astype(int)
    bins = np.minimum(np.floor(p * ISO_BINS).astype(int), ISO_BINS - 1)
    df = pd.DataFrame({"bin": bins, "y": y}).groupby("bin").agg(n=("y", "size"), ny=("y", "sum"))
    acc = (df["ny"] / df["n"]).to_numpy()
    fit = _pav_fit(acc, df["n"].to_numpy())
    got = EXTRA["q370_isotonic_calibration"](spark, SF_SMOKE).toPandas()
    assert list(got["bin"]) == list(df.index)
    assert np.allclose(got["accuracy"], np.round(acc, 6), atol=1e-6)
    assert np.allclose(got["iso_fit"], fit, atol=1e-5)
    # structural: the fit is monotone nondecreasing
    assert (np.diff(got["iso_fit"]) >= -1e-9).all()


def test_gini_concentration_matches_numpy(spark, orders_pdf):
    o = orders_pdf
    amt = (
        np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5)
        .astype(np.int64)
    )
    per = pd.DataFrame({"k": o["o_custkey"], "amt": amt}).groupby("k")["amt"].sum()
    x = np.sort(per.to_numpy())
    n = len(x)
    r = np.arange(1, n + 1, dtype=np.float64)
    s = float(x.sum())
    gini = (2.0 * float((r * x).sum()) - (n + 1) * s) / (n * s)
    top10 = float(x[n - n // 10 :].sum()) / s
    top1 = float(x[n - n // 100 :].sum()) / s
    row = EXTRA["q371_gini_concentration"](spark, SF_SMOKE).collect()[0]
    assert row["n_customers"] == n
    assert row["total_cents"] == int(x.sum())
    assert abs(row["gini"] - gini) <= 1e-6
    assert abs(row["top10_share"] - top10) <= 1e-6
    assert abs(row["top1_share"] - top1) <= 1e-6
    assert 0.0 <= row["gini"] <= 1.0


def test_jl_distortion_matches_numpy(spark):
    from batchprocessingetl_spark.workload.round13_queries import (
        _JL_SIGNS,
        JL_K,
        JL_SAMPLE,
    )

    pdf = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    pdf["h"] = pdf["vec_id"].map(lambda v: _md5(str(int(v))))
    pdf = pdf.sort_values(["h", "vec_id"]).head(JL_SAMPLE)
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    sm = np.array(_JL_SIGNS, dtype=np.float64)  # (k, d)
    yy = x @ sm.T  # (n, k)
    n = len(x)
    ratios = []
    degenerate = 0
    for i in range(n):
        for j in range(i + 1, n):
            do2 = round(float(((x[i] - x[j]) ** 2).sum()), 6)
            dp2 = round(float(((yy[i] - yy[j]) ** 2).sum()), 6)
            if do2 <= 0:
                degenerate += 1
            else:
                ratios.append(round(dp2 / JL_K / do2, 6))
    row = EXTRA["q372_jl_distortion"](spark, SF_SMOKE).collect()[0]
    assert row["n_pairs"] == n * (n - 1) // 2
    assert row["n_degenerate"] == degenerate
    assert abs(row["mean_ratio"] - np.mean(ratios)) <= 1e-4
    assert abs(row["min_ratio"] - min(ratios)) <= 1e-4
    assert abs(row["max_ratio"] - max(ratios)) <= 1e-4
    within = sum(1 for r in ratios if 0.75 <= r <= 1.25) / len(ratios)
    assert abs(row["frac_within_25pct"] - within) <= 1e-5
    # JL with k=16 should concentrate: the mean ratio is ~1
    assert 0.8 <= row["mean_ratio"] <= 1.2


def test_count_min_sketch_matches_python(spark):
    """Replays the SHARED operator's hash convention (one md5 of
    'cms:'+key, row r reads hex chunk [8r, 8r+8)) — the same scheme
    operators/sketches.py::cms_build uses and q121 audits on
    user_ids; q373 runs it on the Zipf term domain."""
    from batchprocessingetl_spark.workload.round13_queries import (
        CMS_D,
        CMS_EPS,
        CMS_PROBES,
        CMS_W,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    counts: Counter = Counter()
    n_total = 0
    for t in docs["text"]:
        toks = t.split()
        counts.update(toks)
        n_total += len(toks)

    def buckets(term: str) -> list[int]:
        h = _md5(f"cms:{term}")
        return [int(h[8 * r : 8 * r + 8], 16) % CMS_W for r in range(CMS_D)]

    cells: dict[tuple[int, int], int] = {}
    for term, c in counts.items():
        for r, b in enumerate(buckets(term)):
            cells[(r, b)] = cells.get((r, b), 0) + c
    probes = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_PROBES]
    got = EXTRA["q373_count_min_sketch"](spark, SF_SMOKE).toPandas()
    assert len(got) == CMS_PROBES
    for _, row in got.iterrows():
        term, exact = row["term"], int(row["exact_cnt"])
        assert counts[term] == exact
        est = min(cells[(r, b)] for r, b in enumerate(buckets(term)))
        assert int(row["cms_est"]) == est
        # CMS never underestimates; the e/w guarantee must hold
        assert int(row["overestimate"]) >= 0
        assert bool(row["est_ok"]) == (exact <= est <= exact + CMS_EPS * n_total)
        assert bool(row["est_ok"])
    assert set(got["term"]) == {t for t, _ in probes}


def test_cms_stream_estimate_matches_python_and_unsharded(spark):
    """q374's epoch-sharded build + shared collapse must equal the
    plain unsharded sketch (linearity) — replicated in pure python by
    building the sketch WITHOUT epochs and checking the query's
    estimates against it."""
    from batchprocessingetl_spark.workload.round13_queries import (
        CMS_D,
        CMS_EPS,
        CMS_PROBES,
        CMS_W,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").dropna(subset=["user_id"])
    counts = Counter(int(u) for u in ev["user_id"])
    n_total = len(ev)

    def buckets(key: str) -> list[int]:
        h = _md5(f"cms:{key}")
        return [int(h[8 * r : 8 * r + 8], 16) % CMS_W for r in range(CMS_D)]

    cells: dict[tuple[int, int], int] = {}
    for uid, c in counts.items():
        for r, b in enumerate(buckets(str(uid))):
            cells[(r, b)] = cells.get((r, b), 0) + c
    probes = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_PROBES]
    got = EXTRA["q374_cms_stream_estimate"](spark, SF_SMOKE).toPandas()
    assert len(got) == min(CMS_PROBES, len(counts))
    assert (got["n_epochs"] == 4).all()
    for _, row in got.iterrows():
        uid, exact = int(row["user_id"]), int(row["exact_cnt"])
        assert counts[uid] == exact
        est = min(cells[(r, b)] for r, b in enumerate(buckets(str(uid))))
        assert int(row["cms_est"]) == est
        assert int(row["overestimate"]) >= 0
        assert bool(row["est_ok"]) == (exact <= est <= exact + CMS_EPS * n_total)
        assert bool(row["est_ok"])
    assert set(got["user_id"].astype(int)) == {u for u, _ in probes}
