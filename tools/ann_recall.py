"""Measured ANN recall curves (VERDICT r3 #5): recall@k of the IVF and
sign-LSH approximate kNN operators against the exact brute-force
baseline (q50's cosine_topk), across nprobe / plane-count settings, at
two scale factors.

Prints a markdown table for docs/SCALE.md. Recall here is a DATA
property as much as an operator property — the fixture embeddings are
near-uniform random unit vectors, the hardest case for space
partitioning (no cluster structure to exploit), so these numbers are a
floor for real embedding corpora, not a ceiling.

Usage: python tools/ann_recall.py [sf_dir ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from batchprocessingetl_spark.catalog import load_table
from batchprocessingetl_spark.operators import similarity as S
from batchprocessingetl_spark.session import get_spark

K = 10
N_QUERIES = 10
IVF_CELLS = 16
IVF_SEED = 42
NPROBES = (1, 2, 4, 8, 16)
PLANE_SETTINGS = ((4, 0), (4, 1), (8, 0), (8, 1))  # (n_planes, multiprobe)


def exact_topk_sets(spark, emb, query_ids, corpus) -> dict[int, set[int]]:
    """Exact per-query top-K id sets via the batch knn_join operator."""
    queries = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), S.as_double(F.col("embedding")).alias("qvec")
    )
    rows = S.knn_join(corpus, queries, K).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def planes_from(emb, n: int) -> list[list[float]]:
    rows = (
        emb.filter(F.col("vec_id").isin(list(range(1, n + 1))))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def one_query_df(emb, qid):
    return emb.filter(F.col("vec_id") == qid).select(
        S.as_double(F.col("embedding")).alias("qvec")
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("ann_recall")
    print("| sf | method | setting | scan fraction | mean recall@10 |")
    print("|---|---|---|---|---|")
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        emb = load_table(spark, sf_dir, "embeddings")
        n_total = emb.count()
        query_ids = list(range(N_QUERIES))
        corpus = emb.filter(~F.col("vec_id").isin(query_ids))
        exact = exact_topk_sets(spark, emb, query_ids, corpus)

        model = S.learn_ivf_centroids(corpus, k=IVF_CELLS, seed=IVF_SEED, max_iter=6)
        for nprobe in NPROBES:
            hits = 0
            for qid in query_ids:
                got = {
                    r["vec_id"]
                    for r in S.ivf_topk(
                        corpus, one_query_df(emb, qid), model, K, nprobe=nprobe
                    ).collect()
                }
                hits += len(got & exact[qid])
            rec = hits / (K * len(query_ids))
            print(
                f"| {sf} | IVF (16 cells) | nprobe={nprobe} |"
                f" {nprobe / IVF_CELLS:.2f} | {rec:.2f} |"
            )

        # IVF + int8 two-phase composite (VERDICT r4 #5): scan fraction
        # is FLOAT-EQUIVALENT bytes — int8 rows cost 1/8 of a float64
        # row — plus the exact re-rank's short list.
        for nprobe in NPROBES:
            hits = 0
            for qid in query_ids:
                got = {
                    r["vec_id"]
                    for r in S.ivf_topk_int8(
                        corpus, one_query_df(emb, qid), model, K,
                        nprobe=nprobe, rerank=4,
                    ).collect()
                }
                hits += len(got & exact[qid])
            rec = hits / (K * len(query_ids))
            frac = (nprobe / IVF_CELLS) / 8 + (4 * K) / n_total
            print(
                f"| {sf} | IVF+int8 rerank (16 cells) | nprobe={nprobe} |"
                f" {frac:.3f} | {rec:.2f} |"
            )

        for n_planes, multiprobe in PLANE_SETTINGS:
            planes = planes_from(emb, n_planes)
            lsh_corpus = corpus.filter(~F.col("vec_id").isin(list(range(1, n_planes + 1))))
            # measured scan fraction: candidates the bucket filter admits
            bucketed = lsh_corpus.withColumn(
                "__bucket", S.lsh_bucket(S.as_double(F.col("embedding")), planes)
            )
            n_corpus = lsh_corpus.count()
            hits = 0
            cand = 0
            for qid in query_ids:
                got = {
                    r["vec_id"]
                    for r in S.cosine_topk_lsh(
                        lsh_corpus,
                        one_query_df(emb, qid),
                        planes,
                        K,
                        multiprobe=multiprobe,
                    ).collect()
                }
                hits += len(got & exact[qid])
                qrow = (
                    one_query_df(emb, qid)
                    .select(S.lsh_bucket(F.col("qvec"), planes).alias("b"))
                    .first()
                )
                probe_buckets = {qrow["b"]}
                if multiprobe:
                    probe_buckets |= {qrow["b"] ^ (1 << i) for i in range(n_planes)}
                cand += bucketed.filter(
                    F.col("__bucket").isin(list(probe_buckets))
                ).count()
            rec = hits / (K * len(query_ids))
            frac = cand / (n_corpus * len(query_ids))
            print(
                f"| {sf} | sign-LSH | planes={n_planes}, multiprobe={multiprobe} |"
                f" {frac:.2f} | {rec:.2f} |"
            )
        print(f"| {sf} | exact (q50) | brute force | 1.00 | 1.00 |")


if __name__ == "__main__":
    main()
