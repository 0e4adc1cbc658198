"""Scale probe: run the flagship scalable operators on m-times
replicated corpora and record wall times + output sizes, so scaling
behavior (linear scan ops, candidate-bounded near-dup ops, block GEMM)
is MEASURED rather than asserted. Results land in docs/SCALE.md.

Replication: each source row becomes ``m`` rows with a distinct id and
a per-replica suffix token appended to the text (so replicas are
near-duplicates — the realistic high-dup-rate crawl regime — rather
than byte-identical). Embeddings replicate as-is (ties are fine for
timing). This intentionally makes the near-dup workload QUADRATICALLY
richer in true pairs (every replica family is a clique), i.e. the
probe's pair counts grow ~m^2 by construction; the operator cost model
to check is candidates ~ pairs, not corpus^2.

Usage: python tools/scale_probe.py [m_small] [m_large] [--ops=a,b,c]
(--ops filters to a subset, e.g. --ops=knn_join_top5,bloom_incremental_dedup
to probe the flat ops at much larger m without the minhash workload.)
Prints one JSON line per (op, m) with secs and output rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessingetl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(spark: SparkSession, m: int) -> DataFrame:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            F.concat("text", F.lit(" zrep"), F.col("rep").cast("string")).alias("text"),
            "lang",
            "source",
        )
    )


def replicate_emb(spark: SparkSession, m: int) -> DataFrame:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return (
        emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
    )


def run(name: str, m: int, df: DataFrame) -> dict:
    t0 = time.time()
    n = df.count()
    rec = {"op": name, "m": m, "secs": round(time.time() - t0, 2), "out_rows": n}
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--ops="):
            only = set(a.split("=", 1)[1].split(","))
    m_small = int(args[0]) if args else 1
    m_large = int(args[1]) if len(args) > 1 else 10
    spark = get_spark("scale_probe")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm

    from batchprocessingetl_spark.operators.curation import bloom_incremental_dedup
    from batchprocessingetl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from batchprocessingetl_spark.operators.packing import pack_sequences
    from batchprocessingetl_spark.operators.similarity import knn_join
    from batchprocessingetl_spark.operators.text import exact_dedup_hashed

    def want(op: str) -> bool:
        return only is None or op in only

    results = []
    for m in (m_small, m_large):
        docs = replicate_docs(spark, m)
        emb = replicate_emb(spark, m)

        if want("exact_dedup_hashed"):
            results.append(run("exact_dedup_hashed", m, exact_dedup_hashed(docs, "text", "doc_id")))

        if want("minhash_lsh_candidates"):
            sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=32)
            results.append(run("minhash_lsh_candidates", m, lsh_candidate_pairs(sigs, bands=16)))

        if want("incremental_lsh_pairs"):
            # q124 shape: new batch (every 10th id) joins the persisted
            # band store; corpus band rows computed once, batch-only
            # signatures per increment. Replica cliques still make TRUE
            # pair counts ~m^2; cost model is candidates, not corpus^2.
            from batchprocessingetl_spark.operators.dedup import (
                band_signatures,
                incremental_lsh_pairs,
            )

            batch = docs.filter(F.col("doc_id") % 10 == 0)
            store = docs.filter(F.col("doc_id") % 10 != 0)
            store_b = band_signatures(
                minhash_signatures(store, "doc_id", "text", n_hashes=32), bands=16
            )
            batch_b = band_signatures(
                minhash_signatures(batch, "doc_id", "text", n_hashes=32), bands=16
            )
            results.append(
                run("incremental_lsh_pairs", m, incremental_lsh_pairs(batch_b, store_b))
            )

        if want("setsim_prefix_join"):
            # q126 shape: exact AllPairs/PPJoin prefix-filtered set-
            # similarity self-join at t=0.5 — output IS the exact
            # qualifying pair set, so out_rows grows ~m^2 on the
            # replica-clique corpus by construction.
            from batchprocessingetl_spark.operators.dedup import setsim_join_prefix

            results.append(
                run(
                    "setsim_prefix_join",
                    m,
                    setsim_join_prefix(docs, "doc_id", "text", n=3, threshold=0.5),
                )
            )

        if want("knn_join_top5"):
            q = emb.filter(F.col("vec_id") % 100 == 0).select(
                F.col("vec_id").alias("qid"),
                F.transform("embedding", lambda x: x.cast("double")).alias("qvec"),
            ).limit(40)
            results.append(run("knn_join_top5", m, knn_join(emb, q, 5)))

        if want("bloom_incremental_dedup"):
            new_b = docs.filter(F.col("doc_id") % 3 == 0)
            corpus = docs.filter(F.col("doc_id") % 5 != 4)
            results.append(
                run("bloom_incremental_dedup", m, bloom_incremental_dedup(new_b, corpus, "text", "doc_id"))
            )

        if want("pack_sequences"):
            toks = docs.withColumn("n_tokens", F.size(F.split("text", r"\s+")).cast("long"))
            results.append(run("pack_sequences", m, pack_sequences(toks, "doc_id", "n_tokens", 2048)))

        if want("bm25_topk_join"):
            from batchprocessingetl_spark.operators.retrieval import bm25_topk_join

            queries = spark.createDataFrame(
                [(1, ["dup", "vector"]), (2, ["scan", "filter"]), (3, ["join", "merge", "hash"])],
                "qid int, terms array<string>",
            )
            results.append(
                run("bm25_topk_join", m, bm25_topk_join(docs, queries, 10))
            )

        if want("boilerplate_spans"):
            from batchprocessingetl_spark.operators.curation import boilerplate_spans

            # replica suffixes multiply cross-doc shared spans (every
            # replica family shares its whole body) — the worst case
            # for the join-back; cost must track flagged occurrences
            results.append(
                run(
                    "boilerplate_spans",
                    m,
                    boilerplate_spans(docs, "doc_id", "text", n=4, min_docs=3),
                )
            )

    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
