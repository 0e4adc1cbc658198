"""Text operators and near-duplicate detection on crafted corpora."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    shingle_frame,
    simhash64,
)
from batchprocessingetl_spark.operators.text import (
    exact_dedup,
    normalize,
    tokens,
    with_quality_signals,
    with_token_stats,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
    (3, "completely different content about spark sql engines and data pipelines"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (5, ""),  # empty
    (6, "tiny doc"),  # too short for 3-shingles
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tokens_and_normalize(spark):
    df = spark.createDataFrame([(1, "  Hello   World \t x "), (2, "")], "id long, t string")
    got = df.select(
        tokens(F.col("t")).alias("toks"), normalize(F.col("t")).alias("norm")
    ).collect()
    assert got[0]["toks"] == ["Hello", "World", "x"]
    assert got[0]["norm"] == "hello world x"
    assert got[1]["toks"] == []


def test_token_stats(spark):
    out = with_token_stats(_docs(spark), "text").filter("doc_id = 6").collect()[0]
    assert out["n_tokens"] == 2 and out["n_distinct_tokens"] == 2
    assert out["avg_token_len"] == (4 + 3) / 2


def test_quality_signals_empty_safe(spark):
    out = {r["doc_id"]: r for r in with_quality_signals(_docs(spark), "text").collect()}
    assert out[5]["alpha_ratio"] is None  # no division-by-zero artifacts
    assert 0.0 < out[1]["stopword_ratio"] < 1.0


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_docs(spark), ["text"], "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2, 3, 5, 6]  # doc 4 collapsed into doc 1


def test_jaccard_finds_near_dup_pair_only(spark):
    pairs = jaccard_pairs(_docs(spark), "doc_id", "text", n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 4) in got and (1, 2) in got and (2, 4) in got
    assert all(3 not in p and 5 not in p and 6 not in p for p in got)
    exact = next(r for r in pairs if (r["id_a"], r["id_b"]) == (1, 4))
    assert exact["jaccard"] == 1.0


def test_minhash_recall_matches_exact(spark):
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(_docs(spark), "doc_id", "text", 3, 0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(_docs(spark), "doc_id", "text", 32, 16, 3, 0.5).collect()
    }
    # verification step makes precision exact; high-identity pairs must survive banding
    assert approx <= exact
    assert (1, 4) in approx


def test_minhash_signature_shape_and_determinism(spark):
    sh = shingle_frame(_docs(spark), "doc_id", "text", 3)
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(sh, "id", None, 16, 3, "sh").collect()}
    assert 5 not in sigs and 6 not in sigs  # no shingles -> no signature
    assert len(sigs[1]) == 16
    assert sigs[1] == sigs[4]  # identical docs -> identical signatures
    assert sigs[1] != sigs[3]


def test_lsh_identical_docs_always_candidates(spark):
    sh = shingle_frame(_docs(spark), "doc_id", "text", 3)
    sigs = minhash_signatures(sh, "id", None, 32, 3, "sh")
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, 16).collect()}
    assert (1, 4) in cands


def test_simhash_similar_docs_close(spark):
    got = {r["id"]: r["simhash"] for r in simhash64(_docs(spark), "doc_id", "text").collect()}
    assert got[1] == got[4]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(got[1], got[2]) < ham(got[1], got[3])


def test_language_id_and_subtokens(spark):
    from batchprocessingetl_spark.operators.text import subtoken_count, with_language_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the park with it"),
            (2, "der hund ist nicht mit der katze zu hause"),
            (3, "el perro y el gato en la casa del señor"),
            (4, "你好世界 hello"),   # CJK wins outright
            (5, "zzz qqq xxx"),                       # no profile hit -> und
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_language_id(df, "text").collect()}
    assert out[1]["predicted_lang"] == "en"
    assert out[2]["predicted_lang"] == "de"
    assert out[3]["predicted_lang"] == "es"
    assert out[4]["predicted_lang"] == "zh"
    assert out[5]["predicted_lang"] == "und"

    sub = {r["doc_id"]: r["n"] for r in df.select("doc_id", subtoken_count(F.col("text")).alias("n")).collect()}
    assert sub[5] == 3
    # "don't stop!" style segmentation: letters / punct / letters ...
    one = spark.createDataFrame([(9, "don't stop! x2")], "doc_id long, text string")
    got = one.select(subtoken_count(F.col("text")).alias("n")).collect()[0]["n"]
    assert got == 7  # don + ' + t + stop + ! + x + 2


def test_winnowing_guarantee_and_matching(spark):
    """Winnowing's core guarantee: a shared substring of length >=
    k + w - 1 produces at least one shared fingerprint."""
    from batchprocessingetl_spark.operators.fingerprint import shared_fingerprints, winnow

    shared_chunk = "identical shared passage of text here"  # 37 chars >= 8+4-1
    df = spark.createDataFrame(
        [
            (1, f"left context AAA {shared_chunk} right tail one"),
            (2, f"completely different prefix {shared_chunk} and suffix"),
            (3, "nothing in common with the others at all zzz"),
            (4, "short"),  # < k -> no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = winnow(df, "doc_id", "text", k=8, w=4)
    by_doc = {r["id"] for r in fps.select("id").distinct().collect()}
    assert 4 not in by_doc
    matches = {(r["id_a"], r["id_b"]): r["n_shared"] for r in shared_fingerprints(fps, fps).collect()}
    assert matches.get((1, 2), 0) >= 1          # guarantee holds
    assert (1, 3) not in matches and (2, 3) not in matches


def test_winnowing_position_shift_invariance(spark):
    """Fingerprint hashes of a shared chunk are identical regardless of
    where the chunk sits in the document (local fingerprinting)."""
    from batchprocessingetl_spark.operators.fingerprint import winnow

    chunk = "the exact same long shared span of characters"
    df = spark.createDataFrame(
        [(1, chunk), (2, "x" * 50 + chunk)], "doc_id long, text string"
    )
    fps = winnow(df, "doc_id", "text", k=8, w=4)
    h1 = {r["fp"] for r in fps.filter("id = 1").collect()}
    h2 = {r["fp"] for r in fps.filter("id = 2").collect()}
    assert h1 & h2  # chunk fingerprints survive the 50-char shift


def test_content_hash_is_md5(spark):
    out = (
        exact_dedup(_docs(spark), ["text"], "doc_id")
        .withColumn("h", F.md5("text"))
        .filter("doc_id = 1")
        .collect()[0]
    )
    assert out["h"] == hashlib.md5(DOCS[0][1].encode()).hexdigest()


def test_simhash60_md5_oracle_independent_and_pairs(spark):
    from batchprocessingetl_spark.operators.dedup import simhash60_md5, simhash_near_pairs

    sigs_df = simhash60_md5(_docs(spark), "doc_id", "text")
    got = {r["id"]: r["simhash"] for r in sigs_df.collect()}
    # doc 5 is empty -> no signature; all others present
    assert set(got) == {1, 2, 3, 4, 6}
    # exact dup -> identical signature; near-dup closer than unrelated
    assert got[1] == got[4]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(got[1], got[2]) < ham(got[1], got[3])
    # signature reproducible from first principles (md5-prefix hashes)
    def ref_sig(text):
        toks = sorted(set(text.split()))
        sums = [0] * 60
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for k in range(60):
                sums[k] += 1 if (h >> k) & 1 else -1
        return sum(1 << k for k in range(60) if sums[k] > 0)

    assert got[1] == ref_sig(DOCS[0][1])
    assert got[3] == ref_sig(DOCS[2][1])
    # banded pair mining: dup pair at hamming 0; (1,2) iff within 3 bits
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(sigs_df).collect()}
    assert pairs[(1, 4)] == 0
    assert ((1, 2) in pairs) == (ham(got[1], got[2]) <= 3)
    # exactness: banded candidates == brute force at this threshold
    ids = sorted(got)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(got[a], got[b]) <= 3
    }
    assert set(pairs) == brute


def test_salted_join_matches_plain_join(spark):
    from batchprocessingetl_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(k, v) for k in ("hot", "hot", "hot", "hot", "cold") for v in (1, 2)],
        "k string, v long",
    )
    small = spark.createDataFrame([("hot", 10), ("cold", 20), ("orphan", 30)], "k string, w long")
    got = sorted(
        (r["k"], r["v"], r["w"]) for r in salted_join(big, small, ["k"], salt_buckets=4).collect()
    )
    want = sorted((r["k"], r["v"], r["w"]) for r in big.join(small, "k").collect())
    assert got == want


def test_connected_components_chains_and_singletons(spark):
    from batchprocessingetl_spark.operators.dedup import connected_components

    # components: {1,2,3,4} via a chain, {5,6}, singleton {7}
    pairs = spark.createDataFrame(
        [(3, 4), (2, 3), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs, verts).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}
    # empty pair set: everything is its own cluster
    none = spark.createDataFrame([], "id_a long, id_b long")
    solo = {r["id"]: r["cluster_id"] for r in connected_components(none, verts).collect()}
    assert solo == {i: i for i in range(1, 8)}


def test_build_vocab_dense_deterministic_ids(spark):
    from batchprocessingetl_spark.operators.text import build_vocab

    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c c")], "id long, text string"
    )
    rows = {r["term"]: r for r in build_vocab(df, "text").collect()}
    # counts: a=3, b=3, c=3 -> all tied, ids by term ASC
    assert [rows[t]["term_id"] for t in ("a", "b", "c")] == [0, 1, 2]
    capped = build_vocab(df, "text", max_terms=2)
    assert capped.count() == 2
    top = build_vocab(df, "text", min_count=4)
    assert top.count() == 0


def test_cooccurrence_window_semantics(spark):
    from batchprocessingetl_spark.operators.text import cooccurrence_counts

    df = spark.createDataFrame([(1, "x y z"), (2, "x z")], "id long, text string")
    got = {
        (r["a"], r["b"]): r["n_cooc"]
        for r in cooccurrence_counts(df, "id", "text", window=2).collect()
    }
    # doc1: (x,y) d1, (x,z) d2, (y,z) d1; doc2: (x,z) d1 -> (x,z) total 2
    assert got == {("x", "y"): 1, ("x", "z"): 2, ("y", "z"): 1}
    one = {
        (r["a"], r["b"]): r["n_cooc"]
        for r in cooccurrence_counts(df, "id", "text", window=1).collect()
    }
    assert one == {("x", "y"): 1, ("y", "z"): 1, ("x", "z"): 1}


def test_fuzzy_name_pairs_semantics(spark):
    from batchprocessingetl_spark.operators.dedup import fuzzy_name_pairs

    rows = [
        (1, "acme corp"),
        (2, "acme corps"),   # dist 1, same prefix -> pair
        (3, "acme corporation"),  # dist > 1 -> no pair
        (4, "zcme corp"),    # dist 1 but edit in prefix -> blocked out
        (5, "acme corp"),    # exact dup -> dist 0 pair with 1 and 2
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_name_pairs(df, "id", "name", max_dist=1).collect()
    )
    assert got == [(1, 2, 1), (1, 5, 0), (2, 5, 1)]


def test_fuzzy_name_pairs_composite_key_in_plan(spark):
    """VERDICT r3 #2: the length band must be part of the equi-join
    KEY (composite blocking), not a post-join filter — the physical
    plan's hash join keys must include both the prefix and a length
    column, and max_dist=0 must not explode at all."""
    from batchprocessingetl_spark.catalog import load_table
    from batchprocessingetl_spark.operators.dedup import fuzzy_name_pairs
    from tests.conftest import SF_SMOKE

    part = load_table(spark, SF_SMOKE, "part")
    out = fuzzy_name_pairs(part, "p_partkey", "p_name", max_dist=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_lines = [ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln]
    assert join_lines, plan
    assert all("__pfx" in ln and "__len" in ln for ln in join_lines), join_lines

    # identical result to the unbanded reference formulation
    import pyspark.sql.functions as F

    s = part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.substring("p_name", 1, 2).alias("__pfx"),
        F.length("p_name").alias("__len"),
    )
    a, b = s.alias("a"), s.alias("b")
    ref = a.join(
        b,
        (F.col("a.__pfx") == F.col("b.__pfx"))
        & (F.abs(F.col("a.__len") - F.col("b.__len")) <= 1)
        & (F.col("a.id") < F.col("b.id"))
        & (F.levenshtein(F.col("a.name"), F.col("b.name")) <= 1),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    got = {(r["id_a"], r["id_b"]) for r in out.select("id_a", "id_b").collect()}
    want = {(r["id_a"], r["id_b"]) for r in ref.collect()}
    assert got == want
    # no duplicate pairs from the band explode
    assert out.count() == len(got)


def test_bigram_structs_edge_cases(spark):
    from batchprocessingetl_spark.operators.text import bigram_structs

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "")], "id long, t string"
    )
    got = {r["id"]: r["bg"] for r in df.select("id", bigram_structs(F.col("t")).alias("bg")).collect()}
    assert [(p["a"], p["b"]) for p in got[1]] == [("a", "b"), ("b", "c")]
    assert got[2] == [] and got[3] == []


def test_lm_quality_scores_hand_computed(spark):
    import math

    from batchprocessingetl_spark.operators.text import lm_quality_scores

    # corpus: bigrams (a,b):3, (b,a):1; ctx a->3, b->1; V = |{a,b,x}| = 3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_quality_scores(df, "doc_id", "text").collect()}
    nll_ab = round(-math.log((3 + 0.5) / (3 + 0.5 * 3)), 7)
    nll_ba = round(-math.log((1 + 0.5) / (1 + 0.5 * 3)), 7)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_nll"] == round((2 * nll_ab + nll_ba) / 3, 6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_nll"] == round(nll_ab, 6)
    # sub-bigram docs: present with zero bigrams and NULL score
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_nll"] is None
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_nll"] is None


def test_shard_overlap_minhash_exact_and_estimate(spark):
    from batchprocessingetl_spark.operators.dedup import shard_overlap_minhash

    # shard A and B share exactly half their shingles; C is disjoint
    rows = [
        ("A", "w1 w2 w3 w4"),   # shingles: {w1 w2 w3, w2 w3 w4}
        ("B", "w1 w2 w3"),      # shingles: {w1 w2 w3}
        ("C", "x1 x2 x3"),      # shingles: {x1 x2 x3}
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in shard_overlap_minhash(df, "source", "text", n_hashes=64).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab["n_common"] == 1 and ab["jaccard_exact"] == 0.5
    # disjoint shards: exact 0, and the estimator must agree within bound
    assert out[("A", "C")]["n_common"] == 0
    assert out[("A", "C")]["jaccard_exact"] == 0.0
    assert all(r["est_ok"] for r in out.values())


def test_shard_overlap_join_fallback_matches_bitmap_plan(spark):
    from batchprocessingetl_spark.operators.dedup import shard_overlap_minhash

    rows = [
        ("A", "w1 w2 w3 w4"),
        ("A", "z1 z2 z3"),
        ("B", "w1 w2 w3"),
        ("B", "z1 z2 z3 z4"),
        ("C", "x1 x2 x3"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")

    def rows_of(out):
        return sorted(
            (r["group_a"], r["group_b"], r["n_common"], r["jaccard_exact"], r["est_ok"])
            for r in out.collect()
        )

    bitmap = rows_of(shard_overlap_minhash(df, "source", "text", n_hashes=64))
    joined = rows_of(
        shard_overlap_minhash(df, "source", "text", n_hashes=64, bitmap_max_shards=0)
    )
    assert bitmap == joined


def test_phrase_count_semantics(spark):
    from pyspark.sql import functions as F

    from batchprocessingetl_spark.operators.text import phrase_count, tokens

    rows = [
        (1, "a b a b a"),     # "a b" twice, overlapping "a b a" twice
        (2, "a"),             # shorter than the phrase
        (3, ""),              # empty
        (4, "b a b"),         # "a b" once
    ]
    df = spark.createDataFrame(rows, "id long, text string").select(
        "id", tokens(F.col("text")).alias("toks")
    )
    got = {
        r["id"]: (r["ab"], r["aba"])
        for r in df.select(
            "id",
            phrase_count(F.col("toks"), ("a", "b")).alias("ab"),
            phrase_count(F.col("toks"), ("a", "b", "a")).alias("aba"),
        ).collect()
    }
    assert got == {1: (2, 2), 2: (0, 0), 3: (0, 0), 4: (1, 0)}


def test_phrase_hits_single_scan_no_shuffle(spark):
    from batchprocessingetl_spark.operators.text import phrase_hits

    df = spark.createDataFrame([(1, "x y z"), (2, "y z y z")], "doc_id long, text string")
    out = phrase_hits(df, "doc_id", "text", {"y z": ("y", "z")})
    got = {(r["id"], r["phrase"]): r["n_occ"] for r in out.collect()}
    assert got == {(1, "y z"): 1, (2, "y z"): 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_leakage_free_split_keeps_clusters_together(spark):
    from pyspark.sql import functions as F

    from batchprocessingetl_spark.workload.textops import q118_leakage_free_split

    out = q118_leakage_free_split(spark, "/root/testdata/sf0.001")
    # every cluster maps to exactly one split value
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    # both splits are populated on this corpus
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "holdout"}


def test_connected_components_reliable_checkpoint_parity(spark, tmp_path):
    """Reliable-barrier mode (checkpoint_dir) must produce the exact
    label set of the default localCheckpoint mode, on a chain long
    enough to force several propagation rounds."""
    from batchprocessingetl_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(9)]  # diameter 9 -> multi-round
    pairs = spark.createDataFrame(chain + [(20, 21)], "id_a long, id_b long")
    verts = spark.createDataFrame(
        [(i,) for i in range(10)] + [(20,), (21,), (30,)], "id long"
    )
    plain = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs, verts).collect()
    }
    reliable = {
        (r["id"], r["cluster_id"])
        for r in connected_components(
            pairs, verts, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert plain == reliable
    assert {c for _, c in plain} == {0, 20, 30}  # chain, pair, singleton
    assert any((tmp_path / "cc").rglob("*")), "no reliable checkpoint written"


def test_incremental_lsh_union_equals_full_recompute(spark):
    """The incremental protocol's defining invariant: per-batch
    incremental candidate pairs, unioned across batches, equal the
    full-corpus self-join candidate set (every pair is emitted by its
    later-arriving member's batch)."""
    from batchprocessingetl_spark.operators.dedup import (
        band_signatures,
        incremental_lsh_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(30):
        words = base.split()
        words[i % len(words)] = f"w{i % 5}"  # 5 near-dup families
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(docs, "doc_id", "text", n_hashes=16, n=3), bands=8
        ).collect()
    }
    assert full  # fixture produces candidates

    got = set()
    store = None
    for b in range(3):  # arrival order: batch 0, then 1, then 2
        batch = band_signatures(
            minhash_signatures(
                docs.filter(F.col("doc_id") % 3 == b), "doc_id", "text",
                n_hashes=16, n=3,
            ),
            bands=8,
        )
        if store is None:
            empty = batch.filter(F.lit(False))
            inc = incremental_lsh_pairs(batch, empty)
        else:
            inc = incremental_lsh_pairs(batch, store)
        got |= {(r["id_a"], r["id_b"]) for r in inc.collect()}
        store = batch if store is None else store.unionByName(batch)
    assert got == full


def test_setsim_prefix_join_lossless_and_prunes(spark):
    """Prefix filtering must return EXACTLY jaccard_pairs' answer at
    every threshold, from a strictly smaller posting table."""
    from batchprocessingetl_spark.operators.dedup import (
        jaccard_pairs,
        setsim_join_prefix,
        shingle_frame,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base.replace(base.split()[i % 10], f"x{i % 4}")) for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for t in (0.2, 0.4, 0.7):
        full = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=t).collect()
        }
        pref = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in setsim_join_prefix(docs, "doc_id", "text", n=3, threshold=t).collect()
        }
        assert pref == full, f"threshold {t}"
    assert full is not None and len(pref) >= 0

    # the posting cut is real: prefix length < full shingle count
    sh = shingle_frame(docs, "doc_id", "text", 3)
    n_full = sh.select(F.explode("sh")).count()
    import math
    n_prefix = sum(
        len(r["sh"]) - math.ceil(0.7 * len(r["sh"])) + 1 for r in sh.collect()
    )
    assert n_prefix < n_full * 0.5  # t=0.7 drops >half the postings

    with pytest.raises(ValueError):
        setsim_join_prefix(docs, "doc_id", "text", threshold=0.0)


# --- Iterated BPE merge training (q182, VERDICT r5 #4) ---------------


def test_bpe_train_merges_matches_python_replay(spark):
    """The k-round Spark loop must reproduce the pure-Python greedy
    replay on the same seg-string semantics — including self-merge
    chains ('aaaa' merges pairwise, never overlapping) and count ties
    broken by (left, right)."""
    from batchprocessingetl_spark.operators.text import (
        bpe_train_merges,
        bpe_train_merges_python,
    )

    words = [
        ("low", 5),
        ("lower", 2),
        ("newest", 6),
        ("widest", 3),
        ("aaaa", 4),  # overlapping self-pair: greedy yields [aa, aa]
        ("banana", 2),  # 'an' twice per word, non-overlapping
        ("a", 9),  # length-1 words contribute no pairs
    ]
    df = spark.createDataFrame(words, "w string, wc long")
    got = [tuple(r) for r in bpe_train_merges(df, 8).collect()]
    want = bpe_train_merges_python(words, 8)
    assert got == want
    # the candidate COUNT is overlapping-adjacent (standard BPE
    # get_stats): 'aaaa' contributes 3 (a,a) pairs * wc 4 = 12 — while
    # the REPLACE application is non-overlapping greedy ([aa, aa])
    aa = [m for m in want if m[1] == "a" and m[2] == "a"]
    assert aa and aa[0][4] == 12


def test_bpe_merge_consumes_shared_boundary_pairs(spark):
    """Consecutive occurrences of the merge pair share a boundary in
    the seg string; both must merge in one pass ('abab' -> [ab, ab])."""
    from batchprocessingetl_spark.operators.text import (
        bpe_train_merges,
        bpe_train_merges_python,
    )

    words = [("abab", 3), ("ab", 5)]
    df = spark.createDataFrame(words, "w string, wc long")
    got = [tuple(r) for r in bpe_train_merges(df, 3).collect()]
    want = bpe_train_merges_python(words, 3)
    assert got == want
    # round 1 merges (a,b) with 3*2 + 5*1 = 11 occurrences; round 2
    # then merges the two adjacent 'ab' tokens inside 'abab'
    assert got[0][1:] == ("a", "b", "ab", 11)
    assert got[1][1:] == ("ab", "ab", "abab", 3)
