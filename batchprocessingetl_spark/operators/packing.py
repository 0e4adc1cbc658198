"""Sequence packing: assign documents to fixed token-budget training
sequences (the concat-and-split sharding every pretraining pipeline
runs between curation and tokenization).

Semantics are the standard contiguous fill: documents are concatenated
in a deterministic order and the stream is cut every ``budget`` tokens;
a document's pack is the sequence its FIRST token lands in, and
``start_off`` records where in that pack it begins. The bookkeeping is
exact and engine-independent, so a SQL oracle (running-sum window)
replicates it bit-for-bit.

Plan shape: one hash shuffle on the shard id, then a per-shard window
(sort by the document key) computing the running token sum — i.e. the
whole operator is shuffle + window, no Python, no iteration. At 100 TB
the shard count bounds both sort size and skew (each shard packs
independently and shards are hash-balanced); packing quality is
unaffected by sharding because budget cuts are per-shard streams by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk_passages(
    df: DataFrame,
    key_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token-window passages (the
    retrieval-indexing chunker: embedding models cap input length, and
    overlap keeps answers that straddle a boundary findable).

    Passage i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last passage is the remainder
    (never empty, never duplicated). Pure built-ins — tokenize once
    into a bound column, then sequence/transform/slice/explode: a
    narrow generate, no shuffle, no Python. Output: one row per
    passage with (key, passage_idx, n_passage_tokens, passage).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    staged = df.select(F.col(key_col), toks.alias("__toks")).filter(F.size("__toks") > 0)
    # number of passages: ceil(max(n - overlap, 1) / stride)
    n = F.size("__toks")
    n_pass = F.ceil((F.greatest(n - F.lit(overlap), F.lit(1))) / F.lit(stride)).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.struct(
            i.cast("int").alias("passage_idx"),
            F.slice("__toks", (i * stride + 1).cast("int"), chunk_tokens).alias("__ptoks"),
        ),
    )
    return (
        staged.select(key_col, F.explode(passages).alias("p"))
        .select(
            key_col,
            F.col("p.passage_idx").alias("passage_idx"),
            F.size("p.__ptoks").alias("n_passage_tokens"),
            F.concat_ws(" ", F.col("p.__ptoks")).alias("passage"),
        )
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Annotate each row with (shard, pack_id, start_off):

    - ``shard``: pmod(xxhash64(key), n_shards) — the independent pack
      stream the document joins;
    - ``pack_id``: index of the budget-sized sequence (within the
      shard) holding the document's first token;
    - ``start_off``: token offset of the document inside that pack.

    Documents longer than ``budget`` simply span multiple sequences
    (concat-and-split semantics); callers wanting drop-or-truncate
    filter on ``tokens_col`` first. Deterministic given (key order,
    token counts) — no RNG, no partition-layout sensitivity. The shard
    hash is a 60-bit md5 prefix (not xxhash64) so any SQL engine
    reproduces the exact assignment (same scheme as
    operators/sampling.py:rank_hash and the SimHash oracle).
    """
    shard: Column = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    start = (cum - F.col(tokens_col)).cast("long")
    return out.withColumn("pack_id", (start / F.lit(budget)).cast("long")).withColumn(
        "start_off", F.pmod(start, F.lit(budget)).cast("long")
    )
