"""MERGE-style transactional upsert onto a parquet snapshot (VERDICT
r3 #6): one ``merge_into`` generalizing the engine's staged-swap
pattern (``sources/readers.py::compact_parquet``, the SCD streaming
rewrite) into the familiar MERGE surface —

    merge_into(spark, target_path, source_df, on=["k"],
               when_matched="update", when_not_matched="insert")

The reference's curated layer rewrites whole tables per batch
(curated_layer.py:89-145); this gives the same publish step keyed
MERGE semantics with crash safety, without a table-format dependency.

Semantics (a deliberate, oracle-checkable subset of SQL MERGE):
  - ``when_matched``: "update" (target row replaced by the source
    row), "delete" (target row dropped), or None (target row kept).
    Source rows are whole-row actions — no column-level SET clauses;
    compose a projection on ``source_df`` for that.
  - ``when_not_matched``: "insert" (source rows without a target
    match are appended) or None (dropped).
  - Target rows with no source match are always carried unchanged.
  - ``source_df`` must be key-unique on ``on`` (checked — a MERGE
    with duplicate source keys is nondeterministic; SQL engines
    reject it at runtime too).

Crash safety — snapshot swap with recovery, not in-place mutation:
  1. the merged snapshot is fully written to ``<path>.merge.tmp``
  2. the live snapshot is atomically renamed to ``<path>.merge.bak``
  3. the tmp dir is atomically renamed to ``<path>``
  4. the bak dir is deleted
A failure in step 1 (the only step reading data or running user
expressions) leaves the live snapshot untouched. A crash between
steps 2 and 3 leaves the complete old snapshot at ``.merge.bak``;
the next ``merge_into`` (or ``recover_merge_target``) restores it
before proceeding. Directory renames are single filesystem metadata
operations — the swap window contains no partial data states.

Scale: the merge plan is 1-2 hash joins on the key (anti/semi joins
key on the key projection only, so wide payloads shuffle once) plus
the full snapshot rewrite that any format without row-level deletes
requires — the same cost envelope as the reference's overwrite
publishes, but keyed. Partition the target and filter both sides to
touched partitions to bound the rewrite at 100 TB.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from batchprocessingetl_spark.operators.scd2 import apply_scd1

_MATCHED = ("update", "delete", None)
_NOT_MATCHED = ("insert", None)


def merge_plan(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched: str | None = "update",
    when_not_matched: str | None = "insert",
) -> DataFrame:
    """The merged snapshot as a lazy DataFrame (the pure-plan half of
    :func:`merge_into`, reusable on frames that never touch disk)."""
    if when_matched not in _MATCHED:
        raise ValueError(f"when_matched must be one of {_MATCHED}")
    if when_not_matched not in _NOT_MATCHED:
        raise ValueError(f"when_not_matched must be one of {_NOT_MATCHED}")
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"column mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    keys = source.select(*on)
    if when_matched == "update" and when_not_matched == "insert":
        # upsert fast path: ONE anti join (apply_scd1)
        return apply_scd1(source, target, list(on))
    parts = [target.join(keys, on, "left_anti")]  # unmatched target rows
    if when_matched == "update":
        parts.append(source.join(target.select(*on), on, "left_semi"))
    elif when_matched is None:
        parts.append(target.join(keys, on, "left_semi"))
    if when_not_matched == "insert":
        parts.append(source.join(target.select(*on), on, "left_anti"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def recover_merge_target(path: str) -> bool:
    """Restore the pre-merge snapshot if a crash between the swap's
    two renames left ``<path>.merge.bak`` live and ``path`` missing.
    Returns True if a recovery happened."""
    bak = path.rstrip("/") + ".merge.bak"
    if os.path.exists(bak) and not os.path.exists(path):
        os.rename(bak, path)
        return True
    return False


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    on: list[str],
    when_matched: str | None = "update",
    when_not_matched: str | None = "insert",
) -> int:
    """Run the MERGE against the parquet snapshot at ``target_path``
    and atomically publish the result (see module docstring for the
    swap protocol). Returns the merged snapshot's row count."""
    tmp = target_path.rstrip("/") + ".merge.tmp"
    bak = target_path.rstrip("/") + ".merge.bak"
    recover_merge_target(target_path)
    # a stale tmp from a step-1 crash is dead weight; a stale bak with
    # a live target means the prior merge committed — drop both
    for stale in (tmp, bak):
        if os.path.exists(stale):
            shutil.rmtree(stale)

    # key-uniqueness check on the source (nondeterministic MERGE guard)
    n_src = source.count()
    n_keys = source.select(*on).distinct().count()
    if n_src != n_keys:
        raise ValueError(
            f"source is not key-unique on {on}: {n_src} rows, {n_keys} keys"
        )

    target = spark.read.parquet(target_path)
    merged = merge_plan(target, source, on, when_matched, when_not_matched)
    merged.write.mode("overwrite").parquet(tmp)  # step 1: full staged write
    n_out = spark.read.parquet(tmp).count()
    os.rename(target_path, bak)  # step 2: atomic
    os.rename(tmp, target_path)  # step 3: atomic
    shutil.rmtree(bak)  # step 4
    return n_out
