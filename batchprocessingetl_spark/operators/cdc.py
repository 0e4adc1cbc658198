"""CDC changelog application — latest-version-wins snapshot compaction.

The reference's incremental raw layer replays row batches and relies on
downstream overwrite (``/root/reference/src/raw/raw_layer.py:142-153``,
``src/curated/curated_layer.py:89-145``); a real change-data-capture
feed instead delivers an *operation log* (insert/update/delete rows
tagged with a monotonically increasing version) that must be compacted
into the current snapshot. This module implements that compaction as a
single aggregation — the missing primitive between the reference's
append-only raw layer and its SCD merges.

Semantics (Debezium/Delta-CDF-style):

- for each key, the row with the highest ``version_col`` wins;
- version ties break deterministically by the ordering of the payload
  struct (total order, so reruns over reshuffled partitions agree);
- a winning ``delete_op`` row erases the key from the snapshot;
- out-of-order delivery is irrelevant — the aggregate is commutative.

Plan shape / scale: ONE aggregation on the key (map-side
``partial_max`` of a (version, payload) struct, then the final merge)
followed by a narrow filter — no window, no join, no driver collect.
Struct-max lowers to SortAggregate (structs aren't hash-agg buffer
types), which sorts each partition by the GROUP KEY only; a
``row_number`` window would additionally sort by version within every
key-group AND materialize all rows through the window. The partial
aggregate shrinks each map partition to one row per key before the
shuffle, so at 100 TB the exchange carries ~|keys| rows, not |log|. Late-arriving increments
compact with the same operator by unioning the prior snapshot (as
op='I', version=snapshot_version) with the new changelog slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_changelog(
    changelog: DataFrame,
    keys: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Winning row per key INCLUDING winning deletes — the closed form
    an incremental compactor persists as state: compacting (state ∪
    new slice) with this same function is associative, so deletes keep
    shadowing lower-versioned re-deliveries across restarts. Columns
    come back in the input's (keys, version, op, payload) order."""
    payload = [
        c for c in changelog.columns if c not in (*keys, version_col, op_col)
    ]
    # Lexicographic struct max: version first, then op/payload as the
    # deterministic tie-break. One aggregate, no window sort.
    winner = F.max(
        F.struct(
            F.col(version_col).alias("v"),
            F.col(op_col).alias("o"),
            F.struct(*[F.col(c) for c in payload]).alias("p"),
        )
    ).alias("w")
    out = changelog.groupBy(*[F.col(k) for k in keys]).agg(winner)
    return out.select(
        *keys,
        F.col("w.v").alias(version_col),
        F.col("w.o").alias(op_col),
        *[F.col(f"w.p.{c}").alias(c) for c in payload],
    )


def apply_changelog(
    changelog: DataFrame,
    keys: list[str],
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact an I/U/D operation log into the current snapshot.

    ``changelog`` columns = keys + [version_col, op_col] + payload.
    Returns keys + payload for every key whose latest operation is not
    a delete. Payload column order is preserved.
    """
    out = compact_changelog(changelog, keys, version_col, op_col)
    return out.filter(F.col(op_col) != F.lit(delete_op)).drop(
        version_col, op_col
    )
