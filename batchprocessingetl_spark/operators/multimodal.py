"""Multimodal column plumbing (north-star extension).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, the standard lakehouse layout for multimodal
training data. The Spark-side plumbing (schema, batch iteration, Arrow
transfer, partition sizing) is real and tested; the actual media
decoding is STUBBED — the image/audio libraries are not in this
container — behind ``decode_stub`` (deterministic fake) and
``decode_real`` (NotImplementedError), with the seam clearly marked.

Scale notes: payloads ride ``mapInPandas`` (Arrow batches), so bytes
never materialize as Python lists row-by-row; decode parallelism ==
partition count, so size input partitions to ~128 MB of payload
(``spark.sql.files.maxPartitionBytes``) to bound executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_FIELDS = "kind string, width int, height int, sample_rate int, n_frames int"

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, content_hash string, feature array<float>"
)


def as_media_frame(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Normalize to the canonical media layout:
    (doc_id, kind, payload binary, meta struct)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.named_struct(
            F.lit("n_bytes"), F.octet_length(F.col(payload_col).cast("binary")).cast("long"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str) -> dict:
    """The production decode seam (PIL/libav/ffmpeg). Not available in
    this environment by design — see module docstring."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; wire PIL/torchaudio here in a real deployment"
    )


def decode_stub(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake 'feature extraction': bytes -> fixed-dim
    float vector via a rolling byte hash. Stands in for an image/audio
    encoder so the distributed plumbing is exercised end-to-end."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 1_000_003
    return [v / 1_000_003.0 for v in acc]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Feature extraction over Arrow batches with ``mapInPandas``.

    Per batch: payload bytes -> (n_bytes, md5 content hash, stub
    feature vector). The UDF sees pandas Series of bytes — zero
    per-row Python call overhead beyond the decode itself, which is
    the irreducible cost once a real decoder is wired in."""
    import hashlib

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": payloads.map(lambda b: decode_stub(b, "stub")),
                }
            )

    return media.mapInPandas(fe, schema=FEATURE_SCHEMA)
