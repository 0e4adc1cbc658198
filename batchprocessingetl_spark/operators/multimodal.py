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


RESIZED_SCHEMA = "doc_id long, kind string, payload binary, width int, height int"

FRAME_SCHEMA = "doc_id long, frame_idx int, n_frame_bytes int, frame binary"


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: output bytes derived from the input,
    sized to the target raster (stands in for decode->resize->encode;
    see ``decode_real`` for the production seam)."""
    if not payload:
        return b""
    out_len = max(1, min(len(payload), (width * height) // 64))
    reps = out_len // len(payload) + 1
    return (payload * reps)[:out_len]


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Batch image resize over Arrow batches (1 row in -> 1 row out).
    The payload never leaves the executor; output partitioning follows
    the input, so a downstream per-image feature pass needs no shuffle."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(lambda b: resize_stub(b, width, height)),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(rz, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """Video frame sampling shape: 1 row in -> N rows out. The payload
    is chunked into fixed-size pseudo-frames and every ``every_n``-th
    frame is emitted as its own row (a real deployment decodes
    keyframes here). Row expansion happens inside the Arrow batch —
    the fan-out never crosses the Python/JVM boundary row-by-row, and
    the output row count is bounded by payload_size / (frame_bytes *
    every_n), so partition memory stays proportional to input size."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload) // frame_bytes
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frame_bytes": pd.Series([len(f) for f in frames], dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return media.mapInPandas(fs, schema=FRAME_SCHEMA)
