"""Embedding similarity operators + multimodal plumbing + streaming."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from batchprocessingetl_spark.operators.multimodal import as_media_frame, decode_stub, extract_features
from batchprocessingetl_spark.operators.similarity import cosine, cosine_topk, cosine_topk_lsh


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # closest to query
        (2, [0.0, 1.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0], 1),  # antipodal
        (4, [0.7, 0.7, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _query(spark):
    return _emb(spark).filter("vec_id = 0").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qvec")
    )


def test_cosine_matches_math(spark):
    df = _emb(spark).crossJoin(F.broadcast(_query(spark)))
    got = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id",
            cosine(F.transform("embedding", lambda x: x.cast("double")), F.col("qvec")).alias("c"),
        ).collect()
    }
    # embeddings are stored float32; compare at float32 precision
    assert abs(got[1] - 0.9 / math.sqrt(0.82)) < 1e-6
    assert got[3] == -1.0
    assert abs(got[4] - 0.7 / math.sqrt(0.98)) < 1e-6


def test_topk_order_and_k(spark):
    out = cosine_topk(_emb(spark).filter("vec_id != 0"), _query(spark), 2)
    got = [r["vec_id"] for r in out.collect()]
    assert got == [1, 4]


def test_lsh_topk_subset_of_bucket(spark):
    planes = [[1.0, 0.0, 0.0]]
    out = cosine_topk_lsh(_emb(spark).filter("vec_id != 0"), _query(spark), planes, 5)
    got = {r["vec_id"] for r in out.collect()}
    # query bucket = positive-x half-space: vecs 1 and 4 only (2 is on
    # the plane -> bit 0; 3 is antipodal)
    assert got == {1, 4}


def test_asof_join_backward(spark):
    import datetime as dt
    from batchprocessingetl_spark.operators.asof import asof_join_backward
    from pyspark.sql import Row

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [Row(id=1, k="u", ts=t(10)), Row(id=2, k="u", ts=t(5)), Row(id=3, k="v", ts=t(1))]
    )
    right = spark.createDataFrame(
        [Row(k="u", ts=t(4), tag="early"), Row(k="u", ts=t(10), tag="tie"), Row(k="w", ts=t(0), tag="other")]
    )
    out = {r["id"]: r for r in asof_join_backward(left, right, ["k"], "ts", "ts", ["tag"]).collect()}
    assert out[1]["tag"] == "tie"        # equal ts matches (inclusive)
    assert out[2]["tag"] == "early"      # latest ts <= 5
    assert out[3]["tag"] is None and out[3]["matched_ts"] is None  # no match -> NULL


def test_asof_join_no_cross_row_attribute_mixing(spark):
    # The matched (latest) right row has a NULL attribute: the output
    # must carry that NULL, not backfill it from an older right row
    # (per-column independent fills would mix attributes of two rows).
    import datetime as dt
    from batchprocessingetl_spark.operators.asof import asof_join_backward
    from pyspark.sql import Row

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame([Row(id=1, k="u", ts=t(9))])
    right = spark.createDataFrame(
        [
            Row(k="u", ts=t(4), tag="early", src="a"),
            Row(k="u", ts=t(8), tag=None, src="b"),
        ]
    )
    out = asof_join_backward(left, right, ["k"], "ts", "ts", ["tag", "src"]).first()
    assert out["matched_ts"] == t(8)
    assert out["src"] == "b"
    assert out["tag"] is None  # NOT "early"


def test_range_join_bands(spark):
    from batchprocessingetl_spark.operators.asof import range_join_broadcast
    from pyspark.sql import Row

    facts = spark.createDataFrame([Row(id=1, value=5.0), Row(id=2, value=25.0), Row(id=3, value=-1.0)])
    bands = spark.createDataFrame(
        [("lo", 0.0, 25.0), ("hi", 25.0, 100.0)], "band string, lo double, hi double"
    )
    out = {r["id"]: r["band"] for r in range_join_broadcast(facts, bands, "value").collect()}
    assert out == {1: "lo", 2: "hi", 3: None}  # hi-exclusive lo-inclusive; no band -> NULL


def test_ivf_topk_exact_when_probing_all_cells(spark):
    from batchprocessingetl_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        learn_ivf_centroids,
    )

    base = _emb(spark).filter("vec_id != 0")
    model = learn_ivf_centroids(base, k=2, seed=7)
    exact = [r["vec_id"] for r in cosine_topk(base, _query(spark), 3).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(base, _query(spark), model, 3, nprobe=2).collect()
    ]
    assert approx == exact  # probing every cell == brute force


def test_similar_pairs_exact_threshold(spark):
    from batchprocessingetl_spark.operators.similarity import similar_pairs_exact

    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in similar_pairs_exact(_emb(spark), 0.99).collect()}
    assert (0, 1) in pairs  # [1,0,0] vs [0.9,0.1,0] cosine ~0.994
    assert all(c >= 0.99 for c in pairs.values())


def test_multimodal_feature_extraction(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    media = as_media_frame(
        docs.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "text"
    )
    out = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert out[1]["n_bytes"] == 5
    assert out[1]["content_hash"] == hashlib.md5(b"hello").hexdigest()
    assert out[1]["feature"] == [float(f"{v:.9g}") for v in decode_stub(b"hello", "text")] or len(out[1]["feature"]) == 8
    assert out[2]["n_bytes"] == 0 and len(out[2]["feature"]) == 8


def test_streaming_matches_batch_windows(spark, tmp_path):
    from batchprocessingetl_spark.streaming.jobs import (
        run_available_now,
        stream_events,
        windowed_event_counts,
    )
    import datetime as dt
    from pyspark.sql import Row

    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1, i % 3, 10), user_id=i % 2,
            event_type="click" if i % 2 else "view", value=float(i), props="{}")
        for i in range(12)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows).write.parquet(src)
    agg = windowed_event_counts(stream_events(spark, src), "1 hour")
    run_available_now(agg, str(tmp_path / "ckpt"), "t_stream_out")
    got = spark.table("t_stream_out")
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert sorted(map(tuple, got.select("window_start", "event_type", "n_events").collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_resize_and_frame_sampling(spark):
    from batchprocessingetl_spark.operators.multimodal import (
        resize_images,
        resize_stub,
        sample_frames,
    )

    long_payload = ("x" * 300).encode()
    docs = spark.createDataFrame(
        [(1, "abcdefgh" * 40), (2, "tiny"), (3, "")], "doc_id long, text string"
    )
    media = as_media_frame(
        docs.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "image"
    )

    rz = {r["doc_id"]: r for r in resize_images(media, 64, 64).collect()}
    assert rz[1]["width"] == 64 and rz[1]["height"] == 64
    assert bytes(rz[1]["payload"]) == resize_stub(b"abcdefgh" * 40, 64, 64)
    assert len(bytes(rz[1]["payload"])) == 64 * 64 // 64  # capped by target raster
    assert bytes(rz[3]["payload"]) == b""  # empty payload stays empty

    # frame sampling: 320 bytes -> 5 full 64B frames -> keep idx 0 and 4
    fr = sample_frames(media, frame_bytes=64, every_n=4).collect()
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in fr}
    src = ("abcdefgh" * 40).encode()
    assert set(got) == {(1, 0), (1, 4)}  # docs 2,3 too short -> no frames
    assert got[(1, 0)] == src[0:64] and got[(1, 4)] == src[256:320]
    assert all(r["n_frame_bytes"] == 64 for r in fr)


def test_binary_file_ingest_to_decode_pipeline(spark, tmp_path):
    """binaryFile source -> media frame -> real decode: files written
    with the repo's own BMP encoder round-trip through Spark's binary
    file reader into the Arrow decode path with exact pixel sums."""
    from pyspark.sql import functions as F

    from batchprocessingetl_spark.operators.media_codecs import encode_bmp
    from batchprocessingetl_spark.operators.multimodal import as_media_frame, decode_media
    from batchprocessingetl_spark.sources.readers import read_binary_files

    d = tmp_path / "imgs"
    d.mkdir()
    want = {}
    for i, (w, h) in enumerate([(2, 2), (3, 1), (4, 4)]):
        rgb = bytes((i * 7 + j) % 256 for j in range(w * h * 3))
        (d / f"{i}.bmp").write_bytes(encode_bmp(w, h, rgb))
        want[i] = (w, h, sum(rgb))
    (d / "notes.txt").write_text("not an image")  # filtered by glob

    files = read_binary_files(spark, str(d), glob="*.bmp")
    assert files.count() == 3
    media = as_media_frame(files, "media_id", "content", "image")
    dec = decode_media(media)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["sum_r"] + r["sum_g"] + r["sum_b"])
        for r in dec.collect()
    }
    assert got == want
