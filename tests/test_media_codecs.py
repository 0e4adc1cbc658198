"""Pure-stdlib media codecs: encode->decode round-trips, wire-format
edge cases (padding, top-down BMPs, PPM comments, PNG filters 0-4,
WAV chunk walking), and the Spark decode_media operator."""

from __future__ import annotations

import struct
import zlib

import pytest

from batchprocessingetl_spark.operators import media_codecs as mc
from batchprocessingetl_spark.operators.multimodal import decode_real, decode_stub


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 12, 25, 38, 51, 103])
def test_synthesized_payload_roundtrip(doc_id):
    kind, payload = mc.synthesize_payload(doc_id)
    assert mc.sniff_format(payload) == kind
    if kind == "wav":
        assert mc.decode_wav(payload) == mc.synth_samples(doc_id)
    else:
        assert mc.IMAGE_DECODERS[kind](payload) == mc.synth_raster(doc_id)


def test_bmp_row_padding_and_bottom_up():
    # width 3 -> 9-byte rows padded to 12; decoder must skip the pad
    # and un-flip the bottom-up row order
    rgb = bytes(range(18))  # 3x2
    assert mc.decode_bmp(mc.encode_bmp(3, 2, rgb)) == (3, 2, rgb)


def test_bmp_top_down_negative_height():
    rgb = bytes((7 * i) % 256 for i in range(36))  # 4x3, no padding
    enc = bytearray(mc.encode_bmp(4, 3, rgb))
    # flip to top-down: height field negative, rows in natural order
    struct.pack_into("<i", enc, 14 + 8, -3)
    stride = 12
    rows = [bytes(enc[54 + i * stride : 54 + (i + 1) * stride]) for i in range(3)]
    enc[54:] = b"".join(reversed(rows))
    assert mc.decode_bmp(bytes(enc)) == (4, 3, rgb)


def test_ppm_header_comments_and_whitespace():
    raster = bytes(45)
    assert mc.decode_ppm(b"P6\n# c\n5 3\n#x\n255\n" + raster) == (5, 3, raster)
    assert mc.decode_ppm(b"P6  5\t3\r255 " + raster) == (5, 3, raster)


def test_png_all_five_filters_reconstruct():
    w, h = 5, 5
    rgb = bytes((x * 17 + y * 29 + c * 7) % 256 for y in range(h) for x in range(w) for c in range(3))
    stride = 3 * w

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw, prev = bytearray(), bytes(stride)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = rgb[y * stride : (y + 1) * stride]
        enc = bytearray([ftype])
        for i in range(stride):
            left = line[i - 3] if i >= 3 else 0
            up, ul = prev[i], (prev[i - 3] if i >= 3 else 0)
            delta = {0: 0, 1: left, 2: up, 3: (left + up) // 2, 4: paeth(left, up, ul)}[ftype]
            enc.append((line[i] - delta) & 0xFF)
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mc._png_chunk(b"IEND", b"")
    )
    assert mc.decode_png(png) == (w, h, rgb)


def test_png_multiple_idat_chunks():
    w, h, rgb = 4, 2, bytes(range(24))
    raw = b"".join(b"\x00" + rgb[y * 12 : (y + 1) * 12] for y in range(h))
    z = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", z[: len(z) // 2])
        + mc._png_chunk(b"IDAT", z[len(z) // 2 :])
        + mc._png_chunk(b"IEND", b"")
    )
    assert mc.decode_png(png) == (w, h, rgb)


def test_wav_skips_unknown_chunks():
    wav = mc.encode_wav(8000, [1, -2, 3])
    body = wav[12:]
    wav2 = wav[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + body
    wav2 = wav2[:4] + struct.pack("<I", len(wav2) - 8) + wav2[8:]
    assert mc.decode_wav(wav2) == (8000, [1, -2, 3])


def test_decode_real_dispatch_and_fallback():
    d = decode_real(mc.encode_bmp(2, 2, bytes(12)))
    assert d["kind"] == "bmp" and (d["width"], d["height"]) == (2, 2)
    d = decode_real(mc.encode_wav(9000, [100, -100]))
    assert d == {"kind": "wav", "sample_rate": 9000, "n_samples": 2, "sum_abs": 200}
    with pytest.raises(ValueError, match="unrecognized"):
        decode_real(b"\xff\xd8\xff some-jpeg-ish bytes")
    # exotic formats keep the documented stub fallback
    assert len(decode_stub(b"\xff\xd8\xff", "jpeg")) == 8


def test_decode_media_operator(spark):
    from batchprocessingetl_spark.operators.multimodal import decode_media, synthesize_media

    ids = spark.range(0, 64).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in decode_media(synthesize_media(ids)).collect()}
    assert len(out) == 64
    for did, r in out.items():
        if did % 4 == 3:
            rate, samples = mc.synth_samples(did)
            assert r["kind"] == "wav" and r["sample_rate"] == rate
            assert r["n_samples"] == len(samples)
            assert r["sum_abs"] == sum(abs(s) for s in samples)
            assert r["width"] is None
        else:
            w, h, rgb = mc.synth_raster(did)
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_r"] == sum(rgb[0::3])
            assert r["sum_b"] == sum(rgb[2::3])
            assert r["sample_rate"] is None


def test_resize_rgb_nearest_neighbor_exact():
    # 4x2 -> 2x4: out(x,y) must equal src(x*4//2, y*2//4) exactly
    w, h = 4, 2
    rgb = bytes(range(24))
    out = mc.resize_rgb(w, h, rgb, 2, 4)
    for y in range(4):
        for x in range(2):
            sx, sy = x * w // 2, y * h // 4
            src = rgb[3 * (w * sy + sx) : 3 * (w * sy + sx) + 3]
            assert out[3 * (2 * y + x) : 3 * (2 * y + x) + 3] == src


@pytest.mark.parametrize("kind_id", [0, 1, 2])  # bmp, png, ppm
def test_resize_image_payload_roundtrips_same_format(kind_id):
    doc_id = kind_id  # kind cycles bmp/png/ppm/wav by id % 4
    kind, payload = mc.synthesize_payload(doc_id)
    resized = mc.resize_image_payload(payload, 6, 5)
    assert mc.sniff_format(resized) == kind
    w, h, rgb = mc.IMAGE_DECODERS[kind](resized)
    assert (w, h) == (6, 5)
    sw, sh, srgb = mc.synth_raster(doc_id)
    for y in range(5):
        for x in range(6):
            sx, sy = x * sw // 6, y * sh // 5
            assert (
                rgb[3 * (6 * y + x) : 3 * (6 * y + x) + 3]
                == srgb[3 * (sw * sy + sx) : 3 * (sw * sy + sx) + 3]
            )


def test_resize_image_payload_rejects_audio_and_junk():
    _, wav = mc.synthesize_payload(3)
    with pytest.raises(ValueError, match="not a decodable image"):
        mc.resize_image_payload(wav, 4, 4)
    with pytest.raises(ValueError, match="not a decodable image"):
        mc.resize_image_payload(b"\xff\xd8garbage", 4, 4)


def test_resize_images_operator_real_path_and_fallback(spark):
    from batchprocessingetl_spark.operators.multimodal import resize_images, synthesize_media

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = synthesize_media(ids)
    out = {r["doc_id"]: r for r in resize_images(media, 8, 8).collect()}
    for did, r in out.items():
        payload = bytes(r["payload"])
        if did % 4 == 3:  # wav -> stub fallback path
            assert mc.sniff_format(payload) is None
        else:
            fmt = mc.sniff_format(payload)
            assert fmt == mc.MEDIA_KINDS[did % 4]
            w, h, _ = mc.IMAGE_DECODERS[fmt](payload)
            assert (w, h) == (8, 8)


# Truncated/corrupt payloads that PASS the magic-byte sniff: the raw
# parse would die in struct/zlib/indexing; decoders must normalize to
# ValueError so mapInPandas callers take the documented stub fallback
# instead of failing the whole job (ADVICE r3).
_SNIFFABLE_GARBAGE = [
    b"BM",  # 2-byte 'BMP'
    b"BM" + b"x" * 20,  # truncated header -> struct.error
    b"BMtext that is not a bitmap at all",  # header parses garbage
    b"P6\n",  # PPM with no dims
    b"P6\n4 4\n255\n",  # truncated PPM raster (already ValueError)
    mc._PNG_SIG,  # bare PNG signature
    mc._PNG_SIG + b"\x00" * 10,  # truncated IHDR
    mc._PNG_SIG + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 17,  # junk IHDR
    b"RIFF\x00\x00\x00\x00WAVE",  # WAV with no chunks
    b"RIFF\x00\x00\x00\x00WAVEfmt \x04\x00\x00\x00ab",  # truncated fmt
]


@pytest.mark.parametrize("payload", _SNIFFABLE_GARBAGE)
def test_sniffable_garbage_normalizes_to_valueerror(payload):
    fmt = mc.sniff_format(payload)
    if fmt in mc.IMAGE_DECODERS:
        with pytest.raises(ValueError):
            mc.IMAGE_DECODERS[fmt](payload)
        with pytest.raises(ValueError):
            mc.resize_image_payload(payload, 4, 4)
    elif fmt == "wav":
        with pytest.raises(ValueError):
            mc.decode_wav(payload)
    # decode_real must surface the same single exception type
    with pytest.raises(ValueError):
        decode_real(payload)


def test_feature_and_resize_operators_survive_corrupt_payloads(spark):
    """End-to-end: a mixed batch of valid + sniffable-garbage payloads
    runs through extract_features and resize_images without killing the
    job; corrupt rows take the stub fallbacks."""
    from batchprocessingetl_spark.operators.multimodal import (
        decode_stub,
        extract_features,
        resize_images,
        resize_stub,
    )

    rows = [(int(i), "image", bytes(mc.synthesize_payload(i)[1])) for i in range(4)]
    rows += [(100 + j, "image", g) for j, g in enumerate(_SNIFFABLE_GARBAGE)]
    media = spark.createDataFrame(rows, "doc_id long, kind string, payload binary")

    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == len(rows)
    for j, g in enumerate(_SNIFFABLE_GARBAGE):
        got = [round(v, 9) for v in feats[100 + j]["feature"]]
        want = [round(v, 9) for v in decode_stub(g, "stub")]
        assert got == pytest.approx(want)

    rz = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 8).collect()}
    assert len(rz) == len(rows)
    for j, g in enumerate(_SNIFFABLE_GARBAGE):
        assert rz[100 + j] == resize_stub(g, 8, 8)


@pytest.mark.parametrize("doc_id", [0, 1, 7, 42, 111])
def test_gif_roundtrip_synth_rasters(doc_id):
    w, h, rgb = mc.synth_raster(doc_id)
    enc = mc.encode_gif(w, h, rgb)
    assert mc.sniff_format(enc) == "gif"
    assert mc.decode_gif(enc) == (w, h, rgb)


def test_gif_lzw_width_growth_and_table_overflow_roundtrip():
    """128x64 pseudo-random indices over a 256-color palette force the
    LZW code width to grow to 12 bits and the table past 4096 entries,
    exercising the encoder's CLEAR+reset and the decoder's matching
    width schedule."""
    import random

    rnd = random.Random(42)
    pal = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    rgb = b"".join(bytes(pal[rnd.randrange(256)]) for _ in range(128 * 64))
    enc = mc.encode_gif(128, 64, rgb)
    assert mc.decode_gif(enc) == (128, 64, rgb)


def test_gif_decoder_reads_hand_packed_uncompressed_stream():
    """Decoder validated independently of the encoder: a GIF built by
    hand with the classic 'uncompressed LZW' trick — min code size 7,
    so every literal code is exactly one byte, with a CLEAR every 100
    codes to keep the table from forcing a width change. Any decoder
    bug in sub-block reassembly, CLEAR handling, or palette mapping
    breaks the pixel-for-pixel comparison."""
    import random
    import struct as st

    rnd = random.Random(7)
    w, h = 25, 8
    indices = [rnd.randrange(128) for _ in range(w * h)]
    pal = b"".join(bytes(((3 * i) % 256, (5 * i) % 256, i)) for i in range(128))
    clear, eoi = 128, 129
    stream = bytearray([clear])
    for i, idx in enumerate(indices):
        if i and i % 100 == 0:
            stream.append(clear)
        stream.append(idx)
    stream.append(eoi)
    payload = (
        b"GIF89a"
        + st.pack("<HHBBB", w, h, 0x80 | 0x06, 0, 0)  # GCT, 2<<6=128 colors
        + pal
        + st.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        + bytes([7])  # min code size
        + mc._gif_subblocks(bytes(stream))
        + b";"
    )
    got = mc.decode_gif(payload)
    want = b"".join(pal[3 * i : 3 * i + 3] for i in indices)
    assert got == (w, h, want)


def test_gif_rejects_interlaced_and_truncated():
    w, h, rgb = mc.synth_raster(3)
    enc = bytearray(mc.encode_gif(w, h, rgb))
    # flip the interlace bit in the image descriptor flags byte
    img_off = enc.index(0x2C, 13)
    enc[img_off + 9] |= 0x40
    with pytest.raises(ValueError):
        mc.decode_gif(bytes(enc))
    with pytest.raises(ValueError):
        mc.decode_gif(mc.encode_gif(w, h, rgb)[:20])


def test_gif_encoder_rejects_wide_palettes():
    rgb = b"".join(bytes((i % 256, i // 256, 0)) for i in range(300))
    with pytest.raises(ValueError):
        mc.encode_gif(300, 1, rgb)


def test_gif_resize_keeps_format_and_palette_subset():
    w, h, rgb = mc.synth_raster(9)
    rs = mc.resize_image_payload(mc.encode_gif(w, h, rgb), 5, 3)
    assert mc.sniff_format(rs) == "gif"
    w2, h2, rgb2 = mc.decode_gif(rs)
    assert (w2, h2) == (5, 3)
    assert rgb2 == mc.resize_rgb(w, h, rgb, 5, 3)
