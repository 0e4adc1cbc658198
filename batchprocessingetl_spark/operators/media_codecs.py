"""Pure-stdlib media codecs for the multimodal column family.

Real, dependency-free decoders for four wire formats — 24-bit BMP,
binary PPM (P6), 8-bit RGB PNG (via ``zlib``), and 16-bit PCM WAV —
plus matching encoders used to synthesize deterministic fixture
payloads. This replaces the round-2 ``decode_real`` NotImplementedError
seam: no media library exists in this environment, but these formats
are fully specified and parseable with ``struct`` + ``zlib`` alone.

Encoders and decoders are INDEPENDENT implementations of each format's
spec (the decoder never calls the encoder), so an encode→decode
round-trip genuinely exercises the wire format: BMP bottom-up row
order, BGR byte order and 4-byte row padding; PPM header tokenization
with comments; PNG chunk walking, CRC layout and all five row filters;
WAV RIFF chunk walking with unknown-chunk skip. Decoder outputs are
integer-exact (pixel channel sums, PCM absolute sums), so a DuckDB
oracle can recompute them analytically — no float tolerance anywhere.

Scale posture: codecs are per-payload pure functions invoked inside
Arrow-batched ``mapInPandas`` (operators/multimodal.py); nothing here
touches Spark. A production deployment swaps these for PIL/libav by
re-pointing ``multimodal.decode_real``'s dispatch table only.
"""

from __future__ import annotations

import functools
import struct
import zlib

# A payload can pass the magic-byte sniff yet still be truncated or
# corrupt (e.g. 10 text bytes starting with 'BM'); the raw parse then
# surfaces as struct.error / zlib.error / IndexError / MemoryError-free
# OverflowError depending on where it dies. Decoder entry points
# normalize ALL of those to ValueError so callers need exactly one
# fallback branch (ADVICE r3: an uncaught struct.error inside
# mapInPandas kills the whole job instead of taking the documented
# decode_stub path).
_PARSE_ERRORS = (struct.error, zlib.error, IndexError, OverflowError)


def _normalizes_parse_errors(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except _PARSE_ERRORS as exc:
            raise ValueError(f"{fn.__name__}: malformed payload ({exc})") from exc

    return wrapped


# ---------------------------------------------------------------- BMP

_BMP_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP: bottom-up rows, BGR order,
    rows padded to 4-byte boundaries. ``rgb`` is row-major top-down
    RGB, len == 3*width*height."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    row_stride = (3 * width + 3) // 4 * 4
    pad = b"\x00" * (row_stride - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom row first
        row = bytearray()
        base = 3 * width * y
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    pixel_data = b"".join(rows)
    info = _BMP_INFO.pack(40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    header = _BMP_HDR.pack(b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return header + info + pixel_data


@_normalizes_parse_errors
def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP -> (width, height, top-down RGB bytes).
    Handles bottom-up (positive height) and top-down (negative height)
    layouts, row padding, and pixel-data offsets beyond the headers."""
    magic, _fsize, _r1, _r2, offset = _BMP_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    _, width, height, _planes, bpp, compression, *_ = _BMP_INFO.unpack_from(payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (3 * width + 3) // 4 * 4
    out = bytearray(3 * width * height)
    for i in range(height):
        src = offset + i * row_stride
        y = (height - 1 - i) if bottom_up else i
        dst = 3 * width * y
        row = payload[src : src + 3 * width]
        for x in range(width):
            b, g, r = row[3 * x : 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# ---------------------------------------------------------------- PPM


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6), maxval 255: ASCII header + raw RGB rows."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _ppm_tokens(payload: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers, skipping
    ``#`` comments, returning (values, offset past the single
    whitespace byte that terminates the last token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


@_normalizes_parse_errors
def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse binary PPM (P6) -> (width, height, RGB bytes). Supports
    ``#`` comments and arbitrary whitespace in the header, per spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (width, height, maxval), off = _ppm_tokens(payload, 2, 3)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = 3 * width * height
    raster = payload[off : off + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return width, height, raster


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(kind: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + kind
        + body
        + struct.pack(">I", zlib.crc32(kind + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """8-bit truecolor (RGB) PNG, filter 0 on every row, one IDAT."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = 3 * width
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


@_normalizes_parse_errors
def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bit RGB PNG -> (width, height, RGB bytes): walk
    chunks (CRC-layout aware), concatenate IDAT, inflate, and undo all
    five row filters (None/Sub/Up/Average/Paeth). Interlace and other
    color types are out of scope and raise."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = len(_PNG_SIG), -1
    height = -1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        kind = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + kind + body + crc
        if kind == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
                )
        elif kind == b"IDAT":
            idat += body
        elif kind == b"IEND":
            break
    if width < 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride, bpp = 3 * width, 3
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, bytes(out)


# ---------------------------------------------------------------- WAV


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Mono 16-bit PCM WAV (RIFF/WAVE, fmt + data chunks)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_normalizes_parse_errors
def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse mono 16-bit PCM WAV -> (sample_rate, samples). Walks RIFF
    chunks in any order, skipping unknown ones (LIST, fact, ...), with
    the spec's odd-length chunk padding."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, data = 12, -1, None
    while pos + 8 <= len(payload):
        kind = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if kind == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif kind == b"data":
            data = body
    if sample_rate < 0 or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, list(struct.unpack(f"<{len(data) // 2}h", data))


# ---------------------------------------------------------------- GIF

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_subblocks(data: bytes) -> bytes:
    """Split an LZW byte stream into GIF sub-blocks (<=255 bytes each)
    followed by the 0x00 terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


class _LsbBitWriter:
    """LSB-first variable-width bit packer (GIF's bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    growing when the just-assigned code reaches 2^width (so the NEXT
    assignment would overflow), capped at 12 bits with an explicit
    CLEAR + table reset at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    w.write(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            w.write(clear, width)
            table, next_code, width = fresh()
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    return w.finish()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of GIF LZW, written against the spec rather than the
    encoder above: the decoder's table runs one entry behind the
    encoder's, so its width grows when its entry count reaches 2^width
    (one stream position after the encoder's 2^width+1 rule lands on
    the same code boundary). Handles the KwKwK self-reference case and
    deferred-clear streams (full table, no CLEAR: stop adding)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """GIF89a with a global color table built from the raster's
    distinct colors (<= 256 required), one non-interlaced image block,
    LZW-compressed index stream."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    colors = sorted({rgb[i : i + 3] for i in range(0, len(rgb), 3)})
    if len(colors) > 256:
        raise ValueError(f"GIF needs <= 256 colors, raster has {len(colors)}")
    depth = 1
    while (1 << depth) < max(len(colors), 2):
        depth += 1
    palette = b"".join(colors) + b"\x00\x00\x00" * ((1 << depth) - len(colors))
    index_of = {c: i for i, c in enumerate(colors)}
    indices = bytes(
        index_of[rgb[i : i + 3]] for i in range(0, len(rgb), 3)
    )
    mcs = max(2, depth)
    lsd = struct.pack("<HHBBB", width, height, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    return (
        b"GIF89a"
        + lsd
        + palette
        + img
        + bytes([mcs])
        + _gif_subblocks(_lzw_encode(indices, mcs))
        + b";"
    )


@_normalizes_parse_errors
def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a GIF87a/89a -> (width, height, top-down RGB bytes) for
    the first image block: logical screen descriptor, global/local
    color tables, extension-block skipping, sub-block reassembly, and
    full variable-width LZW decompression. Interlaced images are out
    of scope and raise."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if not pal:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode(bytes(lzw), mcs)
            if len(indices) != iw * ih:
                raise ValueError(
                    f"GIF raster size mismatch: {len(indices)} != {iw}x{ih}"
                )
            out = bytearray(3 * iw * ih)
            for i, idx in enumerate(indices):
                off = 3 * idx
                if off + 3 > len(pal):
                    raise ValueError(f"GIF index {idx} outside color table")
                out[3 * i : 3 * i + 3] = pal[off : off + 3]
            return iw, ih, bytes(out)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image block")


# ------------------------------------------------- format dispatch


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'bmp' | 'png' | 'ppm' | 'wav'
    | None (unrecognized)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:6] in _GIF_SIGS:
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


IMAGE_DECODERS = {"bmp": decode_bmp, "png": decode_png, "ppm": decode_ppm, "gif": decode_gif}
IMAGE_ENCODERS = {"bmp": encode_bmp, "png": encode_png, "ppm": encode_ppm, "gif": encode_gif}


# ------------------------------------- deterministic fixture payloads
#
# Closed-form synthetic media: every pixel / sample is an integer
# function of (doc_id, x, y) | (doc_id, i), so a SQL oracle can
# recompute the decoded channel sums analytically without parsing any
# bytes — the encode→decode round-trip is what's under test.

MEDIA_KINDS = ("bmp", "png", "ppm", "wav")


def synth_raster(doc_id: int) -> tuple[int, int, bytes]:
    """Deterministic RGB raster: w=4+id%13, h=4+id%7,
    r=(31*id+7x+13y)%256, g=(17*id+5x+11y)%256, b=(23*id+3x+19y)%256."""
    w, h = 4 + doc_id % 13, 4 + doc_id % 7
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf.append((31 * doc_id + 7 * x + 13 * y) % 256)
            buf.append((17 * doc_id + 5 * x + 11 * y) % 256)
            buf.append((23 * doc_id + 3 * x + 19 * y) % 256)
    return w, h, bytes(buf)


def synth_samples(doc_id: int) -> tuple[int, list[int]]:
    """Deterministic PCM: rate=8000+1000*(id%5), n=32+id%50,
    s_i=((7*id+13i)%2048)-1024."""
    rate = 8000 + 1000 * (doc_id % 5)
    n = 32 + doc_id % 50
    return rate, [((7 * doc_id + 13 * i) % 2048) - 1024 for i in range(n)]


def synthesize_payload(doc_id: int) -> tuple[str, bytes]:
    """(kind, encoded bytes) for a doc: kind cycles bmp/png/ppm/wav."""
    return synthesize_payload_as(doc_id, MEDIA_KINDS[doc_id % 4])


def synthesize_payload_as(doc_id: int, kind: str) -> tuple[str, bytes]:
    """(kind, encoded bytes) for a doc in an EXPLICIT wire format —
    the same closed-form raster/samples as :func:`synthesize_payload`,
    so analytic oracles are format-independent. ``kind`` in
    bmp/png/ppm/gif/wav."""
    if kind == "wav":
        rate, samples = synth_samples(doc_id)
        return kind, encode_wav(rate, samples)
    if kind not in IMAGE_ENCODERS:
        raise ValueError(f"unknown media kind {kind!r}")
    w, h, rgb = synth_raster(doc_id)
    return kind, IMAGE_ENCODERS[kind](w, h, rgb)


def resize_rgb(
    width: int, height: int, rgb: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a row-major RGB raster: output
    pixel (x, y) copies source pixel (x*W//out_w, y*H//out_h) — the
    floor-grid convention every raster library's NEAREST mode uses."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length must be 3*width*height")
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dims must be positive")
    out = bytearray(3 * out_w * out_h)
    for y in range(out_h):
        sy = y * height // out_h
        row_base = 3 * width * sy
        dst_base = 3 * out_w * y
        for x in range(out_w):
            sx = row_base + 3 * (x * width // out_w)
            d = dst_base + 3 * x
            out[d : d + 3] = rgb[sx : sx + 3]
    return bytes(out)


def resize_image_payload(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real decode -> nearest-neighbor resize -> re-encode in the SAME
    wire format (BMP/PNG/PPM/GIF). Raises ValueError for non-image or
    unrecognized payloads — callers with exotic formats fall back
    explicitly (see multimodal.resize_images). GIF re-encode stays
    valid because nearest-neighbor output colors are a subset of the
    source palette."""
    fmt = sniff_format(payload)
    if fmt not in IMAGE_DECODERS:
        raise ValueError(f"not a decodable image payload (sniffed {fmt!r})")
    w, h, rgb = IMAGE_DECODERS[fmt](payload)
    out_rgb = resize_rgb(w, h, rgb, out_w, out_h)
    return IMAGE_ENCODERS[fmt](out_w, out_h, out_rgb)
