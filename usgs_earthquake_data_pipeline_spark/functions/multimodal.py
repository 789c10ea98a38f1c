"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The Spark-side architecture here is real and tested — schemas,
partition-preserving batch iteration, UDF signatures, output shapes.
Codecs: the container formats whose headers need only ``struct`` are
parsed for real — PNG (signature + IHDR: width/height/bit-depth),
JPEG (marker-segment walk to the SOFn frame header:
width/height/precision — dimensions need no entropy decoding), WAV
(RIFF chunk walk: fmt/data → channels/sample-rate/duration, PCM16
waveform stats), MP4/ISO BMFF (box walk: ftyp brand, moov/mvhd
timescale+duration, per-trak mdia/hdlr stream types), WebP (the same
RIFF chunk walk: VP8X canvas / VP8 keyframe / VP8L signature dims),
AVIF (the same ISO BMFF box walk: meta/iprp/ipco/ispe dims + pixi
bit depth), GIF (Logical Screen Descriptor), BMP (BITMAPINFOHEADER /
BITMAPCOREHEADER), TIFF (first-IFD inline tags, both byte orders)
and FLAC (STREAMINFO bit-unpack: rate/channels/bits/total). Full
pixel/sample/frame DECODING of compressed codecs (JPEG pixels, H.264
frames, MP3, ...) would need real image/audio libraries this
container doesn't ship, so those paths raise
``NotImplementedError`` at the clearly-marked PIL/libav integration
points rather than being silently wrong. ``decode_image_meta``
additionally parses the deterministic fake test container (see
``FAKE_MAGIC``).

At 100 TB: media bytes never leave the executors, cross to Python
once per Arrow batch (not per row), and every transform is a narrow
map — partitioning of the containing table is preserved, so a
downstream join on the id column needs no extra shuffle beyond what
the join itself requires.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Deterministic fake media container: magic + width + height + payload.
FAKE_MAGIC = b"FAKEIMG1"
_HEADER_FMT = ">8sII"  # magic, width, height
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("bit_depth", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("format", StringType(), True),
    ]
)

# PNG: 8-byte signature, then the IHDR chunk (must be first per the
# spec): 4-byte length + 'IHDR' + 13-byte body (width u32be, height
# u32be, bit depth u8, color type u8, ...). Everything needed lives in
# the first 33 bytes — no image library required.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# JPEG SOFn markers carry the frame header (precision u8, height
# u16be, width u16be). 0xC4/0xC8/0xCC look like SOFs by range but are
# DHT/JPG/DAC — excluded per the JPEG spec (ITU T.81 table B.1).
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_jpeg_dims(content: bytes):
    """Stdlib JPEG dimension parse (round-10 verdict item 6): walk the
    marker segments after SOI until an SOFn frame header and read
    (width, height, precision) from it — entropy-coded pixel data is
    never touched, so no image library is needed. Returns None for a
    malformed stream (no SOF before SOS/EOI/end)."""
    pos = 2  # past SOI
    n = len(content)
    while pos + 1 < n:
        if content[pos] != 0xFF:
            return None  # lost marker sync
        marker = content[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker in _JPEG_SOF_MARKERS:
            if pos + 9 > n:
                return None
            precision = content[pos + 4]
            height, width = struct.unpack(">HH", content[pos + 5 : pos + 9])
            return width, height, precision
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS without SOF
            return None
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:
            pos += 2  # standalone marker, no length field
            continue
        if pos + 4 > n:
            return None
        (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        if seg_len < 2:
            return None
        pos += 2 + seg_len
    return None


def _parse_webp_dims(content: bytes):
    """Stdlib WebP dimension parse (round-13: the dims ARE parseable
    without an image lib — WebP is a RIFF container, the same chunk
    walk `_parse_wav` does). Walks the word-aligned chunk list after
    the ``RIFF....WEBP`` preamble and reads dims from the first of:

    - ``VP8X`` (extended): canvas width-1 / height-1 as 24-bit LE
      at payload bytes 4-9;
    - ``VP8 `` (lossy): the keyframe header — 3-byte frame tag, the
      0x9D 0x01 0x2A sync code, then 14-bit LE width/height;
    - ``VP8L`` (lossless): 0x2F signature byte, then width-1 in bits
      0-13 and height-1 in bits 14-27 of the next LE u32.

    Returns ``(width, height)`` or None. Pixel DECODE still requires
    an image lib and keeps its NotImplementedError guard."""
    pos = 12
    n = len(content)
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        (csize,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + csize]
        if len(body) < csize:
            return None  # lying chunk size: truncated container
        if cid == b"VP8X" and csize >= 10:
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h
        if cid == b"VP8 " and csize >= 10:
            if body[3:6] != b"\x9d\x01\x2a":  # keyframe sync code
                return None
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return w, h
        if cid == b"VP8L" and csize >= 5:
            if body[0] != 0x2F:  # lossless signature
                return None
            bits = struct.unpack("<I", body[1:5])[0]
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        pos += 8 + csize + (csize & 1)  # chunks are 2-byte aligned
    return None


def _parse_avif_dims(content: bytes):
    """Stdlib AVIF dimension parse (round-13): AVIF is ISO BMFF, the
    same container `_parse_mp4`'s `_walk_boxes` already walks. Dims
    live in ``meta/iprp/ipco/ispe`` (ImageSpatialExtents: ver/flags u32
    + width u32be + height u32be); bits-per-channel, when present, in
    the sibling ``pixi`` box. ``meta`` is a FullBox, so its children
    start 4 bytes into the body. Uses the FIRST ispe in ipco — the
    primary item's properties lead in practice; resolving pitm→ipma
    associations is decode-level work this environment can't verify.

    Returns ``(width, height, bit_depth-or-None)`` or None."""
    dims = None
    depth = None
    for btype, s, e in _walk_boxes(content, 0, len(content)):
        if btype != b"meta" or e - s < 4:
            continue
        for t2, s2, e2 in _walk_boxes(content, s + 4, e):  # FullBox skip
            if t2 != b"iprp":
                continue
            for t3, s3, e3 in _walk_boxes(content, s2, e2):
                if t3 != b"ipco":
                    continue
                for t4, s4, e4 in _walk_boxes(content, s3, e3):
                    if t4 == b"ispe" and dims is None and e4 - s4 >= 12:
                        w, h = struct.unpack(
                            ">II", content[s4 + 4 : s4 + 12]
                        )
                        dims = (w, h)
                    elif t4 == b"pixi" and depth is None and e4 - s4 >= 6:
                        # ver/flags u32 + num_channels u8 + bits u8/ch
                        if content[s4 + 4] >= 1:
                            depth = content[s4 + 5]
    if dims is None:
        return None
    return dims[0], dims[1], depth


def _parse_gif_dims(content: bytes):
    """Stdlib GIF dimension parse (round-13 legacy-raster sweep): the
    Logical Screen Descriptor directly follows the 6-byte
    ``GIF87a``/``GIF89a`` signature — width/height as LE u16, and the
    packed byte's color-resolution field (bits 4-6) as bits per
    primary color. No LZW decoding is touched. Returns
    ``(width, height, color_resolution_bits)`` or None."""
    if len(content) < 11:
        return None
    width, height = struct.unpack("<HH", content[6:10])
    if width == 0 or height == 0:
        return None
    return width, height, ((content[10] >> 4) & 0x07) + 1


def _parse_bmp_dims(content: bytes):
    """Stdlib BMP dimension parse: 14-byte file header, then the DIB
    header whose leading u32 size names its own layout —
    BITMAPINFOHEADER-and-later (>=40: i32 width/height, u16 bpp) or
    the OS/2 BITMAPCOREHEADER (==12: u16 width/height/bpp). Height may
    be negative (top-down rows); dimensions are reported absolute.
    Returns ``(width, height, bits_per_pixel)`` or None."""
    if len(content) < 26:
        return None
    (dib_size,) = struct.unpack("<I", content[14:18])
    if dib_size >= 40 and len(content) >= 30:
        width, height = struct.unpack("<ii", content[18:26])
        (bpp,) = struct.unpack("<H", content[28:30])
    elif dib_size == 12:
        width, height, _planes, bpp = struct.unpack("<HHHH", content[18:26])
    else:
        return None
    if width == 0 or height == 0:
        return None
    return abs(width), abs(height), bpp


def _parse_tiff_dims(content: bytes):
    """Stdlib TIFF dimension parse: byte-order word (``II``/``MM``),
    magic 42, then the first IFD's 12-byte entries — tags 256/257
    (ImageWidth/ImageLength, SHORT or LONG, value inline when
    count==1) and 258 (BitsPerSample; taken only when inline, i.e.
    a single sample — multi-sample values live behind an offset this
    header-only parse deliberately doesn't chase). Returns
    ``(width, height, bits_or_None)`` or None."""
    if len(content) < 8:
        return None
    if content[:4] == b"II\x2a\x00":
        endian = "<"
    elif content[:4] == b"MM\x00\x2a":
        endian = ">"
    else:
        return None
    (ifd_off,) = struct.unpack(endian + "I", content[4:8])
    if ifd_off + 2 > len(content):
        return None
    (n_entries,) = struct.unpack(
        endian + "H", content[ifd_off : ifd_off + 2]
    )
    width = height = bits = None
    for i in range(n_entries):
        s = ifd_off + 2 + 12 * i
        if s + 12 > len(content):
            return None
        tag, vtype, count = struct.unpack(
            endian + "HHI", content[s : s + 8]
        )
        if count != 1 or vtype not in (3, 4):  # inline SHORT/LONG only
            continue
        if vtype == 3:  # SHORT: value in the leading 2 value bytes
            (value,) = struct.unpack(endian + "H", content[s + 8 : s + 10])
        else:  # LONG
            (value,) = struct.unpack(endian + "I", content[s + 8 : s + 12])
        if tag == 256:
            width = value
        elif tag == 257:
            height = value
        elif tag == 258:
            bits = value
    if not width or not height:
        return None
    return width, height, bits


def encode_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image bytes (header + id-seeded payload).
    Byte-identical to what :func:`attach_fake_media` builds JVM-side."""
    payload = bytes([media_id % 256]) * (width * height % 256 + 16)
    return struct.pack(_HEADER_FMT, FAKE_MAGIC, width, height) + payload


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic binary media column from an id column —
    the test stand-in for reading real media files. JVM-side: the
    bytes are built with concat/encode expressions, no Python."""
    mid = F.col(id_col).cast("long")
    width = (mid % 64 + 16).cast("int")
    height = (mid % 48 + 16).cast("int")
    # big-endian header via substring of hex — simpler: build in pandas
    # once at test time; here use a compact expression: unhex of
    # zero-padded hex strings reproduces struct.pack('>8sII').
    header = F.concat(
        F.lit(FAKE_MAGIC),
        F.unhex(F.lpad(F.hex(width), 8, "0")),
        F.unhex(F.lpad(F.hex(height), 8, "0")),
    )
    payload = F.unhex(
        F.repeat(F.lpad(F.hex(mid % 256), 2, "0"), (width * height % 256 + 16))
    )
    return df.withColumn("media_id", mid).withColumn(
        "content", F.concat(header, payload).cast("binary")
    ).withColumn("media_type", F.lit("image"))


def _decode_one(media_id: int, content: bytes | None):
    if content is None or len(content) < _HEADER_SIZE:
        return (
            media_id, None, None, None,
            (len(content) if content else 0), "invalid",
        )
    content = bytes(content)
    if content[:8] == _PNG_SIG:
        # IHDR is mandatory-first: bytes 12-15 name it, 16-24 carry
        # width/height (u32be), 24 the bit depth.
        if len(content) >= 33 and content[12:16] == b"IHDR":
            width, height = struct.unpack(">II", content[16:24])
            return media_id, width, height, content[24], len(content), "png"
        return media_id, None, None, None, len(content), "invalid"
    if content[:2] == b"\xff\xd8":  # JPEG SOI
        dims = _parse_jpeg_dims(content)
        if dims is not None:
            width, height, precision = dims
            return media_id, width, height, precision, len(content), "jpeg"
        return media_id, None, None, None, len(content), "invalid"
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        dims = _parse_webp_dims(content)
        if dims is not None:
            # VP8/VP8L code 8-bit channels by spec
            return media_id, dims[0], dims[1], 8, len(content), "webp"
        return media_id, None, None, None, len(content), "invalid"
    if len(content) >= 12 and content[4:8] == b"ftyp" and content[
        8:12
    ] in (b"avif", b"avis"):
        parsed = _parse_avif_dims(content)
        if parsed is not None:
            width, height, depth = parsed
            return media_id, width, height, depth, len(content), "avif"
        return media_id, None, None, None, len(content), "invalid"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        dims = _parse_gif_dims(content)
        if dims is not None:
            return media_id, dims[0], dims[1], dims[2], len(content), "gif"
        return media_id, None, None, None, len(content), "invalid"
    if content[:2] == b"BM":
        dims = _parse_bmp_dims(content)
        if dims is not None:
            return media_id, dims[0], dims[1], dims[2], len(content), "bmp"
        return media_id, None, None, None, len(content), "invalid"
    if content[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        dims = _parse_tiff_dims(content)
        if dims is not None:
            return media_id, dims[0], dims[1], dims[2], len(content), "tiff"
        return media_id, None, None, None, len(content), "invalid"
    magic, width, height = struct.unpack(_HEADER_FMT, content[:_HEADER_SIZE])
    if magic == FAKE_MAGIC:
        # fake payload is 1 byte/px — report it as 8-bit
        return media_id, width, height, 8, len(content), "fake"
    # REAL-CODEC INTEGRATION POINT: PIL.Image.open(io.BytesIO(content))
    # goes here for other compressed formats (HEIC, JPEG XL, ...); the
    # container ships no image libs, so those are explicitly
    # unsupported rather than silently wrong. PNG/JPEG/WebP/AVIF/GIF/
    # BMP/TIFF/FAKEIMG1 headers parse above with stdlib struct.
    raise NotImplementedError(
        "decoding this image format requires PIL/pillow; PNG, JPEG, "
        "WebP, AVIF, GIF, BMP, TIFF and FAKEIMG1 containers decode "
        "header-only in this environment"
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Decode image headers to typed metadata via mapInPandas.

    One Python crossing per Arrow batch; output schema is fixed
    (IMAGE_META_SCHEMA) so downstream plans are fully typed.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_one(mid, content)
                for mid, content in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "bit_depth",
                    "n_bytes", "format",
                ],
            ).astype(
                {
                    "media_id": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "bit_depth": "Int32",
                    "n_bytes": "int64",
                    "format": "object",
                }
            )

    return df.select("media_id", "content").mapInPandas(decode, IMAGE_META_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the payload: slice the binary into
    fixed-stride chunks (the video-frame analogue), one output row per
    sampled frame. Demonstrates the explode-shaped media transform —
    row count grows, partitioning preserved, bytes stay executor-side.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, int, bytes]] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                body = bytes(content)[_HEADER_SIZE:]
                for idx, start in enumerate(range(0, len(body), every_n_bytes)):
                    out.append((mid, idx, body[start : start + every_n_bytes]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "content").mapInPandas(sample, schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

def resize_images(df: DataFrame, max_dim: int = 16) -> DataFrame:
    """Resize (downscale) to a bounding box, aspect-ratio preserved —
    the standard pre-train normalization pass. Integer floor math so
    the output dims are exactly predictable; the fake codec re-encodes
    at the new dims (REAL-CODEC INTEGRATION POINT: PIL's
    Image.thumbnail goes where encode_fake_image is called). Narrow
    map, one Python crossing per Arrow batch."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int, int]] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) < _HEADER_SIZE:
                    continue
                magic, w, h = struct.unpack(_HEADER_FMT, bytes(content)[:_HEADER_SIZE])
                if magic != FAKE_MAGIC:
                    raise NotImplementedError(
                        "real image resizing requires PIL/pillow"
                    )
                longest = max(w, h)
                nw = max(1, w * max_dim // longest)
                nh = max(1, h * max_dim // longest)
                rows.append((mid, nw, nh, len(encode_fake_image(mid, nw, nh))))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes"]
            ).astype(
                {"media_id": "int64", "width": "Int32", "height": "Int32",
                 "n_bytes": "int64"}
            )

    return df.select("media_id", "content").mapInPandas(do, RESIZED_SCHEMA)


def image_features(df: DataFrame) -> DataFrame:
    """Feature extraction over the decoded payload: per-image pixel
    statistics computed vectorized (numpy over the Arrow batch) — the
    shape of an embedding/featurization pass, with media bytes never
    leaving the executor."""
    import numpy as np

    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_px", LongType(), True),
            StructField("mean_px", DoubleType(), True),
            StructField("max_px", IntegerType(), True),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, float, int]] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) < _HEADER_SIZE:
                    continue
                px = np.frombuffer(bytes(content)[_HEADER_SIZE:], dtype=np.uint8)
                rows.append(
                    (mid, int(px.size), float(px.mean()), int(px.max()))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_px", "mean_px", "max_px"]
            ).astype(
                {"media_id": "int64", "n_px": "int64", "mean_px": "float64",
                 "max_px": "Int32"}
            )

    return df.select("media_id", "content").mapInPandas(do, schema)


# ---------------------------------------------------------------------------
# Audio: deterministic fake PCM container + waveform stats
# ---------------------------------------------------------------------------

FAKE_AUDIO_MAGIC = b"FAKEAUD1"
_AUDIO_HEADER_FMT = ">8sII"  # magic, sample_rate, n_frames (1ch => samples)
_AUDIO_HEADER_SIZE = struct.calcsize(_AUDIO_HEADER_FMT)

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", IntegerType(), True),
    ]
)


def _parse_wav(content: bytes):
    """Header-only WAV/RIFF parse with stdlib ``struct``: walk the
    word-aligned chunk list for ``fmt `` (format/channels/rate/
    block-align/bit-depth) and ``data`` (payload). Returns
    ``(channels, sample_rate, n_frames, samples-or-None)`` — samples
    (a numpy int16 view of the interleaved PCM) only for the
    uncompressed PCM16 encoding; other encodings still yield their
    header stats. None when a mandatory chunk is missing."""
    import numpy as np

    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (csize,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        return None
    audio_fmt, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if channels == 0 or block_align == 0 or sample_rate == 0:
        return None
    n_frames = len(data) // block_align
    samples = None
    if audio_fmt == 1 and bits == 16:  # uncompressed PCM16 (LE)
        usable = (len(data) // 2) * 2
        samples = np.frombuffer(data[:usable], dtype="<i2")
    return channels, sample_rate, n_frames, samples


def _parse_flac(content: bytes):
    """Stdlib FLAC STREAMINFO parse (round-13 legacy-codec sweep):
    after the ``fLaC`` marker, walk the metadata-block headers (1-byte
    last-flag<<7|type + u24be length) to the STREAMINFO block (type 0
    — mandatory first per the spec, but the walk tolerates reordered
    writers) and unpack the bit-packed core: sample rate (20 bits),
    channels-1 (3 bits), bits-per-sample-1 (5 bits), total inter-
    channel samples (36 bits). Audio DATA stays entropy-coded —
    decoding it needs a real FLAC codec and keeps its guard. Returns
    ``(channels, sample_rate, total_samples, bits_per_sample)`` or
    None."""
    pos = 4
    while pos + 4 <= len(content):
        header = content[pos]
        length = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + length]
        if header & 0x7F == 0:  # STREAMINFO
            if len(body) < 18:
                return None  # malformed: stop, don't guess
            b = body[10:18]
            sample_rate = (b[0] << 12) | (b[1] << 4) | (b[2] >> 4)
            channels = ((b[2] >> 1) & 0x07) + 1
            bits = (((b[2] & 0x01) << 4) | (b[3] >> 4)) + 1
            total = ((b[3] & 0x0F) << 32) | int.from_bytes(b[4:8], "big")
            if sample_rate == 0:
                return None
            return channels, sample_rate, total, bits
        if header & 0x80:  # last metadata block and still no STREAMINFO
            return None
        pos += 4 + length
    return None


def attach_fake_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic fake PCM audio column derived from an id — the
    audio twin of :func:`attach_fake_media`. Header = magic +
    sample-rate + sample-count (uint32 BE); payload = big-endian
    16-bit samples with value ``(id*7 + i*13) % 256``. Built entirely
    JVM-side (hex/unhex expressions), so the encode half never leaves
    codegen."""
    mid = F.col(id_col).cast("long")
    sr = (F.lit(8000) + (mid % 3) * 4000).cast("int")
    n = (mid % 32 + 16).cast("int")
    header = F.concat(
        F.lit(FAKE_AUDIO_MAGIC),
        F.unhex(F.lpad(F.hex(sr), 8, "0")),
        F.unhex(F.lpad(F.hex(n), 8, "0")),
    )
    payload = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.lpad(F.hex((mid * 7 + i * 13) % 256), 4, "0"),
            ),
            "",
        )
    )
    return (
        df.withColumn("media_id", mid)
        .withColumn("content", F.concat(header, payload).cast("binary"))
        .withColumn("media_type", F.lit("audio"))
    )


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """Waveform statistics via mapInPandas: sample rate / channels /
    frame count from the header (real WAV/RIFF containers parse with
    stdlib struct — see :func:`_parse_wav` — alongside the FAKEAUD1
    test container), duration / RMS / peak from the vectorized numpy
    view of the PCM payload. ``n_frames`` is bytes/block_align — one
    frame per sampling instant across ALL channels (the round-10
    advice rename: for multichannel WAV this is NOT the interleaved
    sample count); ``rms``/``peak`` are computed over every
    interleaved sample, i.e. channel-agnostic signal level. One Python
    crossing per Arrow batch; compressed codecs (libav/soundfile)
    would slot in at the marked point exactly like the image
    decoder's."""
    import math

    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) < _AUDIO_HEADER_SIZE:
                    out.append((media_id, None, None, None, None, None, None))
                    continue
                content = bytes(content)
                if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
                    parsed = _parse_wav(content)
                    if parsed is None:  # RIFF/WAVE but fmt/data missing
                        out.append(
                            (media_id, None, None, None, None, None, None)
                        )
                        continue
                    channels, sr, n_frames, samples = parsed
                    rms = peak = None
                    if samples is not None and samples.size:
                        sf64 = samples.astype(np.float64)
                        rms = round(math.sqrt(float((sf64**2).mean())), 6)
                        peak = int(samples.max())
                    out.append(
                        (
                            media_id,
                            sr,
                            channels,
                            n_frames,
                            n_frames * 1000.0 / sr,
                            rms,
                            peak,
                        )
                    )
                    continue
                if content[:4] == b"fLaC":
                    parsed = _parse_flac(content)
                    if parsed is None:  # fLaC marker but no STREAMINFO
                        out.append(
                            (media_id, None, None, None, None, None, None)
                        )
                        continue
                    channels, sr, total, _bits = parsed
                    # STREAMINFO header stats only — rms/peak need the
                    # entropy-coded frames a real FLAC codec would
                    # decode at the integration point below.
                    out.append(
                        (
                            media_id,
                            sr,
                            channels,
                            total,
                            total * 1000.0 / sr,
                            None,
                            None,
                        )
                    )
                    continue
                magic, sr, n = struct.unpack(
                    _AUDIO_HEADER_FMT, content[:_AUDIO_HEADER_SIZE]
                )
                if magic != FAKE_AUDIO_MAGIC:
                    # REAL-CODEC INTEGRATION POINT (soundfile/libav) for
                    # compressed audio (MP3/AAC/...); WAV headers, FLAC
                    # STREAMINFO and FAKEAUD1 decode above without any
                    # library.
                    raise NotImplementedError(
                        "decoding compressed audio requires an audio "
                        "library; WAV, FLAC STREAMINFO and FAKEAUD1 "
                        "containers decode here"
                    )
                samples = np.frombuffer(
                    content[_AUDIO_HEADER_SIZE:], dtype=">i2"
                ).astype(np.float64)
                rms = round(math.sqrt(float((samples**2).mean())), 6)
                out.append(
                    (
                        media_id,
                        sr,
                        1,  # the fake PCM stream is single-channel
                        n,
                        n * 1000.0 / sr,
                        rms,
                        int(samples.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "channels",
                    "n_frames",
                    "duration_ms",
                    "rms",
                    "peak",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        stats, AUDIO_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video: ISO BMFF (MP4) metadata with a stdlib box walk — the same
# header-only treatment PNG/JPEG/WAV get above. moov/mvhd carries the
# presentation timescale + duration; each trak's mdia/hdlr names its
# stream type (vide/soun/...). No libav needed for any of this;
# DECODING frames would need one and raises at the marked point.
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("major_brand", StringType(), True),
        StructField("timescale", IntegerType(), True),
        StructField("duration_units", LongType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("track_types", StringType(), True),
    ]
)


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for each ISO BMFF box in
    ``buf[start:end]``. Handles the 64-bit largesize escape (size==1)
    and the to-end-of-file escape (size==0); stops at the first
    malformed box rather than guessing."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", buf[pos : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _parse_mp4(content: bytes):
    """Header-only MP4/ISO-BMFF parse with stdlib ``struct``: the
    top-level box walk finds ``ftyp`` (major brand) and ``moov``;
    inside moov, ``mvhd`` (version 0 or 1) yields (timescale,
    duration) and each ``trak``'s ``mdia/hdlr`` yields its
    handler type. Returns ``(major_brand, timescale, duration,
    [track_types])`` or None when the file is not ISO BMFF / the
    mandatory mvhd is missing or zero-timescale."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        return None
    major = content[8:12].decode("ascii", "replace")
    timescale = duration = None
    tracks: list[str] = []
    for btype, s, e in _walk_boxes(content, 0, len(content)):
        if btype != b"moov":
            continue
        for t2, s2, e2 in _walk_boxes(content, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                ver = content[s2]
                if ver == 1:
                    if e2 - s2 < 32:
                        # malformed v1 box: stop rather than reading
                        # the v1 creation/modification bytes as the
                        # v0 timescale/duration layout
                        continue
                    # v1: ver/flags 4 + creation 8 + modification 8,
                    # then timescale u32 + duration u64
                    timescale, duration = struct.unpack(
                        ">IQ", content[s2 + 20 : s2 + 32]
                    )
                elif ver == 0:
                    # v0: ver/flags 4 + creation 4 + modification 4,
                    # then timescale u32 + duration u32
                    timescale, duration = struct.unpack(
                        ">II", content[s2 + 12 : s2 + 20]
                    )
                # any other version byte: unknown layout, skip
            elif t2 == b"trak":
                handler = None
                for t3, s3, e3 in _walk_boxes(content, s2, e2):
                    if t3 != b"mdia":
                        continue
                    for t4, s4, e4 in _walk_boxes(content, s3, e3):
                        if t4 == b"hdlr" and e4 - s4 >= 12:
                            # hdlr body: ver/flags 4 + pre_defined 4 +
                            # handler_type 4
                            handler = content[s4 + 8 : s4 + 12].decode(
                                "ascii", "replace"
                            )
                tracks.append(handler or "unkn")
    if not timescale:  # missing mvhd or zero timescale
        return None
    return major, timescale, duration, tracks


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _mp4_hdlr_trak(handler: bytes) -> bytes:
    """A minimal spec-shaped trak: trak > mdia > hdlr with the given
    handler type (body: ver/flags + pre_defined + handler_type + 12
    reserved bytes + empty NUL-terminated name)."""
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")
    return _mp4_box(b"trak", _mp4_box(b"mdia", hdlr))


# Constant fragments of the fake MP4 (everything except timescale,
# duration and the optional second track varies nothing):
_MP4_FTYP = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0))
# mvhd v0 body BEFORE timescale: ver/flags + creation + modification
_MP4_MVHD_PRE = b"\x00" * 12
# mvhd v0 body AFTER duration: rate(4) volume(2) reserved(10)
# matrix(36, unity) pre_defined(24) next_track_ID(4)
_MP4_MVHD_POST = (
    struct.pack(">I", 0x00010000)  # rate 1.0
    + struct.pack(">H", 0x0100)  # volume 1.0
    + b"\x00" * 10
    + struct.pack(
        ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )  # unity matrix
    + b"\x00" * 24
    + struct.pack(">I", 2)
)
_MP4_TRAK_VIDE = _mp4_hdlr_trak(b"vide")
_MP4_TRAK_SOUN = _mp4_hdlr_trak(b"soun")
_MP4_MVHD_SIZE = 8 + len(_MP4_MVHD_PRE) + 8 + len(_MP4_MVHD_POST)


# Constant fragments of the fake WebP/AVIF containers (round 13 —
# everything except the dims and the pixi depth is fixed-layout, so
# box/chunk sizes are Python-side constants):
_WEBP_VP8X_PRE = (
    b"RIFF" + struct.pack("<I", 22) + b"WEBP"
    + b"VP8X" + struct.pack("<I", 10) + b"\x02\x00\x00\x00"
)
_WEBP_VP8L_PRE = (
    b"RIFF" + struct.pack("<I", 18) + b"WEBP"
    + b"VP8L" + struct.pack("<I", 5) + b"\x2f"
)
_AVIF_FTYP = _mp4_box(b"ftyp", b"avif" + b"\x00" * 4)
# meta FullBox > iprp > ipco > [ispe(dims) pixi(1ch depth)]
_AVIF_ISPE_HDR = struct.pack(">I4s", 20, b"ispe") + b"\x00" * 4
_AVIF_PIXI_HDR = struct.pack(">I4s", 14, b"pixi") + b"\x00" * 4 + b"\x01"
_AVIF_IPCO_HDR = struct.pack(">I4s", 42, b"ipco")
_AVIF_IPRP_HDR = struct.pack(">I4s", 50, b"iprp")
_AVIF_META_HDR = struct.pack(">I4s", 62, b"meta") + b"\x00" * 4


def attach_fake_webp_avif(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL-container WebP/AVIF column derived from an
    id — the still-image sibling of :func:`attach_fake_video`, built
    for the round-13 de-guarding of WebP/AVIF dims. Container by id:
    id%4==0 → WebP VP8X (extended canvas), id%4==2 → WebP VP8L
    (lossless signature word), odd → AVIF (meta/iprp/ipco/ispe +
    pixi). Dims are width=id%1000+1, height=id%700+1; AVIF pixi depth
    is 8+id%5 — all formula-predictable so an oracle can pin every
    decoded field. Built JVM-side: constant fragments are binary
    literals, varying ints become hex/unhex slices (little-endian by
    hex-pair reversal for the RIFF side); the encode never leaves
    codegen."""
    mid = F.col(id_col).cast("long")
    w = (mid % 1000 + 1).cast("bigint")
    h = (mid % 700 + 1).cast("bigint")
    depth = (mid % 5 + 8).cast("bigint")

    def be(c, n_bytes):
        return F.unhex(F.lpad(F.hex(c), 2 * n_bytes, "0"))

    def le(c, n_bytes):
        hx = F.lpad(F.hex(c), 2 * n_bytes, "0")
        pairs = [
            F.substring(hx, 2 * i + 1, 2) for i in reversed(range(n_bytes))
        ]
        return F.unhex(F.concat(*pairs))

    webp_vp8x = F.concat(
        F.lit(_WEBP_VP8X_PRE), le(w - 1, 3), le(h - 1, 3)
    )
    vp8l_bits = (w - 1) + (h - 1) * F.lit(16384)
    webp_vp8l = F.concat(
        F.lit(_WEBP_VP8L_PRE), le(vp8l_bits, 4), F.lit(b"\x00")  # align pad
    )
    avif = F.concat(
        F.lit(_AVIF_FTYP),
        F.lit(_AVIF_META_HDR),
        F.lit(_AVIF_IPRP_HDR),
        F.lit(_AVIF_IPCO_HDR),
        F.lit(_AVIF_ISPE_HDR),
        be(w, 4),
        be(h, 4),
        F.lit(_AVIF_PIXI_HDR),
        be(depth, 1),
    )
    content = (
        F.when((mid % 2) == 1, avif)
        .when((mid % 4) == 0, webp_vp8x)
        .otherwise(webp_vp8l)
    )
    return (
        df.withColumn("media_id", mid)
        .withColumn("content", content.cast("binary"))
        .withColumn("media_type", F.lit("image"))
    )


# Constant fragments of the fake GIF/BMP/TIFF/FLAC containers
# (round-13 legacy-format sweep; varying fields are hex/unhex
# expressions in the attach functions below).
_GIF_SIG = b"GIF89a"
# comment-extension sub-block + GIF trailer: pads the header-only
# fixture past the generic 16-byte minimum while staying walkable
_GIF_TAIL = b"\x21\xfe\x01\x2a\x00\x3b"
_BMP_PRE = (
    b"BM"
    + struct.pack("<I", 54)  # file size: headers only
    + b"\x00\x00\x00\x00"
    + struct.pack("<I", 54)  # pixel-data offset
    + struct.pack("<I", 40)  # BITMAPINFOHEADER
)
_BMP_PLANES = struct.pack("<H", 1)
_TIFF_PRE = b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", 3)
_TIFF_E_WIDTH = struct.pack("<HHI", 256, 3, 1)
_TIFF_E_HEIGHT = struct.pack("<HHI", 257, 3, 1)
_TIFF_E_BITS = struct.pack("<HHI", 258, 3, 1)
_TIFF_TAIL = struct.pack("<I", 0)  # no next IFD
# fLaC marker + last-block STREAMINFO header (type 0, 34 bytes) +
# min/max blocksize 4096 + zero min/max framesize
_FLAC_PRE = (
    b"fLaC\x80\x00\x00\x22" + struct.pack(">HH", 4096, 4096) + b"\x00" * 6
)
_FLAC_MD5 = b"\x00" * 16


def attach_fake_legacy_raster(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL-container GIF/BMP/TIFF column derived from
    an id — the legacy-raster sibling of :func:`attach_fake_webp_avif`
    (round 13). Container by id: id%3==0 → GIF89a (LSD dims + color-
    resolution bits, comment-extension tail), id%3==1 → BMP
    (BITMAPINFOHEADER, header-only file), id%3==2 → little-endian TIFF
    (one IFD with inline SHORT ImageWidth/ImageLength/BitsPerSample).
    Dims are width=id%1000+1, height=id%700+1 (both fit the u16
    fields); depth is id%8+1 (GIF), 24/8 by id parity (BMP), id%15+1
    (TIFF) — all formula-predictable so an oracle can pin every
    decoded field. Built JVM-side like every other attach fixture."""
    mid = F.col(id_col).cast("long")
    w = (mid % 1000 + 1).cast("bigint")
    h = (mid % 700 + 1).cast("bigint")

    def be(c, n_bytes):
        return F.unhex(F.lpad(F.hex(c), 2 * n_bytes, "0"))

    def le(c, n_bytes):
        hx = F.lpad(F.hex(c), 2 * n_bytes, "0")
        pairs = [
            F.substring(hx, 2 * i + 1, 2) for i in reversed(range(n_bytes))
        ]
        return F.unhex(F.concat(*pairs))

    gif = F.concat(
        F.lit(_GIF_SIG),
        le(w, 2),
        le(h, 2),
        be((mid % 8) * 16, 1),  # packed: color resolution = id%8 + 1
        F.lit(b"\x00\x00"),  # background + aspect
        F.lit(_GIF_TAIL),
    )
    bmp_bpp = F.when((mid % 2) == 0, F.lit(24)).otherwise(F.lit(8))
    bmp = F.concat(
        F.lit(_BMP_PRE),
        le(w, 4),
        le(h, 4),
        F.lit(_BMP_PLANES),
        le(bmp_bpp.cast("bigint"), 2),
        F.lit(b"\x00" * 24),  # compression..colors-important zeroed
    )
    tiff = F.concat(
        F.lit(_TIFF_PRE),
        F.lit(_TIFF_E_WIDTH),
        le(w, 2),
        F.lit(b"\x00\x00"),
        F.lit(_TIFF_E_HEIGHT),
        le(h, 2),
        F.lit(b"\x00\x00"),
        F.lit(_TIFF_E_BITS),
        le(mid % 15 + 1, 2),
        F.lit(b"\x00\x00"),
        F.lit(_TIFF_TAIL),
    )
    content = (
        F.when((mid % 3) == 0, gif)
        .when((mid % 3) == 1, bmp)
        .otherwise(tiff)
    )
    return (
        df.withColumn("media_id", mid)
        .withColumn("content", content.cast("binary"))
        .withColumn("media_type", F.lit("image"))
    )


def attach_fake_flac(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL-container FLAC column derived from an id —
    the compressed-audio sibling of :func:`attach_fake_audio` (round
    13): a spec-shaped fLaC stream with a single last-flagged
    STREAMINFO metadata block whose bit-packed core encodes sample
    rate 8000+(id%3)·4000, channels (id%2)+1, 16 bits/sample and
    id%32+16 total samples (the same id formulas the PCM fixture
    uses, so the two audio entries share one oracle arithmetic).
    Header-only: no frames follow the metadata, mirroring what the
    STREAMINFO-only decoder can see. Built JVM-side."""
    mid = F.col(id_col).cast("long")
    sr = (F.lit(8000) + (mid % 3) * 4000).cast("bigint")
    ch = (mid % 2 + 1).cast("bigint")
    total = (mid % 32 + 16).cast("bigint")

    def be(c, n_bytes):
        return F.unhex(F.lpad(F.hex(c), 2 * n_bytes, "0"))

    # STREAMINFO bit-packing (bits/sample fixed at 16 → the low
    # (bps-1)>>4 bit of byte2 is 0 and byte3's high nibble is 0xF):
    packed = F.concat(
        be(F.floor(sr / 4096).cast("bigint"), 1),  # sample rate >> 12
        be((F.floor(sr / 16) % 256).cast("bigint"), 1),  # (sr >> 4) & 255
        be((sr % 16) * 16 + (ch - 1) * 2, 1),  # sr low nibble | channels-1
        F.lit(b"\xf0"),  # (16-1) & 0xF << 4 | total>>32 (= 0 here)
        be(total, 4),
    )
    content = F.concat(F.lit(_FLAC_PRE), packed, F.lit(_FLAC_MD5))
    return (
        df.withColumn("media_id", mid)
        .withColumn("content", content.cast("binary"))
        .withColumn("media_type", F.lit("audio"))
    )


def attach_fake_video(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL-container MP4 column derived from an id —
    the video sibling of :func:`attach_fake_media` /
    :func:`attach_fake_audio`, except the container is spec-shaped
    ISO BMFF (ftyp + moov[mvhd + trak(mdia/hdlr)...]) that any MP4
    tool can walk, not a private magic. Only three things vary with
    the id — timescale 1000·2^(id%3), duration (id%100+1)·500 units,
    and 1 or 2 tracks (vide, +soun when id is odd) — so an oracle can
    predict the decoded metadata exactly. Built JVM-side: constant
    fragments are binary literals, the varying u32s are hex/unhex
    expressions; the encode half never leaves codegen."""
    mid = F.col(id_col).cast("long")
    # 1000 * 2^(id%3): pow is exact for these tiny exponents
    ts = (F.lit(1000) * F.pow(F.lit(2.0), (mid % 3).cast("double"))).cast(
        "long"
    )
    dur = (mid % 100 + 1) * F.lit(500)

    def u32(c):
        return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))

    mvhd = F.concat(
        F.lit(struct.pack(">I4s", _MP4_MVHD_SIZE, b"mvhd")),
        F.lit(_MP4_MVHD_PRE),
        u32(ts),
        u32(dur),
        F.lit(_MP4_MVHD_POST),
    )
    two_tracks = (mid % 2) == 1
    moov_body_len = F.lit(_MP4_MVHD_SIZE + len(_MP4_TRAK_VIDE)) + F.when(
        two_tracks, F.lit(len(_MP4_TRAK_SOUN))
    ).otherwise(F.lit(0))
    content = F.concat(
        F.lit(_MP4_FTYP),
        u32(moov_body_len + 8),
        F.lit(b"moov"),
        mvhd,
        F.lit(_MP4_TRAK_VIDE),
        F.when(two_tracks, F.lit(_MP4_TRAK_SOUN)).otherwise(F.lit(b"")),
    )
    return (
        df.withColumn("media_id", mid)
        .withColumn("content", content.cast("binary"))
        .withColumn("media_type", F.lit("video"))
    )


def decode_video_meta(df: DataFrame) -> DataFrame:
    """MP4 metadata via mapInPandas: major brand, mvhd timescale /
    duration (+ms), track count and handler types (comma-joined in
    mdia order — scalar, so the output stays driver-hashable). One
    Python crossing per Arrow batch, narrow map, partitioning
    preserved — the same discipline as the image/audio decoders.
    Non-ISO-BMFF video (MKV/AVI/WebM) raises at the marked libav
    integration point; malformed MP4 (missing mvhd) yields NULL
    metadata rather than an error, mirroring the image decoder's
    'invalid' rows."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = [
            "media_id",
            "major_brand",
            "timescale",
            "duration_units",
            "duration_ms",
            "n_tracks",
            "track_types",
        ]
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) < 12:
                    out.append((media_id, None, None, None, None, None, None))
                    continue
                content = bytes(content)
                if content[4:8] != b"ftyp":
                    # REAL-CODEC INTEGRATION POINT (libav/PyAV) for
                    # non-ISO-BMFF containers (MKV, AVI, WebM, ...);
                    # MP4/MOV walk above with stdlib struct.
                    raise NotImplementedError(
                        "decoding non-ISO-BMFF video requires libav; "
                        "MP4/MOV containers parse header-only here"
                    )
                parsed = _parse_mp4(content)
                if parsed is None:
                    out.append((media_id, None, None, None, None, None, None))
                    continue
                major, ts, dur, tracks = parsed
                out.append(
                    (
                        media_id,
                        major,
                        ts,
                        dur,
                        dur * 1000.0 / ts,
                        len(tracks),
                        ",".join(tracks),
                    )
                )
            yield pd.DataFrame(out, columns=out_cols)

    return df.select("media_id", "content").mapInPandas(
        meta, VIDEO_META_SCHEMA
    )
