"""Property-based tests (hypothesis) for the stdlib container parsers
(functions/multimodal.py): arbitrary bytes must never raise — every
parser either extracts metadata or returns None — and planted valid
containers embedded in adversarial surroundings still parse. Pure
Python, no Spark session."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.functions.multimodal import (
    _parse_avif_dims,
    _parse_jpeg_dims,
    _parse_mp4,
    _parse_bmp_dims,
    _parse_flac,
    _parse_gif_dims,
    _parse_tiff_dims,
    _parse_wav,
    _parse_webp_dims,
    _walk_boxes,
)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_parsers_never_raise_on_garbage(data):
    # any outcome is fine; raising is not
    _parse_mp4(data)
    _parse_wav(data)
    _parse_jpeg_dims(data)
    _parse_webp_dims(data)
    _parse_avif_dims(data)
    list(_walk_boxes(data, 0, len(data)))


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_mp4_prefixed_garbage_never_raises(tail):
    # a real ftyp header followed by garbage: the walker must stop at
    # the first malformed box, never index out of range
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00" * 4
    _parse_mp4(ftyp + tail)


@settings(max_examples=100, deadline=None)
@given(
    ts=st.integers(min_value=1, max_value=2**32 - 1),
    dur=st.integers(min_value=0, max_value=2**32 - 1),
    version=st.sampled_from([0, 1]),
    pad=st.binary(max_size=32),
)
def test_mp4_planted_mvhd_always_recovered(ts, dur, version, pad):
    """A well-formed ftyp+moov/mvhd with arbitrary timescale/duration
    and a trailing junk box must parse to exactly the planted values."""

    def box(btype, body):
        return struct.pack(">I4s", 8 + len(body), btype) + body

    if version == 1:
        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(">IQ", ts, dur),
        )
    else:
        mvhd = box(b"mvhd", b"\x00" * 12 + struct.pack(">II", ts, dur))
    content = (
        box(b"ftyp", b"mp42" + b"\x00" * 4)
        + box(b"moov", mvhd)
        + box(b"junk", pad)
    )
    parsed = _parse_mp4(content)
    assert parsed is not None
    major, got_ts, got_dur, tracks = parsed
    assert (major, got_ts, got_dur, tracks) == ("mp42", ts, dur, [])


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16_383),
    h=st.integers(min_value=1, max_value=16_383),
    variant=st.sampled_from(["vp8x", "vp8", "vp8l"]),
    tail=st.binary(max_size=32),
)
def test_webp_planted_dims_always_recovered(w, h, variant, tail):
    """All three WebP dimension encodings round-trip through the RIFF
    chunk walk, with trailing junk (incl. a lying chunk size) ignored
    up to the dimension-bearing chunk."""
    if variant == "vp8x":
        body = (
            b"\x02\x00\x00\x00"
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    elif variant == "vp8":
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    else:
        bits = (w - 1) | ((h - 1) << 14)
        body = b"\x2f" + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body + b"\x00"
    # an unknown leading chunk the walker must skip (word-aligned)
    lead = b"EXIF" + struct.pack("<I", 3) + b"abc\x00"
    riff_body = b"WEBP" + lead + chunk + tail
    data = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    assert _parse_webp_dims(data) == (w, h)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=2**32 - 1),
    h=st.integers(min_value=1, max_value=2**32 - 1),
    depth=st.one_of(st.none(), st.integers(min_value=1, max_value=16)),
    pad=st.binary(max_size=24),
)
def test_avif_planted_ispe_always_recovered(w, h, depth, pad):
    """A spec-shaped meta/iprp/ipco/ispe chain embedded next to junk
    boxes parses to exactly the planted dims (+ pixi depth)."""

    def box(btype, body):
        return struct.pack(">I4s", 8 + len(body), btype) + body

    props = box(b"ispe", b"\x00" * 4 + struct.pack(">II", w, h))
    if depth is not None:
        props += box(b"pixi", b"\x00" * 4 + bytes([1, depth]))
    meta = box(b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", props)))
    data = (
        box(b"ftyp", b"avif" + b"\x00" * 4)
        + box(b"free", pad)
        + meta
        + box(b"mdat", b"\x00" * 4)
    )
    assert _parse_avif_dims(data) == (w, h, depth)


@settings(max_examples=100, deadline=None)
@given(short=st.integers(min_value=0, max_value=31))
def test_mp4_mvhd_v1_short_body_is_malformed_not_v0(short):
    """An mvhd that claims version 1 but whose body is shorter than the
    32 bytes the v1 layout needs is malformed: the parser must return
    None (or ignore the box), never fall through and read the v1
    creation/modification-time bytes as the v0 timescale/duration."""

    def box(btype, body):
        return struct.pack(">I4s", 8 + len(body), btype) + body

    body = (b"\x01\x00\x00\x00" + b"\xff" * 32)[:short]
    content = box(b"ftyp", b"mp42" + b"\x00" * 4) + box(
        b"moov", box(b"mvhd", body)
    )
    assert _parse_mp4(content) is None


@settings(max_examples=100, deadline=None)
@given(
    sr=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=8),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=64
    ),
    junk=st.binary(max_size=16),
)
def test_wav_planted_header_always_recovered(sr, channels, samples, junk):
    data = b"".join(struct.pack("<h", s) for s in samples)
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        # a trailing chunk with a LYING size (points past EOF): the
        # walker must treat it as truncated, not crash
        + b"LIST" + struct.pack("<I", 1 << 20) + junk
    )
    parsed = _parse_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert parsed is not None
    got_channels, got_sr, n_frames, _ = parsed
    assert (got_channels, got_sr) == (channels, sr)
    assert n_frames == len(data) // block


# ---------------------------------------------------------------------------
# Round-13 legacy-format sweep: GIF / BMP / TIFF dims, FLAC STREAMINFO
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_legacy_parsers_never_raise_on_garbage(data):
    _parse_gif_dims(data)
    _parse_bmp_dims(data)
    _parse_tiff_dims(data)
    _parse_flac(data)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_legacy_parsers_prefixed_garbage_never_raises(tail):
    # real magics followed by garbage: bounds-checked walks, no raise
    _parse_gif_dims(b"GIF89a" + tail)
    _parse_bmp_dims(b"BM" + tail)
    _parse_tiff_dims(b"II\x2a\x00" + tail)
    _parse_tiff_dims(b"MM\x00\x2a" + tail)
    _parse_flac(b"fLaC" + tail)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=65_535),
    h=st.integers(min_value=1, max_value=65_535),
    cres=st.integers(min_value=0, max_value=7),
    tail=st.binary(max_size=32),
)
def test_gif_planted_lsd_always_recovered(w, h, cres, tail):
    data = (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([cres << 4])
        + b"\x00\x00"
        + tail
    )
    assert _parse_gif_dims(data) == (w, h, cres + 1)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=2**28),
    h=st.integers(min_value=1, max_value=2**28),
    bpp=st.sampled_from([1, 4, 8, 16, 24, 32]),
    topdown=st.booleans(),
    core=st.booleans(),
)
def test_bmp_planted_header_always_recovered(w, h, bpp, topdown, core):
    if core:  # OS/2 BITMAPCOREHEADER: u16 fields
        w, h = w % 65_535 + 1, h % 65_535 + 1
        dib = struct.pack("<IHHHH", 12, w, h, 1, bpp)
    else:
        sh = -h if topdown else h
        dib = struct.pack("<IiiHH", 40, w, sh, 1, bpp) + b"\x00" * 24
    data = (
        b"BM"
        + struct.pack("<I", 14 + len(dib))
        + b"\x00" * 4
        + struct.pack("<I", 14 + len(dib))
        + dib
    )
    assert _parse_bmp_dims(data) == (w, h, bpp)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=65_535),
    bits=st.integers(min_value=1, max_value=64),
    big=st.booleans(),
    tail=st.binary(max_size=16),
)
def test_tiff_planted_ifd_always_recovered(w, h, bits, big, tail):
    """Width as inline LONG, height as inline SHORT, both byte
    orders; an unknown tag and a behind-offset (count>1) tag must be
    skipped, trailing junk ignored."""
    en = ">" if big else "<"

    def entry(tag, vtype, count, raw4):
        return struct.pack(en + "HHI", tag, vtype, count) + raw4

    entries = [
        entry(255, 3, 1, struct.pack(en + "H", 9) + b"\x00\x00"),  # unknown
        entry(256, 4, 1, struct.pack(en + "I", w)),
        entry(257, 3, 1, struct.pack(en + "H", h) + b"\x00\x00"),
        entry(258, 3, 1, struct.pack(en + "H", bits) + b"\x00\x00"),
        entry(259, 3, 3, struct.pack(en + "I", 999)),  # offset-valued
    ]
    magic = b"MM\x00\x2a" if big else b"II\x2a\x00"
    data = (
        magic
        + struct.pack(en + "I", 8)
        + struct.pack(en + "H", len(entries))
        + b"".join(entries)
        + struct.pack(en + "I", 0)
        + tail
    )
    assert _parse_tiff_dims(data) == (w, h, bits)


@settings(max_examples=100, deadline=None)
@given(
    sr=st.integers(min_value=1, max_value=(1 << 20) - 1),
    channels=st.integers(min_value=1, max_value=8),
    bits=st.integers(min_value=4, max_value=32),
    total=st.integers(min_value=0, max_value=(1 << 36) - 1),
    lead_pad=st.binary(max_size=16),
)
def test_flac_planted_streaminfo_always_recovered(
    sr, channels, bits, total, lead_pad
):
    """The bit-packed STREAMINFO core round-trips, including behind a
    leading PADDING block (reordered-writer tolerance)."""
    core = bytes(
        [
            (sr >> 12) & 0xFF,
            (sr >> 4) & 0xFF,
            ((sr & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4),
            (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF),
        ]
    ) + (total & 0xFFFFFFFF).to_bytes(4, "big")
    body = struct.pack(">HH", 4096, 4096) + b"\x00" * 6 + core + b"\x00" * 16
    pad_block = b"\x01" + len(lead_pad).to_bytes(3, "big") + lead_pad
    data = b"fLaC" + pad_block + b"\x80" + b"\x00\x00\x22" + body
    assert _parse_flac(data) == (channels, sr, total, bits)
