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
    _parse_jpeg_dims,
    _parse_mp4,
    _parse_wav,
    _walk_boxes,
)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_parsers_never_raise_on_garbage(data):
    # any outcome is fine; raising is not
    _parse_mp4(data)
    _parse_wav(data)
    _parse_jpeg_dims(data)
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
