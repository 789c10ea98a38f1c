"""Compression-ratio signal: the Arrow-batched UDF must equal a
driver-side zlib reference EXACTLY (deflate is deterministic for a
fixed input/level), and the catalog entry's profile must match a
recomputation from raw text."""

from __future__ import annotations

import zlib

from usgs_earthquake_data_pipeline_spark.functions.compress import (
    DEFLATE_LEVEL,
    compression_ratio,
)
from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def _py_ratio(t: str) -> float | None:
    raw = t.encode("utf-8")
    if not raw:
        return None
    return round(len(zlib.compress(raw, DEFLATE_LEVEL)) / len(raw), 6)


def test_udf_matches_zlib_reference_exactly(spark):
    texts = [
        "a" * 500,
        "the quick brown fox jumps over the lazy dog " * 5,
        "x",
        "",
        None,
        "ab" * 1000,
        "päragraph ünicode ß " * 10,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: r.ratio
        for r in df.select("i", compression_ratio("text").alias("ratio")).collect()
    }
    for i, t in enumerate(texts):
        want = None if t is None else _py_ratio(t)
        assert got[i] == want, (i, got[i], want)


def test_entry_profile_matches_recomputation(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.llm_ops import (
        compression_profile,
    )

    rows = compression_profile(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    by_src: dict[str, list[float]] = {}
    for r in docs:
        v = _py_ratio(r.text)
        if v is not None:
            by_src.setdefault(r.source, []).append(v)
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        vals = by_src[r.source]
        assert r.n_docs == len(vals)
        assert r.min_ratio == min(vals) and r.max_ratio == max(vals)
        assert abs(r.avg_ratio - sum(vals) / len(vals)) < 2e-6
    # signal sanity: repetitive text compresses below 1
    assert all(r.avg_ratio < 1.0 for r in rows)
    # the hash-gated catalog entry: same source domain/doc counts, and
    # the compressBound theorem boolean holds on every source
    gated = CATALOG["text_compression_ratio"].spark_fn(spark, sf_dir).collect()
    assert {(r.source, r.n_docs) for r in gated} == {
        (s, len(v)) for s, v in by_src.items()
    }
    assert all(r.deflate_bound_ok for r in gated), gated


def test_ncd_matrix_byte_exact_replay(spark, sf_dir):
    import zlib

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
    from usgs_earthquake_data_pipeline_spark.plans.llm_ops import (
        ncd_matrix_full,
    )

    got = {
        (r.src_a, r.src_b): r
        for r in ncd_matrix_full(spark, sf_dir).collect()
    }
    assert got
    # driver-side replay: same blobs (first 20 docs by id), same zlib
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_source = {}
    for row in sorted(docs, key=lambda r: r.doc_id):
        by_source.setdefault(row.source, []).append(row.text)
    blobs = {s: "\n".join(t[:20]) for s, t in by_source.items()}

    def c(x: str) -> int:
        return len(zlib.compress(x.encode("utf-8"), 6))

    for (a, b), r in got.items():
        ca, cb = c(blobs[a]), c(blobs[b])
        cab = c(blobs[a] + "\n" + blobs[b])
        assert (r.c_a, r.c_b, r.c_ab) == (ca, cb, cab)
        assert r.ncd == round((cab - min(ca, cb)) / max(ca, cb), 6)
    # the hash-gated catalog entry: same pair domain, blob lengths
    # match the replay, and both bound booleans hold on every pair
    gated = {
        (r.src_a, r.src_b): r
        for r in CATALOG["source_ncd_matrix"].spark_fn(spark, sf_dir).collect()
    }
    assert gated.keys() == got.keys()
    for (a, b), r in gated.items():
        assert (r.blob_len_a, r.blob_len_b) == (len(blobs[a]), len(blobs[b]))
        assert r.ncd_range_ok and r.c_bounds_ok, r


def test_ncd_mirror_source_scores_low(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.plans.llm_ops import (
        ncd_matrix_full,
    )

    # srcA and its mirror share identical text; srcC is unrelated
    base = "the quick brown fox jumps over the lazy dog " * 10
    rows = []
    for i in range(20):
        rows.append((i, base + f" tail{i}", "en", "srcA", len(base)))
        rows.append((100 + i, base + f" tail{i}", "en", "srcB", len(base)))
        rows.append(
            (200 + i, f"zw{i}qx " * 40 + str(i * 7919), "en", "srcC", 200)
        )
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.src_a, r.src_b): r.ncd
        for r in ncd_matrix_full(spark, str(tmp_path)).collect()
    }
    # mirrors compress together — but zlib NCD never reaches 0 when
    # the blobs are internally redundant (small C(a) inflates the
    # ratio; the classic zlib-NCD artifact), so the robust claim is
    # the ORDERING, with a generous absolute cap
    assert got[("srcA", "srcB")] < 0.55
    assert got[("srcA", "srcC")] > got[("srcA", "srcB")] + 0.2
    assert got[("srcB", "srcC")] > got[("srcA", "srcB")] + 0.2


def test_ratio_bracket_flips_on_identity_compressor(spark, sf_dir, monkeypatch):
    """Teeth (round-13 verdict item 4): the corpus-measured per-source
    mean-ratio bracket [0.35, 0.80] must catch a do-nothing compressor
    that the compressBound expansion envelope alone cannot — inject a
    stub returning len(raw) THROUGH the operator (monkeypatched
    deflate_size) and require ratio_bracket_ok to flip false for every
    source while the (still-satisfied) envelope boolean stays true."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from usgs_earthquake_data_pipeline_spark.functions import compress

    # genuine entry first: both booleans true on the real kernel
    real = {
        r.source: r
        for r in CATALOG["text_compression_ratio"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert all(r.deflate_bound_ok and r.ratio_bracket_ok for r in real.values())

    identity_size = pandas_udf(
        lambda texts: texts.map(
            lambda t: len(t.encode("utf-8")) if t else None
        ).astype("Int64"),
        "int",
    )

    def stub(col):
        c = F.col(col) if isinstance(col, str) else col
        return identity_size(c)

    monkeypatch.setattr(compress, "deflate_size", stub)
    corrupted = {
        r.source: r
        for r in CATALOG["text_compression_ratio"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(corrupted) == set(real)
    for r in corrupted.values():
        assert not r.ratio_bracket_ok, r  # mean ratio 1.0 > 0.80
        assert r.deflate_bound_ok, r  # envelope alone is blind to it
