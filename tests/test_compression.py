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
    rows = CATALOG["text_compression_ratio"].spark_fn(spark, sf_dir).collect()
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
