"""Content-defined chunking (``functions.text.cdc_chunks`` + catalog
entry ``docs_chunk_cdc``): structural invariants and the
shift-robustness property that distinguishes CDC from fixed-offset
chunking, each checked against a pure-Python reference."""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions import text as T
from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG


def _py_tokens(s: str) -> list[str]:
    t = s.strip(" ")
    toks = re.split(r"[ \t\n\x0b\f\r]+", t) if t else []
    return [w for w in toks if w]


def _py_cdc(tokens: list[str], prefixes: str = "0") -> list[str]:
    chunks, cur = [], []
    for t in tokens:
        cur.append(t)
        if hashlib.md5(t.encode()).hexdigest()[0] in prefixes:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def _spark_chunks(spark, texts: list[str], prefixes: str = "0"):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select(
        "i", T.cdc_chunks(T.tokens("text"), prefixes).alias("chunks")
    ).collect()
    return {r.i: list(r.chunks) for r in rows}


_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Nd"), whitelist_characters=" .-\t"
    ),
    max_size=120,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
@_SETTINGS
def test_cdc_matches_python_reference(spark, texts):
    got = _spark_chunks(spark, texts)
    for i, text in enumerate(texts):
        assert got[i] == _py_cdc(_py_tokens(text)), (i, text)


@given(text=_TEXT)
@_SETTINGS
def test_cdc_conserves_tokens_and_boundaries(spark, text):
    """Every token lands in exactly one chunk, order preserved; every
    chunk but possibly the last ends in a boundary token, and no
    non-final token of any chunk is a boundary token."""
    toks = _py_tokens(text)
    chunks = _spark_chunks(spark, [text])[0]
    reassembled = [t for c in chunks for t in c.split(" ")]
    assert reassembled == toks or (not toks and chunks == [])
    for ci, c in enumerate(chunks):
        parts = c.split(" ")
        for t in parts[:-1]:
            assert hashlib.md5(t.encode()).hexdigest()[0] != "0", (ci, t)
        if ci < len(chunks) - 1:
            assert hashlib.md5(parts[-1].encode()).hexdigest()[0] == "0"


def test_cdc_shift_robust_vs_fixed_offsets(spark):
    """The CDC property: prepending tokens changes only chunks up to
    the first boundary — every later chunk keeps its identity (hash),
    so chunk-level dedup still matches the unshifted document."""
    base = " ".join(f"w{i}" for i in range(400))
    shifted = "zzz " + base
    a = _py_cdc(_py_tokens(base))
    b = _py_cdc(_py_tokens(shifted))
    assert a != b
    # all but the first chunk of each are identical suffixes
    assert a[1:] == b[1:] or a == b[1:] or a[1:] == b[2:]
    # and Spark agrees with the reference on both
    got = _spark_chunks(spark, [base, shifted])
    assert got[0] == a and got[1] == b


def test_cdc_custom_prefix_width(spark):
    """Two hex prefixes ≈ half the expected chunk length; the fold
    must honor the parameter, not hardcode '0'."""
    text = " ".join(f"tok{i}" for i in range(300))
    one = _spark_chunks(spark, [text], "0")[0]
    two = _spark_chunks(spark, [text], "08")[0]
    assert len(two) > len(one)
    assert two == _py_cdc(_py_tokens(text), "08")


def test_catalog_entry_top50_is_deterministic_and_bounded(spark, sf_dir):
    out = CATALOG["docs_chunk_cdc"].spark_fn(spark, sf_dir).collect()
    assert 0 < len(out) <= 50
    # sorted by (occurrences desc, hash asc); counts are sane
    occ = [(r.occurrences, r.chunk_hash) for r in out]
    assert occ == sorted(occ, key=lambda p: (-p[0], p[1]))
    for r in out:
        assert r.n_docs <= r.occurrences
        assert r.chunk_tokens >= 1
