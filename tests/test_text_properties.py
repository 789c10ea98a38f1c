"""Property-based tests (hypothesis) for the text column functions:
the Spark expressions must agree with a trivial pure-Python reference
on arbitrary inputs, batched through one Spark job per property run
(hypothesis drives data generation; Spark evaluates once per case
list to keep runtime sane)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.functions import text as T
from pyspark.sql import functions as F

# printable-ish text incl. whitespace runs, punctuation, digits
_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        whitelist_characters="\t @._%+-",
    ),
    max_size=80,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_tokens(s: str) -> list[str]:
    """Engine-contract tokenizer: Spark's Java regex and DuckDB's RE2
    both use ASCII-only ``\\s`` (unlike Python's Unicode-aware one),
    and both engines' ``trim`` strips ASCII spaces only — so a leading
    tab yields a leading empty token on BOTH engines identically.
    This reference reproduces that contract, Unicode quirks included."""
    t = s.strip(" ")
    return re.split(r"[ \t\n\x0b\f\r]+", t) if t else []


def _py_ngrams(s: str, n: int) -> list[str]:
    toks = _py_tokens(s)
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _py_dup_frac(arr: list[str]) -> float:
    if not arr:
        return 0.0
    return round(1.0 - len(set(arr)) / len(arr), 6)


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_ngrams_and_dup_fraction_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    rows = {
        r.i: r
        for r in df.select(
            "i",
            T.word_ngrams("text", 2).alias("g2"),
            T.word_ngrams("text", 3).alias("g3"),
            T.duplicate_fraction(T.word_ngrams("text", 2)).alias("d2"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert rows[i].g2 == _py_ngrams(t, 2), repr(t)
        assert rows[i].g3 == _py_ngrams(t, 3), repr(t)
        assert abs(rows[i].d2 - _py_dup_frac(_py_ngrams(t, 2))) < 1e-9


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_redact_pii_matches_python_and_is_idempotent(spark, texts):
    email = re.compile(T.EMAIL_RE)
    ip = re.compile(T.IPV4_RE)

    def py_redact(s: str) -> str:
        return ip.sub("<IP>", email.sub("<EMAIL>", s))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    out = {
        r.i: (r.red, r.red2)
        for r in df.select(
            "i",
            T.redact_pii("text").alias("red"),
            T.redact_pii(T.redact_pii("text")).alias("red2"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i][0] == py_redact(t), repr(t)
        assert out[i][1] == out[i][0], repr(t)  # idempotent


def test_token_count_matches_python_on_unicode_whitespace(spark):
    cases = ["a b", "a b c", "　", "x y"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "text"])
    got = {r.i: r.n for r in df.select("i", T.token_count("text").alias("n")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == len(_py_tokens(c)), repr(c)


_ASCII_TEXT = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x7E
    ),
    max_size=80,
)


def _py_normalize_ascii(s: str) -> str:
    s = re.sub(r"[^a-z0-9 ]", "", s.lower())
    s = re.sub(r" +", " ", s)
    return s.strip(" ")


@_SETTINGS
@given(st.lists(_ASCII_TEXT, min_size=1, max_size=8))
def test_normalize_ascii_matches_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    got = {
        r.i: r.n
        for r in df.select("i", T.normalize_ascii("text").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_normalize_ascii(t), repr(t)
