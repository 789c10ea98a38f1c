"""Property-based guards (hypothesis) for the operators whose round-6
rework touched result-shaping plumbing:

- prefix-filtered Jaccard (sorted-at-source sets, LATE candidate
  dedup) must equal the plain inverted-index join on arbitrary
  corpora at every threshold — duplicates from the un-deduped
  candidate stream must collapse exactly, never multiply;
- salted aggregation/join must equal their unsalted twins on
  arbitrary (skewed, null-bearing) inputs — salting is pure plumbing.

One Spark job per hypothesis case list; small alphabets force heavy
shingle overlap so candidate duplication (shared prefix elements) is
actually exercised.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators import dedup as D
from usgs_earthquake_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# tiny vocabulary => heavy n-gram collisions between documents
_DOC = st.lists(
    st.sampled_from(["a", "b", "c", "aa", "bb"]), min_size=0, max_size=12
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=10)


@given(docs=_CORPUS, threshold=st.sampled_from([0.3, 0.5, 0.7, 0.9]))
@_SETTINGS
def test_prefix_jaccard_equals_inverted_index(spark, docs, threshold):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    exact = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=threshold
        ).collect()
    }
    prefix = D.ngram_jaccard_prefix_pairs(
        df, "doc_id", "text", threshold=threshold
    )
    got = [(r.id_a, r.id_b, r.jaccard) for r in prefix.collect()]
    # exact same pair set AND no duplicated output rows (the late
    # distinct must collapse the multi-prefix-match candidates)
    assert len(got) == len(set(got))
    assert set(got) == exact


_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["hot", "hot", "hot", "warm", "cold"]),  # skewed key
        st.one_of(st.none(), st.integers(-1000, 1000)),
        st.integers(0, 10_000),
    ),
    min_size=0,
    max_size=30,
)


@given(rows=_ROWS)
@_SETTINGS
def test_salted_aggregate_equals_plain_groupby(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long, uid long")
    plain = {
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "n": ("count", "v"),
                "s": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            salt_col="uid",
            n_salts=4,
        ).collect()
    }
    assert salted == plain


@given(rows=_ROWS)
@_SETTINGS
def test_salted_join_equals_plain_join(spark, rows):
    big = spark.createDataFrame(rows, "k string, v long, uid long")
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2)], "k string, tier int"
    )
    def _key(t):
        return tuple((v is None, repr(v)) for v in t)

    plain = sorted(
        ((r.k, r.v, r.uid, r.tier) for r in big.join(dim, "k").collect()),
        key=_key,
    )
    salted = sorted(
        (
            (r.k, r.v, r.uid, r.tier)
            for r in salted_join(big, dim, "k", n_salts=4).collect()
        ),
        key=_key,
    )
    assert salted == plain
