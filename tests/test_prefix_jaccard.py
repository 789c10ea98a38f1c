"""Exactness of the prefix-filtered (PPJoin) Jaccard join against the
inverted-index twin — the property the positional filter must never
break: a candidate may only be pruned when the positional upper bound
proves it cannot reach the threshold.

Run on the driver corpus at several thresholds plus adversarial edge
corpora (identical docs, near-identical docs, tiny docs, shared-prefix
docs) generated deterministically.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators import dedup as D
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def _pairs(df, fn, threshold):
    out = fn(df, "doc_id", "text", threshold=threshold)
    return {
        (r.id_a, r.id_b, r.jaccard) for r in out.collect()
    }


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7, 0.9])
def test_prefix_equals_inverted_on_corpus(spark, sf_dir, threshold):
    docs = load_table(spark, sf_dir, "documents")
    exact = _pairs(docs, D.ngram_jaccard_pairs, threshold)
    prefix = _pairs(docs, D.ngram_jaccard_prefix_pairs, threshold)
    assert prefix == exact


def _edge_corpus(spark):
    """Deterministic adversarial corpus: duplicate docs, one-token-edit
    near-duplicates, docs below shingle size, and a block sharing a
    long common prefix (stresses the positional filter's bound)."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    base = [rng.choice(vocab) for _ in range(40)]
    for i in range(10):  # identical block
        rows.append((i, " ".join(base)))
    for i in range(10, 20):  # one substitution each
        t = list(base)
        t[i % len(t)] = "xx"
        rows.append((i, " ".join(t)))
    for i in range(20, 25):  # below 3-gram size
        rows.append((i, "one two"[: (i % 3) * 3]))
    prefix_block = base[:20]
    for i in range(25, 35):  # long shared prefix, divergent tails
        tail = [rng.choice(vocab) for _ in range(20)]
        rows.append((i, " ".join(prefix_block + tail)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.8, 0.95])
def test_prefix_equals_inverted_on_edge_corpus(spark, threshold):
    docs = _edge_corpus(spark)
    exact = _pairs(docs, D.ngram_jaccard_pairs, threshold)
    prefix = _pairs(docs, D.ngram_jaccard_prefix_pairs, threshold)
    assert prefix == exact
    if threshold <= 0.8:
        # sanity: the corpus actually produces pairs at this threshold
        assert exact


def test_identical_docs_score_one(spark):
    docs = _edge_corpus(spark).filter(F.col("doc_id") < 10)
    got = _pairs(docs, D.ngram_jaccard_prefix_pairs, 0.99)
    assert got == {(a, b, 1.0) for a in range(10) for b in range(a + 1, 10)}
