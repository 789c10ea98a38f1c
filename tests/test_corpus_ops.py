"""Semantic invariants for the corpus-curation entries (the oracle
differential in test_catalog_oracle.py proves cross-engine equality;
these pin properties the oracle alone doesn't make obvious)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions import text as T
from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def test_corpus_shuffle_is_a_partition_into_contiguous_ranks(spark, sf_dir):
    """Every document appears exactly once; within each shard the
    positions are exactly 1..|shard| (a permutation, no gaps/dupes)."""
    out = CATALOG["corpus_shuffle_deterministic"].spark_fn(spark, sf_dir)
    rows = out.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_corpus_shuffle_is_seed_stable(spark, sf_dir):
    a = CATALOG["corpus_shuffle_deterministic"].spark_fn(spark, sf_dir)
    b = CATALOG["corpus_shuffle_deterministic"].spark_fn(spark, sf_dir)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_pack_sequences_conserves_tokens_and_bins_are_contiguous(
    spark, sf_dir
):
    out = CATALOG["pack_sequences_2048"].spark_fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(T.bpe_token_count("text").cast("long")).alias("t")
    ).collect()[0].t
    assert sum(r.n_tokens for r in out) == total
    assert sum(r.n_docs for r in out) == docs.count()
    bins = [r.bin for r in out]
    assert bins == list(range(len(bins)))  # contiguous from 0, ordered


def test_mixture_downsample_never_exceeds_source_counts(spark, sf_dir):
    kept = {
        r.source: r.n_kept
        for r in CATALOG["mixture_downsample_uniform"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    full = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(kept) <= set(full)
    for source, n_kept in kept.items():
        assert 0 < n_kept <= full[source], source


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    out = CATALOG["decontaminate_ngram_overlap"].spark_fn(spark, sf_dir)
    assert out.filter(F.col("doc_id") % 20 == 0).count() == 0


def test_incremental_dedup_admits_no_existing_fingerprint(spark, sf_dir):
    out = CATALOG["dedup_incremental_new_batch"].spark_fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8).select(
        F.md5("text").alias("fp")
    )
    assert out.join(existing, "fp", "inner").count() == 0
    # and every admitted doc is from the new batch
    assert out.filter(F.col("doc_id") % 10 < 8).count() == 0


def test_normalized_dedup_is_at_most_as_fine_as_exact(spark, sf_dir):
    """Normalization can only merge groups, never split them: the
    number of normalized fingerprints is <= the number of exact ones."""
    n_norm = CATALOG["dedup_normalized_text"].spark_fn(spark, sf_dir).count()
    n_exact = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("fp"))
        .distinct()
        .count()
    )
    assert n_norm <= n_exact
