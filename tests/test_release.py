"""End-to-end dataset-release build (plans/release.py): curation →
split → consistent multi-table snapshot, reproducible and frozen."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark import sinks
from usgs_earthquake_data_pipeline_spark.plans.release import (
    _curated_docs,
    build_dataset_release,
)


def _content(spark, root, name):
    tables = sinks.read_snapshot(spark, root, name)
    return {
        t: sorted(tuple(r) for r in df.collect()) for t, df in tables.items()
    }


def test_release_build_partitions_curated_docs_exactly(spark, sf_dir, tmp_path):
    root = str(tmp_path / "rel")
    versions = build_dataset_release(spark, sf_dir, root, "v1")
    assert set(versions) == {"train", "val", "test", "stats"}
    tables = sinks.read_snapshot(spark, root, "v1")
    n_curated = _curated_docs(spark, sf_dir).count()
    n_split = sum(tables[s].count() for s in ("train", "val", "test"))
    assert n_split == n_curated  # splits partition the curated corpus
    # disjoint membership
    ids = [
        {r.doc_id for r in tables[s].select("doc_id").collect()}
        for s in ("train", "val", "test")
    ]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    # stats table reconciles with the splits
    stats_total = (
        tables["stats"].agg(F.sum("n_docs").alias("n")).first().n
    )
    assert stats_total == n_curated


def test_release_rebuild_is_reproducible_and_frozen(spark, sf_dir, tmp_path):
    """Same input -> byte-identical release content; a newer release
    never changes what the old name resolves to."""
    root = str(tmp_path / "rel")
    build_dataset_release(spark, sf_dir, root, "v1")
    v1 = _content(spark, root, "v1")
    build_dataset_release(spark, sf_dir, root, "v2")
    assert _content(spark, root, "v2") == v1  # deterministic rebuild
    assert _content(spark, root, "v1") == v1  # v1 frozen after v2
    assert sinks.list_snapshots(spark, root) == ["v1", "v2"]


def test_release_train_split_supports_pruned_reads(spark, sf_dir, tmp_path):
    root = str(tmp_path / "rel")
    versions = build_dataset_release(spark, sf_dir, root, "v1")
    pruned = sinks.read_versioned_table_pruned(
        spark, f"{root}/train", {"n_chars": (0, 200)}, version=versions["train"]
    )
    full = sinks.read_snapshot(spark, root, "v1")["train"].filter(
        F.col("n_chars").between(0, 200)
    )
    assert {r.doc_id for r in pruned.collect()} == {
        r.doc_id for r in full.collect()
    }
