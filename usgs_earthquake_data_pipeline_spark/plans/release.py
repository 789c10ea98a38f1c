"""Dataset-release build: the capstone pipeline that ties the corpus
stages to the warehouse layer.

``build_dataset_release`` runs the full curation chain (quality gates
→ exact dedup → deterministic train/val/test split) and commits the
result as ONE multi-table snapshot (``sinks.commit_snapshot``):
train/val/test + a stats table, all pinned at consistent versions,
with per-file ``n_chars`` stats on the train split for data-skipping
reads. Everything inside is the same code the catalog entries verify
under the DuckDB hash gate (``curation_corpus_pipeline``,
``split_train_val_test``); this module only composes.

Reproducibility: every stage is deterministic (codegen gates, md5
fingerprints, hash-bucket splits — no RNG, no timestamps), so
rebuilding the same input yields byte-identical membership; a
committed release then stays frozen forever via the snapshot manifest
regardless of later table commits (tested).

Scale: one corpus scan feeds the gates; the dedup shuffle carries
gate survivors only; split membership is a scan-side hash filter;
the three split writes are range-clustered by ``n_chars`` so the
stats sidecars give disjoint per-file ranges (data skipping bites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..sinks import commit_snapshot
from ..sources.tables import load_table
from .sampling import hash_bucket


def _curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gates + first-doc-wins exact dedup — the verified
    ``curation_corpus_pipeline`` front end, keeping doc rows."""
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(T.quality_gate("text")).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.col("n_chars"),
        T.token_count("text").cast("long").alias("n_tok"),
        T.fingerprint_md5("text").alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )


def build_dataset_release(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    name: str,
    val_pct: int = 10,
    test_pct: int = 10,
) -> dict[str, int]:
    """Curate, split, and commit a named release. Returns the
    snapshot's ``{table: version}`` map. Splits are hash-bucketed on
    ``doc_id`` (stable under corpus growth: adding documents never
    moves an existing one between splits)."""
    curated = _curated_docs(spark, sf_dir)
    bucket = hash_bucket("doc_id", 100)
    split = (
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train")
    )
    tagged = curated.withColumn("split", split)
    tables = {
        s: tagged.filter(F.col("split") == s)
        .drop("split")
        .repartitionByRange(4, "n_chars")
        for s in ("train", "val", "test")
    }
    tables["stats"] = (
        tagged.groupBy("split", "source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .coalesce(1)
    )
    return commit_snapshot(
        spark,
        root,
        tables,
        name,
        stats_cols={"train": ["n_chars"]},
    )
