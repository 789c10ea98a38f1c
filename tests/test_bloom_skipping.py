"""Versioned-table Bloom data-skipping tests: point lookups prune
files min/max stats cannot, pruning never changes results, false
positives only cost a read, and the sidecar stays vacuum-compatible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.sinks import (
    _bloom_excludes,
    _norm_file_uri,
    _read_file_stats,
    read_versioned_table,
    read_versioned_table_pruned,
    save_versioned_table,
    vacuum_versions,
)


@pytest.fixture(scope="module")
def bloomed_table(spark, tmp_path_factory):
    # 40 files; `key` is HASH-scattered (every file's [min, max] spans
    # nearly the whole domain -> min/max skipping is useless for point
    # lookups on it), which is exactly the bloom's job.
    path = str(tmp_path_factory.mktemp("vt") / "bloomed")
    df = (
        spark.range(0, 8_000)
        .withColumn("key", F.concat(F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(2_000))))
        .withColumn("v", F.col("id").cast("double"))
    )
    save_versioned_table(
        df.repartition(40, "key"),
        path,
        stats_cols=["v"],
        bloom_cols=["key"],
        bloom_bits=1 << 12,
    )
    return path


def test_sidecar_carries_bloom_section(spark, bloomed_table):
    stats = _read_file_stats(spark, bloomed_table, 0)
    bloom = stats["bloom"]
    assert bloom["m"] == 1 << 12 and bloom["k"] == 3
    assert set(bloom["cols"]) == {"key"}
    bitmaps = bloom["cols"]["key"]
    assert len(bitmaps) == 40
    assert all(len(bm) == (1 << 12) // 64 for bm in bitmaps.values())


def test_point_lookup_prunes_and_matches_full_scan(spark, bloomed_table):
    full = read_versioned_table(spark, bloomed_table)
    # a key that exists: repartition(40, "key") co-locates all its rows
    # in ONE file, and the bloom must find (at least) that file
    some_key = full.select("key").first().key
    pruned = read_versioned_table_pruned(
        spark, bloomed_table, equals={"key": some_key}
    )
    want = full.filter(F.col("key") == some_key)
    assert sorted(r.id for r in pruned.collect()) == sorted(
        r.id for r in want.collect()
    )
    n_read = len(pruned.inputFiles())
    assert 1 <= n_read < 40, n_read  # real skipping happened


def test_absent_key_reads_almost_nothing(spark, bloomed_table):
    pruned = read_versioned_table_pruned(
        spark, bloomed_table, equals={"key": "no-such-key"}
    )
    assert pruned.count() == 0
    # 3 hashes into 4096 bits with ~200 keys/file -> the occasional
    # false-positive file is fine, reading most of the table is not
    assert len(pruned.inputFiles()) <= 8


def test_equals_combines_with_between(spark, bloomed_table):
    full = read_versioned_table(spark, bloomed_table)
    some_key = full.filter(F.col("v") < 100).select("key").first().key
    got = read_versioned_table_pruned(
        spark,
        bloomed_table,
        between={"v": (0.0, 100.0)},
        equals={"key": some_key},
    )
    want = full.filter((F.col("key") == some_key) & F.col("v").between(0.0, 100.0))
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )


def test_equals_alone_via_minmax_stats_still_prunes(spark, tmp_path):
    # no bloom, clustered int key: equals should prune through the
    # degenerate [v, v] min/max range
    path = str(tmp_path / "nobloom")
    df = spark.range(0, 4_000).withColumn("k", (F.col("id") / 100).cast("long"))
    save_versioned_table(df.repartitionByRange(40, "k"), path, stats_cols=["k"])
    pruned = read_versioned_table_pruned(spark, path, equals={"k": 7})
    assert pruned.count() == 100
    assert len(pruned.inputFiles()) < 40


def test_none_equals_value_rejected(spark, bloomed_table):
    with pytest.raises(ValueError):
        read_versioned_table_pruned(spark, bloomed_table, equals={"key": None})


def test_bloom_excludes_respects_signed_words():
    # bit 63 set -> stored as a NEGATIVE signed long; membership must
    # still see it
    bitmap = [-(1 << 63)] + [0] * 3
    assert not _bloom_excludes(bitmap, [63])
    assert _bloom_excludes(bitmap, [0])
    assert _bloom_excludes(bitmap, [64])


def test_unbloomed_column_and_missing_file_read_not_pruned(spark, bloomed_table):
    # equals on a column with no bloom and no stats: nothing prunes,
    # the exact filter still applies
    full = read_versioned_table(spark, bloomed_table)
    pruned = read_versioned_table_pruned(
        spark, bloomed_table, equals={"id": 123}
    )
    assert len(pruned.inputFiles()) == len(full.inputFiles())
    assert [r.id for r in pruned.collect()] == [123]


def test_vacuum_keeps_bloom_sidecar_of_live_versions(spark, bloomed_table, tmp_path):
    path = str(tmp_path / "vt2")
    df = spark.range(0, 100).withColumn("k", F.col("id"))
    save_versioned_table(df, path, bloom_cols=["k"])
    save_versioned_table(df, path, bloom_cols=["k"])
    vacuum_versions(spark, path, keep=1)
    stats = _read_file_stats(spark, path, 1)
    assert stats is not None and "bloom" in stats
    assert _read_file_stats(spark, path, 0) is None
