"""Conditional Delta Lake parity tests (VERDICT r2 item 6).

The reference's storage core is Delta (reference
save_to_raw_delta_prod.py:92-147). ``delta-spark`` is not installed in
this container, so ``session.TABLE_FORMAT`` falls back to ``parquet``
and every test here SKIPS. The moment the environment gains the
package, ``TABLE_FORMAT`` flips automatically (``session.py`` probe)
and these tests verify the flip is real — append/overwrite/upsert
round-trips produce a transactional ``_delta_log`` and ``OPTIMIZE ...
ZORDER BY`` replaces the hand-rolled Morton sort — instead of the
parity being assumed.
"""

from __future__ import annotations

import os

import pytest

delta = pytest.importorskip("delta")

from pyspark.sql import functions as F  # noqa: E402

from usgs_earthquake_data_pipeline_spark import session as session_mod  # noqa: E402
from usgs_earthquake_data_pipeline_spark.sinks import (  # noqa: E402
    read_partitioned_table,
    save_partitioned_table,
    upsert_partitions,
)


def _events(spark, n=100, day_offset=0):
    return spark.range(n).select(
        F.col("id"),
        (F.lit(2024) ).alias("year"),
        (F.lit(1)).alias("month"),
        (F.pmod(F.col("id"), F.lit(2)) + 1 + day_offset).cast("int").alias("day"),
        (F.col("id") * 1.5).alias("mag"),
    )


def test_table_format_flipped():
    assert session_mod.DELTA_AVAILABLE
    assert session_mod.TABLE_FORMAT == "delta"


def test_delta_append_overwrite_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    cols = ["year", "month", "day"]
    assert save_partitioned_table(_events(spark), path, "append", cols)
    assert save_partitioned_table(_events(spark), path, "append", cols)
    assert read_partitioned_table(spark, path).count() == 200
    # transactionality: the delta log exists and records the commits
    assert os.path.isdir(os.path.join(path, "_delta_log"))
    assert save_partitioned_table(_events(spark), path, "overwrite", cols)
    assert read_partitioned_table(spark, path).count() == 100


def test_delta_upsert_replaces_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    cols = ["year", "month", "day"]
    save_partitioned_table(_events(spark), path, "append", cols)
    # upsert day=1 only (day_offset shifts ids into days 1..2 -> 1)
    patch = _events(spark, n=10).filter(F.col("day") == 1)
    assert upsert_partitions(patch, path, cols)
    out = read_partitioned_table(spark, path)
    assert out.filter(F.col("day") == 1).count() == 5
    assert out.filter(F.col("day") == 2).count() == 50


def test_delta_optimize_zorder(spark, tmp_path):
    path = str(tmp_path / "tbl")
    save_partitioned_table(_events(spark, n=500), path, "append", ["year"])
    try:
        res = spark.sql(f"OPTIMIZE delta.`{path}` ZORDER BY (day, mag)")
    except Exception as exc:  # pragma: no cover - version-dependent SQL
        pytest.skip(f"OPTIMIZE ZORDER unsupported by installed delta: {exc}")
    assert res.count() >= 1
    assert read_partitioned_table(spark, path).count() == 500
