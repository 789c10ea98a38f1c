"""Streaming incremental materialized-view maintenance
(streaming/matview.py): per-micro-batch algebraic folds onto the
versioned table must equal a batch full aggregate, and replays must
not double-count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.sinks import (
    list_versions,
    read_versioned_table,
)
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table
from usgs_earthquake_data_pipeline_spark.streaming.matview import (
    _read_applied,
    _write_applied,
    stream_update_matview,
)

MERGES = {"cnt": "count", "sum_value": "sum"}


def _partial(df):
    return df.groupBy(
        F.col("event_type").alias("etype")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )


def _events_stream(spark, sf_dir, files_per_trigger=1):
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(sf_dir)
    )


def test_stream_matview_equals_batch_aggregate(spark, sf_dir, tmp_path):
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    q = stream_update_matview(
        _events_stream(spark, sf_dir),
        view,
        ckpt,
        _partial,
        keys=["etype"],
        merges=MERGES,
    )
    assert q.awaitTermination(180), "stream did not drain"
    got = {
        r.etype: (r.cnt, r.sum_value)
        for r in read_versioned_table(spark, view).collect()
    }
    expected = {
        r.etype: (r.cnt, r.sum_value)
        for r in _partial(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == expected  # incremental == full recompute, decimal-exact


def test_stream_matview_resume_processes_only_new_data(spark, sf_dir, tmp_path):
    """Restarting against the same checkpoint with no new files adds
    no versions and changes no values."""
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = stream_update_matview(
            _events_stream(spark, sf_dir),
            view,
            ckpt,
            _partial,
            keys=["etype"],
            merges=MERGES,
        )
        assert q.awaitTermination(180)

    run()
    before = {
        r.etype: (r.cnt, r.sum_value)
        for r in read_versioned_table(spark, view).collect()
    }
    n_versions = len(list_versions(spark, view))
    run()  # same checkpoint, nothing new to process
    after = {
        r.etype: (r.cnt, r.sum_value)
        for r in read_versioned_table(spark, view).collect()
    }
    assert after == before
    assert len(list_versions(spark, view)) == n_versions


def test_stream_matview_replayed_batch_is_skipped(spark, sf_dir, tmp_path):
    """The at-least-once crash window: a batch whose fold committed
    but whose checkpoint didn't advance is replayed by the engine —
    the applied-batch marker must make the replay a no-op instead of
    a double count."""
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    q = stream_update_matview(
        _events_stream(spark, sf_dir),
        view,
        ckpt,
        _partial,
        keys=["etype"],
        merges=MERGES,
    )
    assert q.awaitTermination(180)
    committed = {
        r.etype: (r.cnt, r.sum_value)
        for r in read_versioned_table(spark, view).collect()
    }
    last = _read_applied(spark, view)
    assert last >= 0
    # simulate the replay: re-run with a FRESH checkpoint (engine
    # re-delivers batch 0..n) against the already-folded view
    q2 = stream_update_matview(
        _events_stream(spark, sf_dir),
        view,
        str(tmp_path / "ckpt2"),
        _partial,
        keys=["etype"],
        merges=MERGES,
    )
    assert q2.awaitTermination(180)
    replayed = {
        r.etype: (r.cnt, r.sum_value)
        for r in read_versioned_table(spark, view).collect()
    }
    assert replayed == committed  # no double counting


def test_applied_marker_roundtrip(spark, tmp_path):
    path = str(tmp_path / "view")
    os.makedirs(path)
    assert _read_applied(spark, path) == -1
    _write_applied(spark, path, 7)
    assert _read_applied(spark, path) == 7
    _write_applied(spark, path, 8)
    assert _read_applied(spark, path) == 8
