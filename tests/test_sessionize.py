"""Gap-sessionization tests: batch twin correctness on hand-computed
sessions, streaming operator vs batch twin on the same data."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events():
    """Two users; user 1 has two sessions split by a >30min gap."""
    rows = [
        (1, T0, 10.0),
        (1, T0 + timedelta(minutes=10), 5.0),
        (1, T0 + timedelta(minutes=20), 1.0),
        # 40-minute gap → new session
        (1, T0 + timedelta(minutes=60), 2.0),
        (2, T0 + timedelta(minutes=5), 7.0),
    ]
    return rows


def test_batch_sessionization(spark):
    df = spark.createDataFrame(_events(), "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    assert (1, T0, 3, 16.0) in out
    assert (1, T0 + timedelta(minutes=60), 1, 2.0) in out
    assert (2, T0 + timedelta(minutes=5), 1, 7.0) in out
    assert len(out) == 3


def test_stream_sessionization_matches_batch(spark, tmp_path):
    df = spark.createDataFrame(_events(), "user_id long, ts timestamp, value double")
    src = str(tmp_path / "src")
    df.write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    # the watermark never advances past the final events in a single
    # availableNow run, so only sessions closed by a later event in the
    # SAME run are emitted: user 1's first session (closed by its
    # minute-60 event). Open sessions stay in state — correct streaming
    # semantics.
    assert (1, T0, 3, 16.0) in got


def test_batch_sessionization_on_driver_events(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    sessions = sessionize_batch(ev, gap_seconds=600)
    # invariants: per-user event counts conserved; sessions don't overlap
    n_events = ev.count()
    assert sessions.agg(F.sum("n_events")).first()[0] == n_events
    overlap = (
        sessions.alias("a")
        .join(
            sessions.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_start") < F.col("b.session_start"))
            & (F.col("b.session_start") <= F.col("a.session_end")),
        )
        .count()
    )
    assert overlap == 0
