"""Temporal operator unit tests — including the NULL-value as-of case
the oracle data doesn't cover."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators import temporal as TP


def _t(minute):
    return datetime(2024, 1, 1, 12, minute, 0)


def test_asof_join_carries_null_values(spark):
    """The most recent right row wins even when its value is NULL —
    last(ignorenulls) must not skip back to an older non-null row."""
    left = spark.createDataFrame(
        [(1, _t(30), "click")], "user_id long, ts timestamp, what string"
    )
    right = spark.createDataFrame(
        [(1, _t(10), 5.0), (1, _t(20), None)],
        "user_id long, ts timestamp, err_value double",
    )
    out = TP.asof_join(left, right, "user_id", "ts", "ts", ["err_value"]).collect()
    assert len(out) == 1
    assert out[0]["err_value"] is None  # newest right row, not the stale 5.0
    assert out[0]["asof_ts"] == _t(20)  # and the timestamps agree with it


def test_asof_join_equal_timestamp_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _t(10)), (2, _t(5))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(10), 7.0)], "user_id long, ts timestamp, v double"
    )
    rows = {r.user_id: r for r in
            TP.asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()}
    assert rows[1]["v"] == 7.0  # ts >= right ts includes equality
    assert rows[2]["v"] is None and rows[2]["asof_ts"] is None  # no match → NULLs


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _t(59))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(0), 1.0)], "user_id long, ts timestamp, v double"
    )
    strict = TP.asof_join(
        left, right, "user_id", "ts", "ts", ["v"], tolerance_seconds=600
    ).collect()
    assert strict[0]["v"] is None  # 59 min > 10 min tolerance
    loose = TP.asof_join(
        left, right, "user_id", "ts", "ts", ["v"], tolerance_seconds=3600
    ).collect()
    assert loose[0]["v"] == 1.0


def test_range_join_excludes_outside_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(0))], "user_id long, error_id long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 200, _t(5)), (1, 201, _t(30))],
        "user_id long, purchase_id long, r_ts timestamp",
    )
    out = TP.range_join_buckets(
        left, right, "user_id", "l_ts", "r_ts", tolerance_seconds=600
    )
    assert [r.purchase_id for r in out.collect()] == [200]


def test_compaction_target_files_multi_partition(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark import sinks

    rows = [(i, 2024, 1 + i % 2) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, year int, month int")
    path = str(tmp_path / "t")
    for _ in range(4):
        sinks.save_partitioned_table(df, path, mode="append")
    sinks.compact_partitioned_table(spark, path, target_files_per_partition=2)
    import glob
    import os

    for month in (1, 2):
        files = glob.glob(
            os.path.join(path, "year=2024", f"month={month}", "*.parquet")
        )
        assert 1 <= len(files) <= 2, files
    assert sinks.read_partitioned_table(spark, path).count() == 4000


def test_gapfill_single_observation_key(spark):
    """A key with one bucket yields a one-row grid, no gaps."""
    from pyspark.sql import functions as F

    from usgs_earthquake_data_pipeline_spark.operators.temporal import (
        gapfill_locf,
    )

    obs = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00", 2.5), (2, "2024-01-01 01:00:00", 1.0),
         (2, "2024-01-01 04:00:00", 4.0)],
        "user_id long, bucket string, v double",
    ).withColumn("bucket", F.col("bucket").cast("timestamp"))
    out = gapfill_locf(
        obs, key_col="user_id", bucket_col="bucket", value_col="v",
        bucket_seconds=3600, grid_start=F.min("bucket"), grid_end=F.max("bucket"),
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append((r["v"], r["is_gap"]))
    assert by_user[1] == [(2.5, 0)]
    assert by_user[2] == [(1.0, 0), (1.0, 1), (1.0, 1), (4.0, 0)]


def test_anomaly_zscore_degenerate_window_yields_null_not_nan(
    spark, tmp_path
):
    """Seven equal prior daily totals make the trailing variance 0 and
    the raw z NaN/Inf; Spark and DuckDB disagree on NaN compare and
    round(NaN), so the guard must emit NULL z and a false flag — on
    BOTH engines (r5 ADVICE)."""
    import duckdb
    import pandas as pd

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    # one event per day, days 1..9: days 1-7 identical (value 5.0) so
    # day 8's trailing window is degenerate; day 9's window has spread
    rows = []
    for d in range(1, 10):
        v = 5.0 if d <= 7 else (100.0 if d == 8 else 7.0)
        rows.append((d, pd.Timestamp(2024, 1, d, 12), d, "t", v, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    entry = CATALOG["anomaly_zscore_daily"]
    got = {r["d"]: r for r in entry.spark_fn(spark, sf).collect()}
    assert set(got) == {8, 9}
    assert got[8]["z"] is None
    assert got[8]["is_anomaly"] is False
    assert got[9]["z"] is not None  # non-degenerate window still scores

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ora = {r[0]: r for r in con.execute(entry.oracle).fetchall()}
    assert ora[8][2] is None and ora[8][3] is False
    assert ora[9][2] == got[9]["z"] and ora[9][3] == got[9]["is_anomaly"]
