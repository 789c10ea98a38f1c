"""Sink tests: partitioned round-trip with pruning, empty-skip,
invalid mode, CSV/JSON exports, foreachPartition serving sink."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark import sinks
from usgs_earthquake_data_pipeline_spark.operators import silver
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def events(spark):
    # small synthetic bronze-shaped frame with year/month/tsunami
    rows = [
        (i, 2020 + i % 3, 1 + i % 12, i % 7 == 0, float(i))
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "id long, year int, month int, is_flag boolean, value double"
    ).withColumn("tsunami", F.col("is_flag").cast("int")).drop("is_flag")


def test_partitioned_roundtrip_and_pruning(spark, events, tmp_path):
    path = str(tmp_path / "bronze")
    wrote = sinks.save_partitioned_table(
        events, path, mode="overwrite", partition_cols=["year", "month"],
        cluster_cols=["value"],
    )
    assert wrote
    # layout on disk is hive-partitioned
    assert glob.glob(os.path.join(path, "year=2020", "month=1", "*.parquet"))

    back = sinks.read_partitioned_table(spark, path)
    assert back.count() == 200
    pruned = back.filter(F.col("year") == 2020)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (partition pruning)
    assert "PartitionFilters" in plan and "year" in plan
    assert pruned.count() == events.filter(F.col("year") == 2020).count()


def test_append_accumulates(spark, events, tmp_path):
    path = str(tmp_path / "t")
    sinks.save_partitioned_table(events, path, mode="append")
    sinks.save_partitioned_table(events, path, mode="append")
    assert sinks.read_partitioned_table(spark, path).count() == 400


def test_invalid_mode_raises(events, tmp_path):
    with pytest.raises(ValueError, match="Invalid mode"):
        sinks.save_partitioned_table(events, str(tmp_path / "x"), mode="upsert")


def test_empty_skip(spark, events, tmp_path):
    empty = events.filter(F.lit(False))
    assert not sinks.save_partitioned_table(empty, str(tmp_path / "e"))
    assert sinks.save_to_csv(empty, str(tmp_path)) is None
    assert sinks.save_to_json(empty, str(tmp_path)) is None


def test_csv_json_exports(spark, events, tmp_path):
    csv_path = sinks.save_to_csv(events.limit(10), str(tmp_path))
    json_path = sinks.save_to_json(events.limit(10), str(tmp_path))
    assert csv_path and "earthquake_data_" in csv_path
    assert spark.read.option("header", "true").csv(csv_path).count() == 10
    assert spark.read.json(json_path).count() == 10


def test_foreach_partition_sink_batching(spark, events, tmp_path):
    """Executor-side writer receives every row exactly once, in
    batches no larger than batch_size."""
    out_dir = str(tmp_path / "served")
    os.makedirs(out_dir, exist_ok=True)

    def factory():
        import json
        import os as _os
        import uuid

        def write(batch):
            assert len(batch) <= 50
            fname = _os.path.join(out_dir, f"{uuid.uuid4().hex}.json")
            with open(fname, "w") as fh:
                json.dump([r["id"] for r in batch], fh)

        return write

    sinks.foreach_partition_sink(events, factory, batch_size=50)
    import json as _json

    seen = []
    for f in glob.glob(os.path.join(out_dir, "*.json")):
        seen.extend(_json.load(open(f)))
    assert sorted(seen) == list(range(200))


def test_cassandra_sink_disabled_noop(events):
    # feature-flagged off like the reference: must not touch network
    sinks.save_to_cassandra(events, ["127.0.0.1"], "ks", "t", enabled=False)


def test_silver_layer_roundtrip(spark, events, tmp_path):
    yearly_path = str(tmp_path / "fact_yearly")
    monthly_path = str(tmp_path / "fact_monthly")
    yearly, monthly = silver.build_silver_layer(events, yearly_path, monthly_path)
    back = sinks.read_partitioned_table(spark, yearly_path)
    expected = {
        (r.year, r.tsunami_yearly_count) for r in yearly.collect()
    }
    got = {(r.year, r.tsunami_yearly_count) for r in back.collect()}
    assert got == expected and expected
    back_m = sinks.read_partitioned_table(spark, monthly_path)
    assert back_m.count() == monthly.count()


def test_silver_sql_twins_match_dataframe_api(spark, events):
    """The spark.sql string forms of A3/A4 must produce the same rows
    as the DataFrame implementations."""
    events.createOrReplaceTempView("usgs_events")
    sql_yearly = {
        tuple(r) for r in spark.sql(silver.SILVER_SQL["fact_tsunami_yearly"]).collect()
    }
    df_yearly = {tuple(r) for r in silver.fact_tsunami_yearly(events).collect()}
    assert sql_yearly == df_yearly and sql_yearly
    sql_monthly = {
        tuple(r) for r in spark.sql(silver.SILVER_SQL["fact_tsunami_monthly"]).collect()
    }
    df_monthly = {tuple(r) for r in silver.fact_tsunami_monthly(events).collect()}
    assert sql_monthly == df_monthly


def test_driver_events_table_silver(spark, sf_dir, tmp_path):
    """Silver aggregations also run over the driver's events table
    mapped to bronze shape (year/month derived, flag from type)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        (F.col("event_type") == "error").cast("int").alias("tsunami"),
    )
    yearly = silver.fact_tsunami_yearly(ev).collect()
    assert yearly and all(r.tsunami_yearly_count > 0 for r in yearly)


def test_merge_rows_upserts_by_key(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.sinks import (
        merge_rows,
        read_partitioned_table,
        save_partitioned_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 2024, 1, "a"), (2, 2024, 1, "b"), (3, 2024, 2, "c"), (4, 2023, 12, "d")],
        "id long, year int, month int, val string",
    )
    save_partitioned_table(base, path, "append", ["year", "month"], skip_empty=False)

    updates = spark.createDataFrame(
        [(2, 2024, 1, "B2"), (9, 2024, 2, "new")],
        "id long, year int, month int, val string",
    )
    assert merge_rows(spark, path, updates, ["id"], ["year", "month"])
    got = {
        r.id: (r.year, r.month, r.val)
        for r in read_partitioned_table(spark, path).collect()
    }
    assert got == {
        1: (2024, 1, "a"),
        2: (2024, 1, "B2"),   # replaced in place
        3: (2024, 2, "c"),
        4: (2023, 12, "d"),   # untouched partition survives
        9: (2024, 2, "new"),  # new key appended
    }


def test_merge_rows_rejects_duplicate_keys_and_skips_empty(spark, tmp_path):
    import pytest as _pytest

    from usgs_earthquake_data_pipeline_spark.sinks import (
        merge_rows,
        save_partitioned_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 2024, 1, "a")], "id long, year int, month int, val string"
    )
    save_partitioned_table(base, path, "append", ["year", "month"], skip_empty=False)
    dup = spark.createDataFrame(
        [(1, 2024, 1, "x"), (1, 2024, 1, "y")],
        "id long, year int, month int, val string",
    )
    with _pytest.raises(ValueError, match="duplicate keys"):
        merge_rows(spark, path, dup, ["id"], ["year", "month"])
    empty = dup.limit(0)
    assert merge_rows(spark, path, empty, ["id"], ["year", "month"]) is False


def test_versioned_table_time_travel(spark, tmp_path):
    """Two writes -> two pinned-readable versions; latest resolves via
    the manifest; an uncommitted directory is invisible."""
    from usgs_earthquake_data_pipeline_spark.sinks import (
        list_versions,
        read_versioned_table,
        save_versioned_table,
    )

    path = str(tmp_path / "vt")
    v0 = save_versioned_table(spark.range(3).selectExpr("id AS a"), path)
    v1 = save_versioned_table(spark.range(5).selectExpr("id AS a"), path)
    assert (v0, v1) == (0, 1)
    assert list_versions(spark, path) == [0, 1]
    assert read_versioned_table(spark, path).count() == 5          # latest
    assert read_versioned_table(spark, path, version=0).count() == 3  # pinned

    # simulate a crashed writer: data dir exists, manifest never moved
    spark.range(9).selectExpr("id AS a").write.parquet(f"{path}/version=2")
    assert list_versions(spark, path) == [0, 1]      # not committed
    assert read_versioned_table(spark, path).count() == 5  # still v1


def test_versioned_table_empty_path_raises(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.sinks import read_versioned_table

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_versioned_table(spark, str(tmp_path / "missing"))


def test_vacuum_versions_keeps_latest_and_drops_orphans(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.sinks import (
        list_versions,
        read_versioned_table,
        save_versioned_table,
        vacuum_versions,
    )

    path = str(tmp_path / "vt")
    for n in (3, 5, 7):
        save_versioned_table(spark.range(n).selectExpr("id AS a"), path)
    # orphan from a crashed writer
    spark.range(9).selectExpr("id AS a").write.parquet(f"{path}/version=9")

    dropped = vacuum_versions(spark, path, keep=2)
    assert dropped == [0]
    assert list_versions(spark, path) == [1, 2]
    assert read_versioned_table(spark, path).count() == 7
    import os

    assert not os.path.exists(f"{path}/version=9")  # orphan removed


def test_orc_format_roundtrip_and_pruning(spark, events, tmp_path):
    """The sink's table_format is not parquet-only: ORC (Spark
    built-in) round-trips with the same hive layout and partition
    pruning — the format a Hive-era warehouse would hand us."""
    path = str(tmp_path / "orc_table")
    assert sinks.save_partitioned_table(
        events, path, mode="overwrite", partition_cols=["year", "month"],
        table_format="orc",
    )
    assert glob.glob(os.path.join(path, "year=2020", "month=1", "*.orc"))
    back = sinks.read_partitioned_table(spark, path, table_format="orc")
    assert back.count() == events.count()
    pruned = back.filter(F.col("year") == 2020)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "year" in plan
    assert pruned.count() == events.filter(F.col("year") == 2020).count()


def test_permissive_json_read_quarantines_corrupt_records(spark, tmp_path):
    """Bronze re-reads must not die on a torn/corrupt line (the REST
    feed truncates mid-object under network failure): PERMISSIVE mode
    parses the good rows and quarantines the bad line into
    _corrupt_record for a dead-letter audit, instead of failing the
    whole batch (FAILFAST) or silently dropping it (DROPMALFORMED)."""
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "mag": 5.1}\n'
        '{"id": 2, "mag": '  # truncated mid-record
        '\n{"id": 3, "mag": 6.2}\n'
    )
    df = (
        spark.read.schema("id BIGINT, mag DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = {r.id: r.mag for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1: 5.1, 3: 6.2}
    assert len(bad) == 1 and '"mag": ' in bad[0]._corrupt_record


def test_partitioned_roundtrip_orc(spark, sf_dir, tmp_path):
    """K3/K6 format pluggability beyond parquet: the same partitioned
    sink writes/reads ORC (bundled in spark-sql — the other columnar
    format a warehouse migration meets), with identical rows and
    working predicate pushdown on the read."""
    from usgs_earthquake_data_pipeline_spark.sinks import (
        read_partitioned_table,
        save_partitioned_table,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_id", "user_id", "event_type", "value")
        .filter("event_id < 200")
    )
    path = str(tmp_path / "events_orc")
    assert save_partitioned_table(
        ev, path, mode="overwrite", partition_cols=["event_type"],
        table_format="orc",
    )
    back = read_partitioned_table(spark, path, table_format="orc")
    assert sorted(map(tuple, back.select(*ev.columns).collect())) == sorted(
        map(tuple, ev.collect())
    )
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter("user_id < 3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "user_id" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0]
