"""Custom Python data-source tests: fixture-driven windows, schema,
partition parallelism, agreement with the JVM flatten path."""

from __future__ import annotations

import json

from usgs_earthquake_data_pipeline_spark.schema import EVENT_COLUMNS
from usgs_earthquake_data_pipeline_spark.sources.usgs_datasource import (
    UsgsGeoJsonDataSource,
)

from tests.test_geojson import FULL_FEATURE, NO_DEPTH_FEATURE, SPARSE_FEATURE, _doc


def _write_fixture(dirpath, start, features):
    (dirpath / f"{start}.json").write_text(_doc(features))


def test_datasource_reads_fixture_windows(spark, tmp_path):
    fixtures = tmp_path / "fx"
    fixtures.mkdir()
    _write_fixture(fixtures, "2024-01-01", [FULL_FEATURE, NO_DEPTH_FEATURE])
    _write_fixture(fixtures, "2024-02-01", [SPARSE_FEATURE])
    # March..December windows have no fixture file → empty partitions

    spark.dataSource.register(UsgsGeoJsonDataSource)
    df = (
        spark.read.format("usgs_geojson")
        .option("start_year", 2024)
        .option("fixture_dir", str(fixtures))
        .load()
    )
    assert df.columns == EVENT_COLUMNS
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"us7000abcd", "ci00000002", "nc00000003"}
    assert rows["us7000abcd"]["latitude"] == 36.12
    assert rows["ci00000002"]["depth"] is None
    assert df.rdd.getNumPartitions() == 12  # one partition per month window


def test_datasource_agrees_with_jvm_flatten(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.sources.geojson import (
        events_from_geojson_strings,
    )

    fixtures = tmp_path / "fx"
    fixtures.mkdir()
    feats = [FULL_FEATURE, NO_DEPTH_FEATURE, SPARSE_FEATURE]
    _write_fixture(fixtures, "2024-01-01", feats)

    spark.dataSource.register(UsgsGeoJsonDataSource)
    via_source = (
        spark.read.format("usgs_geojson")
        .option("start_year", 2024)
        .option("fixture_dir", str(fixtures))
        .load()
    )
    via_jvm = events_from_geojson_strings(spark, [_doc(feats)])

    def norm(df):
        out = set()
        for r in df.collect():
            d = r.asDict()
            d["geometry"] = json.dumps(json.loads(d["geometry"]), sort_keys=True)
            out.add(tuple(d[c] for c in EVENT_COLUMNS))
        return out

    assert norm(via_source) == norm(via_jvm)
