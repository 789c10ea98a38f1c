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


def _feature_at(fid: str, time_ms: int) -> dict:
    return {
        "type": "Feature",
        "id": fid,
        "properties": {"mag": 1.0, "time": time_ms, "tsunami": 0},
        "geometry": {"type": "Point", "coordinates": [-120.0, 35.0]},
    }


def test_stream_reader_windows_and_offsets(tmp_path):
    """Unit-level offset contract: half-open windows, no overlap,
    deterministic replay via readBetweenOffsets."""
    from usgs_earthquake_data_pipeline_spark.sources.usgs_datasource import (
        UsgsGeoJsonStreamReader,
    )

    hour = 3_600_000
    feats = [
        _feature_at("w0a", 0),
        _feature_at("w0b", hour - 1),
        _feature_at("w1a", hour),
        _feature_at("w2a", 2 * hour + 5),
    ]
    fx = tmp_path / "feed.json"
    fx.write_text(_doc(feats))
    r = UsgsGeoJsonStreamReader(
        {"fixture_file": str(fx), "window_ms": str(hour), "start_ms": "0"}
    )
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    assert sorted(t[0] for t in rows1) == ["w0a", "w0b"]
    assert off1 == {"end_ms": hour}
    rows2, off2 = r.read(off1)
    assert [t[0] for t in rows2] == ["w1a"]
    # exactly-once replay from the offset log
    assert [t[0] for t in r.readBetweenOffsets(off0, off1)] == ["w0a", "w0b"]
    assert [t[0] for t in r.readBetweenOffsets(off1, off2)] == ["w1a"]


def test_stream_source_end_to_end(spark, tmp_path):
    """The registered format runs as a real readStream source: three
    micro-batches drain three windows into a memory sink."""
    import time

    hour = 3_600_000
    feats = [
        _feature_at("s0", 10),
        _feature_at("s1", hour + 10),
        _feature_at("s2", 2 * hour + 10),
    ]
    fx = tmp_path / "feed.json"
    fx.write_text(_doc(feats))
    spark.dataSource.register(UsgsGeoJsonDataSource)
    stream = (
        spark.readStream.format("usgs_geojson")
        .option("fixture_file", str(fx))
        .option("window_ms", str(hour))
        .option("start_ms", "0")
        .load()
    )
    assert stream.isStreaming
    assert stream.columns == EVENT_COLUMNS
    q = (
        stream.select("id", "eventtime")
        .writeStream.format("memory")
        .queryName("usgs_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("usgs_stream_sink").count() >= 3:
                break
            time.sleep(1)
        got = {r.id for r in spark.table("usgs_stream_sink").collect()}
        assert {"s0", "s1", "s2"} <= got
    finally:
        q.stop()


def test_datasource_writer_roundtrip(spark, tmp_path):
    """df.write.format('usgs_geojson') emits one FeatureCollection per
    partition plus a _MANIFEST.json; reading the files back recovers
    every row's id, geometry (lon/lat/depth) and properties."""
    import json as _json

    spark.dataSource.register(UsgsGeoJsonDataSource)
    out = tmp_path / "gj"
    df = spark.createDataFrame(
        [
            ("w1", 10.0, 20.0, 5.5, 6.1, "deep quake"),
            ("w2", -110.25, 35.5, None, 4.2, "no depth"),
        ],
        "id string, longitude double, latitude double, depth double, "
        "mag double, place string",
    ).repartition(2)
    df.write.format("usgs_geojson").mode("overwrite").save(str(out))

    manifest = _json.loads((out / "_MANIFEST.json").read_text())
    assert manifest["n_features"] == 2
    feats = []
    for name in manifest["files"]:
        doc = _json.loads((out / name).read_text())
        assert doc["type"] == "FeatureCollection"
        assert doc["metadata"]["count"] == len(doc["features"])
        feats.extend(doc["features"])
    by_id = {f["id"]: f for f in feats}
    assert set(by_id) == {"w1", "w2"}
    assert by_id["w1"]["geometry"]["coordinates"] == [10.0, 20.0, 5.5]
    assert by_id["w2"]["geometry"]["coordinates"] == [-110.25, 35.5]
    assert by_id["w1"]["properties"]["place"] == "deep quake"
    assert by_id["w2"]["properties"]["mag"] == 4.2
    assert "id" not in by_id["w1"]["properties"]  # hoisted to Feature.id


def test_datasource_writer_overwrite_removes_stale_parts(spark, tmp_path):
    """mode('overwrite') into a non-empty directory must leave ONLY the
    new files (round-10 advice: stale part-*.json survived, so naive
    part-file globbers saw mixed old+new data)."""
    import json as _json

    spark.dataSource.register(UsgsGeoJsonDataSource)
    out = tmp_path / "gj"

    def write(rows, mode):
        df = spark.createDataFrame(
            rows, "id string, longitude double, latitude double, mag double"
        ).repartition(2)
        df.write.format("usgs_geojson").mode(mode).save(str(out))

    write([("old1", 1.0, 2.0, 3.0), ("old2", 4.0, 5.0, 6.0)], "overwrite")
    first_parts = {p.name for p in out.glob("part-*.json")}
    assert first_parts

    write([("new1", 7.0, 8.0, 9.0)], "overwrite")
    manifest = _json.loads((out / "_MANIFEST.json").read_text())
    on_disk = {p.name for p in out.glob("part-*.json")}
    assert on_disk == set(manifest["files"]), "stale part files survive"
    ids = {
        f["id"]
        for name in on_disk
        for f in _json.loads((out / name).read_text())["features"]
    }
    assert ids == {"new1"}
    assert manifest["n_features"] == 1


def test_datasource_writer_append_merges_manifest(spark, tmp_path):
    """mode('append') must keep earlier appends visible to
    manifest-honoring readers: the committed manifest carries the union
    of prior + new files and the cumulative feature count."""
    import json as _json

    spark.dataSource.register(UsgsGeoJsonDataSource)
    out = tmp_path / "gj"

    def write(rows, mode):
        df = spark.createDataFrame(
            rows, "id string, longitude double, latitude double, mag double"
        ).coalesce(1)
        df.write.format("usgs_geojson").mode(mode).save(str(out))

    write([("a1", 1.0, 2.0, 3.0), ("a2", 4.0, 5.0, 6.0)], "append")
    write([("b1", 7.0, 8.0, 9.0)], "append")
    manifest = _json.loads((out / "_MANIFEST.json").read_text())
    assert manifest["n_features"] == 3
    ids = {
        f["id"]
        for name in manifest["files"]
        for f in _json.loads((out / name).read_text())["features"]
    }
    assert ids == {"a1", "a2", "b1"}


def test_datasource_writer_part_names_unique_across_jobs():
    """Two writer JOBS get distinct per-job tokens embedded in their
    part names, so a second application whose task lands on the same
    (partition, attempt) pair can never truncate a committed file
    (round-11 review: taskAttemptId restarts with each SparkContext)."""
    from usgs_earthquake_data_pipeline_spark.sources.usgs_datasource import (
        UsgsGeoJsonWriter,
    )

    a = UsgsGeoJsonWriter({"path": "/tmp/x"}, overwrite=False)
    b = UsgsGeoJsonWriter({"path": "/tmp/x"}, overwrite=False)
    assert a.job_token != b.job_token
    assert len(a.job_token) == 12


def test_datasource_writer_append_recovers_legacy_manifest_counts(
    spark, tmp_path
):
    """Appending onto a pre-file_counts manifest must recover each
    prior file's feature count from its own metadata instead of
    zeroing it (round-11 review: n_features undercounted forever)."""
    import json as _json

    spark.dataSource.register(UsgsGeoJsonDataSource)
    out = tmp_path / "gj"
    df = spark.createDataFrame(
        [("a1", 1.0, 2.0, 3.0), ("a2", 4.0, 5.0, 6.0)],
        "id string, longitude double, latitude double, mag double",
    ).coalesce(1)
    df.write.format("usgs_geojson").mode("append").save(str(out))
    # rewrite the manifest in the legacy shape (files list only)
    mpath = out / "_MANIFEST.json"
    m = _json.loads(mpath.read_text())
    mpath.write_text(
        _json.dumps({"files": m["files"], "n_features": m["n_features"]})
    )
    df2 = spark.createDataFrame(
        [("b1", 7.0, 8.0, 9.0)],
        "id string, longitude double, latitude double, mag double",
    ).coalesce(1)
    df2.write.format("usgs_geojson").mode("append").save(str(out))
    merged = _json.loads(mpath.read_text())
    assert merged["n_features"] == 3, merged


def test_datasource_writer_requires_path(spark):
    import pytest as _pytest

    spark.dataSource.register(UsgsGeoJsonDataSource)
    df = spark.createDataFrame([("x",)], "id string")
    with _pytest.raises(Exception, match="path"):
        df.write.format("usgs_geojson").mode("append").save()


def test_datasource_writer_commit_publishes_manifest_before_deletes(
    tmp_path, monkeypatch
):
    """Crash-safety ordering (round-12 advice): if the process dies
    between the manifest publish and the stale-part deletes, readers
    must see a CONSISTENT manifest (new files, all present) — never
    one referencing removed files. Simulated by making os.remove blow
    up: the manifest on disk must already be the new one, with no
    .tmp debris."""
    import json as _json
    import os as _os

    from usgs_earthquake_data_pipeline_spark.sources.usgs_datasource import (
        GeoJsonCommit,
        UsgsGeoJsonWriter,
    )

    out = tmp_path / "gj"
    out.mkdir()
    stale = out / "part-oldjob-00000-1.json"
    stale.write_text(
        _json.dumps(
            {"type": "FeatureCollection", "metadata": {"count": 1},
             "features": [{}]}
        )
    )
    new = out / "part-newjob-00000-2.json"
    new.write_text(
        _json.dumps(
            {"type": "FeatureCollection", "metadata": {"count": 2},
             "features": [{}, {}]}
        )
    )
    writer = UsgsGeoJsonWriter({"path": str(out)}, overwrite=True)

    real_remove = _os.remove

    def exploding_remove(p):
        raise OSError("simulated crash during stale-part cleanup")

    monkeypatch.setattr(_os, "remove", exploding_remove)
    try:
        with __import__("pytest").raises(OSError):
            writer.commit([GeoJsonCommit(str(new), 2)])
    finally:
        monkeypatch.setattr(_os, "remove", real_remove)

    manifest = _json.loads((out / "_MANIFEST.json").read_text())
    assert manifest["files"] == [new.name]  # new manifest already live
    assert manifest["n_features"] == 2
    for name in manifest["files"]:  # every referenced file exists
        assert (out / name).exists()
    assert not list(out.glob("_MANIFEST.json.*.tmp"))  # replaced, no debris
    # the stale part survived the simulated crash — unreferenced, which
    # manifest-honoring readers ignore
    assert stale.exists()


def test_datasource_writer_next_commit_self_heals_orphans(tmp_path):
    """Self-heal (round-13): a part file referenced by neither the
    prior manifest nor the incoming winning set — the leftover of a
    crash between a prior commit's manifest publish and its stale-part
    deletes — is swept by the NEXT commit before it publishes, so
    naive globbers stop over-reading after one successful commit.
    Referenced prior parts survive an append commit untouched."""
    import json as _json

    from usgs_earthquake_data_pipeline_spark.sources.usgs_datasource import (
        GeoJsonCommit,
        UsgsGeoJsonWriter,
    )

    def feature_file(path, n):
        path.write_text(
            _json.dumps(
                {
                    "type": "FeatureCollection",
                    "metadata": {"count": n},
                    "features": [{} for _ in range(n)],
                }
            )
        )

    out = tmp_path / "gj"
    out.mkdir()
    committed = out / "part-job1-00000-1.json"
    orphan = out / "part-crashed-00000-9.json"
    incoming = out / "part-job2-00000-3.json"
    feature_file(committed, 2)
    feature_file(orphan, 5)
    feature_file(incoming, 1)
    # prior manifest references only the committed part — the orphan
    # simulates a crashed prior overwrite that never reached deletes
    (out / "_MANIFEST.json").write_text(
        _json.dumps(
            {
                "files": [committed.name],
                "file_counts": {committed.name: 2},
                "n_features": 2,
            }
        )
    )

    writer = UsgsGeoJsonWriter({"path": str(out)}, overwrite=False)
    writer.commit([GeoJsonCommit(str(incoming), 1)])

    assert not orphan.exists(), "orphan must be swept by the next commit"
    assert committed.exists() and incoming.exists()
    manifest = _json.loads((out / "_MANIFEST.json").read_text())
    assert set(manifest["files"]) == {committed.name, incoming.name}
    assert manifest["n_features"] == 3
    # glob view == manifest view again
    on_disk = {p.name for p in out.glob("part-*.json")}
    assert on_disk == set(manifest["files"])
