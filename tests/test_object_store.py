"""S5/K4 object-storage round-trip against a real (mocked) S3 endpoint.

moto's ThreadedMotoServer provides an S3-compatible HTTP endpoint in
process, so the SDK layer — client wiring, multi-file table upload,
paginated listing, staged download, Spark read-back — is exercised for
real. Only the s3a filesystem class itself stays untested here (the
hadoop-aws jars are absent; PARITY.md documents that gap and the exact
config `sinks.configure_s3` would use).
"""

from __future__ import annotations

import pytest

moto = pytest.importorskip("moto")

from moto.server import ThreadedMotoServer  # noqa: E402

from usgs_earthquake_data_pipeline_spark.sources import object_store as obs  # noqa: E402

BUCKET = "usgs-delta-lake-bucket"  # the reference's bucket name


@pytest.fixture(scope="module")
def s3_client():
    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    client = obs.make_client(f"http://{host}:{port}", "test-key", "test-secret")
    client.create_bucket(Bucket=BUCKET)
    yield client
    server.stop()


def test_partitioned_table_round_trip(spark, s3_client, tmp_path):
    df = spark.range(200).selectExpr(
        "id", "id % 4 AS part", "CAST(id * 2.5 AS DOUBLE) AS val"
    )
    local = str(tmp_path / "tbl")
    df.write.partitionBy("part").parquet(local)

    n_up = obs.upload_table(s3_client, local, BUCKET, "raw/tbl")
    assert n_up > 0

    keys = [k for k, _ in obs.list_prefix(s3_client, BUCKET, "raw/tbl/")]
    assert len(keys) == n_up
    # partition layout survives the store
    assert any("part=3" in k for k in keys)
    assert not any(k.endswith("_SUCCESS") for k in keys)

    staged = obs.read_table_staged(
        spark, s3_client, BUCKET, "raw/tbl", str(tmp_path / "staged")
    )
    assert staged.count() == 200
    assert sorted(staged.columns) == ["id", "part", "val"]
    # value-level equality with the original
    orig = {(r.id, r.part, r.val) for r in df.collect()}
    back = {(r.id, r.part, r.val) for r in staged.collect()}
    assert back == orig
    # partition pruning still works on the staged copy
    assert staged.filter("part = 3").count() == 50


def test_read_missing_prefix_raises(spark, s3_client, tmp_path):
    with pytest.raises(FileNotFoundError):
        obs.read_table_staged(
            spark, s3_client, BUCKET, "raw/nope", str(tmp_path / "empty")
        )
