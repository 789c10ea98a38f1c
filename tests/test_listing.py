"""S7 object-listing utility tests (Hadoop FS over local paths)."""

from __future__ import annotations

from usgs_earthquake_data_pipeline_spark import sinks
from usgs_earthquake_data_pipeline_spark.sources.listing import (
    list_objects,
    table_size_bytes,
)


def test_list_objects_and_size(spark, tmp_path):
    df = spark.range(100)
    path = str(tmp_path / "t")
    df.write.parquet(path)
    top = list_objects(spark, path)
    assert any(o.path.endswith("_SUCCESS") for o in top)
    files = list_objects(spark, path, recursive=True)
    parquet = [o for o in files if o.path.endswith(".parquet")]
    assert parquet and all(not o.is_dir for o in files)
    assert table_size_bytes(spark, path) == sum(o.size for o in files)


def test_list_partitioned_layout(spark, tmp_path):
    rows = [(i, 2020 + i % 2, 1 + i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, year int, month int")
    path = str(tmp_path / "p")
    sinks.save_partitioned_table(df, path, mode="overwrite")
    top = list_objects(spark, path)
    years = {o.path.rsplit("/", 1)[-1] for o in top if o.is_dir}
    assert years == {"year=2020", "year=2021"}
