"""Object-store / filesystem listing utility (S7).

The reference lists bucket objects with boto3 for ops visibility
(usgs_tsunami_fact_silver_object_storage.py:65-81). The Spark-native
equivalent uses the Hadoop FileSystem API, which works uniformly over
local paths, HDFS, and s3a:// — no extra SDK, and the same
credentials/endpoint config as the writers (sinks.configure_s3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ObjectInfo:
    path: str
    size: int
    is_dir: bool


def list_objects(
    spark: SparkSession, path: str, recursive: bool = False
) -> list[ObjectInfo]:
    """List files/objects under ``path`` (local, hdfs:// or s3a://)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    out: list[ObjectInfo] = []
    if recursive:
        it = fs.listFiles(hadoop_path, True)
        while it.hasNext():
            st = it.next()
            out.append(ObjectInfo(st.getPath().toString(), st.getLen(), False))
    else:
        for st in fs.listStatus(hadoop_path):
            out.append(
                ObjectInfo(st.getPath().toString(), st.getLen(), st.isDirectory())
            )
    return out


def table_size_bytes(spark: SparkSession, path: str) -> int:
    """Total size of a table directory — the ops check the reference
    runs by eyeballing bucket listings."""
    return sum(o.size for o in list_objects(spark, path, recursive=True))
