"""Structured Streaming bronze/silver pipeline.

The reference approximates streaming with an hourly cron re-running a
paged batch ingest (deploy.yml:53) and hints at intended streaming
reads via ignoreDeletes/readChangeFeed options it passes to Polars
(usgs_read_polars.py:34-37). This module is the Spark-native version:

- ``stream_geojson_to_bronze``: file-arrival stream of GeoJSON
  documents (one FeatureCollection per line) → parse (same
  from_json/explode plan as batch) → partitioned bronze append via
  foreachBatch. ``availableNow`` trigger = the cron-batch shape;
  ``processingTime`` = continuous ingest. Delivery is AT-LEAST-ONCE:
  the checkpoint prevents re-reading committed input, but a crash
  between the batch's append and the checkpoint commit replays that
  batch. Downstream exact semantics come from the dedup operators
  (exact_dedup on event id) or a transactional sink (Delta + txn
  app/batch id) — a blind parquet append alone cannot be exactly-once.
- ``stream_silver_counts``: incremental silver — watermarked windowed
  counts over eventtime, the streaming twin of fact_tsunami_monthly.
  Late events beyond the watermark are dropped (documented bound),
  in-watermark updates revise the counts.

At scale both are standard stateful-streaming shapes: state is keyed
by (window, year/month) — bounded by the watermark horizon, not by
input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sinks import save_partitioned_table
from ..sources.geojson import geojson_docs_to_events


def stream_geojson_to_bronze(
    spark: SparkSession,
    input_path: str,
    bronze_path: str,
    checkpoint_path: str,
    *,
    available_now: bool = True,
    replay_idempotent: bool = False,
) -> StreamingQuery:
    """Bronze ingest stream: watch ``input_path`` for GeoJSON document
    files (one FeatureCollection JSON per line), flatten to canonical
    events, append partitioned.

    ``replay_idempotent=True`` upgrades the at-least-once foreachBatch
    append to effective exactly-once: each micro-batch lands in its own
    ``ingest_batch=<id>`` directory in OVERWRITE mode, so a crash
    between write and checkpoint commit replays the batch onto ITSELF
    instead of duplicating rows — the standard "make the write a
    deterministic function of batchId" recipe. The extra directory
    level reads back as a partition column and costs nothing at scan
    time (readers that project events never touch it)."""
    raw = spark.readStream.text(input_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        events = geojson_docs_to_events(batch_df, "value")
        if replay_idempotent:
            save_partitioned_table(
                events,
                f"{bronze_path.rstrip('/')}/ingest_batch={batch_id}",
                mode="overwrite",
            )
        else:
            save_partitioned_table(events, bronze_path, mode="append")

    writer = (
        raw.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_geojson_to_bronze_filesink(
    spark: SparkSession,
    input_path: str,
    bronze_path: str,
    checkpoint_path: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Exactly-once bronze ingest via the NATIVE file sink: same parse
    plan, but the partitioned parquet write goes through Spark's
    streaming file sink, whose ``_spark_metadata`` manifest commits
    each batch's files atomically with the checkpoint — replayed
    batches overwrite their own manifest entry, so readers never see
    duplicates. The trade-off vs foreachBatch: no empty-skip or custom
    landing logic, and consumers listing files directly (outside
    Spark) must honor the manifest."""
    raw = spark.readStream.text(input_path)
    events = geojson_docs_to_events(raw, "value")
    writer = (
        events.writeStream.format("parquet")
        .partitionBy("year", "month")
        .option("path", bronze_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_silver_counts(
    spark: SparkSession,
    bronze_path: str,
    checkpoint_path: str,
    query_name: str = "silver_tsunami_counts",
    *,
    watermark: str = "30 days",
    window_size: str = "7 days",
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental silver: tsunami-event counts in tumbling eventtime
    windows with a late-data watermark, maintained into an in-memory
    sink (swap for a Delta/parquet upsert sink in production).

    Streaming twin of fact_tsunami_monthly: same filter + time-bucket
    + count shape, expressed as a watermarked stateful aggregation.
    """
    from ..schema import USGS_EVENTS_SCHEMA

    bronze = (
        spark.readStream.schema(USGS_EVENTS_SCHEMA)
        .format("parquet")
        .load(bronze_path)
    )
    counts = (
        bronze.filter(F.col("tsunami") == 1)
        .withWatermark("eventtime", watermark)
        .groupBy(F.window("eventtime", window_size).alias("win"))
        .agg(F.count("*").alias("tsunami_count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tsunami_count",
        )
    )
    writer = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_to_geojson(
    events_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming leg of the ``usgs_geojson`` SINK — completes the
    custom DataSource's matrix (batch read + stream read + batch
    write + STREAM write; reference parity P9/K2 as a continuous
    export): every micro-batch lands as GeoJSON FeatureCollection
    files through the batch writer, one ``batch=<id>`` directory per
    micro-batch in OVERWRITE mode. The directory name is a
    deterministic function of batchId, so foreachBatch's
    at-least-once replay overwrites ITSELF instead of duplicating
    features — the same idempotence recipe as
    ``stream_geojson_to_bronze(replay_idempotent=True)``. Each batch
    directory carries its own ``_MANIFEST.json`` (manifest published
    before stale-part deletes, so readers never see a torn commit).

    At scale: the writer serializes one FeatureCollection per
    partition — a narrow map over the micro-batch, no added shuffle;
    the per-batch directory keeps commit scope (and replay scope)
    bounded to one trigger's data."""
    spark = events_stream.sparkSession
    from ..sources.usgs_datasource import UsgsGeoJsonDataSource

    spark.dataSource.register(UsgsGeoJsonDataSource)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():  # empty-trigger skip (reference F3)
            return
        (
            batch_df.write.format("usgs_geojson")
            .mode("overwrite")
            .save(f"{out_path.rstrip('/')}/batch={batch_id}")
        )

    writer = events_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
