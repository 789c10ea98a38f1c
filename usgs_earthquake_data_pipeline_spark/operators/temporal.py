"""Temporal operators Spark lacks as built-ins, expressed as
compositions of DataFrame primitives (never driver loops, never
unbounded theta joins):

- ``asof_join``: for each left row, the newest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union-window
  trick: tag both streams, single shuffle on the key, ordered window
  carries the last right value forward. O(n log n) within key
  partitions — the scalable form (a naive ``ts >= ts'`` theta join is
  quadratic and unusable at 100 TB).
- ``range_join_buckets``: pairs within a time tolerance, via
  time-bucket blocking (each left row joins its own and the adjacent
  bucket, then the exact predicate filters) — an equi-join on
  (key, bucket) instead of a non-equi join, so it shuffles instead of
  nested-looping.
- ``time_bucket_rollup``: the hypertable-style fixed-width time
  rollup (floor-to-bucket + aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    *,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: enrich each left row with the most recent right row
    at or before its timestamp, per key.

    Returns all left columns plus ``right_value_cols`` (NULL when no
    right row precedes). ``tolerance_seconds`` bounds staleness like
    pandas ``merge_asof(tolerance=...)``.
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__r", F.lit(None))
    # the whole right row travels as ONE struct: last(ignorenulls) then
    # skips missed rows (left rows carry NULL structs) but never skips a
    # right row whose VALUE is NULL — the struct itself is non-null.
    rt = right.select(
        F.col(key_col),
        F.col(right_ts).alias(left_ts),
        F.struct(
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("__r"),
    ).withColumn("__side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (__side
    # 0 < 1), so "at or before" includes equal timestamps.
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(left_ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        in_range = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("__r.__ts"))
        ) <= tolerance_seconds * 1_000_000
        out = out.withColumn("__r", F.when(in_range, F.col("__r")))
    for c in right_value_cols:
        out = out.withColumn(c, F.col("__r")[c])
    return (
        out.withColumn(f"asof_{right_ts}", F.col("__r.__ts"))
        .drop("__side", "__r")
    )


def _bucket(col: Column, width_seconds: int) -> Column:
    return F.floor(F.unix_micros(col) / (width_seconds * 1_000_000)).cast("long")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    *,
    tolerance_seconds: int,
) -> DataFrame:
    """Pairs (left, right) with the same key whose timestamps differ by
    at most ``tolerance_seconds``, via bucket blocking: each right row
    is replicated into its bucket and both neighbors, the join is a
    pure equi-join on (key, bucket), and the exact predicate prunes.
    Replication factor is a constant 3 — not data-dependent."""
    lb = left.withColumn("__bucket", _bucket(F.col(left_ts), tolerance_seconds))
    rb = right.withColumn(
        "__b0", _bucket(F.col(right_ts), tolerance_seconds)
    ).withColumn(
        "__bucket", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1))
    ).drop("__b0")
    joined = lb.join(rb, [key_col, "__bucket"])
    delta = F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts)))
    return joined.filter(delta <= tolerance_seconds * 1_000_000).drop("__bucket")


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Hypertable-style rollup: aggregate into fixed-width time
    buckets. Output carries ``bucket_start`` (timestamp). Partial
    aggregation makes the shuffle proportional to bucket count."""
    bucket_start = F.timestamp_micros(
        _bucket(F.col(ts_col), width_seconds) * width_seconds * 1_000_000
    ).alias("bucket_start")
    keys = [bucket_start] + [F.col(k) for k in (extra_keys or [])]
    return df.groupBy(*keys).agg(*aggs)


def gapfill_locf(
    observed: DataFrame,
    *,
    key_col: str,
    bucket_col: str,
    value_col: str,
    bucket_seconds: int,
    grid_start: Column,
    grid_end: Column,
) -> DataFrame:
    """Timescale-style ``time_bucket_gapfill + locf``: densify a
    per-key bucketed series onto a regular grid and carry the last
    observation forward into the gaps.

    ``observed`` holds one row per (key, bucket) that HAS data;
    ``grid_start``/``grid_end`` are timestamp expressions evaluated
    against ``observed`` (usually global min/max) that bound the grid.

    Plan shape: the grid is ``sequence() + explode`` over the distinct
    keys — |keys| x |buckets| rows, generated, never shuffled raw —
    left-joined to the observations on (key, bucket), then one
    ``last(value, ignorenulls)`` window per key ordered by bucket.
    Exactly one shuffle on the key (the window's); the join
    co-partitions with it. Buckets before a key's first observation
    stay NULL (nothing to carry); ``is_gap`` marks filled rows.
    """
    grid = (
        observed.groupBy(key_col)
        .agg(grid_start.alias("__g0"), grid_end.alias("__g1"))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    "__g0", "__g1", F.expr(f"INTERVAL {bucket_seconds} SECONDS")
                )
            ).alias(bucket_col),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(observed, [key_col, bucket_col], "left")
    return joined.select(
        key_col,
        bucket_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().cast("int").alias("is_gap"),
    )
