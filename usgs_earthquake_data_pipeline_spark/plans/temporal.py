"""Catalog entries for the temporal operators (as-of join, bucketed
range join, hypertable-style rollup). DuckDB supports ASOF JOIN and
non-equi joins natively, so all three are fully oracle-checked — the
oracle runs the naive formulation, the Spark side runs the scalable
composition, and the results must be identical."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import temporal as TP
from ..materialize import materialize_lazy
from ..sources.tables import load_table
from .catalog import register


@register(
    "asof_join_last_error",
    oracle=(
        "SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, "
        "e.err_value, epoch_us(e.ts) AS err_ts_us "
        "FROM (SELECT * FROM events WHERE event_type = 'click') c "
        "ASOF LEFT JOIN (SELECT user_id, ts, value AS err_value FROM events "
        "WHERE event_type = 'error') e "
        "ON c.user_id = e.user_id AND c.ts >= e.ts"
    ),
    headline=True,
    tags=("temporal", "asof"),
)
def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click enriched with the user's most recent
    error at or before it. Spark side is the union-window composition
    (one shuffle on user_id); the oracle is DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    joined = TP.asof_join(clicks, errors, "user_id", "ts", "ts", ["err_value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "err_value",
        F.unix_micros("asof_ts").alias("err_ts_us"),
    )


@register(
    "range_join_error_purchase",
    oracle=(
        "SELECT l.event_id AS error_id, r.event_id AS purchase_id "
        "FROM events l JOIN events r ON l.user_id = r.user_id "
        "AND l.event_type = 'error' AND r.event_type = 'purchase' "
        "AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 600000000"
    ),
    tags=("temporal", "range-join"),
)
def range_join_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: (error, purchase) pairs for the same user within 10
    minutes. Spark side blocks on time buckets (pure equi-join, 3×
    constant replication); the oracle is the naive non-equi join."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("l_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("r_ts")
    )
    return TP.range_join_buckets(
        errors, purchases, "user_id", "l_ts", "r_ts", tolerance_seconds=600
    ).select("error_id", "purchase_id")


@register(
    "sessionize_gap_10min",
    oracle=(
        "WITH g AS (SELECT user_id, ts, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000 "
        "THEN 1 ELSE 0 END AS new_s FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT user_id, ts, SUM(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
        "FROM g) "
        "SELECT user_id, epoch_us(min(ts)) AS session_start_us, "
        "epoch_us(max(ts)) AS session_end_us, CAST(count(*) AS INT) AS n_events "
        "FROM s GROUP BY user_id, sid"
    ),
    tags=("temporal", "session"),
)
def sessionize_gap_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (batch form of the stateful streaming
    operator): 10-minute-gap sessions per user via lag + cumulative
    counter — one shuffle on user_id. The streaming twin
    (applyInPandasWithState) is validated against this in tests."""
    from ..streaming.sessionize import sessionize_batch

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return sessionize_batch(ev, gap_seconds=600).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


@register(
    "time_bucket_rollup_hourly",
    oracle=(
        "SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT) "
        "AS bucket_start_us, event_type, count(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("temporal", "rollup"),
)
def time_bucket_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup per event type."""
    ev = load_table(spark, sf_dir, "events")
    out = TP.time_bucket_rollup(
        ev,
        "ts",
        3600,
        aggs=[
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        ],
        extra_keys=["event_type"],
    )
    return out.select(
        F.unix_micros("bucket_start").alias("bucket_start_us"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("bucket_start_us", "event_type")


@register(
    "session_window_builtin",
    oracle=(
        "WITH g AS (SELECT user_id, ts, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000 "
        "THEN 1 ELSE 0 END AS new_s FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT user_id, ts, SUM(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
        "FROM g) "
        "SELECT user_id, epoch_us(min(ts)) AS session_start_us, "
        "epoch_us(max(ts)) + 600000000 AS session_end_us, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us"
    ),
    tags=("temporal", "session"),
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's *built-in* ``session_window``
    aggregation (the engine-native alternative to the lag+cumsum form
    in ``sessionize_gap_10min`` and the stateful streaming operator).

    Semantics differ from the lag form at the exact boundary: the
    built-in window is half-open [first, last+gap), so an event
    arriving exactly ``gap`` after the last one starts a NEW session
    (the oracle encodes ``>=``), and ``session_end = last + gap``
    rather than the last event time. One shuffle on the session key;
    Catalyst plans it as a single session-window aggregate — no
    window-function pass at all."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", F.session_window("ts", "10 minutes")
    ).agg(F.count("*").alias("n_events"))
    return agg.select(
        "user_id",
        F.unix_micros("session_window.start").alias("session_start_us"),
        F.unix_micros("session_window.end").alias("session_end_us"),
        "n_events",
    ).orderBy("user_id", "session_start_us")


@register(
    "window_range_frame_30min",
    oracle=(
        "SELECT user_id, epoch_us(ts) AS ts_us, "
        "count(*) OVER w AS n_30m, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_30m "
        "FROM events WHERE user_id < 100 "
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) "
        "RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) "
        "ORDER BY user_id, ts_us"
    ),
    tags=("temporal", "window", "range-frame"),
)
def window_range_frame_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the rolling event
    count and value sum over the trailing 30 minutes of EVENT TIME —
    a true range frame over unix-micros ordering (peers at equal
    timestamps share the frame), not a row-count frame. The sum is
    decimal-exact inside the frame so summation order cannot diverge
    between engines; one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1_800_000_000, 0)
    )
    return (
        ev.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.count("*").over(w).alias("n_30m"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("sum_30m"),
        )
        .orderBy("user_id", "ts_us")
    )


@register(
    "session_conversion_rate",
    oracle=(
        "WITH g AS (SELECT user_id, ts, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
        "THEN 1 ELSE 0 END AS new_s FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT user_id, event_type, SUM(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
        "FROM g), "
        "sess AS (SELECT user_id, sid, "
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p "
        "FROM s GROUP BY 1, 2) "
        "SELECT count(*) AS n_sessions, "
        "CAST(SUM(has_p) AS BIGINT) AS n_converting, "
        "round(1.0 * SUM(has_p) / count(*), 6) AS conversion_rate "
        "FROM sess"
    ),
    tags=("temporal", "session", "analytics"),
)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped conversion: the fraction of 30-minute-gap
    sessions containing a purchase — the metric gap sessionization
    exists to feed. Reuses the shared session-id assignment stage
    (streaming/sessionize.py:assign_session_ids), then one
    session-keyed aggregate and a scalar rollup; exchanges bounded by
    events once and sessions once."""
    from ..streaming.sessionize import assign_session_ids

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    sess = (
        assign_session_ids(ev, gap_seconds=1800)
        .groupBy("user_id", "__session_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("has_p")
        )
    )
    return sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum("has_p").cast("bigint").alias("n_converting"),
        F.round(F.sum("has_p") / F.count("*"), 6).alias("conversion_rate"),
    )


@register(
    "asof_join_tolerance_10min",
    oracle=(
        # ASOF match nulled out when staler than the tolerance — the
        # pandas merge_asof(tolerance=...) contract
        "SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, "
        "CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= 600000000 "
        "THEN e.err_value END AS err_value, "
        "CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= 600000000 "
        "THEN epoch_us(e.ts) END AS err_ts_us "
        "FROM (SELECT * FROM events WHERE event_type = 'click') c "
        "ASOF LEFT JOIN (SELECT user_id, ts, value AS err_value FROM events "
        "WHERE event_type = 'error') e "
        "ON c.user_id = e.user_id AND c.ts >= e.ts"
    ),
    tags=("temporal", "asof"),
)
def asof_join_tolerance_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: each click joined to the
    user's most recent error, but only if that error is at most 10
    minutes old (older matches null out — pandas merge_asof's
    ``tolerance`` semantics). Exercises the tolerance branch of the
    union-window as-of composition under the hash gate; plan shape is
    unchanged (one shuffle on user_id, tolerance is a post-window
    expression)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    joined = TP.asof_join(
        clicks, errors, "user_id", "ts", "ts", ["err_value"],
        tolerance_seconds=600,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "err_value",
        F.unix_micros("asof_ts").alias("err_ts_us"),
    )


@register(
    "timeseries_gapfill_locf",
    oracle=(
        "WITH obs AS (SELECT user_id, "
        "CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT) "
        "AS bucket_us, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_sum "
        "FROM events WHERE user_id < 10 GROUP BY 1, 2), "
        "spans AS (SELECT user_id, min(bucket_us) AS b0, max(bucket_us) AS b1 "
        "FROM obs GROUP BY 1), "
        "grid AS (SELECT user_id, unnest(generate_series(b0, b1, 3600000000)) "
        "AS bucket_us FROM spans), "
        "dense AS (SELECT g.user_id, g.bucket_us, o.hour_sum FROM grid g "
        "LEFT JOIN obs o ON o.user_id = g.user_id "
        "AND o.bucket_us = g.bucket_us) "
        "SELECT user_id, bucket_us, "
        "last_value(hour_sum IGNORE NULLS) OVER (PARTITION BY user_id "
        "ORDER BY bucket_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS hour_sum, "
        "CAST(hour_sum IS NULL AS INT) AS is_gap "
        "FROM dense ORDER BY 1, 2"
    ),
    tags=("temporal", "timeseries", "gapfill"),
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timescale-style ``time_bucket_gapfill + locf``: each user's
    hourly value-sum series densified onto a regular hourly grid from
    their first to their last active hour, gaps carrying the last
    observation forward (``is_gap`` marks filled rows).

    The grid is generated per key with ``sequence + explode`` —
    |keys| x |buckets| rows that exist only inside the plan, never as
    stored data — and the fill is one ``last(ignorenulls)`` window:
    one shuffle on user_id total. The per-key span (vs a global grid)
    also means no leading NULLs and no key emitting buckets outside
    its lifetime — at 100 TB with sparse long-tail keys a global grid
    would manufacture mostly-empty series. The oracle builds the same
    grid with DuckDB's generate_series + IGNORE NULLS last_value.
    Buckets are exchanged as unix-micros BIGINTs (catalog ts rule)."""
    from ..operators.temporal import gapfill_locf

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    obs = (
        ev.groupBy(
            "user_id",
            (
                F.floor(F.unix_micros("ts") / 3_600_000_000) * 3_600_000_000
            ).alias("bucket_us"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("hour_sum")
        )
    )
    filled = gapfill_locf(
        obs.withColumn("bucket", F.timestamp_micros(F.col("bucket_us"))).drop(
            "bucket_us"
        ),
        key_col="user_id",
        bucket_col="bucket",
        value_col="hour_sum",
        bucket_seconds=3600,
        grid_start=F.min("bucket"),
        grid_end=F.max("bucket"),
    )
    return filled.select(
        "user_id",
        F.unix_micros("bucket").alias("bucket_us"),
        "hour_sum",
        "is_gap",
    ).orderBy("user_id", "bucket_us")


@register(
    "twap_value_per_type",
    oracle=(
        "WITH seq AS (SELECT event_type, value, epoch_us(ts) AS t_us, "
        "lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id) "
        "AS next_us FROM events), "
        "w AS (SELECT event_type, value, next_us - t_us AS dur_us FROM seq "
        "WHERE next_us IS NOT NULL) "
        "SELECT event_type, "
        "round(SUM(value * dur_us) / SUM(dur_us), 6) AS twap, "
        "CAST(count(*) AS BIGINT) AS n_intervals "
        "FROM w GROUP BY 1 ORDER BY 1"
    ),
    tags=("temporal", "timeseries", "twap"),
)
def twap_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type — the irregular-
    sampling mean (each observation weighted by how long it was
    current) that a plain AVG gets wrong whenever sampling density
    correlates with the value. One lead() window per type for the
    holding durations, then an algebraic weighted aggregate: one
    shuffle, partial-aggregated. Ties on ts break by event_id so the
    lead sequence (and therefore every duration) is engine-identical;
    the quotient rounds to 6 dp (double dot-products agree to ~1e-10
    relative between engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    return (
        seq.withColumn("dur_us", F.col("next_us") - F.col("t_us"))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twap"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


_EWMA_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(floor({epoch} / 86400000000) AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM {table} GROUP BY 1),
idx AS (SELECT d, v, row_number() OVER (ORDER BY d) AS i FROM daily),
ew(i, d, ewma) AS (
  SELECT i, d, v FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.i, idx.d, (idx.v + ew.ewma) / 2
  FROM idx JOIN ew ON idx.i = ew.i + 1
)
SELECT d, round(ewma, 6) AS ewma FROM ew ORDER BY d
"""

# Spark side of the daily-series recursions: ONE array fold instead of
# |days| recursive 1-row-join steps. The WITH RECURSIVE form is kept
# verbatim as the DuckDB oracle (it states the semantics), but running
# it through Spark's iterative union executor costs ~9-10 s of pure
# per-step scheduling at EVERY scale factor (round-9 verdict item 4).
# aggregate() over the array_sort(collect_list(...))-ordered daily
# array computes the same chain JVM-side in one stage: identical IEEE
# operations in identical order, so the doubles stay bit-identical to
# the recursive form. Scale shape: the corpus collapses in the daily
# aggregate; the fold runs on one |days|-element array on one task.
_EWMA_FOLD_SQL = """
WITH daily AS (
  SELECT CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM {table} GROUP BY 1),
arr AS (SELECT array_sort(collect_list(struct(d, v))) AS xs FROM daily),
folded AS (
  SELECT aggregate(
    xs,
    CAST(array() AS ARRAY<STRUCT<d: BIGINT, ewma: DOUBLE>>),
    (acc, e) -> array_append(acc, struct(
        e.d AS d,
        IF(size(acc) = 0, e.v,
           (e.v + element_at(acc, -1).ewma) / 2) AS ewma))
  ) AS out FROM arr)
SELECT r.d AS d, round(r.ewma, 6) AS ewma
FROM folded LATERAL VIEW explode(out) t AS r
ORDER BY d
"""


@register(
    "ewma_daily_value_recursive",
    oracle=_EWMA_SQL.format(epoch="epoch_us(ts)", table="events"),
    tags=("temporal", "timeseries", "recursive"),
)
def ewma_daily_value_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=1/2) of the daily value sum — the inherently recursive
    timeseries smoother (each output depends on the previous output,
    which no window frame expresses). The oracle states it as WITH
    RECURSIVE; the Spark side computes the identical chain as one
    JVM-side array fold (see ``_EWMA_FOLD_SQL``) — same additions and
    exact halvings in the same order, so the doubles are bit-identical
    to the recursive form at a fraction of the scheduling cost. α is
    deliberately 1/2: each step is then one IEEE addition and one
    exact halving, so the whole chain is bit-identical across engines
    with NO intermediate rounding. The two tempting alternatives both
    diverge and were ruled out by measurement: rounding doubles at
    each step flips at half boundaries (independently computed doubles
    one ulp apart round apart and the offset persists), and decimal
    casts disagree between engines (Spark narrows HALF_UP, DuckDB
    truncates — 0.0000025 → 0.000003 vs 0.000002). The fold runs over
    the ~30-row daily aggregate, not raw events — array length = days,
    one task, any data scale."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ewma_events")
    return spark.sql(_EWMA_FOLD_SQL.format(table="__ewma_events"))


@register(
    "scd2_user_type_history",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, ts, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev_type, epoch_us(ts) AS t_us, event_id FROM events "
        "WHERE user_id < 5), "
        "changes AS (SELECT user_id, event_type, t_us, event_id FROM seq "
        "WHERE prev_type IS NULL OR event_type <> prev_type), "
        "versioned AS (SELECT user_id, event_type, t_us AS valid_from_us, "
        "lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) "
        "AS valid_to_us FROM changes) "
        "SELECT user_id, event_type, valid_from_us, valid_to_us, "
        "CAST(valid_to_us IS NULL AS INT) AS is_current "
        "FROM versioned ORDER BY user_id, valid_from_us"
    ),
    tags=("temporal", "scd2", "warehouse"),
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse each
    user's event-type stream into validity intervals — a row per
    CHANGE with [valid_from, valid_to) and an is_current flag, the
    standard warehouse shape for as-of dimension joins (the existing
    asof_join operator is its query-side counterpart).

    Two windows over the same user partitioning (lag to detect
    changes, lead to close intervals) — one shuffle total, interval
    count bounded by changes, not events. Ties break by event_id so
    both engines derive identical intervals."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seq.filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    return (
        changes.select(
            "user_id",
            "event_type",
            F.col("t_us").alias("valid_from_us"),
            F.lead("t_us").over(w2).alias("valid_to_us"),
        )
        .withColumn(
            "is_current", F.col("valid_to_us").isNull().cast("int")
        )
        .orderBy("user_id", "valid_from_us")
    )


@register(
    "pit_join_state_at_purchase",
    oracle=(
        # naive point-in-time join: SCD2 intervals from the
        # non-purchase stream, labels matched by interval membership
        # (the quadratic non-equi form the union-window plan must
        # reproduce exactly)
        "WITH seq AS (SELECT user_id, event_type, ts, "
        "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "    AS prev_type, epoch_us(ts) AS t_us, event_id FROM events "
        "  WHERE user_id < 20 AND event_type <> 'purchase'), "
        "changes AS (SELECT user_id, event_type, t_us, event_id FROM seq "
        "  WHERE prev_type IS NULL OR event_type <> prev_type), "
        "versioned AS (SELECT user_id, event_type, t_us AS vf, "
        "  lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
        "    AS vt FROM changes), "
        "labels AS (SELECT user_id, event_id, epoch_us(ts) AS t_us "
        "  FROM events WHERE user_id < 20 AND event_type = 'purchase') "
        "SELECT l.user_id AS user_id, l.event_id, "
        "  v.event_type AS state_at_label "
        "FROM labels l LEFT JOIN versioned v "
        "  ON v.user_id = l.user_id AND v.vf <= l.t_us "
        "  AND (v.vt IS NULL OR l.t_us < v.vt) "
        "ORDER BY l.user_id, l.event_id"
    ),
    tags=("temporal", "scd2", "warehouse", "feature-store"),
)
def pit_join_state_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) join: each label event (a
    purchase) is enriched with the dimension version VALID AT ITS
    TIMESTAMP — here the user's SCD2 behavioral state built from the
    non-purchase stream. The defining guarantee is leakage-freedom: a
    label can never see a feature whose validity starts after the
    label's timestamp, which is exactly what makes offline training
    features reproducible online.

    The naive formulation (the oracle) is a non-equi interval join —
    per-user quadratic, a scale killer. The plan here is the
    union-window as-of shape instead: feature-change rows and label
    rows union into ONE stream, one shuffle on user_id, and a
    last-non-null window picks each label's governing version.
    Same-timestamp ties order feature-before-label (kind 0 < 1), so
    an interval starting AT the label timestamp applies (inclusive
    valid_from, matching the oracle's vf <= ts < vt), and stacked
    same-timestamp changes shadow to the LAST one — the only one
    whose zero-width-free interval can contain anything. Labels
    before any change yield NULL state (the left join's no-match)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feat = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("t_us"),
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            F.col("t_us"),
            F.lit(0).alias("kind"),
            "event_id",
            F.col("event_type").alias("state"),
        )
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        feat.unionByName(labels)
        .withColumn(
            "state_at_label", F.last("state", ignorenulls=True).over(wu)
        )
        .filter(F.col("kind") == 1)
        .select("user_id", "event_id", "state_at_label")
        .orderBy("user_id", "event_id")
    )


@register(
    "sliding_window_counts",
    oracle=(
        "WITH b AS (SELECT CAST(floor(epoch_us(ts) / 1800000000) "
        "* 1800000000 AS BIGINT) AS s30, value FROM events), "
        "w AS (SELECT s30 AS win_start_us, value FROM b "
        "UNION ALL SELECT s30 - 1800000000, value FROM b) "
        "SELECT win_start_us, count(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM w GROUP BY 1 ORDER BY 1"
    ),
    tags=("temporal", "window", "sliding"),
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h windows every 30 min,
    ``F.window(ts, dur, slide)``): each event lands in dur/slide = 2
    overlapping windows — the hopping-aggregate shape streaming SLAs
    are measured in (tumbling and session windows carry their own
    entries). Spark plans the window assignment as an Expand (local
    row fan-out, no UDF, no join); the oracle derives the same two
    covering window starts arithmetically and UNION ALLs them. At
    100 TB the exchange is bounded by windows × groups, with the
    fan-out factor (dur/slide) a known plan constant."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "n",
            "sum_value",
        )
        .orderBy("win_start_us")
    )


@register(
    "acf_daily_value_lags",
    oracle=(
        "WITH daily AS ("
        "  SELECT day(ts) AS d, "
        "         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x "
        "  FROM events GROUP BY 1), "
        "lags AS (SELECT UNNEST([1, 2, 3, 4, 5, 6, 7]) AS lag_k), "
        "pairs AS ("
        "  SELECT l.lag_k, a.x AS xa, b.x AS xb "
        "  FROM daily a CROSS JOIN lags l "
        "  JOIN daily b ON b.d = a.d + l.lag_k), "
        "s AS ("
        "  SELECT lag_k, CAST(COUNT(*) AS DOUBLE) AS n, "
        "         CAST(SUM(xa) AS DOUBLE) AS sx, "
        "         CAST(SUM(xb) AS DOUBLE) AS sy, "
        "         CAST(SUM(CAST(CAST(xa AS DECIMAL(19,6)) * CAST(xb AS DECIMAL(19,6)) AS DECIMAL(30,12))) AS DOUBLE) AS sxy, "
        "         CAST(SUM(CAST(CAST(xa AS DECIMAL(19,6)) * CAST(xa AS DECIMAL(19,6)) AS DECIMAL(30,12))) AS DOUBLE) AS sxx, "
        "         CAST(SUM(CAST(CAST(xb AS DECIMAL(19,6)) * CAST(xb AS DECIMAL(19,6)) AS DECIMAL(30,12))) AS DOUBLE) AS syy "
        "  FROM pairs GROUP BY 1) "
        "SELECT lag_k, round((n * sxy - sx * sy) / "
        "       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS acf "
        "FROM s ORDER BY 1"
    ),
    tags=("temporal", "stats"),
)
def acf_daily_value_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily value series at lags 1-7
    (Pearson correlation of the lag-k pairs) — the seasonality/
    persistence diagnostic a forecasting pipeline runs before model
    choice. Same determinism discipline as spearman: every sum is
    decimal-exact (daily totals normalized to DECIMAL(18,6) on both
    engines so products agree digit-for-digit), the statistic is one
    IEEE expression over exact sums, rounded to 6 dp. Scale shape:
    the raw table collapses to |days| rows in the first map-side
    aggregate — the lag self-join and all seven correlations run on
    that tiny series (the 'daily pre-agg shrinks input to O(days)'
    pattern), so the entry is scan-bound at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("x")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
    left = daily.crossJoin(F.broadcast(lags)).select(
        "lag_k",
        F.col("x").alias("xa"),
        (F.col("d") + F.col("lag_k")).alias("d2"),
    )
    pairs = left.join(
        daily.select(F.col("d").alias("d2"), F.col("x").alias("xb")), "d2"
    )
    s = pairs.groupBy("lag_k").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("xa").cast("double").alias("sx"),
        F.sum("xb").cast("double").alias("sy"),
        F.sum((F.col("xa") * F.col("xb")).cast("decimal(30,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("xa") * F.col("xa")).cast("decimal(30,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("xb") * F.col("xb")).cast("decimal(30,12)"))
        .cast("double")
        .alias("syy"),
    )
    acf = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("lag_k", F.round(acf, 6).alias("acf")).orderBy("lag_k")


@register(
    "anomaly_zscore_daily",
    oracle=(
        "WITH daily AS ("
        "  SELECT day(ts) AS d, "
        "         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x "
        "  FROM events GROUP BY 1), "
        "w AS ("
        "  SELECT d, x, "
        "         COUNT(*) OVER win AS n7, "
        "         CAST(SUM(x) OVER win AS DOUBLE) AS s7, "
        "         CAST(SUM(CAST(CAST(x AS DECIMAL(19,6)) * "
        "                        CAST(x AS DECIMAL(19,6)) AS DECIMAL(30,12)))"
        "              OVER win AS DOUBLE) AS q7 "
        "  FROM daily "
        "  WINDOW win AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)), "
        "z AS ("
        "  SELECT d, CAST(x AS DOUBLE) AS x, "
        "         q7 - s7 * s7 / 7 AS ss7, "
        "         (CAST(x AS DOUBLE) - s7 / 7) / "
        "         sqrt((q7 - s7 * s7 / 7) / 6) AS zraw "
        "  FROM w WHERE n7 = 7) "
        "SELECT CAST(d AS INT) AS d, x, "
        "       CASE WHEN ss7 <= 0 THEN NULL ELSE round(zraw, 6) END AS z, "
        "       CASE WHEN ss7 <= 0 THEN FALSE ELSE abs(zraw) > 2 END "
        "         AS is_anomaly "
        "FROM z ORDER BY d"
    ),
    tags=("temporal", "stats", "anomaly"),
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection: each day's value
    total scored against the mean/stddev of the 7 PRIOR days (the
    frame excludes the current row, so an anomalous day can't mask
    itself), flagged at |z| > 2 — the on-call dashboard query. Same
    determinism discipline as acf/spearman: the frame sums are
    decimal-exact (operands widened to DECIMAL(19,6) before squaring
    — DuckDB multiplies 18-digit decimals in int64 and overflows),
    the z statistic is one shared IEEE expression over exact sums on
    both engines, rounded to 6 dp only for display; the anomaly flag
    compares the raw z. Scale shape: raw events collapse to |days|
    rows map-side before the single ordered window — the frame never
    sees raw data."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("x")
    )
    win = Window.orderBy("d").rowsBetween(-7, -1)
    xx = (
        F.col("x").cast("decimal(19,6)") * F.col("x").cast("decimal(19,6)")
    ).cast("decimal(30,12)")
    w = daily.select(
        "d",
        "x",
        F.count("*").over(win).alias("n7"),
        F.sum("x").over(win).cast("double").alias("s7"),
        F.sum(xx).over(win).cast("double").alias("q7"),
    )
    # degenerate-window guard (r5 ADVICE): seven equal prior days make
    # the trailing variance 0 (or ~0 negative after IEEE cancellation)
    # and zraw NaN/Inf — Spark and DuckDB disagree on NaN compare and
    # round(NaN), so emit NULL z / false flag instead, on both engines
    ss7 = F.col("q7") - F.col("s7") * F.col("s7") / 7
    zraw = (F.col("x").cast("double") - F.col("s7") / 7) / F.sqrt(ss7 / 6)
    return (
        w.filter(F.col("n7") == 7)
        .select(
            "d",
            F.col("x").cast("double").alias("x"),
            F.when(ss7 <= 0, F.lit(None).cast("double"))
            .otherwise(F.round(zraw, 6))
            .alias("z"),
            F.when(ss7 <= 0, F.lit(False))
            .otherwise(F.abs(zraw) > 2)
            .alias("is_anomaly"),
        )
        .orderBy("d")
    )


@register(
    "seasonal_decompose_weekly",
    oracle=(
        "WITH daily AS (SELECT day(ts) AS d, "
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x "
        "FROM events GROUP BY 1), "
        "offs AS (SELECT UNNEST([-3, -2, -1, 0, 1, 2, 3]) AS o), "
        "win AS (SELECT d + o AS dc, x FROM daily CROSS JOIN offs), "
        "tr AS (SELECT dc AS d, CAST(SUM(x) AS DOUBLE) AS s7, "
        "count(*) AS n7 FROM win GROUP BY 1), "
        "det AS (SELECT daily.d, round(CAST(daily.x AS DOUBLE) - "
        "round(s7 / 7.0, 6), 6) AS det "
        "FROM daily JOIN tr ON tr.d = daily.d WHERE n7 = 7) "
        "SELECT CAST(d % 7 AS INT) AS phase, count(*) AS n_days, "
        "round(CAST(SUM(CAST(det AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) "
        "AS seasonal FROM det GROUP BY 1 ORDER BY 1"
    ),
    tags=("temporal", "stats"),
)
def seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily value
    series (the moving-average step of STL): trend = 7-day centered
    moving average (FULL windows only — edge days with partial
    windows are excluded on both engines), detrended = value − trend,
    seasonal factor = mean detrended value per weekly phase (d mod
    7).  The factors are what a forecasting/monitoring pipeline
    subtracts before anomaly scoring — the ``anomaly_zscore_daily``
    entry's unseasonalized twin.

    Scale shape: the corpus collapses to |days| rows in one map-side
    aggregate; the centered window is an offset CROSS JOIN against a
    7-row broadcast + re-aggregate (decimal-exact — sidesteps
    engine-specific float summation order inside window-frame AVG),
    and everything downstream runs on the tiny daily series.  Same
    'daily pre-agg shrinks input to O(days)' pattern as the ACF
    entry."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("x")
    )
    offs = spark.range(-3, 4).select(F.col("id").cast("int").alias("o"))
    win = daily.crossJoin(F.broadcast(offs)).select(
        (F.col("d") + F.col("o")).alias("dc"), "x"
    )
    tr = win.groupBy(F.col("dc").alias("d")).agg(
        F.sum("x").cast("double").alias("s7"), F.count("*").alias("n7")
    )
    det = (
        daily.join(tr, "d")
        .filter(F.col("n7") == 7)
        .select(
            "d",
            F.round(
                F.col("x").cast("double") - F.round(F.col("s7") / 7.0, 6), 6
            ).alias("det"),
        )
    )
    return (
        det.groupBy((F.col("d") % 7).cast("int").alias("phase"))
        .agg(
            F.count("*").alias("n_days"),
            F.round(
                F.sum(F.col("det").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("seasonal"),
        )
        .orderBy("phase")
    )


@register(
    "survival_kaplan_meier_daily",
    oracle=(
        "WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS w_end "
        "FROM events), "
        "u AS (SELECT user_id, "
        "date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) "
        "AS t, "
        "CAST(max(CAST(ts AS DATE)) <= w_end - 7 AS INT) AS churned "
        "FROM events CROSS JOIN horizon GROUP BY user_id, w_end), "
        "cell AS (SELECT t, CAST(count(*) AS BIGINT) AS m, "
        "CAST(SUM(churned) AS BIGINT) AS d FROM u GROUP BY 1), "
        "tot AS (SELECT SUM(m) AS n_users FROM cell), "
        "rk AS (SELECT t, m, d, "
        "n_users - COALESCE(SUM(m) OVER (ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n "
        "FROM cell CROSS JOIN tot), "
        "km AS (SELECT t, CAST(n AS BIGINT) AS n_at_risk, d AS n_churned, "
        "SUM(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeros, "
        "SUM(CASE WHEN d < n THEN ln(1.0 - CAST(d AS DOUBLE) / n) "
        "ELSE 0.0 END) OVER (ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum "
        "FROM rk) "
        "SELECT CAST(t AS BIGINT) AS t_days, n_at_risk, n_churned, "
        "CASE WHEN zeros > 0 THEN 0.0 ELSE round(exp(lsum), 6) END "
        "AS survival FROM km ORDER BY t_days"
    ),
    tags=("temporal", "survival", "analytics"),
)
def survival_kaplan_meier_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier survival curve for user retention with proper
    right-censoring — THE standard churn estimator (the naive
    "fraction still active after t days" is biased because users who
    joined late haven't had time to churn; KM handles exactly that).
    Survival time = days between a user's first and last event; users
    whose last event falls in the final 7 days of the observation
    window are CENSORED (still alive as far as the data can tell) —
    they shrink risk sets but never count as deaths, the textbook
    estimator S(t) = Π_{u≤t} (1 − d_u/n_u).

    Determinism: risk sets and death counts are exact integers; the
    running product is exp(Σ ln(1−d/n)) over the t-ordered window
    (both engines fold the frame in the same t order; ln/exp ULP
    noise sits far below the 6-dp round — the BM25 convention), with
    an explicit zero-crossing guard because Spark's ln(0) is NULL
    while DuckDB's is -inf.

    Scale shape: the corpus-sized work is ONE (user) aggregate; the
    KM recursion runs on the bounded |distinct t| day-domain table
    (a single tiny window partition by design — days, not rows)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    horizon = ev.agg(F.max(day).alias("w_end"))
    u = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("user_id", "w_end")
        .agg(
            F.datediff(F.max(day), F.min(day)).alias("t"),
            (F.max(day) <= F.date_sub(F.col("w_end"), 7))
            .cast("int")
            .alias("churned_flag"),
        )
        .select(
            "t", F.col("churned_flag").alias("churned")
        )
    )
    cell = u.groupBy("t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("churned").cast("long").alias("d"),
    )
    tot = cell.agg(F.sum("m").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = cell.crossJoin(F.broadcast(tot)).withColumn(
        "n",
        F.col("n_users")
        - F.coalesce(F.sum("m").over(w_prev), F.lit(0)),
    )
    km = rk.select(
        "t",
        F.col("n").cast("long").alias("n_at_risk"),
        F.col("d").alias("n_churned"),
        F.sum(
            F.when(F.col("d") == F.col("n"), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("zeros"),
        F.sum(
            F.when(
                F.col("d") < F.col("n"),
                F.log(
                    F.lit(1.0) - F.col("d").cast("double") / F.col("n")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("lsum"),
    )
    return km.select(
        F.col("t").cast("long").alias("t_days"),
        "n_at_risk",
        "n_churned",
        F.when(F.col("zeros") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("lsum")), 6))
        .alias("survival"),
    ).orderBy("t_days")


_CUSUM_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(floor({epoch} / 86400000000) AS BIGINT) AS d,
         SUM(CAST(value AS DECIMAL(18,2))) AS xd
  FROM {table} GROUP BY 1),
stats AS (
  SELECT CAST(SUM(xd) AS DOUBLE) / count(*) AS mu FROM daily),
idx AS (
  SELECT d, CAST(xd AS DOUBLE) AS x,
         row_number() OVER (ORDER BY d) AS i,
         mu * 1.05 AS k, mu * 0.5 AS h
  FROM daily CROSS JOIN stats),
cu(i, d, x, h, s) AS (
  SELECT i, d, x, h, greatest(0.0, x - k) FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.i, idx.d, idx.x, idx.h, greatest(0.0, cu.s + idx.x - idx.k)
  FROM idx JOIN cu ON idx.i = cu.i + 1
)
SELECT d, round(x, 6) AS daily_value, round(s, 6) AS cusum,
       s > h AS alarm
FROM cu ORDER BY d
"""

# Spark side: array fold, same chain (see _EWMA_FOLD_SQL note). The
# seed case greatest(0, x_1 - k) is the general step with prev = 0.0
# (0.0 + x is IEEE-exact x), so the fold needs no first-row special.
_CUSUM_FOLD_SQL = """
WITH daily AS (
  SELECT CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT) AS d,
         SUM(CAST(value AS DECIMAL(18,2))) AS xd
  FROM {table} GROUP BY 1),
arr AS (
  SELECT array_sort(collect_list(struct(d, CAST(xd AS DOUBLE) AS x))) AS xs,
         CAST(SUM(xd) AS DOUBLE) / count(*) AS mu
  FROM daily),
folded AS (
  SELECT mu * 0.5 AS h,
         aggregate(
           xs,
           CAST(array() AS ARRAY<STRUCT<d: BIGINT, x: DOUBLE, s: DOUBLE>>),
           (acc, e) -> array_append(acc, struct(
               e.d AS d, e.x AS x,
               greatest(0.0,
                        IF(size(acc) = 0, CAST(0.0 AS DOUBLE),
                           element_at(acc, -1).s) + e.x - mu * 1.05) AS s))
         ) AS out
  FROM arr)
SELECT r.d AS d, round(r.x, 6) AS daily_value, round(r.s, 6) AS cusum,
       r.s > h AS alarm
FROM folded LATERAL VIEW explode(out) t AS r
ORDER BY d
"""


@register(
    "anomaly_cusum_daily",
    oracle=_CUSUM_SQL.format(epoch="epoch_us(ts)", table="events"),
    tags=("temporal", "timeseries", "recursive", "anomaly"),
)
def anomaly_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detector over the daily value sum —
    the sequential drift alarm (Page 1954) that catches small
    persistent shifts a per-day z-score never sees: S_t =
    max(0, S_{t−1} + x_t − k) with allowance k = 1.05·mean and alarm
    threshold h = 0.5·mean.  Inherently recursive (the max-reset
    makes it non-linear, unlike EWMA's convolution form); the oracle
    states it as WITH RECURSIVE, the Spark side computes the identical
    chain as one array fold (``_CUSUM_FOLD_SQL`` — the
    `ewma_daily_value_recursive` convention).

    Float discipline: daily sums are exact decimals; the mean is one
    division of an exact decimal total; each fold step is an add, a
    subtract, and a max on doubles in identical order — no
    intermediate rounding, bit-identical chains (the EWMA entry's
    measured result).  Array length = |days|, one task: the corpus
    collapses in the first aggregate at any scale."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__cusum_events")
    return spark.sql(_CUSUM_FOLD_SQL.format(table="__cusum_events"))


@register(
    "changepoint_binary_seg_daily",
    oracle=(
        "WITH daily AS (SELECT CAST(floor(epoch_us(ts) / 86400000000) "
        "AS BIGINT) AS d, SUM(CAST(value AS DECIMAL(18,2))) AS xd "
        "FROM events GROUP BY 1), "
        "idx AS (SELECT d, xd, row_number() OVER (ORDER BY d) AS i "
        "FROM daily), "
        "pre AS (SELECT d, i, SUM(xd) OVER (ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p "
        "FROM idx), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(xd) AS t "
        "FROM daily), "
        "g AS (SELECT d, i, n, t, p, "
        "CAST(n * p - i * t AS DOUBLE) AS num FROM pre CROSS JOIN tot "
        "WHERE i < n), "
        "sc AS (SELECT d, i, n, t, p, "
        "(num * num) / (CAST(n AS DOUBLE) * i * (n - i)) AS gain "
        "FROM g) "
        "SELECT CAST(d AS BIGINT) AS split_day, CAST(i AS BIGINT) "
        "AS split_idx, CAST(n AS BIGINT) AS n_days, "
        "round(gain, 6) AS gain, "
        "round(CAST(p AS DOUBLE) / i, 6) AS mean_left, "
        "round(CAST(t - p AS DOUBLE) / (n - i), 6) AS mean_right "
        "FROM sc ORDER BY gain DESC, split_day LIMIT 1"
    ),
    tags=("temporal", "timeseries", "changepoint"),
)
def changepoint_binary_seg_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First step of binary-segmentation changepoint detection over
    the daily value series: the split maximizing the between-segment
    sum of squares, in the prefix-sum closed form gain(i) =
    (n·P_i − i·T)² / (n·i·(n−i)) — no per-split rescan, one pass
    over prefix sums.  Numerators are EXACT (integer × decimal
    prefix-sum arithmetic, converted to double once); the gain is
    then two IEEE ops, with the split day as deterministic tiebreak.
    Further segmentation steps recurse on each side of the argmax —
    the same bounded computation per segment.

    Scale shape: the corpus collapses in the daily aggregate; prefix
    sums and the argmax run on the |days|-bounded domain (single tiny
    window partition by design).  Returns the split with segment
    means, the fitted step function's parameters."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)")
        .alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("xd"))
    idx = daily.withColumn(
        "i", F.row_number().over(Window.orderBy("d"))
    )
    w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = idx.select("d", "i", F.sum("xd").over(w).alias("p"))
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("xd").alias("t")
    )
    g = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            "d",
            "i",
            "n",
            "p",
            "t",
            (F.col("n") * F.col("p") - F.col("i") * F.col("t"))
            .cast("double")
            .alias("num"),
        )
    )
    gain = (F.col("num") * F.col("num")) / (
        F.col("n").cast("double") * F.col("i") * (F.col("n") - F.col("i"))
    )
    return (
        g.select(
            F.col("d").cast("long").alias("split_day"),
            F.col("i").cast("long").alias("split_idx"),
            F.col("n").cast("long").alias("n_days"),
            F.round(gain, 6).alias("gain"),
            F.round(F.col("p").cast("double") / F.col("i"), 6).alias(
                "mean_left"
            ),
            F.round(
                (F.col("t") - F.col("p")).cast("double")
                / (F.col("n") - F.col("i")),
                6,
            ).alias("mean_right"),
        )
        .orderBy(F.col("gain").desc(), "split_day")
        .limit(1)
    )


@register(
    "trend_theil_sen_daily",
    oracle=(
        "WITH daily AS (SELECT CAST(floor(epoch_us(ts) / 86400000000) "
        "AS BIGINT) AS d, SUM(CAST(value AS DECIMAL(18,2))) AS xd "
        "FROM events GROUP BY 1), "
        "pairs AS (SELECT CAST(b.xd - a.xd AS DOUBLE) / (b.d - a.d) "
        "AS slope FROM daily a JOIN daily b ON b.d > a.d), "
        "sl AS (SELECT median(slope) AS med_slope, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM pairs), "
        "res AS (SELECT CAST(xd AS DOUBLE) - med_slope * d AS resid, "
        "med_slope, n_pairs FROM daily CROSS JOIN sl) "
        "SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days, "
        "n_pairs, round(med_slope, 6) AS slope, "
        "round(median(resid), 6) AS intercept "
        "FROM res GROUP BY med_slope, n_pairs"
    ),
    tags=("temporal", "timeseries", "robust"),
)
def trend_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily value series: slope =
    median of all pairwise day-to-day slopes (breakdown point ~29%,
    immune to the outlier days that wreck OLS), intercept = median
    residual at that slope — the robust twin of the per-type OLS
    entry (`agg_regression_per_type`).

    Determinism: each pairwise slope is an exact-decimal difference
    cast to double once, divided by an exact integer day gap; the
    median of identical double multisets is identical on both engines
    (both interpolate the two middle order statistics as (a+b)/2),
    and the intercept pass reuses the UNROUNDED slope so rounding is
    cosmetic-only at the output.

    Scale shape: the corpus collapses to the |days| daily aggregate
    first; the pairwise join is |days|²-bounded (a domain, not a
    data, quadratic — 435 pairs for a month, regardless of row
    count), and both medians run on bounded frames."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)")
        .alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("xd"))
    a = daily.select(F.col("d").alias("da"), F.col("xd").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("xd").alias("xb"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        (
            (F.col("xb") - F.col("xa")).cast("double")
            / (F.col("db") - F.col("da"))
        ).alias("slope")
    )
    sl = pairs.agg(
        F.expr("percentile(slope, 0.5)").alias("med_slope"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    res = daily.crossJoin(F.broadcast(sl)).select(
        (F.col("xd").cast("double") - F.col("med_slope") * F.col("d"))
        .alias("resid"),
        "med_slope",
        "n_pairs",
    )
    return (
        res.groupBy("med_slope", "n_pairs")
        .agg(F.expr("percentile(resid, 0.5)").alias("med_resid"))
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            "n_pairs",
            F.round(F.col("med_slope"), 6).alias("slope"),
            F.round(F.col("med_resid"), 6).alias("intercept"),
        )
    )


_HOLT_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(floor({epoch} / 86400000000) AS BIGINT) AS d,
         SUM(CAST(value AS DECIMAL(18,2))) AS xd
  FROM {table} GROUP BY 1),
idx AS (SELECT d, CAST(xd AS DOUBLE) AS x,
        row_number() OVER (ORDER BY d) AS i FROM daily),
h(i, d, x, l, b) AS (
  SELECT i, d, x, x, CAST(0.0 AS DOUBLE) FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.i, idx.d, idx.x,
         (idx.x + (h.l + h.b)) / 2,
         (((idx.x + (h.l + h.b)) / 2 - h.l) + h.b) / 2
  FROM idx JOIN h ON idx.i = h.i + 1
)
SELECT d, round(x, 6) AS daily_value, round(l, 6) AS level,
       round(b, 6) AS trend, round(l + 7 * b, 6) AS forecast_7d
FROM h ORDER BY d
"""

# Spark side: array fold of the two-state (level, trend) chain (see
# _EWMA_FOLD_SQL note). The level expression is repeated inside the
# trend formula — the same computation on the same operands, so the
# doubles match the recursive form's l_t exactly (codegen CSEs it).
_HOLT_FOLD_SQL = """
WITH daily AS (
  SELECT CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT) AS d,
         SUM(CAST(value AS DECIMAL(18,2))) AS xd
  FROM {table} GROUP BY 1),
arr AS (
  SELECT array_sort(collect_list(struct(d, CAST(xd AS DOUBLE) AS x))) AS xs
  FROM daily),
folded AS (
  SELECT aggregate(
    xs,
    CAST(array() AS ARRAY<STRUCT<d: BIGINT, x: DOUBLE, l: DOUBLE, b: DOUBLE>>),
    (acc, e) -> array_append(acc, IF(size(acc) = 0,
        struct(e.d AS d, e.x AS x, e.x AS l, CAST(0.0 AS DOUBLE) AS b),
        struct(e.d AS d, e.x AS x,
               (e.x + (element_at(acc, -1).l + element_at(acc, -1).b)) / 2
                 AS l,
               (((e.x + (element_at(acc, -1).l + element_at(acc, -1).b)) / 2
                 - element_at(acc, -1).l) + element_at(acc, -1).b) / 2
                 AS b)))
  ) AS out FROM arr)
SELECT r.d AS d, round(r.x, 6) AS daily_value, round(r.l, 6) AS level,
       round(r.b, 6) AS trend, round(r.l + 7 * r.b, 6) AS forecast_7d
FROM folded LATERAL VIEW explode(out) t AS r
ORDER BY d
"""


@register(
    "forecast_holt_linear_daily",
    oracle=_HOLT_SQL.format(epoch="epoch_us(ts)", table="events"),
    tags=("temporal", "timeseries", "recursive", "forecast"),
)
def forecast_holt_linear_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (the step up
    from the EWMA entry when the series drifts): level l_t =
    α·x_t + (1−α)(l_{t−1}+b_{t−1}), trend b_t = β(l_t−l_{t−1}) +
    (1−β)b_{t−1}, plus the 7-day-ahead forecast l+7b — the
    workhorse short-horizon forecaster before anything seasonal
    (`seasonal_decompose_weekly` handles that axis).

    α=β=1/2 deliberately, the EWMA/CUSUM recursive convention: every
    step is additions and exact halvings of doubles in identical
    order, so the two-state recursion is bit-identical across
    engines with NO intermediate rounding (a 2-state chain is exactly
    where per-step rounding would compound divergence).  Inherently
    recursive — two coupled states, no window frame expresses it —
    stated WITH RECURSIVE in the oracle; the Spark side folds the
    identical chain over the sorted daily array
    (``_HOLT_FOLD_SQL``, the EWMA convention).

    Scale: corpus collapses in the daily aggregate; array length =
    |days|, one task."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__holt_events")
    return spark.sql(_HOLT_FOLD_SQL.format(table="__holt_events"))


@register(
    "changepoint_segmented_fit",
    oracle=(
        "WITH daily AS (SELECT CAST(floor(epoch_us(ts) / 86400000000) "
        "AS BIGINT) AS d, SUM(CAST(value AS DECIMAL(18,2))) AS xd "
        "FROM events GROUP BY 1), "
        "idx AS (SELECT d, xd, row_number() OVER (ORDER BY d) AS i "
        "FROM daily), "
        "pre AS (SELECT d, i, SUM(xd) OVER (ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p "
        "FROM idx), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(xd) AS t "
        "FROM daily), "
        "split AS (SELECT i AS i_star, d AS split_day FROM ("
        "SELECT d, i, (CAST(n * p - i * t AS DOUBLE) * "
        "CAST(n * p - i * t AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * i * (n - i)) AS gain "
        "FROM pre CROSS JOIN tot WHERE i < n) z "
        "ORDER BY gain DESC, d LIMIT 1), "
        "sides AS (SELECT CASE WHEN i <= i_star THEN 'left' ELSE 'right' "
        "END AS side, i, xd, split_day FROM idx CROSS JOIN split), "
        "fits AS (SELECT side, split_day, CAST(count(*) AS BIGINT) AS m, "
        "CAST(SUM(i) AS BIGINT) AS sx, SUM(xd) AS sy, "
        "CAST(SUM(i * i) AS BIGINT) AS sxx, SUM(i * xd) AS sxy "
        "FROM sides GROUP BY 1, 2) "
        "SELECT split_day, side, m AS n_days, "
        "CASE WHEN m * sxx - sx * sx > 0 THEN "
        "round(CAST(m * sxy - sx * sy AS DOUBLE) "
        "/ CAST(m * sxx - sx * sx AS DOUBLE), 6) END AS slope, "
        "CASE WHEN m * sxx - sx * sx > 0 THEN "
        "round((CAST(sy AS DOUBLE) - (CAST(m * sxy - sx * sy AS DOUBLE) "
        "/ CAST(m * sxx - sx * sx AS DOUBLE)) * sx) / m, 6) END "
        "AS intercept "
        "FROM fits ORDER BY side"
    ),
    tags=("temporal", "timeseries", "changepoint", "regression"),
)
def changepoint_segmented_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise-linear (segmented) fit around the detected
    changepoint — binary segmentation's second half: re-fit OLS on
    each side of `changepoint_binary_seg_daily`'s argmax split, the
    step-plus-trend model a monitoring pipeline reports ("level
    shifted on day D; before: +a/day, after: +b/day").

    Exactness: x is the integer day index and y the exact-decimal
    daily sum, so every OLS moment (Σx, Σy, Σx², Σxy) is EXACT and
    the closed-form slope/intercept are single IEEE divisions of
    exactly-computed numerators — no float-order anywhere before the
    final division (the same discipline as `agg_regression_per_type`,
    composed with the changepoint argmax).

    Scale shape: corpus collapses to |days|; the argmax and both fits
    run on the bounded day domain; output is the 2-row model."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)")
        .alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("xd"))
    idx = daily.withColumn("i", F.row_number().over(Window.orderBy("d")))
    w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = idx.select("d", "i", F.sum("xd").over(w).alias("p"))
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("xd").alias("t")
    )
    num = (F.col("n") * F.col("p") - F.col("i") * F.col("t")).cast("double")
    gain = (num * num) / (
        F.col("n").cast("double") * F.col("i") * (F.col("n") - F.col("i"))
    )
    split = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            F.col("i").alias("i_star"),
            F.col("d").alias("split_day"),
            gain.alias("gain"),
        )
        .orderBy(F.col("gain").desc(), "split_day")
        .limit(1)
        .drop("gain")
    )
    sides = idx.crossJoin(F.broadcast(split)).select(
        F.when(F.col("i") <= F.col("i_star"), "left")
        .otherwise("right")
        .alias("side"),
        "i",
        "xd",
        "split_day",
    )
    fits = sides.groupBy("side", "split_day").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("i").cast("long").alias("sx"),
        F.sum("xd").alias("sy"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum(F.col("i") * F.col("xd")).alias("sxy"),
    )
    det = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / det.cast("double")
    return fits.select(
        "split_day",
        "side",
        F.col("m").alias("n_days"),
        F.when(det > 0, F.round(slope, 6)).alias("slope"),
        F.when(
            det > 0,
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx"))
                / F.col("m"),
                6,
            ),
        ).alias("intercept"),
    ).orderBy("side")


@register(
    "survival_km_by_type",
    oracle=(
        "WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS w_end "
        "FROM events), "
        "u AS (SELECT event_type, user_id, "
        "date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) "
        "AS t, "
        "CAST(max(CAST(ts AS DATE)) <= w_end - 7 AS INT) AS churned "
        "FROM events CROSS JOIN horizon GROUP BY 1, 2, w_end), "
        "cell AS (SELECT event_type, t, CAST(count(*) AS BIGINT) AS m, "
        "CAST(SUM(churned) AS BIGINT) AS d FROM u GROUP BY 1, 2), "
        "tot AS (SELECT event_type, SUM(m) AS n_users FROM cell "
        "GROUP BY 1), "
        "rk AS (SELECT cell.event_type, t, m, d, "
        "n_users - COALESCE(SUM(m) OVER (PARTITION BY cell.event_type "
        "ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS n FROM cell JOIN tot USING (event_type)), "
        "km AS (SELECT event_type, t, CAST(n AS BIGINT) AS n_at_risk, "
        "d AS n_churned, "
        "SUM(CASE WHEN d = n THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY event_type ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeros, "
        "SUM(CASE WHEN d < n THEN ln(1.0 - CAST(d AS DOUBLE) / n) "
        "ELSE 0.0 END) OVER (PARTITION BY event_type ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum "
        "FROM rk) "
        "SELECT event_type, CAST(t AS BIGINT) AS t_days, n_at_risk, "
        "n_churned, CASE WHEN zeros > 0 THEN 0.0 "
        "ELSE round(exp(lsum), 6) END AS survival "
        "FROM km ORDER BY event_type, t_days"
    ),
    tags=("temporal", "survival", "analytics", "grouped"),
)
def survival_km_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Kaplan-Meier: one survival curve PER event type
    (survival time = the span between a user's first and last event
    OF THAT TYPE, same censoring rule as the pooled entry) — the
    cohort-comparison form survival analysis is actually used in
    ("does the purchase cohort retain differently from the error
    cohort?"), and the log-rank test's input.

    The grouped form is the scale story: the KM window carries
    ``partitionBy(event_type)``, so a million strata mean a million
    SMALL day-domain windows sharing one shuffle — never a single
    global partition (the pooled entry's window is domain-bounded;
    this one is domain-bounded PER KEY and key-parallel).  Float
    discipline identical to the pooled twin."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    horizon = ev.agg(F.max(day).alias("w_end"))
    u = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("event_type", "user_id", "w_end")
        .agg(
            F.datediff(F.max(day), F.min(day)).alias("t"),
            (F.max(day) <= F.date_sub(F.col("w_end"), 7))
            .cast("int")
            .alias("churned"),
        )
        .select("event_type", "t", "churned")
    )
    cell = u.groupBy("event_type", "t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("churned").cast("long").alias("d"),
    )
    tot = cell.groupBy("event_type").agg(F.sum("m").alias("n_users"))
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rk = cell.join(F.broadcast(tot), "event_type").withColumn(
        "n",
        F.col("n_users") - F.coalesce(F.sum("m").over(w_prev), F.lit(0)),
    )
    km = rk.select(
        "event_type",
        "t",
        F.col("n").cast("long").alias("n_at_risk"),
        F.col("d").alias("n_churned"),
        F.sum(F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .over(w_cum)
        .alias("zeros"),
        F.sum(
            F.when(
                F.col("d") < F.col("n"),
                F.log(
                    F.lit(1.0) - F.col("d").cast("double") / F.col("n")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("lsum"),
    )
    return km.select(
        "event_type",
        F.col("t").cast("long").alias("t_days"),
        "n_at_risk",
        "n_churned",
        F.when(F.col("zeros") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("lsum")), 6))
        .alias("survival"),
    ).orderBy("event_type", "t_days")


@register(
    "survival_logrank_purchase_vs_error",
    oracle=(
        "WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS w_end "
        "FROM events), "
        "u AS (SELECT event_type AS grp, user_id, "
        "date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) "
        "AS t, "
        "CAST(max(CAST(ts AS DATE)) <= w_end - 7 AS INT) AS churned "
        "FROM events CROSS JOIN horizon "
        "WHERE event_type IN ('purchase', 'error') "
        "GROUP BY 1, 2, w_end), "
        "cell AS (SELECT grp, t, count(*) AS m, SUM(churned) AS d "
        "FROM u GROUP BY 1, 2), "
        "grid AS (SELECT g.grp, x.t, COALESCE(cell.m, 0) AS m, "
        "COALESCE(cell.d, 0) AS d "
        "FROM (SELECT DISTINCT t FROM cell) x "
        "CROSS JOIN (SELECT DISTINCT grp FROM cell) g "
        "LEFT JOIN cell ON cell.grp = g.grp AND cell.t = x.t), "
        "tot AS (SELECT grp, SUM(m) AS n_tot FROM grid GROUP BY 1), "
        "rk AS (SELECT grid.grp, t, m, d, "
        "n_tot - COALESCE(SUM(m) OVER (PARTITION BY grid.grp ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n "
        "FROM grid JOIN tot ON tot.grp = grid.grp), "
        "piv AS (SELECT t, "
        "SUM(CASE WHEN grp = 'purchase' THEN n ELSE 0 END) AS na, "
        "SUM(CASE WHEN grp = 'purchase' THEN d ELSE 0 END) AS da, "
        "SUM(CASE WHEN grp = 'error' THEN n ELSE 0 END) AS nb, "
        "SUM(CASE WHEN grp = 'error' THEN d ELSE 0 END) AS db "
        "FROM rk GROUP BY 1), "
        "terms AS (SELECT da, "
        "round((da + db) * CAST(na AS DOUBLE) / (na + nb), 9) AS e_a, "
        "round((da + db) * (CAST(na AS DOUBLE) / (na + nb)) "
        "* (CAST(nb AS DOUBLE) / (na + nb)) "
        "* (na + nb - (da + db)) / (na + nb - 1), 9) AS v "
        "FROM piv WHERE da + db > 0 AND na + nb > 1), "
        "agg AS (SELECT CAST(SUM(da) AS BIGINT) AS observed_a, "
        "CAST(SUM(CAST(e_a AS DECIMAL(28,9))) AS DOUBLE) AS expected_a, "
        "CAST(SUM(CAST(round(da - e_a, 9) AS DECIMAL(28,9))) AS DOUBLE) "
        "AS u_sum, "
        "CAST(SUM(CAST(v AS DECIMAL(28,9))) AS DOUBLE) AS v_sum "
        "FROM terms) "
        "SELECT observed_a, round(expected_a, 6) AS expected_a, "
        "CASE WHEN v_sum > 0 THEN round(u_sum * u_sum / v_sum, 6) END "
        "AS chi_sq, "
        "CASE WHEN v_sum > 0 THEN u_sum * u_sum / v_sum > 3.841 "
        "ELSE FALSE END AS significant_5pct "
        "FROM agg"
    ),
    tags=("temporal", "survival", "stats"),
)
def survival_logrank_purchase_vs_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The log-rank test (Mantel-Cox) between the purchase and error
    cohorts' survival curves — the hypothesis test that turns the
    stratified KM entry's two curves into a yes/no "do these cohorts
    retain differently": at every death time, compare group A's
    observed deaths to the hypergeometric expectation under H₀ (same
    hazard), accumulate U = Σ(O−E) and its variance, and report
    χ² = U²/ΣV against the 5% df-1 critical value.

    Exactness: risk sets and death counts are integers on the JOINT
    time grid (zero-filled full grid so each group's cumulative risk
    window is correct even at the other group's death times);
    per-time E and V terms are identical rational expressions rounded
    9 dp and summed as DECIMAL (order-free); the statistic is one
    division.  Scale: everything after the per-user aggregate lives
    on the |times|×2 grid."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    day = F.col("ts").cast("date")
    horizon = ev.agg(F.max(day).alias("w_end"))
    u = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy(F.col("event_type").alias("grp"), "user_id", "w_end")
        .agg(
            F.datediff(F.max(day), F.min(day)).alias("t"),
            (F.max(day) <= F.date_sub(F.col("w_end"), 7))
            .cast("int")
            .alias("churned"),
        )
    )
    # the |times|x2 cell table feeds THREE consumers (time grid, group
    # grid, the zero-fill join) and its lineage holds the corpus-sized
    # per-user aggregate — un-materialized, that chain re-ran per
    # consumer (r13 optimization round, guide §2.4)
    cell = u.groupBy("grp", "t").agg(
        F.count("*").alias("m"), F.sum("churned").alias("d")
    ).transform(materialize_lazy)
    times = cell.select("t").distinct()
    grps = cell.select("grp").distinct()
    grid = (
        times.crossJoin(grps)
        .join(cell, ["grp", "t"], "left")
        .select(
            "grp",
            "t",
            F.coalesce("m", F.lit(0)).alias("m"),
            F.coalesce("d", F.lit(0)).alias("d"),
        )
    )
    tot = grid.groupBy("grp").agg(F.sum("m").alias("n_tot"))
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = grid.join(F.broadcast(tot), "grp").withColumn(
        "n",
        F.col("n_tot") - F.coalesce(F.sum("m").over(w_prev), F.lit(0)),
    )
    piv = rk.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == "purchase", F.col("n")).otherwise(0))
        .alias("na"),
        F.sum(F.when(F.col("grp") == "purchase", F.col("d")).otherwise(0))
        .alias("da"),
        F.sum(F.when(F.col("grp") == "error", F.col("n")).otherwise(0))
        .alias("nb"),
        F.sum(F.when(F.col("grp") == "error", F.col("d")).otherwise(0))
        .alias("db"),
    )
    dtot = F.col("da") + F.col("db")
    ntot = F.col("na") + F.col("nb")
    e_a = F.round(dtot * F.col("na").cast("double") / ntot, 9)
    v = F.round(
        dtot
        * (F.col("na").cast("double") / ntot)
        * (F.col("nb").cast("double") / ntot)
        * (ntot - dtot)
        / (ntot - 1),
        9,
    )
    terms = piv.filter((dtot > 0) & (ntot > 1)).select(
        "da", e_a.alias("e_a"), v.alias("v")
    )
    agg = terms.agg(
        F.sum("da").cast("long").alias("observed_a"),
        F.sum(F.col("e_a").cast("decimal(28,9)"))
        .cast("double")
        .alias("expected_raw"),
        F.sum(
            F.round(F.col("da") - F.col("e_a"), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("u_sum"),
        F.sum(F.col("v").cast("decimal(28,9)"))
        .cast("double")
        .alias("v_sum"),
    )
    chi = F.col("u_sum") * F.col("u_sum") / F.col("v_sum")
    return agg.select(
        "observed_a",
        F.round(F.col("expected_raw"), 6).alias("expected_a"),
        F.when(F.col("v_sum") > 0, F.round(chi, 6)).alias("chi_sq"),
        F.when(F.col("v_sum") > 0, chi > 3.841)
        .otherwise(F.lit(False))
        .alias("significant_5pct"),
    )


@register(
    "survival_rmst_14d",
    oracle=(
        "WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS w_end "
        "FROM events), "
        "u AS (SELECT user_id, "
        "date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) "
        "AS t, "
        "CAST(max(CAST(ts AS DATE)) <= w_end - 7 AS INT) AS churned "
        "FROM events CROSS JOIN horizon GROUP BY user_id, w_end), "
        "cell AS (SELECT t, CAST(count(*) AS BIGINT) AS m, "
        "CAST(SUM(churned) AS BIGINT) AS d FROM u GROUP BY 1), "
        "tot AS (SELECT SUM(m) AS n_users FROM cell), "
        "rk AS (SELECT t, m, d, "
        "n_users - COALESCE(SUM(m) OVER (ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n "
        "FROM cell CROSS JOIN tot), "
        "km AS (SELECT t, "
        "SUM(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeros, "
        "SUM(CASE WHEN d < n THEN ln(1.0 - CAST(d AS DOUBLE) / n) "
        "ELSE 0.0 END) OVER (ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum "
        "FROM rk), "
        "steps AS (SELECT t, CASE WHEN zeros > 0 THEN 0.0 "
        "ELSE round(exp(lsum), 6) END AS s, "
        "least(COALESCE(lead(t) OVER (ORDER BY t), 14), 14) AS t_next "
        "FROM km WHERE t < 14), "
        "area AS (SELECT CAST(SUM(CAST(round(s * (t_next - t), 6) "
        "AS DECIMAL(18,6))) AS DOUBLE) AS tail_area FROM steps "
        "WHERE t_next > t) "
        "SELECT CAST(14 AS BIGINT) AS tau_days, "
        "round(least(14.0, 1.0 * "
        "(SELECT COALESCE(min(t), 14) FROM steps)) "
        "+ COALESCE(tail_area, 0.0), 6) AS rmst_days FROM area"
    ),
    tags=("temporal", "survival", "analytics"),
)
def survival_rmst_14d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at τ=14 days — the area under
    the KM curve up to τ, the one-number survival summary that stays
    valid under censoring where a plain mean of observed lifetimes
    does not ("average retained days in the first fortnight").
    Computed as the exact step integral: S=1 from 0 to the first
    event time, then Σ S(tᵢ)·(min(tᵢ₊₁,τ)−tᵢ) over KM steps below τ
    — per-step areas round 6 dp and sum as DECIMAL (order-free), on
    top of the pooled entry's exp/ln KM chain.

    Scale shape identical to the pooled KM: one corpus aggregate,
    then everything on the bounded day domain; output is a single
    summary row."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    horizon = ev.agg(F.max(day).alias("w_end"))
    u = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("user_id", "w_end")
        .agg(
            F.datediff(F.max(day), F.min(day)).alias("t"),
            (F.max(day) <= F.date_sub(F.col("w_end"), 7))
            .cast("int")
            .alias("churned"),
        )
        .select("t", "churned")
    )
    cell = u.groupBy("t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("churned").cast("long").alias("d"),
    )
    tot = cell.agg(F.sum("m").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = cell.crossJoin(F.broadcast(tot)).withColumn(
        "n",
        F.col("n_users") - F.coalesce(F.sum("m").over(w_prev), F.lit(0)),
    )
    km = rk.select(
        "t",
        F.sum(F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .over(w_cum)
        .alias("zeros"),
        F.sum(
            F.when(
                F.col("d") < F.col("n"),
                F.log(
                    F.lit(1.0) - F.col("d").cast("double") / F.col("n")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("lsum"),
    )
    w_t = Window.orderBy("t")
    steps = km.filter(F.col("t") < 14).select(
        "t",
        F.when(F.col("zeros") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("lsum")), 6))
        .alias("s"),
        F.least(
            F.coalesce(F.lead("t").over(w_t), F.lit(14)), F.lit(14)
        ).alias("t_next"),
    )
    area = steps.filter(F.col("t_next") > F.col("t")).agg(
        F.sum(
            F.round(
                F.col("s") * (F.col("t_next") - F.col("t")), 6
            ).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("tail_area")
    )
    first_t = steps.agg(
        F.coalesce(F.min("t"), F.lit(14)).alias("first_t")
    )
    return (
        area.crossJoin(F.broadcast(first_t))
        .select(
            F.lit(14).cast("long").alias("tau_days"),
            F.round(
                F.least(F.lit(14.0), F.lit(1.0) * F.col("first_t"))
                + F.coalesce(F.col("tail_area"), F.lit(0.0)),
                6,
            ).alias("rmst_days"),
        )
    )


_MASE_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(floor({epoch} / 86400000000) AS BIGINT) AS d,
         SUM(CAST(value AS DECIMAL(18,2))) AS xd
  FROM {table} GROUP BY 1),
idx AS (SELECT d, CAST(xd AS DOUBLE) AS x,
        row_number() OVER (ORDER BY d) AS i FROM daily),
nt AS (SELECT CAST(count(*) - 6 AS BIGINT) AS n_train FROM idx),
train AS (SELECT idx.* FROM idx, nt WHERE idx.i <= nt.n_train),
h(i, d, x, l, b) AS (
  SELECT i, d, x, x, CAST(0.0 AS DOUBLE) FROM train WHERE i = 1
  UNION ALL
  SELECT train.i, train.d, train.x,
         (train.x + (h.l + h.b)) / 2,
         (((train.x + (h.l + h.b)) / 2 - h.l) + h.b) / 2
  FROM train JOIN h ON train.i = h.i + 1
),
last_state AS (SELECT h.l, h.b FROM h, nt WHERE h.i = nt.n_train),
fc AS (SELECT idx.i, idx.x,
       last_state.l + (idx.i - nt.n_train) * last_state.b AS f
       FROM idx, last_state, nt WHERE idx.i > nt.n_train),
num AS (SELECT CAST(count(*) AS BIGINT) AS h_steps,
        CAST(SUM(CAST(round(ABS(x - f), 6) AS DECIMAL(18,6)))
             AS DOUBLE) AS sae_fc FROM fc),
den AS (SELECT CAST(count(*) AS BIGINT) AS n_naive,
        CAST(SUM(CAST(round(ABS(a.x - b.x), 6) AS DECIMAL(18,6)))
             AS DOUBLE) AS sae_naive
        FROM idx a JOIN idx b ON a.i = b.i + 7, nt
        WHERE a.i <= nt.n_train)
SELECT nt.n_train, num.h_steps,
       num.sae_fc / num.h_steps AS mae_forecast,
       den.sae_naive / den.n_naive AS mae_seasonal_naive,
       (num.sae_fc / num.h_steps) / (den.sae_naive / den.n_naive)
         AS mase
FROM nt, num, den
"""

# Spark side: one array pipeline (see _EWMA_FOLD_SQL note). The Holt
# train fold keeps only the final (l, b) state; holdout forecasts are
# zip_with over the last 6 elements; the seasonal-naive denominator is
# zip_with of the train array against its lag-7 shift. Per-term
# absolute errors round to 6 dp and fold into a DECIMAL(38,6)
# accumulator — exact micro-unit integers, matching the oracle's
# DECIMAL sum bit-for-bit after the final double cast.
_MASE_FOLD_SQL = """
WITH daily AS (
  SELECT CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT) AS d,
         SUM(CAST(value AS DECIMAL(18,2))) AS xd
  FROM {table} GROUP BY 1),
arr AS (
  SELECT transform(
           array_sort(collect_list(struct(d, CAST(xd AS DOUBLE) AS x))),
           e -> e.x) AS xs
  FROM daily),
dims AS (SELECT xs, CAST(size(xs) - 6 AS BIGINT) AS n_train FROM arr),
st AS (
  SELECT xs, n_train,
         aggregate(
           slice(xs, 1, CAST(n_train AS INT)),
           struct(CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
                  false AS started),
           (acc, x) -> IF(NOT acc.started,
               struct(x AS l, CAST(0.0 AS DOUBLE) AS b, true AS started),
               struct((x + (acc.l + acc.b)) / 2 AS l,
                      (((x + (acc.l + acc.b)) / 2 - acc.l) + acc.b) / 2
                        AS b,
                      true AS started))) AS hs
  FROM dims),
scored AS (
  SELECT n_train,
         CAST(size(xs) - n_train AS BIGINT) AS h_steps,
         aggregate(
           zip_with(slice(xs, CAST(n_train AS INT) + 1, 6),
                    sequence(1, 6),
                    (x, k) -> round(abs(x - (hs.l + k * hs.b)), 6)),
           CAST(0 AS DECIMAL(38,6)),
           (acc, e) -> acc + CAST(e AS DECIMAL(18,6))) AS sae_fc_dec,
         CAST(n_train - 7 AS BIGINT) AS n_naive,
         aggregate(
           zip_with(slice(xs, 8, CAST(n_train AS INT) - 7),
                    slice(xs, 1, CAST(n_train AS INT) - 7),
                    (a, b) -> round(abs(a - b), 6)),
           CAST(0 AS DECIMAL(38,6)),
           (acc, e) -> acc + CAST(e AS DECIMAL(18,6))) AS sae_naive_dec
  FROM st)
SELECT n_train, h_steps,
       CAST(sae_fc_dec AS DOUBLE) / h_steps AS mae_forecast,
       CAST(sae_naive_dec AS DOUBLE) / n_naive AS mae_seasonal_naive,
       (CAST(sae_fc_dec AS DOUBLE) / h_steps)
         / (CAST(sae_naive_dec AS DOUBLE) / n_naive) AS mase
FROM scored
"""


@register(
    "forecast_mase_holdout",
    oracle=_MASE_SQL.format(epoch="epoch_us(ts)", table="events"),
    tags=("temporal", "timeseries", "recursive", "forecast", "eval"),
)
def forecast_mase_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the Holt forecaster on a 6-day holdout — the accuracy
    gate the forecasting family lacked: every forecast entry emits
    predictions, none scored them. Train = all but the last 6 days;
    the Holt recursion (same α=β=1/2 exact-halving chain as
    `forecast_holt_linear_daily`) runs on train only, h-step-ahead
    forecasts l + k·b score the holdout, and the scale-free
    denominator is the in-sample SEASONAL-NAIVE (lag-7) MAE —
    Hyndman & Koehler's MASE, the metric that survives zero-valued
    and multi-scale series where MAPE breaks. MASE < 1 means the
    forecaster beats naive seasonality out of sample.

    Exactness: daily sums are exact DECIMAL→double, the recursion is
    exact halvings, per-term absolute errors round to 6 dp and sum as
    DECIMAL (order-free — the 6/18-term double sums would otherwise
    be partial-aggregation-order sensitive), and the three emitted
    ratios are pure IEEE divisions. The oracle keeps the WITH
    RECURSIVE statement; the Spark side runs the identical chain as
    one array pipeline (``_MASE_FOLD_SQL``, the EWMA/CUSUM/Holt
    convention).

    Scale: corpus collapses in the daily aggregate; the fold and both
    scoring zips run on one |days|-element array on one task."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__mase_events")
    return spark.sql(_MASE_FOLD_SQL.format(table="__mase_events"))
