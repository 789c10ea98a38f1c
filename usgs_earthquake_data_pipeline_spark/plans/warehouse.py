"""Warehouse table-maintenance entries: MERGE upsert and CDC
snapshot diff.

The reference maintains its silver tables by full overwrite
(/root/reference/usgs_tsunami_count_fact_silver.py:57-72); the
Delta-native form of that maintenance is ``MERGE INTO`` (upsert a
change batch) and the change-data-feed diff. Both are implemented as
pure DataFrame algebra in ``operators/merge.py`` and exercised here
under the DuckDB oracle gate. Same alignment rules as catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.matview import merge_aggregate_state
from ..operators.merge import diff_snapshots, merge_upsert
from ..sources.tables import load_table
from .catalog import register


@register(
    "merge_upsert_customer_balance",
    oracle=(
        "WITH src AS ("
        "  SELECT o_custkey AS k, "
        "         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal, "
        "         'updated' AS status "
        "  FROM orders GROUP BY 1 "
        "  UNION ALL "
        "  SELECT s_suppkey + 10000000, 0.0, 'inserted' FROM supplier"
        ") "
        "SELECT k, bal, status FROM src "
        "UNION ALL "
        "SELECT c_custkey AS k, c_acctbal AS bal, 'existing' AS status "
        "FROM customer WHERE c_custkey NOT IN (SELECT k FROM src) "
        "ORDER BY k"
    ),
    tags=("warehouse", "merge"),
)
def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO: a CDC batch (per-customer lifetime
    spend, plus brand-new accounts) upserted into the customer
    snapshot. Matched customers get the new balance, unmatched
    survive, new keys insert. The change batch is broadcast — the
    target table never shuffles, which is what makes this merge
    survive a 100 TB target."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")

    target = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.lit("existing").alias("status"),
    )
    updates = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("bal")
    ).withColumn("status", F.lit("updated"))
    inserts = supp.select(
        (F.col("s_suppkey") + F.lit(10000000)).alias("k"),
        F.lit(0.0).alias("bal"),
        F.lit("inserted").alias("status"),
    )
    source = updates.unionByName(inserts)
    merged = merge_upsert(target, source, keys=["k"], broadcast_source=True)
    # Deterministic row order: the driver compare is the contract, and
    # an ORDER BY on the (unique) key keeps the hash row-order-proof.
    return merged.orderBy("k")


@register(
    "cdc_diff_user_value",
    oracle=(
        "WITH old AS ("
        "  SELECT user_id, "
        "         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val "
        "  FROM events WHERE day(ts) BETWEEN 1 AND 15 GROUP BY 1"
        "), new AS ("
        "  SELECT user_id, "
        "         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val "
        "  FROM events WHERE day(ts) BETWEEN 8 AND 22 GROUP BY 1"
        ") "
        "SELECT COALESCE(old.user_id, new.user_id) AS user_id, "
        "       CASE WHEN old.user_id IS NULL THEN 'insert' "
        "            WHEN new.user_id IS NULL THEN 'delete' "
        "            ELSE 'update' END AS change_type, "
        "       old.val AS old_val, new.val AS new_val "
        "FROM old FULL OUTER JOIN new ON old.user_id = new.user_id "
        "WHERE old.user_id IS NULL OR new.user_id IS NULL "
        "   OR old.val IS DISTINCT FROM new.val "
        "ORDER BY user_id"
    ),
    tags=("warehouse", "cdc"),
)
def cdc_diff_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two snapshots of a per-user rollup
    (overlapping time slices, so all three change types occur).
    One co-partitioned full-outer join; classification is codegen."""
    ev = load_table(spark, sf_dir, "events")

    def snap(lo: int, hi: int) -> DataFrame:
        return (
            ev.filter(F.dayofmonth("ts").between(lo, hi))
            .groupBy("user_id")
            .agg(
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("val")
            )
        )

    return diff_snapshots(snap(1, 15), snap(8, 22), keys=["user_id"]).orderBy(
        "user_id"
    )


@register(
    "merge_upsert_last_wins",
    oracle=(
        "WITH src AS ("
        "  SELECT o_custkey AS k, "
        "         CAST(o_totalprice AS DOUBLE) AS bal, "
        "         'order' AS status, "
        "         row_number() OVER (PARTITION BY o_custkey "
        "           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn "
        "  FROM orders), "
        "s1 AS (SELECT k, bal, status FROM src WHERE rn = 1) "
        "SELECT k, bal, status FROM s1 "
        "UNION ALL "
        "SELECT c_custkey AS k, c_acctbal AS bal, 'existing' AS status "
        "FROM customer WHERE c_custkey NOT IN (SELECT k FROM s1) "
        "ORDER BY k"
    ),
    tags=("warehouse", "merge"),
)
def merge_upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with an AMBIGUOUS source batch under the deterministic
    last-wins contract: the raw orders feed carries many rows per
    customer (a CDC stream that was never compacted); the winner is
    the latest order by (o_orderdate, o_orderkey) — ordering columns
    the TARGET schema doesn't even carry, which is why the dedup runs
    before the target-column projection. The plain policy would raise
    here like Delta MERGE does; the oracle re-derives the same winner
    with a row_number window. Same broadcast-anti scale shape as the
    unique-source merge entry: the target never shuffles."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    target = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.lit("existing").alias("status"),
    )
    source = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("bal"),
        F.lit("order").alias("status"),
        "o_orderdate",
        "o_orderkey",
    )
    merged = merge_upsert(
        target,
        source,
        keys=["k"],
        broadcast_source=True,
        duplicate_policy="last_wins",
        last_wins_order=["o_orderdate", "o_orderkey"],
    )
    return merged.orderBy("k")


@register(
    "mv_incremental_daily_rollup",
    oracle=(
        "SELECT CAST(day(ts) AS INT) AS day, event_type, "
        "       CAST(COUNT(*) AS BIGINT) AS cnt, "
        "       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value, "
        "       MIN(value) AS min_value, MAX(value) AS max_value "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("warehouse", "matview", "agg"),
)
def mv_incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily rollup is
    built as partial aggregates over days 1-20, then days 21+ arrive
    as a delta batch and are folded in with the algebraic merge
    (sum-of-sums / sum-of-counts / min-of-mins / max-of-maxes). The
    oracle aggregates the WHOLE table directly — hash equality proves
    incremental maintenance == full recompute, the invariant that
    lets a 100 TB view update by scanning only the new partition.
    Decimal-accumulated sums make the proof exact: decimal addition is
    associative, so any batch split yields identical results."""
    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.dayofmonth("ts").alias("day"),
            F.col("event_type"),
        ).agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    view = partial(ev.filter(F.dayofmonth("ts") <= 20))
    delta = partial(ev.filter(F.dayofmonth("ts") > 20))
    merged = merge_aggregate_state(
        view,
        delta,
        keys=["day", "event_type"],
        merges={
            "cnt": "count",
            "sum_value": "sum",
            "min_value": "min",
            "max_value": "max",
        },
    )
    return merged.select(
        "day",
        "event_type",
        "cnt",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("day", "event_type")


@register(
    "mv_join_incremental",
    oracle=(
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS sum_price "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("warehouse", "matview", "join"),
)
def mv_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (the join counterpart
    of mv_incremental_daily_rollup, via the differential-dataflow
    bilinearity identity Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB): the
    orders⋈lineitem view is built from the old slices, then
    INDEPENDENT delta batches arrive on both sides — new orders
    (o_orderkey % 11 == 5) and late lineitems (l_linenumber >= 4,
    cutting across order boundaries so every delta term is
    non-trivial, including the ΔA⋈ΔB cross term — and crucially the
    splits don't align, so rows survive only through the CORRECT
    term). The maintained view aggregates to per-status counts and
    decimal-exact revenue; the oracle joins and aggregates the whole
    tables directly — hash equality proves incremental == full
    recompute. At 100 TB the stored sides are bucketed on the join
    key, so each old-side term touches only the delta's buckets; the
    view itself is never re-joined, only unioned."""
    from ..operators.matview import merge_join_state

    a = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    b = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice", "l_linenumber"
    )
    a_new = F.col("k") % 11 == 5
    b_new = F.col("l_linenumber") >= 4
    a_old, delta_a = a.filter(~a_new), a.filter(a_new)
    b_old, delta_b = b.filter(~b_new), b.filter(b_new)

    view_old = a_old.join(b_old, "k").select(
        "k", "o_orderstatus", "l_extendedprice"
    )
    maintained = merge_join_state(
        view_old,
        a_old,
        delta_a,
        b_old,
        delta_b,
        on="k",
        broadcast_deltas=False,
    )
    return (
        maintained.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def _zorder_oracle_sql() -> str:
    """DuckDB twin of operators.zorder.z_value over events
    (user_id, value), built from the same quantization constants so
    both engines interleave identical cell indices. The float work is
    one identical-order expression per dimension; the interleave is
    pure integer bit algebra, expanded to the same 16 terms."""
    cells = (1 << 16) - 1
    qa = (
        "least(greatest(CAST(round((CAST(user_id AS DOUBLE) - 0.0) "
        f"/ 150.0 * {cells}.0, 0) AS BIGINT), 0), {cells})"
    )
    qb = (
        "least(greatest(CAST(round((CAST(value AS DOUBLE) - 0.0) "
        f"/ 500.0 * {cells}.0, 0) AS BIGINT), 0), {cells})"
    )
    terms = []
    for i in range(16):
        terms.append(f"(((a >> {i}) & 1) << {2 * i})")
        terms.append(f"(((b >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    return (
        f"WITH q AS (SELECT event_id, {qa} AS a, {qb} AS b FROM events) "
        f"SELECT event_id, CAST({z} AS BIGINT) AS z FROM q "
        "ORDER BY z, event_id LIMIT 100"
    )


@register(
    "zorder_curve_events",
    oracle=_zorder_oracle_sql(),
    tags=("warehouse", "clustering"),
)
def zorder_curve_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-curve values over (user_id, value) — the clustering
    key ``operators.zorder.z_order_sort`` lays files out by so 2-D
    predicates prune on min/max file stats (the reference's 'z order'
    TODO, done properly; see operators/zorder.py). The entry gates the
    quantize + bit-interleave algebra against a pure-SQL twin: first
    100 events along the curve, event_id tiebreak. Pure codegen
    expressions — the only exchange is the TakeOrdered."""
    from ..operators.zorder import z_value

    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_id",
            z_value(
                F.col("user_id"), F.col("value"), (0.0, 150.0), (0.0, 500.0)
            ).alias("z"),
        )
        .orderBy("z", "event_id")
        .limit(100)
    )
