"""Relational-breadth catalog entries: set operations, grouping sets,
HAVING, subqueries, outer joins, conditional aggregation / pivot,
string and date functions, exact percentiles.

The reference has none of these (SURVEY.md §2.4/2.6/2.8) — they're
what makes this a complete analytics engine rather than a port of the
reference's five aggregate shapes. Same alignment rules as
catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


@register(
    "setop_union_counts",
    oracle=(
        "SELECT user_id, count(*) AS n FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "UNION ALL SELECT user_id FROM events WHERE event_type = 'purchase'"
        ") t GROUP BY 1 ORDER BY 1"
    ),
    tags=("setop",),
)
def setop_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered streams, re-aggregated."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        clicks.unionByName(buys).groupBy("user_id").agg(F.count("*").alias("n"))
        .orderBy("user_id")
    )


@register(
    "setop_intersect_users",
    oracle=(
        "SELECT user_id FROM events WHERE event_type = 'error' AND value > 450 "
        "INTERSECT "
        "SELECT user_id FROM events WHERE event_type = 'signup' AND value > 450"
    ),
    tags=("setop",),
)
def setop_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two filtered user sets."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "error") & (F.col("value") > 450)).select(
        "user_id"
    )
    b = ev.filter((F.col("event_type") == "signup") & (F.col("value") > 450)).select(
        "user_id"
    )
    return a.intersect(b)


@register(
    "agg_cube_type_day",
    oracle=(
        "SELECT event_type, CAST(day(ts) AS INT) AS day, count(*) AS cnt "
        "FROM events WHERE day(ts) <= 3 "
        "GROUP BY CUBE(event_type, CAST(day(ts) AS INT)) "
        "ORDER BY event_type NULLS FIRST, day NULLS FIRST"
    ),
    tags=("agg", "cube"),
)
def agg_cube_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over two dimensions."""
    ev = load_table(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 3)
    return (
        ev.cube(F.col("event_type"), F.dayofmonth("ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first()
        )
    )


@register(
    "agg_having_hot_users",
    oracle=(
        "SELECT user_id, count(*) AS n_events FROM events "
        "GROUP BY 1 HAVING count(*) > 70 ORDER BY 1"
    ),
    tags=("agg", "having"),
)
def agg_having_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: post-aggregation filter."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > 70)
        .orderBy("user_id")
    )


@register(
    "subquery_scalar_acctbal",
    oracle=(
        "SELECT c_custkey, c_acctbal FROM customer "
        "WHERE c_acctbal > (SELECT max(c_acctbal) FROM customer) - 1000 "
        "ORDER BY c_custkey"
    ),
    tags=("subquery",),
)
def subquery_scalar_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers within 1000 of the max balance
    (max is exact on stored doubles — no FP-order risk)."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("__cust_scalar")
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM __cust_scalar "
        "WHERE c_acctbal > (SELECT max(c_acctbal) FROM __cust_scalar) - 1000 "
        "ORDER BY c_custkey"
    )


@register(
    "subquery_exists_orders",
    oracle=(
        "SELECT o_orderstatus, count(*) AS n FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_quantity >= 49) GROUP BY 1 ORDER BY 1"
    ),
    tags=("subquery", "semi"),
)
def subquery_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (compiles to a left-semi join): orders having
    a near-max-quantity line item, counted by status."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus")
    )


@register(
    "join_full_outer_nation_profile",
    oracle=(
        "SELECT n_name, coalesce(s.n_supp, 0) AS n_supp, "
        "coalesce(c.n_cust, 0) AS n_cust "
        "FROM nation "
        "LEFT JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier "
        "GROUP BY 1) s ON s_nationkey = n_nationkey "
        "LEFT JOIN (SELECT c_nationkey, count(*) AS n_cust FROM customer "
        "GROUP BY 1) c ON c_nationkey = n_nationkey "
        "ORDER BY n_name"
    ),
    tags=("join", "outer"),
)
def join_full_outer_nation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer joins with null-coalescing: per-nation supplier and
    customer counts including empty nations."""
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    return (
        nation.join(F.broadcast(supp), nation.n_nationkey == supp.s_nationkey, "left")
        .join(F.broadcast(cust), nation.n_nationkey == cust.c_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        )
        .orderBy("n_name")
    )


@register(
    "pivot_event_counts",
    oracle=(
        "SELECT user_id, "
        "count(*) FILTER (WHERE event_type = 'click') AS click, "
        "count(*) FILTER (WHERE event_type = 'error') AS error, "
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase "
        "FROM events WHERE user_id < 20 GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "pivot"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT / conditional aggregation: per-user counts of selected
    event types as columns."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "error", "purchase"])
        .orderBy("user_id")
    )


@register(
    "string_funcs_customers",
    oracle=(
        "SELECT c_custkey, upper(c_name) AS uname, "
        "substr(c_name, 1, 9) AS prefix, length(c_name) AS name_len, "
        "concat(c_mktsegment, ':', c_name) AS tagged "
        "FROM customer WHERE c_name LIKE '%7' ORDER BY c_custkey"
    ),
    tags=("scalar", "string"),
)
def string_funcs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions + LIKE predicate."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").like("%7"))
        .select(
            "c_custkey",
            F.upper("c_name").alias("uname"),
            F.substring("c_name", 1, 9).alias("prefix"),
            F.length("c_name").cast("long").alias("name_len"),
            F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        )
        .orderBy("c_custkey")
    )


@register(
    "date_funcs_orders",
    oracle=(
        "SELECT CAST(year(o_orderdate) AS INT) AS yr, "
        "CAST(quarter(o_orderdate) AS INT) AS qtr, count(*) AS n, "
        "CAST(min(strftime(o_orderdate, '%Y-%m-%d')) AS VARCHAR) AS first_day "
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("scalar", "date"),
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction and formatting grouped by year/quarter."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
        )
        .orderBy("yr", "qtr")
    )


@register(
    "salted_aggregate_by_type",
    oracle=(
        "SELECT event_type, count(*) AS n, min(value) AS min_value, "
        "max(value) AS max_value FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "skew"),
)
def salted_aggregate_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a (deliberately low-
    cardinality, i.e. maximally skewed) key — must produce exactly the
    same result as the plain group-by oracle."""
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": ("count", "event_id"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        salt_col="event_id",
    ).orderBy("event_type")


@register(
    "percentile_quantity",
    oracle=(
        "SELECT l_returnflag, "
        "round(quantile_cont(l_quantity, 0.5), 6) AS p50, "
        "round(quantile_cont(l_quantity, 0.9), 6) AS p90 "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "percentile"),
)
def percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_grouping_sets",
    oracle=(
        "SELECT event_type, yr, count(*) AS cnt FROM "
        "(SELECT event_type, CAST(year(ts) AS INT) AS yr FROM events) t "
        "GROUP BY GROUPING SETS ((event_type), (yr), ()) "
        "ORDER BY event_type NULLS FIRST, yr NULLS FIRST"
    ),
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither a cube nor a rollup: per-type,
    per-year, and grand-total — no (type, year) cell). The DataFrame
    API exposes only cube/rollup, so this is the catalog's spark.sql
    form; Catalyst expands it to the same Expand+Aggregate the cube
    entries compile to."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__gs_events")
    return spark.sql(
        "SELECT event_type, yr, count(*) AS cnt FROM "
        "(SELECT event_type, year(ts) AS yr FROM __gs_events) t "
        "GROUP BY GROUPING SETS ((event_type), (yr), ()) "
        "ORDER BY event_type ASC NULLS FIRST, yr ASC NULLS FIRST"
    )


@register(
    "agg_regression_per_type",
    oracle=(
        "SELECT event_type, "
        "round(regr_slope(value, epoch_us(ts) / 86400000000.0), 6) AS slope, "
        "round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 6) "
        "AS intercept, "
        "round(corr(value, epoch_us(ts) / 86400000000.0), 6) AS r "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "regression"),
)
def agg_regression_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates per event type: value trend over
    time (x = fractional days since epoch). regr_slope/intercept/corr
    are single-pass mergeable moment aggregates — partial moments
    combine map-side exactly like SUM, so the shuffle is one small
    state per group at any scale. Rounded to 6 decimals both sides
    (moment accumulation order is engine-specific)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros("ts") / 86400000000.0
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
            F.round(F.regr_intercept(F.col("value"), x), 6).alias("intercept"),
            F.round(F.corr(F.col("value"), x), 6).alias("r"),
        )
        .orderBy("event_type")
    )


@register(
    "pandas_grouped_mad",
    oracle=(
        "SELECT event_type, "
        "round(median(abs(value - m)), 6) AS mad, CAST(count(*) AS BIGINT) AS n "
        "FROM (SELECT event_type, value, "
        "median(value) OVER (PARTITION BY event_type) AS m FROM events) t "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "pandas", "udf"),
)
def pandas_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas) under the oracle gate:
    per-type median absolute deviation — an order-statistic no
    single-pass built-in computes. One shuffle on the group key, then
    each group is a pandas frame on an executor (Arrow both ways).
    Medians are order statistics, not accumulations, so the values
    compare exactly; rounded 6dp only for the avg-of-two-middles
    case."""
    import pandas as pd

    from ..sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["value"].median()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "mad": [round(float((pdf["value"] - med).abs().median()), 6)],
                "n": [len(pdf)],
            }
        )

    return (
        ev.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(mad, "event_type string, mad double, n bigint")
        .orderBy("event_type")
    )


@register(
    "window_analytics_suite",
    oracle=(
        "SELECT event_id, event_type, "
        "CAST(ntile(4) OVER w AS INT) AS quartile, "
        "round(percent_rank() OVER w, 6) AS pct_rank, "
        "round(cume_dist() OVER w, 6) AS cume, "
        "first_value(event_id) OVER w AS cheapest_id, "
        "last_value(event_id) OVER "
        "(PARTITION BY event_type ORDER BY value, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS priciest_id "
        "FROM events WHERE user_id < 20 "
        "WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id) "
        "ORDER BY event_type, pct_rank, event_id"
    ),
    tags=("window", "analytic"),
)
def window_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function breadth in one pass: ntile quartiles,
    percent_rank, cume_dist, first/last_value (with the explicit
    unbounded frame last_value needs). All five share one window
    ordering — a single shuffle on the partition key serves every
    function. Rank ratios are exact (n-1 denominators), rounded 6dp
    only to normalize the trailing digits of the division."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "event_id",
            "event_type",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.first("event_id").over(w).alias("cheapest_id"),
            F.last("event_id").over(w_full).alias("priciest_id"),
        )
        .orderBy("event_type", "pct_rank", "event_id")
    )


@register(
    "join_salted_skew",
    oracle=(
        "SELECT e.event_type, count(*) AS n_events, "
        "CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events e JOIN ("
        "SELECT DISTINCT event_type FROM events WHERE event_type <> 'error'"
        ") d ON e.event_type = d.event_type GROUP BY 1 ORDER BY 1"
    ),
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join on a maximally skewed key (5 distinct
    event types over the whole fact table — the worst-case key
    distribution): the big side is salted, the dim side replicated
    per salt, so each hot key spreads across ``n_salts`` tasks instead
    of landing on one straggler. Must equal the plain-join oracle
    bit-for-bit. This is the manual fallback for skew AQE can't fix
    (e.g. when the dim is too large to broadcast); result-equality
    with broadcast off is separately proven in tests/test_plans.py."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.filter(F.col("event_type") != "error")
        .select("event_type")
        .distinct()
    )
    joined = salted_join(ev, dim, "event_type", n_salts=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "skew_hot_key_rollup",
    oracle=(
        "WITH f AS ("
        "  SELECT l_orderkey, "
        "    CASE WHEN l_partkey % 10 < 5 THEN 0 "
        "         ELSE l_partkey % 1000 END AS hk, "
        "    CAST(l_extendedprice AS DECIMAL(18,2)) AS price "
        "  FROM lineitem), "
        "d AS (SELECT DISTINCT hk, hk % 7 AS tier FROM f) "
        "SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "  CAST(SUM(price) AS DOUBLE) AS sum_price, "
        "  CAST(MIN(hk) AS BIGINT) AS min_hk, "
        "  CAST(MAX(hk) AS BIGINT) AS max_hk "
        "FROM f JOIN d USING (hk) GROUP BY 1 ORDER BY 1"
    ),
    headline=True,
    tags=("join", "agg", "skew"),
)
def skew_hot_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew stress headliner: a join + rollup where HALF the fact
    table shares ONE key — the distribution that turns a naive
    hash-shuffle plan into a single-straggler stage at 100 TB. The
    hot key is synthesized from lineitem (l_partkey % 10 < 5 → key 0,
    ~50% of rows; the rest spread over ~500 keys), the dim side is
    the distinct-key tier table, and the rollup groups by tier —
    which inherits the skew (tier 0 holds the hot key).

    Both explicit mitigation operators run against it end-to-end:
    `salted_join` fans key 0's rows over 16 salted partitions
    (dim replicated per salt — the skew join for when the dim can't
    broadcast), and `salted_aggregate` two-phases the rollup so the
    hot tier combines 16 partial rows instead of streaming half the
    table through one reducer. Result must equal the plain-join
    oracle exactly — salting is pure plumbing, decimal sums keep the
    arithmetic engine-exact. Bench-timed every round; the EXPLAIN
    audit pins the salted exchange shape."""
    from ..operators.skew import salted_aggregate, salted_join

    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        "l_orderkey",
        F.when(F.col("l_partkey") % 10 < 5, F.lit(0).cast("bigint"))
        .otherwise(F.col("l_partkey") % 1000)
        .alias("hk"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    dim = (
        fact.select("hk")
        .distinct()
        .withColumn("tier", F.col("hk") % 7)
    )
    joined = salted_join(fact, dim, "hk", n_salts=16)
    return (
        salted_aggregate(
            joined,
            ["tier"],
            {
                "n_rows": ("count", "hk"),
                "sum_price": ("sum", "price"),
                "min_hk": ("min", "hk"),
                "max_hk": ("max", "hk"),
            },
            salt_col="l_orderkey",
        )
        .select(
            "tier",
            "n_rows",
            F.col("sum_price").cast("double").alias("sum_price"),
            "min_hk",
            "max_hk",
        )
        .orderBy("tier")
    )


@register(
    "winsorize_value_stats",
    oracle=(
        "WITH b AS ("
        "  SELECT event_type, quantile_cont(value, 0.05) AS lo, "
        "    quantile_cont(value, 0.95) AS hi "
        "  FROM events GROUP BY 1) "
        "SELECT e.event_type, count(*) AS n, "
        "  CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)"
        "    AS BIGINT) AS n_clipped, "
        "  CAST(SUM(CAST(round(greatest(lo, least(hi, value)), 6)"
        "    AS DECIMAL(18,6))) AS DOUBLE) AS sum_winsorized "
        "FROM events e JOIN b USING (event_type) "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "percentile", "robust"),
)
def winsorize_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clipped) per-group stats — the robust-mean
    building block outlier-heavy metrics pipelines use.

    Two passes over the group key: exact interpolated percentiles per
    group (|groups| rows), broadcast back, then clip-and-aggregate in
    one codegen pass. Clipped values round to 6 dp then sum as
    decimals so the total is order-independent and engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = F.round(
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value"))), 6
    )
    outlier = F.when(
        (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
    ).otherwise(0)
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(outlier).alias("n_clipped"),
            F.sum(clipped.cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_winsorized"),
        )
        .orderBy("event_type")
    )


@register(
    "audit_referential_integrity",
    oracle=(
        "SELECT 'customer_orphan_nation' AS check_name, count(*) AS n_orphans "
        "FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE n.n_nationkey IS NULL "
        "UNION ALL "
        "SELECT 'lineitem_orphan_order', count(*) "
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderkey IS NULL "
        "UNION ALL "
        "SELECT 'order_orphan_customer', count(*) "
        "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey IS NULL "
        "ORDER BY 1"
    ),
    tags=("audit", "join"),
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the data-
    quality gate a pipeline runs before publishing a snapshot. Each
    check is a LEFT ANTI join that counts rows whose parent key is
    missing; the dimension side broadcasts (or AQE flips it to shuffle
    at scale) and each fact table crosses the wire at most once, as
    bare keys."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")

    def orphans(name, child, child_key, parent, parent_key):
        missing = child.select(F.col(child_key).alias("k")).join(
            parent.select(F.col(parent_key).alias("k")), "k", "left_anti"
        )
        return missing.agg(
            F.lit(name).alias("check_name"), F.count("*").alias("n_orphans")
        )

    return (
        orphans("customer_orphan_nation", cust, "c_nationkey", nat, "n_nationkey")
        .unionByName(
            orphans("lineitem_orphan_order", li, "l_orderkey", orders, "o_orderkey")
        )
        .unionByName(
            orphans("order_orphan_customer", orders, "o_custkey", cust, "c_custkey")
        )
        .orderBy("check_name")
    )


@register(
    "funnel_view_click_purchase",
    oracle=(
        "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY 1), "
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1), "
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1) "
        "SELECT step, n_users FROM ("
        "SELECT '1_view' AS step, count(*) AS n_users FROM v "
        "UNION ALL SELECT '2_click', count(*) FROM c "
        "UNION ALL SELECT '3_purchase', count(*) FROM p) t ORDER BY 1"
    ),
    tags=("analytics", "funnel", "join"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose first view precedes a
    click that precedes a purchase — strictly sequential (each step's
    anchor is the min event time AFTER the previous step's anchor),
    so re-ordered events never inflate conversion. Each step is one
    user-keyed aggregate joined to the previous frontier; exchanges
    carry one row per surviving user, shrinking monotonically down
    the funnel."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(event_type, frontier, anchor_col, out_col):
        joined = (
            ev.filter(F.col("event_type") == event_type)
            .join(frontier, "user_id")
            .filter(F.col("ts") > F.col(anchor_col))
        )
        return joined.groupBy("user_id").agg(F.min("ts").alias(out_col))

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")

    def step(name, df):
        return df.agg(F.lit(name).alias("step"), F.count("*").alias("n_users"))

    return (
        step("1_view", v)
        .unionByName(step("2_click", c))
        .unionByName(step("3_purchase", p))
        .orderBy("step")
    )


@register(
    "orders_retention_cohort",
    oracle=(
        # CAST: DuckDB's month-trunc yields DATE; Spark's yields
        # TIMESTAMP — align the types for the hash compare
        "WITH o AS (SELECT o_custkey, "
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m "
        "FROM orders), "
        "c AS (SELECT o_custkey, min(m) AS cohort_month FROM o GROUP BY 1), "
        "a AS (SELECT DISTINCT o.o_custkey, c.cohort_month, "
        "date_diff('month', c.cohort_month, o.m) AS months_since "
        "FROM o JOIN c ON o.o_custkey = c.o_custkey) "
        "SELECT cohort_month, months_since, count(*) AS n_customers "
        "FROM a GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("analytics", "cohort", "window"),
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month,
    counted once per month-offset in which they ordered again — the
    standard retention triangle. Two customer-keyed aggregates and one
    equi-join; the distinct collapses same-month repeat orders before
    the final (cohort, offset) count, so exchange volume is bounded by
    |customers| x active months, never raw orders."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("m")
    )
    c = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_month"))
    a = (
        o.join(c, "o_custkey")
        .select(
            "o_custkey",
            "cohort_month",
            F.round(F.months_between(F.col("m"), F.col("cohort_month")))
            .cast("bigint")
            .alias("months_since"),
        )
        .distinct()
    )
    return (
        a.groupBy("cohort_month", "months_since")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("cohort_month", "months_since")
    )


@register(
    "json_props_stats",
    oracle=(
        "WITH j AS (SELECT event_type, "
        "CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events) "
        "SELECT event_type, count(*) AS n, "
        "CAST(SUM(k) AS BIGINT) AS sum_k, "
        "min(k) AS min_k, max(k) AS max_k, "
        "count(DISTINCT k) AS n_distinct_k "
        "FROM j GROUP BY 1 ORDER BY 1"
    ),
    tags=("json", "semi-structured", "agg"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: the events ``props`` JSON
    string is parsed with a typed ``from_json`` schema (codegen
    JacksonParser — never a Python UDF) and aggregated per event type.
    At 100 TB the parse pipelines with the scan; only per-type
    partials reach the exchange."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "struct<k: bigint>")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


@register(
    "join_full_outer_click_purchase",
    oracle=(
        "WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events "
        "WHERE event_type = 'click' GROUP BY 1), "
        "p AS (SELECT user_id, count(*) AS n_purchases FROM events "
        "WHERE event_type = 'purchase' GROUP BY 1) "
        "SELECT COALESCE(c.user_id, p.user_id) AS user_id, "
        "COALESCE(n_clicks, 0) AS n_clicks, "
        "COALESCE(n_purchases, 0) AS n_purchases "
        "FROM c FULL OUTER JOIN p ON c.user_id = p.user_id "
        "ORDER BY 1"
    ),
    tags=("join", "outer"),
)
def join_full_outer_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A true FULL OUTER join (both null-extended sides survive):
    per-user click and purchase counts including users who only did
    one of the two. Pre-aggregating each side before the join keeps
    the outer join's input at one row per (user, side) — the fact
    table never reaches the outer join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return (
        clicks.join(buys, clicks.user_id == buys.p_user, "full_outer")
        .select(
            F.coalesce("user_id", "p_user").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .orderBy("user_id")
    )


@register(
    "pagerank_supplier_influence",
    oracle=(
        # two unrolled damped-PageRank iterations over the
        # customer->supplier purchase graph; same simplified rule as
        # operators/graph.py (no dangling-mass redistribution)
        "WITH e AS (SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst, "
        "CAST(count(*) AS DOUBLE) AS w "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2), "
        "outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1), "
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t), "
        "r1 AS (SELECT n.node, 0.15 + 0.85 * COALESCE(sum(1.0 * e.w / o.ow), 0) "
        "AS rank FROM nodes n "
        "LEFT JOIN e ON e.dst = n.node LEFT JOIN outw o ON o.src = e.src "
        "GROUP BY 1), "
        "r2 AS (SELECT n.node, 0.15 + 0.85 * COALESCE(sum(r.rank * e.w / o.ow), 0) "
        "AS rank FROM nodes n "
        "LEFT JOIN e ON e.dst = n.node LEFT JOIN outw o ON o.src = e.src "
        "LEFT JOIN r1 r ON r.node = e.src GROUP BY 1) "
        "SELECT node, round(rank, 6) AS rank FROM r2 "
        "WHERE node LIKE 's%' ORDER BY rank DESC, node LIMIT 20"
    ),
    tags=("graph", "iterative", "analytics"),
)
def pagerank_supplier_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (2 iterations) over the customer→supplier
    purchase graph — which suppliers accumulate the most purchase-walk
    mass. The third iterative shape in the engine (after k-means and
    label propagation): per round one src-keyed equi-join of the rank
    table onto the edges plus one dst-keyed aggregate, exchanges
    bounded by |edges| and |nodes|. Keys are namespaced ('c'/'s'
    prefixes) because customer and supplier keys overlap numerically.
    Oracle: the identical two iterations unrolled in SQL."""
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    ranks = pagerank(edges, weight="w", damping=0.85, iterations=2)
    return (
        ranks.filter(F.col("node").startswith("s"))
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@register(
    "setop_bag_semantics",
    oracle=(
        "WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'), "
        "p AS (SELECT user_id FROM events WHERE event_type = 'purchase') "
        "SELECT user_id, count(*) AS n FROM ("
        "SELECT user_id FROM c EXCEPT ALL SELECT user_id FROM p"
        ") t GROUP BY 1 ORDER BY 1"
    ),
    tags=("setop", "bag"),
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiset) semantics, the set-op variant the
    distinct-based entries can't express: each purchase occurrence
    cancels ONE click occurrence of the same user, surviving
    multiplicity preserved. Spark's ``exceptAll`` plans this as an
    aggregate of signed counts (sum of +1/−1 per side) — one shuffle
    on the value, no join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        clicks.exceptAll(buys)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id")
    )


@register(
    "lateral_top_spenders_per_nation",
    oracle=(
        "SELECT n.n_name, t.c_name, t.spend FROM nation n "
        "CROSS JOIN LATERAL ("
        "SELECT c.c_name, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) "
        "AS DOUBLE) AS spend "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "WHERE c.c_nationkey = n.n_nationkey "
        "GROUP BY c.c_name ORDER BY spend DESC, c.c_name LIMIT 2"
        ") t ORDER BY n.n_name, t.spend DESC, t.c_name"
    ),
    tags=("lateral", "join", "topk"),
)
def lateral_top_spenders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table):
    per nation, the two customers with the highest total order spend.
    Run through ``spark.sql`` deliberately — Catalyst's
    DecorrelateInnerQuery rewrites the per-outer-row aggregate+LIMIT
    into a window-ranked join, the same physical plan the DataFrame
    window formulation produces, so the lateral *syntax* costs nothing
    at 100 TB: one join shuffle on c_nationkey plus one window over
    (nation, spend). Spend sums DECIMAL-exact (order-independent),
    surfaced as DOUBLE on both sides; ties broken by unique c_name."""
    for name in ("nation", "customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"lat_{name}")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.spend FROM lat_nation n
        JOIN LATERAL (
          SELECT c.c_name, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
          AS DOUBLE) AS spend
          FROM lat_customer c JOIN lat_orders o ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          GROUP BY c.c_name ORDER BY spend DESC, c.c_name LIMIT 2
        ) t ORDER BY n.n_name, t.spend DESC, t.c_name
        """
    )


@register(
    "variant_props_buckets",
    oracle=(
        "WITH j AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k "
        "FROM events) "
        "SELECT CAST(k // 10 AS BIGINT) AS bucket, count(*) AS n, "
        "CAST(SUM(k) AS BIGINT) AS sum_k "
        "FROM j GROUP BY 1 ORDER BY 1"
    ),
    tags=("json", "variant", "semi-structured"),
)
def variant_props_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    encodes the props JSON into the binary variant format once, then
    ``variant_get`` extracts typed fields without re-parsing text —
    the schema-on-read shape you'd use when props keys vary by event.
    Unlike the fixed-schema ``from_json`` twin (json_props_stats), a
    variant column stores and serves *any* JSON shape; at 100 TB the
    parse + extract pipeline runs inside the scan stage and only the
    ~10-row bucket histogram reaches the exchange."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.expr("k div 10").alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("bucket")
    )


@register(
    "unpivot_type_metrics",
    oracle=(
        "WITH m AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1) "
        "SELECT event_type, metric, metric_value FROM ("
        "SELECT event_type, 'n_events' AS metric, n_events AS metric_value FROM m "
        "UNION ALL "
        "SELECT event_type, 'sum_value' AS metric, sum_value AS metric_value FROM m"
        ") t ORDER BY event_type, metric"
    ),
    tags=("unpivot", "reshape"),
)
def unpivot_type_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long reshape), the inverse of the pivot entry:
    per-type metrics melt into (event_type, metric, metric_value)
    rows. ``DataFrame.unpivot`` plans as a local Expand node — each
    input row fans out to |metrics| rows with zero shuffle beyond the
    feeding aggregate, so the reshape itself is free at any scale.
    The oracle states the same reshape as UNION ALL (portable ANSI);
    sums are DECIMAL-exact before surfacing as DOUBLE."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    return (
        wide.unpivot(["event_type"], ["n_events", "sum_value"], "metric", "metric_value")
        .orderBy("event_type", "metric")
    )


@register(
    "pandas_udaf_weighted_mean",
    oracle=(
        "SELECT event_type, "
        "round(SUM(value * (user_id % 5 + 1)) / SUM(user_id % 5 + 1), 6) "
        "AS wmean, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("agg", "pandas", "udf", "udaf"),
)
def pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the UDAF surface, SURVEY §2.11):
    a Series→scalar function used directly inside ``groupBy().agg()``
    alongside built-ins — completing the UDF matrix next to the
    scalar (tests/test_pandas_udf_parity.py), grouped-map
    (pandas_grouped_mad), map (multimodal), and table-function
    (chunking UDTF) shapes.

    Weighted mean per event type, weights derived deterministically
    from user_id. Arrow-batched like every Python boundary in this
    repo; at scale each group's values stream to exactly one executor
    (no partial aggregation for arbitrary Python UDAFs — the
    documented trade vs expressing the same thing in two built-in
    SUMs, which is the production form for THIS aggregate; the UDAF
    form exists for aggregates with no SQL decomposition). Rounded to
    6 dp: numpy's pairwise summation and SQL's sequential sum differ
    in the last ulp."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _wmean(v, w):
        return float((v * w).sum() / w.sum())

    # the module's postponed annotations (future import) would turn
    # inline hints into strings, which pandas_udf's Series->scalar
    # (GROUPED_AGG) inference rejects — attach real objects instead
    _wmean.__annotations__ = {"v": pd.Series, "w": pd.Series, "return": float}
    wmean = pandas_udf(_wmean, "double")

    # Spark disallows mixing a grouped-agg pandas UDF with JVM
    # aggregates in one agg() — the row count is a second UDAF
    def _n(v):
        return len(v)

    _n.__annotations__ = {"v": pd.Series, "return": int}
    n_udaf = pandas_udf(_n, "long")

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("w", (F.col("user_id") % 5 + 1).cast("double"))
        .groupBy("event_type")
        .agg(
            F.round(wmean("value", "w"), 6).alias("wmean"),
            n_udaf("value").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "graph_triangle_count",
    oracle=(
        "WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem), "
        "e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b "
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey) "
        "SELECT CAST(count(*) AS BIGINT) AS n_triangles "
        "FROM e e1 JOIN e e2 ON e1.b = e2.a "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"
    ),
    tags=("graph", "analytics"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-purchase graph (parts are adjacent when
    some order contains both) — the third graph-analytics member next
    to PageRank and connected components; triangle density is the
    standard community-structure signal.

    The operator orients edges low-degree→high-degree before the
    wedge join (operators/graph.py:triangle_count), bounding each
    node's wedge contribution by ~sqrt(2m) where the oracle's plain
    id-ordered edge-cube join lets one hub produce degree² wedges —
    same count, hub-proof intermediates at 100 TB."""
    from ..operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return triangle_count(edges)


@register(
    "markov_event_transitions",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev_type FROM events), "
        "t AS (SELECT prev_type, event_type AS next_type, count(*) AS n "
        "FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
        "tot AS (SELECT prev_type, SUM(n) AS row_n FROM t GROUP BY 1) "
        "SELECT t.prev_type, t.next_type, t.n, "
        "round(t.n / tot.row_n, 6) AS p "
        "FROM t JOIN tot ON tot.prev_type = t.prev_type "
        "ORDER BY 1, 2"
    ),
    tags=("sequence", "analytics", "window"),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event
    stream: P(next event type | previous event type) — the clickstream
    summary behind next-action prediction and anomaly scoring.

    One lag() window per user (ties broken by event_id so the
    sequence is engine-identical), then a 25-cell aggregate; the
    row-normalizer joins per prev_type, a |types|-row broadcast. The
    probability is an exact integer ratio rounded to 6 dp — no FP
    accumulation anywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        t.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("row_n"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "recursive_referral_depth",
    oracle=(
        "WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events), "
        "d(id, depth) AS ("
        "SELECT user_id, 0 FROM users WHERE user_id = 0 "
        "UNION ALL "
        "SELECT u.user_id, d.depth + 1 FROM users u "
        "JOIN d ON u.user_id IN (2 * d.id, 2 * d.id + 1) "
        "WHERE u.user_id <> 0) "
        "SELECT depth, count(*) AS n_users, min(id) AS min_id, "
        "max(id) AS max_id FROM d GROUP BY 1 ORDER BY 1"
    ),
    tags=("recursive", "hierarchy", "sql"),
)
def recursive_referral_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497):
    depth of each user in the synthetic binary referral tree
    (parent(u) = u div 2, root 0), summarized per level. Hierarchy
    traversal — org charts, category trees, referral chains — stated
    declaratively; each recursion step is one join bounded by the
    tree depth (log2 of the user count), the same per-iteration shape
    the iterative operators (label propagation, PageRank) build by
    hand. Spark does not yet support UNION-distinct recursion, so
    cyclic closures (dedup_resolve_clusters) keep the iterative
    operator; acyclic hierarchies get the declarative form. The
    oracle runs the identical SQL in DuckDB."""
    ev = load_table(spark, sf_dir, "events")
    ev.select("user_id").distinct().createOrReplaceTempView("__rec_users")
    return spark.sql(
        """
        WITH RECURSIVE d(id, depth) AS (
          SELECT user_id, 0 FROM __rec_users WHERE user_id = 0
          UNION ALL
          SELECT u.user_id, d.depth + 1 FROM __rec_users u
          JOIN d ON u.user_id IN (2 * d.id, 2 * d.id + 1)
          WHERE u.user_id <> 0
        )
        SELECT depth, count(*) AS n_users, min(id) AS min_id,
               max(id) AS max_id
        FROM d GROUP BY 1 ORDER BY 1
        """
    )


@register(
    "pipe_syntax_error_hotspots",
    oracle=(
        "SELECT user_id, count(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events WHERE event_type = 'error' "
        "GROUP BY 1 HAVING count(*) > 10 ORDER BY 1"
    ),
    tags=("sql", "pipe-syntax"),
)
def pipe_syntax_error_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (SPARK-49555, the GoogleSQL `|>`
    operator-chaining form): error-hotspot users stated as a linear
    pipeline instead of inside-out SQL. Parses to exactly the plan
    the classic form produces — syntax, not semantics — so the oracle
    is the equivalent ANSI query and must hash-match."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__pipe_events")
    return spark.sql(
        """
        FROM __pipe_events
        |> WHERE event_type = 'error'
        |> AGGREGATE count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           GROUP BY user_id
        |> WHERE n > 10
        |> ORDER BY user_id
        """
    )


@register(
    "try_arithmetic_safety",
    oracle=(
        "SELECT event_type, "
        "CAST(SUM(CASE WHEN user_id % 3 = 0 THEN NULL ELSE "
        "CAST(round(value / (user_id % 3), 6) AS DECIMAL(18,6)) END) "
        "AS DOUBLE) AS sum_safe_ratio, "
        "CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_null_div, "
        "CAST(SUM(CASE WHEN TRY_CAST(substr(props, 8, 2) AS BIGINT) IS NULL "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_badcast "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("sql", "error-safe", "try"),
)
def try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe SQL semantics (``try_divide`` / ``try_cast``): the
    ANSI-mode-friendly forms that turn would-be runtime errors
    (division by zero, malformed casts) into NULLs instead of killing
    a 1000-executor job hours in — the operational difference between
    'one bad row poisons the batch' and 'bad rows are counted and
    quarantined'. The oracle states the identical semantics with
    portable CASE/TRY_CAST; per-type sums are decimal-exact."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("user_id") % 3
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(
                F.round(F.try_divide("value", d), 6).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("sum_safe_ratio"),
            F.sum((d == 0).cast("bigint")).alias("n_null_div"),
            F.sum(
                F.substring("props", 8, 2)
                .try_cast("bigint")
                .isNull()
                .cast("bigint")
            ).alias("n_badcast"),
        )
        .orderBy("event_type")
    )


@register(
    "hof_user_value_trend",
    oracle=(
        "WITH u AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs "
        "FROM events WHERE user_id < 10 GROUP BY 1) "
        "SELECT user_id, len(vs) AS n, "
        "len(list_filter(list_zip(vs[2:], vs[1:-1]), p -> p[1] > p[2])) "
        "AS n_increases FROM u ORDER BY 1"
    ),
    tags=("hof", "array", "analytics"),
)
def hof_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions end to end: each user's value
    sequence (event-time order, event_id tie-break via lexicographic
    struct sort) analyzed entirely inside array expressions —
    zip-with-shifted-self counts strictly increasing steps without a
    second window or explode. The sequence materializes once per user
    (bounded by per-key history, the contract for HOF pipelines at
    scale); the oracle mirrors it with DuckDB's list lambdas."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    grouped = ev.groupBy("user_id").agg(
        F.transform(arr, lambda s: s["value"]).alias("vs")
    )
    n = F.size("vs")
    increases = F.size(
        F.filter(
            F.zip_with(
                F.slice("vs", 2, n - 1),
                F.slice("vs", 1, n - 1),
                lambda cur, prev: cur > prev,
            ),
            lambda x: x,
        )
    )
    return grouped.select(
        "user_id", n.alias("n"), increases.alias("n_increases")
    ).orderBy("user_id")


@register(
    "listagg_user_types",
    oracle=(
        "SELECT user_id, "
        "string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types "
        "FROM events WHERE user_id < 20 AND value > 90 "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("sql", "listagg", "agg"),
)
def listagg_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 LISTAGG (Spark 4's ``listagg ... WITHIN GROUP``):
    each user's distinct high-value event types as one ordered
    comma-joined string — the report-layer aggregation DuckDB spells
    ``string_agg``. Deterministic because DISTINCT + WITHIN GROUP
    ORDER BY pin both membership and order; the high-value filter
    keeps per-user sets distinct enough to exercise the ordering."""
    ev = load_table(spark, sf_dir, "events")
    ev.filter((F.col("user_id") < 20) & (F.col("value") > 90)).select(
        "user_id", "event_type"
    ).createOrReplaceTempView("__listagg_ev")
    return spark.sql(
        "SELECT user_id, listagg(DISTINCT event_type, ',') "
        "WITHIN GROUP (ORDER BY event_type) AS types "
        "FROM __listagg_ev GROUP BY user_id ORDER BY user_id"
    )


@register(
    "agg_mode_median_per_user",
    oracle=(
        "WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events "
        "WHERE user_id < 25 GROUP BY 1, 2), "
        "r AS (SELECT user_id, event_type, row_number() OVER ("
        "PARTITION BY user_id ORDER BY n DESC, event_type) AS rk FROM c) "
        "SELECT r.user_id, r.event_type AS modal_type, "
        "median(e.value) AS median_value "
        "FROM r JOIN events e ON e.user_id = r.user_id "
        "WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1"
    ),
    tags=("agg", "mode", "median"),
)
def agg_mode_median_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``mode()`` and exact ``median()`` per user — the
    order-statistics aggregates. ``mode(x, true)`` pins ties to the
    lowest value (a bare mode() is legal-but-arbitrary on ties, which
    a correctness gate can't accept), matching the oracle's explicit
    count-then-lexicographic ranking; both engines interpolate the
    even-count median as the midpoint of the two central stored
    doubles, so equality is exact without rounding."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr("mode(event_type, true)").alias("modal_type"),
            F.median("value").alias("median_value"),
        )
        .orderBy("user_id")
    )


@register(
    "join_null_safe_eq",
    oracle=(
        "WITH k AS (SELECT event_id, CASE WHEN value < 10 THEN NULL "
        "ELSE CAST(floor(value / 100) AS BIGINT) END AS vband, event_type "
        "FROM events), "
        "e AS (SELECT vband, count(*) AS n_err FROM k "
        "WHERE event_type = 'error' GROUP BY 1), "
        "p AS (SELECT vband, count(*) AS n_buy FROM k "
        "WHERE event_type = 'purchase' GROUP BY 1) "
        "SELECT e.vband, n_err, n_buy FROM e JOIN p "
        "ON e.vband IS NOT DISTINCT FROM p.vband "
        "ORDER BY e.vband NULLS FIRST"
    ),
    tags=("join", "null-semantics"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the
    NULL band is a real joinable group instead of silently dropping
    (plain `=` never matches NULL = NULL — a classic silent-data-loss
    bug when a banding expression produces NULLs). Still a hash-
    joinable equi-condition: Catalyst plans `<=>` as an equi-join key,
    not a nested loop."""
    ev = load_table(spark, sf_dir, "events")
    band = F.when(F.col("value") < 10, F.lit(None)).otherwise(
        F.floor(F.col("value") / 100).cast("bigint")
    )
    k = ev.select("event_type", band.alias("vband"))
    e = (
        k.filter(F.col("event_type") == "error")
        .groupBy("vband")
        .agg(F.count("*").alias("n_err"))
    )
    p = (
        k.filter(F.col("event_type") == "purchase")
        .groupBy("vband")
        .agg(F.count("*").alias("n_buy"))
        .withColumnRenamed("vband", "p_vband")
    )
    return (
        e.join(p, e.vband.eqNullSafe(F.col("p_vband")))
        .select("vband", "n_err", "n_buy")
        .orderBy(F.col("vband").asc_nulls_first())
    )


@register(
    "window_ntile_quartiles",
    oracle=(
        "WITH t AS (SELECT event_type, value, ntile(4) OVER ("
        "PARTITION BY event_type ORDER BY value, event_id) AS q FROM events) "
        "SELECT event_type, q, count(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM t GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("window", "ntile", "analytics"),
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile assignment per event type, summarized per
    bucket. ntile's bucket boundaries depend on ROW order, not value
    rank — ties split across buckets by position — so the ordering
    carries the event_id tie-break to keep both engines' assignments
    identical; bucket sums are decimal-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("q", F.ntile(4).over(w))
        .groupBy("event_type", "q")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type", "q")
    )


@register(
    "setop_union_by_name_evolution",
    oracle=(
        "WITH old_snap AS (SELECT doc_id, lang, CAST(NULL AS BIGINT) "
        "AS n_chars FROM documents WHERE doc_id % 2 = 0), "
        "new_snap AS (SELECT doc_id, lang, n_chars FROM documents "
        "WHERE doc_id % 2 = 1) "
        "SELECT lang, count(*) AS n, "
        "CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_missing_schema "
        "FROM (SELECT * FROM old_snap UNION ALL SELECT * FROM new_snap) t "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("setop", "schema-evolution"),
)
def setop_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union (``unionByName(allowMissingColumns=True)``):
    an old snapshot lacking a later-added column unions with the new
    snapshot, NULL-filling the gap — the K6 schema-merge semantics at
    the DataFrame level, where positional UNION would silently
    misalign columns. The missing-schema rows stay countable, not
    lost."""
    docs = load_table(spark, sf_dir, "documents")
    old_snap = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new_snap = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    )
    merged = old_snap.unionByName(new_snap, allowMissingColumns=True)
    return (
        merged.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("n_chars").isNull().cast("bigint")).alias(
                "n_missing_schema"
            ),
        )
        .orderBy("lang")
    )


@register(
    "ab_test_conversion_lift",
    oracle=(
        "WITH u AS (SELECT user_id, "
        "CASE WHEN ((user_id * 2654435761) % 4294967296) % 2 = 0 "
        "THEN 'A' ELSE 'B' END AS arm, "
        "max(CASE WHEN event_type = 'purchase' AND value > 95 "
        "THEN 1 ELSE 0 END) AS converted "
        "FROM events GROUP BY 1) "
        "SELECT arm, count(*) AS n_users, "
        "CAST(SUM(converted) AS BIGINT) AS n_converted, "
        "round(SUM(converted) * 1.0 / count(*), 6) AS rate "
        "FROM u GROUP BY 1 ORDER BY 1"
    ),
    tags=("analytics", "experiment", "ab-test"),
)
def ab_test_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: deterministic 50/50 arm assignment by
    multiplicative-hash parity of user_id (the engine-portable form of
    hash bucketing — xxhash64 differs between engines, exact integer
    arithmetic doesn't), high-value purchase conversion per arm. The
    assignment is stable across runs/partitions/engines, the property
    an experiment platform actually needs; the conversion flag is a
    per-user max, so event volume never biases the rate."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        ((F.col("user_id") * 2654435761) % 4294967296) % 2 == 0, "A"
    ).otherwise("B")
    converted = F.max(
        (
            (F.col("event_type") == "purchase") & (F.col("value") > 95)
        ).cast("int")
    )
    users = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"), converted.alias("converted")
    )
    return (
        users.groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.round(F.sum("converted") / F.count("*"), 6).alias("rate"),
        )
        .orderBy("arm")
    )


@register(
    "map_type_counts",
    oracle=(
        "WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events "
        "WHERE user_id < 25 GROUP BY 1, 2) "
        "SELECT user_id, "
        "CAST(count(*) AS INT) AS n_types, "
        "CAST(coalesce(SUM(CASE WHEN event_type = 'click' THEN n END), 0) "
        "AS BIGINT) AS n_clicks, "
        "CAST(SUM(CASE WHEN n > 10 THEN 1 ELSE 0 END) AS INT) AS n_hot_types "
        "FROM c GROUP BY 1 ORDER BY 1"
    ),
    tags=("map", "complex-types"),
)
def map_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType end to end: per-user event-type counts built into a
    real ``map<string,bigint>`` (``map_from_entries`` over the
    collected pairs) and then QUERIED with the map algebra —
    ``size``, ``element_at`` (missing key → NULL, coalesced), and
    ``map_filter`` for the hot-type count. Maps never reach the
    output (map column order is engine-undefined — the catalog's
    no-unhashable-outputs rule); the scalars extracted from them are
    what the oracle reproduces relationally. The map per user is
    bounded by |event types|, the usual contract for map-typed
    feature bundles at scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    pairs = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = F.map_from_entries(F.collect_list(F.struct("event_type", "n")))
    mapped = pairs.groupBy("user_id").agg(m.alias("m"))
    return mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias(
            "n_clicks"
        ),
        F.size(F.map_filter("m", lambda k, v: v > 10)).alias("n_hot_types"),
    ).orderBy("user_id")


@register(
    "format_roundtrip_xml_csv",
    oracle=(
        "SELECT event_id AS xml_id, event_type AS xml_type, "
        "event_id AS csv_id, value AS csv_value "
        "FROM events WHERE user_id < 5 ORDER BY event_id"
    ),
    tags=("xml", "csv", "semi-structured"),
)
def format_roundtrip_xml_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-record XML and CSV parsing (``from_xml`` — Spark 4's
    fourth semi-structured reader next to JSON/variant — and
    ``from_csv``): each event is rendered to an XML fragment and a
    CSV line with pure string expressions, parsed back through the
    typed readers, and the EXTRACTED fields are the output. The
    oracle is the plain projection of the original columns — the
    hash match proves the render→parse round trip is lossless, which
    is a stronger statement than any structural assertion. Both
    parsers run inside codegen with the scan; no Python."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    xml = F.concat(
        F.lit("<e><id>"),
        F.col("event_id"),
        F.lit("</id><t>"),
        F.col("event_type"),
        F.lit("</t></e>"),
    )
    csv = F.concat_ws(",", F.col("event_id"), F.col("value"))
    return (
        ev.select(
            F.from_xml(xml, "id BIGINT, t STRING").alias("x"),
            F.from_csv(csv, "id BIGINT, v DOUBLE").alias("c"),
        )
        .select(
            F.col("x.id").alias("xml_id"),
            F.col("x.t").alias("xml_type"),
            F.col("c.id").alias("csv_id"),
            F.col("c.v").alias("csv_value"),
        )
        .orderBy("xml_id")
    )


@register(
    "format_roundtrip_orc",
    oracle=(
        "SELECT event_id, event_type, epoch_us(ts) AS ts_us, value "
        "FROM events WHERE user_id < 5 ORDER BY event_id"
    ),
    tags=("orc", "format", "sink"),
)
def format_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write→read round trip (the columnar format family member
    next to the parquet everything else exercises — ORC ships in
    Spark core, no extra jar): a typed slice of events is written as
    ORC into the per-process scratch dir and read back, and the
    RE-READ columns are the output. The oracle is the plain projection
    of the original parquet columns, so the hash match proves the
    bigint/string/timestamp/double round trip is lossless through
    ORC's writer+reader — the same proof pattern as the XML/CSV and
    AES entries. Timestamps compare as epoch_us per the catalog
    convention (ORC stores local-TZ-semantics timestamps; the session
    is UTC-pinned on both write and read, so microseconds survive
    exactly)."""
    import os

    from ..session import _scratch_dir

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    # normpath first: a trailing-slash sf_dir would basename to '' and
    # make different SFs share (and clobber) one scratch dir while
    # earlier-returned DataFrames still lazily read it (round-12 advice)
    out = os.path.join(
        _scratch_dir(),
        f"orc_roundtrip_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    ev.select("event_id", "event_type", "ts", "value").write.mode(
        "overwrite"
    ).orc(out)
    return (
        spark.read.orc(out)
        .select(
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
        .orderBy("event_id")
    )


@register(
    "crypto_roundtrip_aes",
    oracle=(
        "SELECT doc_id, substr(text, 1, 24) AS text_head, "
        "CAST(length(text) AS BIGINT) AS n_chars "
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id"
    ),
    tags=("crypto", "pii", "security"),
)
def crypto_roundtrip_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round trip (``aes_encrypt`` /
    ``aes_decrypt``, AES-128): document text encrypted and decrypted
    inside the plan, with the DECRYPTED text projected — the oracle
    is the plain projection, so the hash match proves the cipher
    round trip lossless (the same proof pattern as the XML/CSV
    entry). ECB mode here because the proof needs a deterministic
    ciphertext path; production column encryption uses GCM (random
    IV, ciphertext non-deterministic by design) where only the
    round-trip property — not the ciphertext — is comparable. This
    is the at-rest PII-protection primitive the redaction operator
    (text_redact_pii) complements: redact what you never need back,
    encrypt what you sometimes do."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    key = F.lit("0123456789abcdef")
    enc = F.aes_encrypt(F.col("text").cast("binary"), key, F.lit("ECB"))
    dec = F.aes_decrypt(enc, key, F.lit("ECB")).cast("string")
    return docs.select(
        "doc_id",
        F.substring(dec, 1, 24).alias("text_head"),
        F.length(dec).cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "fuzzy_part_name_pairs",
    oracle=(
        "WITH n AS (SELECT DISTINCT p_name FROM part), "
        "b AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM n) "
        "SELECT a.p_name AS name_a, c.p_name AS name_b, "
        "CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist "
        "FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name "
        "WHERE levenshtein(a.p_name, c.p_name) <= 3 "
        "ORDER BY 1, 2"
    ),
    tags=("fuzzy", "entity-resolution", "dedup"),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity-resolution shape): near-
    duplicate part names within edit distance 3, candidate-generated
    by an equi-join on the product noun (the second word) before the
    levenshtein verify — the blocking that keeps fuzzy joins off the
    all-pairs cliff exactly like the shingle/grid/cluster blockers in
    the dedup, spatial, and SemDeDup operators. The distinct-names
    projection runs first, so the pair space is bounded by distinct
    VALUES, not rows; both engines implement classic unweighted edit
    distance, so the verify agrees exactly."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    b = names.select(
        "p_name", F.element_at(F.split("p_name", " "), 2).alias("blk")
    )
    a = b.select(F.col("p_name").alias("name_a"), "blk")
    c = b.select(F.col("p_name").alias("name_b"), "blk")
    return (
        a.join(c, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


@register(
    "spearman_quantity_price",
    oracle=(
        "WITH ranked AS ("
        "  SELECT l_returnflag AS grp, "
        "         CAST(AVG(CAST(rnx AS DECIMAL(15,1))) OVER "
        "              (PARTITION BY l_returnflag, l_quantity) AS DECIMAL(15,1)) AS rx, "
        "         CAST(AVG(CAST(rny AS DECIMAL(15,1))) OVER "
        "              (PARTITION BY l_returnflag, l_extendedprice) AS DECIMAL(15,1)) AS ry "
        "  FROM ("
        "    SELECT l_returnflag, l_quantity, l_extendedprice, "
        "           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnx, "
        "           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rny "
        "    FROM lineitem"
        "  ) t"
        "), sums AS ("
        "  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n, "
        "         CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy, "
        "         CAST(SUM(CAST(rx * ry AS DECIMAL(31,2))) AS DOUBLE) AS sxy, "
        "         CAST(SUM(CAST(rx * rx AS DECIMAL(31,2))) AS DOUBLE) AS sxx, "
        "         CAST(SUM(CAST(ry * ry AS DECIMAL(31,2))) AS DOUBLE) AS syy "
        "  FROM ranked GROUP BY grp"
        ") "
        "SELECT grp, round((n * sxy - sx * sy) / "
        "       (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS spearman_rho "
        "FROM sums ORDER BY grp"
    ),
    headline=True,  # r5: bench-tracked — the distributed-rank rewrite
    tags=("stats", "window"),
)
def spearman_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group (quantity vs price), with
    standard average-rank tie handling. Every sum is accumulated in
    DECIMAL (ranks are exact halves, so sums are exact and
    order-independent — the only way a double statistic can
    hash-match across engines; the final rho rounds to 6 dp
    because past ~2^53 the engines' decimal→double conversions differ
    in the last ulp (DuckDB double-rounds via hugeint)); the final rho arithmetic is the same
    IEEE expression on both sides. Ranking is the two-level
    range-bucket scheme (see inline comment): fine windows partition
    by (grp, bucket) so no task ever sorts a whole group — the r4
    verdict's single-task-per-group scale killer, fixed without
    changing a bit of the output."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity"),
        F.col("l_extendedprice"),
    )
    # Distributed two-level ranking (round-5 scale fix: the previous
    # Window.partitionBy(grp) put each group's ENTIRE sort in one task
    # — parallelism 3 here, ~1/3 of lineitem per task at 100 TB).
    # Each axis now ranks in two passes over ORDER-PRESERVING range
    # buckets of the value (monotonic, so v1 < v2 => bucket(v1) <=
    # bucket(v2), and ties share a bucket):
    #   coarse: per-(grp, bucket) row counts — a tiny |grp| x B table
    #           whose within-group cumsum gives each bucket's rank
    #           offset (rows in strictly lower buckets);
    #   fine:   rank() + peer count windowed by (grp, bucket) — every
    #           task sorts ~n/(|grp|*B) rows, not n/|grp|.
    # avg tie rank keeps its closed form with rank' = offset + local
    # rank: ties at competition rank r spanning c peers average
    # (2r + c - 1)/2. Arithmetic (decimal halves) is unchanged, so the
    # oracle hash is identical to the single-window form.
    _B = 32

    def _bucket(col: str, lo: str, hi: str) -> F.Column:
        return F.when(F.col(hi) == F.col(lo), F.lit(0)).otherwise(
            F.least(
                F.lit(_B - 1),
                F.floor(
                    (F.col(col) - F.col(lo)) / (F.col(hi) - F.col(lo)) * _B
                ).cast("int"),
            )
        )

    spans = base.groupBy("grp").agg(
        F.min("l_quantity").alias("__lox"),
        F.max("l_quantity").alias("__hix"),
        F.min("l_extendedprice").alias("__loy"),
        F.max("l_extendedprice").alias("__hiy"),
    )
    with_b = (
        base.join(F.broadcast(spans), "grp")
        .withColumn("__bx", _bucket("l_quantity", "__lox", "__hix"))
        .withColumn("__by", _bucket("l_extendedprice", "__loy", "__hiy"))
        .drop("__lox", "__hix", "__loy", "__hiy")
    )
    # Both axes' offsets derive from ONE tiny (grp, bx, by) cell count
    # (<= |grp| * B^2 rows). Branch discipline: every side input
    # (spans, cell, offsets) hangs off the cheap column-pruned scan or
    # the cell table — never off a windowed result, which branch
    # re-evaluation would recompute per reference (the first cut of
    # this rewrite chained axis 2 on axis 1's windows and the physical
    # plan exploded to 15 broadcast joins / 20 exchanges).
    cell = with_b.groupBy("grp", "__bx", "__by").agg(F.count("*").alias("__n"))

    def _offsets(bcol: str, out: str) -> DataFrame:
        counts = cell.groupBy("grp", bcol).agg(F.sum("__n").alias("__n"))
        w_off = (
            Window.partitionBy("grp")
            .orderBy(bcol)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return counts.select(
            "grp",
            bcol,
            F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(out),
        )

    def _avg_rank(col: str, bcol: str, off: str) -> F.Column:
        w_local = Window.partitionBy("grp", bcol).orderBy(col)
        peers = F.count("*").over(w_local.rangeBetween(0, 0))
        num = (
            F.lit(2) * (F.col(off) + F.rank().over(w_local)) + peers - F.lit(1)
        )
        return (num.cast("decimal(16,1)") / F.lit(2)).cast("decimal(15,1)")

    ranked = (
        with_b.join(F.broadcast(_offsets("__bx", "__offx")), ["grp", "__bx"])
        .join(F.broadcast(_offsets("__by", "__offy")), ["grp", "__by"])
        .select(
            "grp",
            _avg_rank("l_quantity", "__bx", "__offx").alias("rx"),
            _avg_rank("l_extendedprice", "__by", "__offy").alias("ry"),
        )
    )
    sums = ranked.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum((F.col("rx") * F.col("ry")).cast("decimal(31,2)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("rx") * F.col("rx")).cast("decimal(31,2)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("ry") * F.col("ry")).cast("decimal(31,2)"))
        .cast("double")
        .alias("syy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("grp", F.round(rho, 6).alias("spearman_rho")).orderBy("grp")


@register(
    "k_anonymity_audit",
    oracle=(
        "SELECT c_nationkey, c_mktsegment, "
        "       CAST(COUNT(*) AS BIGINT) AS group_size, "
        "       COUNT(*) < 5 AS violates_k "
        "FROM customer GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("governance", "privacy", "agg"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation,
    market segment): every equivalence class with its size and a
    violates-k(=5) flag — the privacy check run before releasing a
    training corpus containing user attributes (complements the PII
    redaction entry, which handles direct identifiers). One
    map-side-combined groupBy; output is bounded by the QI domain,
    not the row count."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") < 5).alias("violates_k"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "assoc_rules_event_pairs",
    oracle=(
        "WITH b AS (SELECT DISTINCT user_id, event_type FROM events), "
        "n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM b), "
        "item AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt "
        "         FROM b GROUP BY 1), "
        "pair AS (SELECT a.event_type AS ant, c.event_type AS cons, "
        "                CAST(COUNT(*) AS BIGINT) AS pair_cnt "
        "         FROM b a JOIN b c ON a.user_id = c.user_id "
        "          AND a.event_type <> c.event_type GROUP BY 1, 2) "
        "SELECT ant, cons, pair_cnt, "
        "       CAST(pair_cnt AS DOUBLE) / n_users AS support, "
        "       CAST(pair_cnt AS DOUBLE) / ia.cnt AS confidence, "
        "       CAST(pair_cnt AS DOUBLE) * n_users / (ia.cnt * ic.cnt) AS lift "
        "FROM pair "
        "JOIN item ia ON ant = ia.event_type "
        "JOIN item ic ON cons = ic.event_type "
        "CROSS JOIN n ORDER BY 1, 2"
    ),
    tags=("mining", "join", "agg"),
)
def assoc_rules_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over per-user event baskets: support /
    confidence / lift for every directed event-type pair (the market-
    basket analysis shape). Counts are exact integers, so the double
    ratios are engine-deterministic with no decimal accumulation
    needed. Scale shape: baskets are DISTINCT (user, item) — bounded
    by users × item domain; the pair self-join co-partitions on
    user_id (one shuffle, per-user fan-out = basket², fine for a
    bounded item domain — unbounded item vocabularies are FP-growth's
    territory, out of scope); item/total counts are tiny broadcasts
    back onto the 25-row pair table."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = baskets.select(
        F.countDistinct("user_id").alias("n_users")
    )
    item = baskets.groupBy("event_type").agg(F.count("*").alias("cnt"))
    a = baskets.select("user_id", F.col("event_type").alias("ant"))
    c = baskets.select("user_id", F.col("event_type").alias("cons"))
    pair = (
        a.join(c, "user_id")
        .filter(F.col("ant") != F.col("cons"))
        .groupBy("ant", "cons")
        .agg(F.count("*").alias("pair_cnt"))
    )
    ia = F.broadcast(item.select(F.col("event_type").alias("ant"), F.col("cnt").alias("ant_cnt")))
    ic = F.broadcast(item.select(F.col("event_type").alias("cons"), F.col("cnt").alias("cons_cnt")))
    return (
        pair.join(ia, "ant")
        .join(ic, "cons")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ant",
            "cons",
            "pair_cnt",
            (F.col("pair_cnt").cast("double") / F.col("n_users")).alias("support"),
            (F.col("pair_cnt").cast("double") / F.col("ant_cnt")).alias("confidence"),
            (
                F.col("pair_cnt").cast("double")
                * F.col("n_users")
                / (F.col("ant_cnt") * F.col("cons_cnt"))
            ).alias("lift"),
        )
        .orderBy("ant", "cons")
    )


@register(
    "ab_test_cuped_adjustment",
    oracle=(
        "WITH u AS (SELECT user_id, "
        "CASE WHEN ((user_id * 2654435761) % 4294967296) % 2 = 0 "
        "THEN 'A' ELSE 'B' END AS arm, "
        "COALESCE(SUM(CASE WHEN day(ts) <= 10 "
        "THEN CAST(value AS DECIMAL(18,6)) END), 0) AS x, "
        "COALESCE(SUM(CASE WHEN day(ts) > 10 "
        "THEN CAST(value AS DECIMAL(18,6)) END), 0) AS y "
        "FROM events GROUP BY 1, 2), "
        "g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy, "
        "CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy, "
        "CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx FROM u), "
        "a AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users, "
        "CAST(SUM(x) AS DOUBLE) AS sxa, CAST(SUM(y) AS DOUBLE) AS sya "
        "FROM u GROUP BY 1) "
        "SELECT arm, n_users, sya / n_users AS mean_y, "
        "sya / n_users - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) "
        "* (sxa / n_users - sx / n) AS cuped_mean_y "
        "FROM a CROSS JOIN g ORDER BY arm"
    ),
    tags=("analytics", "experiment", "ab-test", "stats"),
)
def ab_test_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM'13): the experiment
    metric (days 11+) adjusted by the pre-period covariate (days
    1-10) — cuped_mean = mean(y) - theta*(mean_arm(x) - mean(x)),
    theta = Cov(x,y)/Var(x). Every moment accumulates as DECIMAL
    (per-user sums exact, cross-moments widened to DECIMAL(38,12)),
    so theta and the adjusted means are single deterministic double
    expressions over exact sums — hash-identical across engines with
    no per-row double summation anywhere. Shape: one user-keyed
    conditional aggregation, then a 2-row per-arm rollup × a 1-row
    global-moment broadcast."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        ((F.col("user_id") * 2654435761) % 4294967296) % 2 == 0, "A"
    ).otherwise("B")
    dec = F.col("value").cast("decimal(18,6)")
    users = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.coalesce(
            F.sum(F.when(F.dayofmonth("ts") <= 10, dec)), F.lit(0).cast("decimal(18,6)")
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.dayofmonth("ts") > 10, dec)), F.lit(0).cast("decimal(18,6)")
        ).alias("y"),
    )
    g = users.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
    )
    a = users.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("x").cast("double").alias("sxa"),
        F.sum("y").cast("double").alias("sya"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        a.crossJoin(F.broadcast(g))
        .select(
            "arm",
            "n_users",
            (F.col("sya") / F.col("n_users")).alias("mean_y"),
            (
                F.col("sya") / F.col("n_users")
                - theta * (F.col("sxa") / F.col("n_users") - F.col("sx") / F.col("n"))
            ).alias("cuped_mean_y"),
        )
        .orderBy("arm")
    )


@register(
    "benford_totalprice_audit",
    oracle=(
        "WITH d AS (SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) "
        "AS VARCHAR), 1, 1) AS digit FROM orders WHERE o_totalprice >= 1), "
        "c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1), "
        "t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM d) "
        "SELECT digit, cnt, cnt / total AS observed_share, "
        "log10(1 + 1.0 / CAST(digit AS BIGINT)) AS expected_share, "
        "cnt / total - log10(1 + 1.0 / CAST(digit AS BIGINT)) AS deviation "
        "FROM c CROSS JOIN t ORDER BY digit"
    ),
    tags=("governance", "audit", "stats"),
)
def benford_totalprice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals (the forensic
    anomaly screen for fabricated or systematically-biased numeric
    data). The leading digit comes from the INTEGER part's string form
    — floor() then integer-to-string is identical across engines,
    where double formatting, floor(log10(x)) at power-of-ten
    boundaries, and double→int CASTs (DuckDB rounds, Spark
    truncates) are not. Expected shares are per-digit constants (log10(1+1/d)), so
    the only data-dependent doubles are exact-integer ratios. One
    9-group aggregate + a 1-row total broadcast."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = orders.select(
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1).alias(
            "digit"
        )
    )
    c = d.groupBy("digit").agg(F.count("*").alias("cnt"))
    t = d.agg(F.count("*").cast("double").alias("total"))
    expected = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit").cast("bigint"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "cnt",
            (F.col("cnt") / F.col("total")).alias("observed_share"),
            expected.alias("expected_share"),
            (F.col("cnt") / F.col("total") - expected).alias("deviation"),
        )
        .orderBy("digit")
    )


@register(
    "drift_psi_value_bins",
    oracle=(
        "WITH binned AS (SELECT CAST(LEAST(FLOOR(value / 100), 9) AS INT) AS bin, "
        "CASE WHEN day(ts) <= 15 THEN 'ref' ELSE 'cur' END AS period "
        "FROM events WHERE value >= 0), "
        "c AS (SELECT bin, "
        "CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref, "
        "CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur "
        "FROM binned GROUP BY 1), "
        "t AS (SELECT CAST(SUM(n_ref) AS DOUBLE) AS tot_ref, "
        "CAST(SUM(n_cur) AS DOUBLE) AS tot_cur FROM c) "
        "SELECT bin, n_ref, n_cur, "
        "n_ref / tot_ref AS p_ref, n_cur / tot_cur AS p_cur, "
        "CASE WHEN n_ref > 0 AND n_cur > 0 THEN (n_cur / tot_cur - n_ref / tot_ref) "
        "* ln((n_cur / tot_cur) / (n_ref / tot_ref)) END AS psi_term "
        "FROM c CROSS JOIN t ORDER BY bin"
    ),
    tags=("governance", "drift", "stats"),
)
def drift_psi_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between a reference
    period (days 1-15) and the current period (16+): per-bin observed
    shares and PSI contributions over fixed-width value bins — the
    production screen for feature/metric drift before a model or
    mixture goes stale. Emitted PER BIN rather than as the summed
    scalar: every number is a single deterministic double expression
    over exact integer counts (a cross-engine sum of 10 doubles is
    not order-stable; a 10-row report is, and is what an operator
    dashboards anyway; an empty bin on either side yields a NULL
    term — the dashboard's "new/vanished category" signal — instead
    of the log-of-zero PSI is undefined on). One conditional
    aggregation + a 1-row totals broadcast."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 0)
    binned = ev.select(
        F.least(F.floor(F.col("value") / 100), F.lit(9)).cast("int").alias("bin"),
        F.when(F.dayofmonth("ts") <= 15, "ref").otherwise("cur").alias("period"),
    )
    c = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_ref").cast("double").alias("tot_ref"),
        F.sum("n_cur").cast("double").alias("tot_cur"),
    )
    p_ref = F.col("n_ref") / F.col("tot_ref")
    p_cur = F.col("n_cur") / F.col("tot_cur")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            p_ref.alias("p_ref"),
            p_cur.alias("p_cur"),
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                (p_cur - p_ref) * F.log(p_cur / p_ref),
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )


@register(
    "ab_test_jackknife_buckets",
    oracle=(
        "WITH u AS (SELECT user_id, "
        "CASE WHEN ((user_id * 2654435761) % 4294967296) % 2 = 0 "
        "THEN 'A' ELSE 'B' END AS arm, "
        "CAST(((user_id * 2654435761) % 4294967296) % 20 AS BIGINT) AS bucket, "
        "SUM(CAST(value AS DECIMAL(18,6))) AS y "
        "FROM events GROUP BY 1, 2, 3), "
        "b AS (SELECT arm, bucket, CAST(COUNT(*) AS BIGINT) AS n_users, "
        "SUM(y) AS sy FROM u GROUP BY 1, 2), "
        "a AS (SELECT arm, CAST(SUM(n_users) AS BIGINT) AS n_arm, "
        "SUM(sy) AS sy_arm FROM b GROUP BY 1) "
        "SELECT b.arm, bucket, n_users, "
        "CAST(sy AS DOUBLE) / n_users AS bucket_mean, "
        "CAST(sy_arm - sy AS DOUBLE) / (n_arm - n_users) AS loo_mean "
        "FROM b JOIN a ON b.arm = a.arm ORDER BY 1, 2"
    ),
    tags=("analytics", "experiment", "ab-test", "stats"),
)
def ab_test_jackknife_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-a-group jackknife buckets for the A/B metric: users hash
    deterministically into 20 buckets per arm; each row carries the
    bucket's mean and the leave-one-bucket-out arm mean — the
    pseudo-values whose spread IS the experiment's uncertainty
    (SE² = (g-1)/g · Σ(θ̂_(i) − θ̄)², summed dashboard-side: a 40-row
    client sum, kept out of the engines because cross-engine double
    summation is not order-stable). Every emitted number is one
    double expression over exact decimal/integer sums. Completes the
    experimentation family: rates (ab_test_conversion_lift),
    variance reduction (CUPED), uncertainty (this)."""
    ev = load_table(spark, sf_dir, "events")
    mixed = (F.col("user_id") * 2654435761) % 4294967296
    u = ev.groupBy("user_id").agg(
        F.first(F.when(mixed % 2 == 0, "A").otherwise("B")).alias("arm"),
        F.first(mixed % 20).alias("bucket"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("y"),
    )
    b = u.groupBy("arm", "bucket").agg(
        F.count("*").alias("n_users"), F.sum("y").alias("sy")
    )
    a = b.groupBy("arm").agg(
        F.sum("n_users").alias("n_arm"), F.sum("sy").alias("sy_arm")
    )
    return (
        b.join(F.broadcast(a), "arm")
        .select(
            "arm",
            "bucket",
            "n_users",
            (F.col("sy").cast("double") / F.col("n_users")).alias("bucket_mean"),
            (
                (F.col("sy_arm") - F.col("sy")).cast("double")
                / (F.col("n_arm") - F.col("n_users"))
            ).alias("loo_mean"),
        )
        .orderBy("arm", "bucket")
    )


@register(
    "new_vs_returning_daily",
    oracle=(
        "WITH f AS (SELECT user_id, CAST(min(day(ts)) AS INT) AS first_day "
        "FROM events GROUP BY 1), "
        "d AS (SELECT CAST(day(ts) AS INT) AS day, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users "
        "FROM events GROUP BY 1), "
        "n AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users "
        "FROM f GROUP BY 1) "
        "SELECT d.day, active_users, COALESCE(new_users, 0) AS new_users, "
        "CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY d.day "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users "
        "FROM d LEFT JOIN n ON d.day = n.day ORDER BY 1"
    ),
    tags=("analytics", "window", "agg"),
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new vs returning users with a running total of distinct
    users ever seen — the growth-dashboard staple. Cumulative
    DISTINCT (not supported as a window function in either engine)
    decomposes into the first-seen-day trick: a user is 'new' on
    min(day), and the running distinct total is the cumsum of new
    arrivals. Two user-keyed aggregates + a |days|-row window: the
    single-partition cumsum sees 30 rows, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    day = F.dayofmonth("ts").alias("day")
    first = ev.groupBy("user_id").agg(F.min(F.dayofmonth("ts")).alias("first_day"))
    daily = ev.groupBy(day).agg(
        F.countDistinct("user_id").alias("active_users")
    )
    new = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new, "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


@register(
    "events_since_last_purchase",
    oracle=(
        "WITH g AS (SELECT event_id, user_id, ts, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg "
        "FROM events WHERE user_id < 30) "
        "SELECT event_id, user_id, seg, "
        "CAST(row_number() OVER (PARTITION BY user_id, seg "
        "ORDER BY ts, event_id) - 1 AS BIGINT) AS n_since "
        "FROM g ORDER BY user_id, seg, n_since, event_id"
    ),
    tags=("window", "analytics"),
)
def events_since_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count with a conditional RESET — events since the
    user's most recent purchase (0 on the purchase row itself). The
    reset decomposes into the segment-id trick: a running sum of the
    reset flag partitions each user's timeline into purchase epochs,
    then position-within-epoch is an ordinary row_number. The shape
    no plain frame spec can express (frames can't reference a
    data-dependent boundary), and the same two-window one-shuffle
    plan the sessionizer uses: both windows share the user_id
    partitioning. Ties pinned by event_id on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w_seg = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w_seg)
    w_pos = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id")
    return (
        ev.select("event_id", "user_id", "ts", seg.alias("seg"))
        .withColumn("n_since", F.row_number().over(w_pos) - F.lit(1))
        .select(
            "event_id",
            "user_id",
            "seg",
            F.col("n_since").cast("bigint").alias("n_since"),
        )
        .orderBy("user_id", "seg", "n_since", "event_id")
    )


@register(
    "attribution_first_last_touch",
    oracle=(
        "SELECT p.user_id, epoch_us(p.ts) AS purchase_us, "
        "epoch_us(min(c.ts)) AS first_click_us, "
        "epoch_us(max(c.ts)) AS last_click_us, "
        "CAST(count(*) AS BIGINT) AS n_clicks "
        "FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p "
        "JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c "
        "ON c.user_id = p.user_id AND c.ts <= p.ts "
        "AND c.ts >= p.ts - INTERVAL 30 MINUTE "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("analytics", "attribution", "join", "agg"),
)
def attribution_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-model click attribution: for every purchase, the FIRST
    and LAST click in its 30-minute lookback plus the touch count —
    first-touch and last-touch models from one pass (the as-of join
    entry is the streaming-friendly last-touch twin; this is the
    batch form marketers reconcile against). The range condition
    rides the user_id equi-join (never a cartesian); min/max/count
    aggregate the matches per purchase, so output is one row per
    attributed purchase."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    return (
        joined.groupBy("user_id", "p_ts")
        .agg(
            F.min("c_ts").alias("first_c"),
            F.max("c_ts").alias("last_c"),
            F.count("*").alias("n_clicks"),
        )
        .select(
            "user_id",
            F.unix_micros("p_ts").alias("purchase_us"),
            F.unix_micros("first_c").alias("first_click_us"),
            F.unix_micros("last_c").alias("last_click_us"),
            "n_clicks",
        )
        .orderBy("user_id", "purchase_us")
    )


@register(
    "dq_quarantine_events",
    oracle=(
        "WITH t AS (SELECT event_id, event_type, value, "
        "concat_ws(',', "
        "CASE WHEN event_type IS NULL OR event_type NOT IN "
        "('click', 'purchase', 'error', 'view') THEN 'in_set:event_type' END, "
        "CASE WHEN value IS NULL OR value < 0 OR value > 250 "
        "THEN 'in_range:value' END) AS violated_rules "
        "FROM events) "
        "SELECT event_id, event_type, value, violated_rules "
        "FROM t WHERE violated_rules <> '' ORDER BY event_id"
    ),
    tags=("governance", "dq", "quarantine"),
)
def dq_quarantine_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine operator under the hash gate: events failing the
    admission rules (unexpected type, out-of-range value), each row
    carrying its comma-joined violation reasons — so the split logic,
    the multi-violation concatenation order, and the reason strings
    themselves are all oracle-verified, not just counts. One codegen
    pass, no shuffle (the sort is the driver-compare convention)."""
    from ..operators.expectations import Rule, quarantine

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    rules = [
        Rule("in_set", "event_type", values=("click", "purchase", "error", "view")),
        Rule("in_range", "value", lo=0.0, hi=250.0),
    ]
    _, bad = quarantine(ev, rules)
    return bad.select(
        "event_id", "event_type", "value", "violated_rules"
    ).orderBy("event_id")


@register(
    "churn_inactive_users",
    oracle=(
        "SELECT user_id, epoch_us(max(ts)) AS last_seen_us, "
        "CAST(count(*) AS BIGINT) AS lifetime_events, "
        "max(ts) < TIMESTAMP '2024-01-16' AS churned "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("analytics", "churn", "agg"),
)
def churn_inactive_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity churn flag: a user whose last event precedes the
    cutoff is churned as of the analysis date — the retention
    dashboard's denominator-defining query (cohort matrix and
    new-vs-returning are its companions). One user-keyed aggregate;
    the flag is pure codegen on the max."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("lifetime_events"),
        )
        .select(
            "user_id",
            F.unix_micros("last_ts").alias("last_seen_us"),
            "lifetime_events",
            (F.col("last_ts") < cutoff).alias("churned"),
        )
        .orderBy("user_id")
    )


@register(
    "bloom_prefilter_semi_join",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(count(*) AS BIGINT) AS n_items, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders "
        "WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F') "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    headline=True,
    tags=("join", "bloom", "skipping", "scale"),
)
def bloom_prefilter_semi_join_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective semi join through an explicit broadcast-bloom
    prefilter (operators/bloom.py): build a 2**17-bit bitmap from the
    ~7%-selective urgent-finished order keys in one aggregate job,
    inline it as a literal-array predicate at the lineitem scan, and
    shuffle only the survivors into the exact semi join.  The result
    is hash-identical to the plain semi join oracle — bloom false
    positives die in the join; the bloom has no false negatives.
    This is the always-on form of Spark's runtime bloom-filter
    rewrite: at 100 TB the probe-side shuffle is the dominant cost
    and the bitmap (16 KiB, driver-held) removes ~93% of it."""
    from ..operators.bloom import bloom_prefilter_semi_join

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = bloom_prefilter_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return (
        joined.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "dp_noisy_counts_by_type",
    oracle=(
        "WITH c AS (SELECT event_type, count(*) AS c FROM events GROUP BY 1), "
        "u AS (SELECT event_type, c, (CAST("
        "list_reduce(list_transform(regexp_extract_all("
        "substr(md5(CAST(event_type AS VARCHAR)), 1, 8), '.'), "
        "c2 -> strpos('0123456789abcdef', c2) - 1), "
        "(a, b) -> a * 16 + b) % 1048576 AS DOUBLE) + 0.5) / 1048576.0 AS u "
        "FROM c) "
        "SELECT event_type, round(c + ((-10.0) * sign(u - 0.5) * "
        "ln(1 - 2 * abs(u - 0.5))), 6) AS noisy_count "
        "FROM u ORDER BY 1"
    ),
    tags=("governance", "privacy", "dp"),
)
def dp_noisy_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    ε=0.1 → scale b=1/ε=10 for a count query of sensitivity 1): per
    event type, the exact count plus Laplace noise drawn by INVERSE
    CDF from a DETERMINISTIC uniform seeded by the group key (the
    sampling module's cross-engine md5 bucket, 2^20 buckets,
    midpoint-offset so u∈(0,1) exclusive).  Deterministic noise is
    what an auditable release pipeline wants anyway: re-running the
    release must not leak a fresh noise draw per run (the
    averaging-attack the DP literature warns about) — fixing the
    draw per (release, key) is the standard mitigation. As SHIPPED
    (unsalted key hash) the noise is a public function of the key, so
    this demonstrates the mechanism's plan shape, not a privacy
    guarantee: a real release keys a per-release SECRET salt into the
    hash, at which point the ε=0.1 bound applies. See
    `dp_discrete_geometric_counts` for the integer (two-sided
    geometric) mechanism that keeps the release in the count domain.

    Scale shape: one map-side-combined count aggregate (output
    bounded by the key domain), noise is per-GROUP codegen arithmetic
    on the aggregated rows — zero extra shuffles, zero driver state.
    Floats follow the catalog convention: identical operation order
    on both engines, one final 6 dp round."""
    from .sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type").agg(F.count("*").alias("c"))
    m = 1 << 20
    u = (hash_bucket(F.col("event_type"), m).cast("double") + 0.5) / float(m)
    noise = F.lit(-10.0) * F.signum(u - 0.5) * F.log(1 - 2 * F.abs(u - 0.5))
    return (
        cnt.select(
            "event_type",
            F.round(F.col("c") + noise, 6).alias("noisy_count"),
        )
        .orderBy("event_type")
    )


@register(
    "l_diversity_audit",
    oracle=(
        "WITH g AS (SELECT c_nationkey, c_mktsegment, "
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band "
        "FROM customer) "
        "SELECT c_nationkey, c_mktsegment, "
        "CAST(count(*) AS BIGINT) AS group_size, "
        "CAST(count(DISTINCT bal_band) AS BIGINT) AS n_sensitive, "
        "count(DISTINCT bal_band) < 3 AS violates_l "
        "FROM g GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("governance", "privacy", "agg"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.): k-anonymity's
    group-size check (the ``k_anonymity_audit`` twin) is blind to a
    uniform group — 50 users who all share one sensitive value leak
    it despite k=50.  Per quasi-identifier class (nation, market
    segment), count the DISTINCT sensitive values (account-balance
    band, 1000-unit floors) and flag classes with fewer than l=3.
    One grouped distinct-count aggregate; output bounded by the QI
    domain, the distinct is a two-phase partial aggregate (no
    row-level data leaves the executors)."""
    cust = load_table(spark, sf_dir, "customer")
    g = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    return (
        g.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("group_size"),
            F.countDistinct("bal_band").alias("n_sensitive"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "n_sensitive",
            (F.col("n_sensitive") < 3).alias("violates_l"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "attribution_time_decay",
    oracle=(
        "WITH p AS (SELECT event_id AS pid, user_id, ts, epoch_us(ts) "
        "AS p_us FROM events WHERE event_type = 'purchase'), "
        "t AS (SELECT user_id, event_type AS channel, ts, epoch_us(ts) "
        "AS t_us FROM events WHERE event_type IN ('click', 'view')), "
        "j AS (SELECT pid, channel, "
        "power(0.5, CAST((p_us - t_us) // 86400000000 AS DOUBLE)) AS w "
        "FROM p JOIN t ON t.user_id = p.user_id AND t.ts < p.ts "
        "AND t.ts >= p.ts - INTERVAL 7 DAY), "
        "tot AS (SELECT pid, SUM(w) AS w_sum FROM j GROUP BY 1), "
        "s AS (SELECT channel, round(w / w_sum, 9) AS share "
        "FROM j JOIN tot USING (pid)) "
        "SELECT channel, CAST(count(*) AS BIGINT) AS n_touches, "
        "round(CAST(SUM(CAST(share AS DECIMAL(28,9))) AS DOUBLE), 6) "
        "AS credit FROM s GROUP BY 1 ORDER BY 1"
    ),
    tags=("analytics", "attribution", "join", "agg"),
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution — the third classic credit model next
    to ``attribution_first_last_touch``: every click/view in a
    purchase's 7-day lookback earns weight 2^(−age_days), each
    conversion's weights normalize to unit credit, and credit sums
    per channel.  The decay base is DELIBERATELY a power of two with
    an integer exponent: every weight is an exact binary fraction
    with exponents in [−6, 0], so the per-conversion weight sum is
    EXACTLY representable (no float-order sensitivity despite being
    a plain double SUM) and the normalizing division is one IEEE op
    — shares then round 9 dp and aggregate decimal-exactly.

    Scale shape: the lookback join rides the user_id equi-join with
    a range predicate (never cartesian), per-conversion totals are a
    pid-keyed aggregate, and the output is channel-domain-sized."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.unix_micros("ts").alias("p_us"),
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
        F.unix_micros("ts").alias("t_us"),
    )
    j = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "pid",
        "channel",
        F.pow(
            F.lit(0.5),
            F.expr("(p_us - t_us) div 86400000000").cast("double"),
        ).alias("w"),
    )
    tot = j.groupBy("pid").agg(F.sum("w").alias("w_sum"))
    s = j.join(tot, "pid").select(
        "channel", F.round(F.col("w") / F.col("w_sum"), 9).alias("share")
    )
    return (
        s.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(
                F.sum(F.col("share").cast("decimal(28,9)")).cast("double"),
                6,
            ).alias("credit"),
        )
        .orderBy("channel")
    )


@register(
    "drift_ks_two_sample",
    oracle=(
        "WITH s AS (SELECT value, CAST(day(ts) <= 15 AS INT) AS in_a "
        "FROM events), "
        "n AS (SELECT CAST(SUM(in_a) AS BIGINT) AS n1, "
        "CAST(SUM(1 - in_a) AS BIGINT) AS n2 FROM s), "
        "g AS (SELECT value, SUM(in_a) AS c1, SUM(1 - in_a) AS c2 "
        "FROM s GROUP BY 1), "
        "c AS (SELECT SUM(c1) OVER (ORDER BY value "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1, "
        "SUM(c2) OVER (ORDER BY value "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2 FROM g), "
        "d AS (SELECT CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) "
        "AS d_scaled FROM c CROSS JOIN n GROUP BY n1, n2) "
        "SELECT n1, n2, d_scaled, "
        "round(CAST(d_scaled AS DOUBLE) / (n1 * n2), 9) AS ks_d, "
        "round(1.358 * sqrt((n1 + n2) / CAST(n1 * n2 AS DOUBLE)), 9) "
        "AS crit_5pct, "
        "CAST(d_scaled AS DOUBLE) / (n1 * n2) > "
        "1.358 * sqrt((n1 + n2) / CAST(n1 * n2 AS DOUBLE)) AS drift_flag "
        "FROM d CROSS JOIN n"
    ),
    tags=("analytics", "drift", "distribution"),
)
def drift_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the first and
    second half of the month — the EXACT empirical-CDF companion to
    the binned PSI entry (`drift_psi_value_bins`): D = sup|F₁−F₂|
    evaluated at every distinct value, no binning loss.  The supremum
    is computed in INTEGER arithmetic — max|f₁·n₂ − f₂·n₁| over
    cumulative counts — so the statistic is exact and the only floats
    are the final division and the 5% critical value
    (1.358·√((n₁+n₂)/n₁n₂), identical one-op expressions on both
    engines).

    Scale shape: one (value) aggregate collapses the corpus, then the
    cumulative window runs over the bounded VALUE-GRID domain (2-dp
    prices in [0, 500] — ≤50k cells regardless of row count; the
    single-partition window is domain-bounded by design, the |days|
    argument of the KM/seasonal entries)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "value", (F.dayofmonth("ts") <= 15).cast("int").alias("in_a")
    )
    n = s.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("n2"),
    )
    g = s.groupBy("value").agg(
        F.sum("in_a").alias("c1"),
        F.sum(F.lit(1) - F.col("in_a")).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        F.sum("c1").over(w).alias("f1"), F.sum("c2").over(w).alias("f2")
    )
    d = (
        c.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
            )
            .cast("long")
            .alias("d_scaled")
        )
    )
    ks = F.col("d_scaled").cast("double") / (F.col("n1") * F.col("n2"))
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2"))
        / (F.col("n1") * F.col("n2")).cast("double")
    )
    return d.select(
        "n1",
        "n2",
        "d_scaled",
        F.round(ks, 9).alias("ks_d"),
        F.round(crit, 9).alias("crit_5pct"),
        (ks > crit).alias("drift_flag"),
    )


@register(
    "er_blocking_quality",
    oracle=(
        "WITH s AS (SELECT p_partkey AS k, p_name AS nm, "
        "substr(p_name, 1, 2) AS blk FROM part WHERE p_partkey % 10 = 0), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM s), "
        "p AS (SELECT CAST(levenshtein(a.nm, b.nm) <= 4 AS INT) AS m, "
        "CAST(a.blk = b.blk AS INT) AS c "
        "FROM s a JOIN s b ON a.k < b.k), "
        "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_all, "
        "CAST(SUM(c) AS BIGINT) AS n_cand, "
        "CAST(SUM(m) AS BIGINT) AS n_true, "
        "CAST(SUM(m * c) AS BIGINT) AS n_found FROM p) "
        "SELECT n_records, n_all AS n_all_pairs, n_cand AS n_candidates, "
        "n_true, n_found, "
        "round(1.0 - n_cand / CAST(n_all AS DOUBLE), 9) "
        "AS reduction_ratio, "
        "CASE WHEN n_true > 0 THEN "
        "round(n_found / CAST(n_true AS DOUBLE), 9) END "
        "AS pair_completeness "
        "FROM agg CROSS JOIN n"
    ),
    tags=("entity-resolution", "dedup", "eval"),
)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality report for entity resolution (Christen's two
    numbers): REDUCTION RATIO — what fraction of the quadratic pair
    space the 2-char-prefix blocking scheme prunes — and PAIR
    COMPLETENESS — what fraction of TRUE matches (edit distance ≤ 4,
    the sorted-neighborhood entries' threshold) survive the pruning.
    The eval every blocking-scheme change must pass before it ships:
    RR without PC rewards deleting everything; PC without RR rewards
    no blocking at all.

    Ground truth needs all-pairs edit distances, so it runs on a
    deliberately bounded hash subset (p_partkey % 10) — the eval-only
    quadratic, same contract as the mutual-kNN probe set; the
    blocking scheme under test stays linear at corpus scale.  All
    counts are exact integers from one self-join pass carrying both
    the match and same-block flags; the two ratios are single IEEE
    divisions."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_partkey") % 10 == 0
    )
    s = part.select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("nm"),
        F.substring("p_name", 1, 2).alias("blk"),
    )
    n = s.agg(F.count("*").cast("long").alias("n_records"))
    a = s.select(
        F.col("k").alias("ka"), F.col("nm").alias("na"), F.col("blk").alias("ba")
    )
    b = s.select(
        F.col("k").alias("kb"), F.col("nm").alias("nb"), F.col("blk").alias("bb")
    )
    p = a.join(F.broadcast(b), F.col("ka") < F.col("kb")).select(
        (F.levenshtein("na", "nb") <= 4).cast("int").alias("m"),
        (F.col("ba") == F.col("bb")).cast("int").alias("c"),
    )
    agg = p.agg(
        F.count("*").cast("long").alias("n_all_pairs"),
        F.sum("c").cast("long").alias("n_candidates"),
        F.sum("m").cast("long").alias("n_true"),
        F.sum(F.col("m") * F.col("c")).cast("long").alias("n_found"),
    )
    return (
        agg.crossJoin(F.broadcast(n))
        .select(
            "n_records",
            "n_all_pairs",
            "n_candidates",
            "n_true",
            "n_found",
            F.round(
                F.lit(1.0)
                - F.col("n_candidates") / F.col("n_all_pairs").cast("double"),
                9,
            ).alias("reduction_ratio"),
            F.when(
                F.col("n_true") > 0,
                F.round(
                    F.col("n_found") / F.col("n_true").cast("double"), 9
                ),
            ).alias("pair_completeness"),
        )
    )


@register(
    "k_anon_generalize_ladder",
    oracle=(
        "WITH lv AS ("
        "SELECT 1 AS lvl, 'day' AS level, CAST(event_type || '|' || "
        "CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS VARCHAR) "
        "AS qi FROM events "
        "UNION ALL "
        "SELECT 2, 'week', event_type || '|' || "
        "CAST(CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) "
        "AS VARCHAR) FROM events "
        "UNION ALL "
        "SELECT 3, 'month', event_type || '|' || "
        "CAST(year(ts) * 100 + month(ts) AS VARCHAR) FROM events), "
        "g AS (SELECT lvl, level, qi, count(*) AS sz "
        "FROM lv GROUP BY 1, 2, 3), "
        "per AS (SELECT lvl, level, CAST(count(*) AS BIGINT) AS n_groups, "
        "CAST(min(sz) AS BIGINT) AS min_group, min(sz) >= 25 AS meets_k "
        "FROM g GROUP BY 1, 2), "
        "best AS (SELECT COALESCE(min(CASE WHEN meets_k THEN lvl END), 9) "
        "AS best_lvl FROM per) "
        "SELECT level, n_groups, min_group, meets_k, "
        "lvl = best_lvl AS chosen "
        "FROM per CROSS JOIN best ORDER BY lvl"
    ),
    tags=("governance", "privacy", "k-anonymity"),
)
def k_anon_generalize_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity generalization ladder — the ENFORCEMENT step the
    `k_anonymity_audit` twin only measures: coarsen the
    quasi-identifier (event_type × time) up a fixed hierarchy
    (day → week → month) and choose the FINEST level whose minimum
    group size reaches k=25, the standard generalization-lattice
    walk (Samarati) restricted to one attribute's ladder.  Output is
    the per-level report with the chosen level flagged — the testdata
    actually exercises the ladder: sf0.001's day cells (min 2) and
    week cells (min 13) both fail k and push the choice to month,
    while sf0.01+ passes at day.

    All counts exact integers; one (level, qi) aggregate (the level
    union triples the map-side rows, nothing else), a 3-row rollup,
    and a 1-row broadcast argmin.  At 100 TB: the union explode is
    map-side and the aggregate output stays bounded by the QI
    domain × |ladder|."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    lv = (
        ev.select(
            F.lit(1).alias("lvl"),
            F.lit("day").alias("level"),
            F.concat_ws(
                "|",
                F.col("event_type"),
                F.floor(us / 86400000000).cast("long").cast("string"),
            ).alias("qi"),
        )
        .unionAll(
            ev.select(
                F.lit(2),
                F.lit("week"),
                F.concat_ws(
                    "|",
                    F.col("event_type"),
                    F.floor(us / 604800000000).cast("long").cast("string"),
                ),
            )
        )
        .unionAll(
            ev.select(
                F.lit(3),
                F.lit("month"),
                F.concat_ws(
                    "|",
                    F.col("event_type"),
                    (F.year("ts") * 100 + F.month("ts")).cast("string"),
                ),
            )
        )
    )
    g = lv.groupBy("lvl", "level", "qi").agg(F.count("*").alias("sz"))
    per = g.groupBy("lvl", "level").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group"),
        (F.min("sz") >= 25).alias("meets_k"),
    )
    best = per.agg(
        F.coalesce(
            F.min(F.when(F.col("meets_k"), F.col("lvl"))), F.lit(9)
        ).alias("best_lvl")
    )
    return (
        per.crossJoin(F.broadcast(best))
        .select(
            "level",
            "n_groups",
            "min_group",
            "meets_k",
            (F.col("lvl") == F.col("best_lvl")).alias("chosen"),
        )
        .orderBy("lvl")
    )


@register(
    "rfm_user_segments",
    oracle=(
        "WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS w_end "
        "FROM events), "
        "u AS (SELECT user_id, "
        "date_diff('day', max(CAST(ts AS DATE)), w_end) AS r_days, "
        "CAST(count(*) AS BIGINT) AS f_events, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary "
        "FROM events CROSS JOIN horizon GROUP BY user_id, w_end), "
        "cuts AS (SELECT "
        "quantile_cont(r_days, [0.2, 0.4, 0.6, 0.8]) AS rq, "
        "quantile_cont(f_events, [0.2, 0.4, 0.6, 0.8]) AS fq, "
        "quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq FROM u), "
        "s AS (SELECT user_id, CAST(r_days AS BIGINT) AS r_days, "
        "f_events, monetary, "
        "CAST(5 - ((r_days > rq[1])::INT + (r_days > rq[2])::INT "
        "+ (r_days > rq[3])::INT + (r_days > rq[4])::INT) AS BIGINT) "
        "AS r_score, "
        "CAST(1 + (f_events > fq[1])::INT + (f_events > fq[2])::INT "
        "+ (f_events > fq[3])::INT + (f_events > fq[4])::INT AS BIGINT) "
        "AS f_score, "
        "CAST(1 + (monetary > mq[1])::INT + (monetary > mq[2])::INT "
        "+ (monetary > mq[3])::INT + (monetary > mq[4])::INT AS BIGINT) "
        "AS m_score "
        "FROM u CROSS JOIN cuts) "
        "SELECT user_id, r_days, f_events, monetary, "
        "r_score, f_score, m_score, "
        "CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || "
        "CAST(m_score AS VARCHAR) AS segment "
        "FROM s ORDER BY user_id"
    ),
    tags=("analytics", "segmentation", "warehouse"),
)
def rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics classic: per user,
    Recency (days since last event), Frequency (event count),
    Monetary (value total), each scored 1-5 against the population's
    exact quintile cutoffs and concatenated into the '555'-style
    segment code.

    Deliberately NOT the ntile formulation: ntile needs a global
    single-partition window over every user — the anti-pattern this
    repo's spearman entry exists to avoid.  Instead the cutoffs come
    from ONE exact-percentile aggregate (partial-merge, both engines
    interpolate with the identical (n−1)·p rule), broadcast as a
    single row, and scoring is a pure codegen CASE chain against
    them — per-user work never leaves the map side after the one
    user-keyed aggregate.  Boundary semantics are strict-greater on
    identical doubles, so ties score identically cross-engine; users
    AT a cutoff share the lower score (threshold binning, not
    rank binning — equal metric values always get equal scores,
    which ntile cannot promise).

    Scale: one (user) shuffle + one 1-row percentile broadcast;
    output is |users| rows of codegen arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    horizon = ev.agg(F.max(day).alias("w_end"))
    u = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("user_id", "w_end")
        .agg(
            F.datediff(F.col("w_end"), F.max(day)).alias("r_days"),
            F.count("*").cast("long").alias("f_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .select("user_id", "r_days", "f_events", "monetary")
    )
    qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    cuts = u.agg(
        F.expr(f"percentile(r_days, {qs})").alias("rq"),
        F.expr(f"percentile(f_events, {qs})").alias("fq"),
        F.expr(f"percentile(monetary, {qs})").alias("mq"),
    )

    def score(col: str, cut: str, invert: bool) -> F.Column:
        above = sum(
            (F.col(col) > F.col(cut)[i]).cast("int") for i in range(4)
        )
        return (
            (F.lit(5) - above) if invert else (F.lit(1) + above)
        ).cast("long")

    s = u.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        F.col("r_days").cast("long").alias("r_days"),
        "f_events",
        "monetary",
        score("r_days", "rq", invert=True).alias("r_score"),
        score("f_events", "fq", invert=False).alias("f_score"),
        score("monetary", "mq", invert=False).alias("m_score"),
    )
    return s.select(
        "user_id",
        "r_days",
        "f_events",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    ).orderBy("user_id")


@register(
    "drift_chi_square_type",
    oracle=(
        "WITH s AS (SELECT event_type AS t, "
        "CAST(day(ts) <= 15 AS INT) AS in_a FROM events), "
        "o AS (SELECT t, in_a, count(*) AS obs FROM s GROUP BY 1, 2), "
        "rt AS (SELECT t, SUM(obs) AS r FROM o GROUP BY 1), "
        "ct AS (SELECT in_a, SUM(obs) AS c FROM o GROUP BY 1), "
        "n AS (SELECT SUM(obs) AS n FROM o), "
        "cell AS (SELECT CAST(round(pow(CAST(obs * n - r * c AS DOUBLE), 2)"
        " / CAST(n * r * c AS DOUBLE) * 1000000000) AS BIGINT) AS term "
        "FROM o JOIN rt USING (t) JOIN ct USING (in_a) CROSS JOIN n), "
        "k AS (SELECT count(*) AS n_types FROM rt) "
        "SELECT CAST(n_types AS INT) AS n_types, "
        "CAST(n_types - 1 AS BIGINT) AS dof, "
        "CAST(SUM(term) AS DOUBLE) / 1000000000.0 AS chi2, "
        "sqrt(CAST(SUM(term) AS DOUBLE) / 1000000000.0 "
        "/ (SELECT CAST(n AS DOUBLE) FROM n)) AS cramers_v "
        "FROM cell CROSS JOIN k GROUP BY 1, 2"
    ),
    tags=("analytics", "drift", "distribution"),
)
def drift_chi_square_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × month-half — the
    CATEGORICAL drift companion to the KS entry (which covers the
    continuous value column): did the event-type mix shift between
    the halves?  Cramér's V (min(r,c)-1 = 1 here, so V = √(χ²/N))
    gives the effect size the raw statistic hides at scale.

    Exactness: observed/marginal counts are exact integers; each
    cell's term (O·N − r·c)²/(N·r·c) mixes them in one identical IEEE
    expression per engine (the squared numerator ≤ ~1e10 stays exact
    in double before squaring), then rounds to integer nano-units so
    the ≤|types|×2-cell sum is order-free; χ² re-emerges as one IEEE
    division.  Scale shape: one map-side-combined (type, half)
    aggregate collapses the corpus; everything after runs on ≤ 2·
    |types| rows (broadcast joins at bench scale)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("event_type").alias("t"),
        (F.dayofmonth("ts") <= 15).cast("int").alias("in_a"),
    )
    o = s.groupBy("t", "in_a").agg(F.count("*").alias("obs"))
    rt = o.groupBy("t").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("in_a").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    cell = (
        o.join(F.broadcast(rt), "t")
        .join(F.broadcast(ct), "in_a")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                F.pow(
                    (F.col("obs") * F.col("n") - F.col("r") * F.col("c"))
                    .cast("double"),
                    F.lit(2),
                )
                / (F.col("n") * F.col("r") * F.col("c")).cast("double")
                * F.lit(1_000_000_000)
            )
            .cast("long")
            .alias("term")
        )
    )
    k = rt.agg(F.count("*").alias("n_types"))
    chi2 = F.sum("term").cast("double") / F.lit(1.0e9)
    n_dbl = n.select(F.col("n").cast("double").alias("n_d"))
    return (
        cell.crossJoin(F.broadcast(k))
        .groupBy(F.col("n_types").cast("int").alias("n_types"))
        .agg(F.sum("term").alias("term_sum"))
        .crossJoin(F.broadcast(n_dbl))
        .select(
            "n_types",
            (F.col("n_types") - 1).cast("long").alias("dof"),
            (F.col("term_sum").cast("double") / F.lit(1.0e9)).alias("chi2"),
            F.sqrt(
                F.col("term_sum").cast("double")
                / F.lit(1.0e9)
                / F.col("n_d")
            ).alias("cramers_v"),
        )
    )


@register(
    "drift_mann_whitney_value",
    oracle=(
        "WITH s AS (SELECT value, CAST(day(ts) <= 15 AS INT) AS in_a "
        "FROM events), "
        "g AS (SELECT value, SUM(in_a) AS c1, count(*) AS c FROM s "
        "GROUP BY 1), "
        "cum AS (SELECT c1, c, SUM(c) OVER (ORDER BY value "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_c, "
        "CAST(c AS HUGEINT) * c * c - c AS t3t FROM g), "
        "agg AS (SELECT SUM(c1 * (2 * COALESCE(before_c, 0) + c + 1)) "
        "AS s2, SUM(t3t) AS ties, SUM(c1) AS n1, SUM(c - c1) AS n2 "
        "FROM cum) "
        "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
        "CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u_scaled2, "
        "CAST(s2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_stat, "
        "(CAST(s2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 "
        "- CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) "
        "/ sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 "
        "* (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE) "
        "/ (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))) "
        "AS z_score "
        "FROM agg"
    ),
    tags=("analytics", "drift", "distribution"),
)
def drift_mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the month halves on
    the value column — the rank-based location test that completes
    the drift suite (KS: any distributional change; chi-square:
    categorical mix; U: does one half stochastically dominate).

    Exactness: tie-averaged ranks are kept in DOUBLED integers
    (2·rank(v) = 2·cum_before + count + 1 — exact BIGINT; no
    fractional average-rank floats), so U×2 = Σ_A 2·rank − n₁(n₁+1)
    is exact, and the tie-corrected normal approximation
    z = (U − n₁n₂/2) / √(n₁n₂/12 · (n+1 − Σ(t³−t)/(n(n−1))))
    is one identical IEEE expression per engine over exact integers
    (Σ(t³−t) runs in HUGEINT/DECIMAL — t³ overflows BIGINT on a
    500k-row tie group).

    Scale shape: identical to the KS entry — one (value) aggregate
    collapses the corpus, the cumulative window runs over the bounded
    2-dp value grid (≤50k cells), the final row is a scalar fold."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "value", (F.dayofmonth("ts") <= 15).cast("int").alias("in_a")
    )
    g = s.groupBy("value").agg(
        F.sum("in_a").alias("c1"), F.count("*").alias("c")
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = g.select(
        "c1",
        "c",
        F.sum("c").over(w).alias("before_c"),
        (
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("t3t"),
    )
    # s2 ~ n1·2n and n1·(n1+1) are O(n²): run them in decimal(38,0)
    # like t3t so a >3e9-row corpus can't wrap LongType silently while
    # the DuckDB oracle's HUGEINT keeps going.
    agg = cum.agg(
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (2 * F.coalesce("before_c", F.lit(0)) + F.col("c") + 1)
        ).alias("s2"),
        F.sum("t3t").alias("ties"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
    )
    u2 = F.col("s2") - F.col("n1").cast("decimal(38,0)") * (F.col("n1") + 1)
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    z = (u2.cast("double") / F.lit(2.0) - n1d * n2d / F.lit(2.0)) / F.sqrt(
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - F.col("ties").cast("double")
            / (
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1).cast("double")
            )
        )
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        u2.cast("long").alias("u_scaled2"),
        (u2.cast("double") / F.lit(2.0)).alias("u_stat"),
        z.alias("z_score"),
    )


@register(
    "trend_mann_kendall_daily",
    oracle=(
        "WITH d AS (SELECT CAST(day(ts) AS BIGINT) AS day, "
        "count(*) AS x FROM events GROUP BY 1), "
        "p AS (SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1 "
        "WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s "
        "FROM d a JOIN d b ON b.day > a.day), "
        "t AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)) "
        "AS tie_term FROM (SELECT x, count(*) AS c FROM d GROUP BY 1)), "
        "n AS (SELECT count(*) AS n FROM d) "
        "SELECT s, CAST(n AS BIGINT) AS n_days, "
        "(CAST(s AS DOUBLE) - CASE WHEN s > 0 THEN 1 "
        "WHEN s < 0 THEN -1 ELSE 0 END) / "
        "sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) "
        "- CAST(tie_term AS DOUBLE)) / 18.0) AS z_score "
        "FROM p CROSS JOIN t CROSS JOIN n"
    ),
    tags=("analytics", "trend", "temporal"),
)
def trend_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test over the daily event counts — the
    non-parametric significance companion to the Theil-Sen slope
    entry (Theil-Sen says HOW steep, Mann-Kendall says WHETHER the
    monotone trend is real): S = Σ_{i<j} sign(x_j − x_i), with the
    tie-corrected variance and the standard continuity correction.

    Exactness: S and the tie term are exact integers (the pair space
    is the bounded |days|² ≈ 31² grid — a self-join of the daily
    aggregate, NEVER the raw corpus); z is one fixed-shape IEEE
    expression over them.  Scale shape: one map-side-combined daily
    aggregate collapses the corpus; everything after runs on ≤ 31
    rows."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.dayofmonth("ts").cast("long").alias("day")
    ).agg(F.count("*").alias("x"))
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    p = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    t = (
        d.groupBy("x")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * (F.col("c") - 1)
                * (2 * F.col("c") + 5)
            ).alias("tie_term")
        )
    )
    n = d.agg(F.count("*").alias("n"))
    cc = F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    z = (F.col("s").cast("double") - cc) / F.sqrt(
        (
            F.col("n").cast("double")
            * (F.col("n") - 1)
            * (2 * F.col("n") + 5)
            - F.col("tie_term").cast("double")
        )
        / F.lit(18.0)
    )
    return (
        p.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(n))
        .select(
            "s",
            F.col("n").cast("long").alias("n_days"),
            z.alias("z_score"),
        )
    )


# Poisson(1) CDF as exact double literals — both engines parse the
# same decimal strings to the same doubles, and the md5-derived
# uniform is an exact 32-bit integer / 2^32, so every weight
# comparison is bit-identical cross-engine.
_POIS1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
)
_BOOT_B = 32


def _boot_u32_sql() -> str:
    return (
        "list_reduce(list_transform(regexp_extract_all("
        "substr(md5('boot:' || CAST(event_id AS VARCHAR) || ':' "
        "|| CAST(b AS VARCHAR)), 1, 8), '.'), "
        "c -> strpos('0123456789abcdef', c) - 1), "
        "(a, d) -> a * 16 + d)"
    )


def _boot_w_sql() -> str:
    cases = " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {cases} ELSE {len(_POIS1_CDF)} END"


@register(
    "bootstrap_mean_ci_value",
    oracle=(
        "WITH rep AS (SELECT event_id, "
        "CAST(round(value * 1000000) AS BIGINT) AS vi, r.b AS b "
        "FROM events, unnest(range(0, "
        f"{_BOOT_B})) r(b)), "
        f"uu AS (SELECT vi, b, CAST({_boot_u32_sql()} AS DOUBLE) "
        "/ 4294967296.0 AS u FROM rep), "
        f"ww AS (SELECT vi, b, {_boot_w_sql()} AS w FROM uu), "
        "reps AS (SELECT b, "
        "CAST(SUM(CAST(w AS DECIMAL(19,0)) * CAST(vi AS DECIMAL(19,0))) "
        "AS DOUBLE) "
        "/ CAST(SUM(CAST(w AS DECIMAL(19,0))) AS DOUBLE) / 1000000.0 AS m "
        "FROM ww GROUP BY 1), "
        "full_stats AS (SELECT CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) "
        "/ CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_value "
        "FROM events) "
        "SELECT n_events, mean_value, "
        f"CAST({_BOOT_B} AS BIGINT) AS n_replicates, "
        "round(quantile_cont(m, 0.025), 9) AS ci_lo, "
        "round(quantile_cont(m, 0.975), 9) AS ci_hi "
        "FROM full_stats, reps GROUP BY 1, 2, 3"
    ),
    headline=True,  # the explode-x32 scan-heavy shape the bench lacked
    tags=("analytics", "stats", "bootstrap", "eval"),
)
def bootstrap_mean_ci_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap CI for the mean event value —
    the uncertainty-quantification pass the stats suite lacked: every
    drift/AB entry emits a point statistic, this one puts a
    finite-width interval around one.

    Poisson bootstrap (Chamandy et al., the map-reduce-native
    resample): replicate b gives every row an independent
    Poisson(1)-distributed inclusion count, so a replicate never needs
    a global n-row sample — the weight is a pure per-(row, b)
    expression. Determinism: u = md5('boot:'||id||':'||b) first 8 hex
    as an exact 32-bit integer / 2^32; the Poisson inverse-CDF
    thresholds are shared decimal literals, so weights are
    bit-identical cross-engine (no RNG, no stddev convention — the CI
    endpoints use the proven percentile ≡ quantile_cont pairing over
    32 identical doubles; per-replicate means are exact-integer
    micro-unit sums with one IEEE division).

    Scale shape: explode ×B then ONE map-side-combined aggregate —
    the exchange carries B rows per task regardless of corpus size;
    the B-row replicate table and the 1-row full stats meet in a
    scalar fold. At 100 TB, B=32 replicates cost one extra scan-side
    multiply per row, not 32 shuffles."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vi"),
    )
    rep = ev.select(
        "event_id",
        "vi",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = u32.cast("double") / F.lit(4294967296.0)
    w = F.lit(len(_POIS1_CDF))
    for k in reversed(range(len(_POIS1_CDF))):
        w = F.when(u < float(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    # w*vi and the weight/value sums accumulate in decimal(38,0), not
    # LongType: at the ~1e9+-row scale this plan targets, a bigint sum
    # of micro-unit values wraps silently under non-ANSI Spark while
    # DuckDB (HUGEINT) keeps going — the same divergence mode fixed in
    # gini_length_by_source / drift_mann_whitney_value. The oracle
    # mirrors with DECIMAL(19,0) operands -> DECIMAL(38,0) products.
    w_dec = F.col("w").cast("decimal(19,0)")
    reps = (
        rep.select("b", "vi", w.cast("long").alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(w_dec * F.col("vi").cast("decimal(19,0)")).cast("double")
                / F.sum(w_dec).cast("double")
                / F.lit(1_000_000.0)
            ).alias("m")
        )
    )
    full_stats = ev.agg(
        F.count("*").cast("long").alias("n_events"),
        (
            F.sum(F.col("vi").cast("decimal(38,0)")).cast("double")
            / F.count("*").cast("double")
            / F.lit(1_000_000.0)
        ).alias("mean_value"),
    )
    return (
        reps.crossJoin(F.broadcast(full_stats))
        .groupBy("n_events", "mean_value")
        .agg(
            F.lit(_BOOT_B).cast("long").alias("n_replicates"),
            F.round(F.percentile("m", F.lit(0.025)), 9).alias("ci_lo"),
            F.round(F.percentile("m", F.lit(0.975)), 9).alias("ci_hi"),
        )
        .select("n_events", "mean_value", "n_replicates", "ci_lo", "ci_hi")
    )
