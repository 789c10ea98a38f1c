"""End-to-end training-data curation pipeline + sketch operators.

``curation_corpus_pipeline`` chains the individual LLM-pipeline stages
(quality gates → exact dedup → per-source corpus stats) into the one
composite a real corpus build runs — verified end-to-end against a
single DuckDB oracle, proving the stages compose without driver-side
materialization between them.

The sketch entries (``sketch_*``) are the approximate, fixed-memory
scale path for distinct counts and quantiles: HyperLogLog++ and
KLL/GK-style sketches whose merge is associative, so at 100 TB the
shuffle carries one small sketch per group instead of the raw values.
Spark's and DuckDB's sketch implementations differ, so the estimates
themselves can't be oracle values — instead EVERY sketch entry is
hash-gated (round 12) with the identity-boolean device: the exact
statistic is the oracle-checkable payload and the sketch's contract
(a structural theorem where one exists, a measured bound with stated
slack otherwise) rides as a boolean the oracle pins to TRUE. The
measured-bound slacks are additionally exercised in
``tests/test_sketches.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.sketches import KMV_SPACE_SQL as _KMV_SPACE_SQL
from ..operators.sketches import kmv_hash_sql as _kmv_hash_sql
from ..sources.tables import load_table
from .catalog import register

# the quality-gate CTE, built from the same threshold constants and
# SQL fragments text_quality_filter's oracle uses (functions/text.py)
_QUALITY_CTE = (
    "WITH t AS (SELECT doc_id, text, lang, source, "
    f"{T.QUALITY_COLS_SQL}, md5(text) AS fp "
    "FROM documents), "
    f"q AS (SELECT * FROM t WHERE {T.QUALITY_WHERE_SQL}), "
)


@register(
    "curation_corpus_pipeline",
    oracle=(
        _QUALITY_CTE
        + "d AS (SELECT * FROM (SELECT q.*, row_number() OVER "
        "(PARTITION BY fp ORDER BY doc_id) AS rn FROM q) WHERE rn = 1) "
        "SELECT source, lang, count(*) AS n_docs, "
        "CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
        "CAST(SUM(length(text)) AS BIGINT) AS total_chars "
        "FROM d GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    headline=True,
    tags=("llm", "pipeline", "dedup", "text"),
)
def curation_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite corpus build: quality gates → exact dedup
    (first-doc-wins per content fingerprint, as a min_by aggregate) →
    per-(source, lang) token/char budget. One scan, one map-side-
    combined shuffle on the fingerprint, one tiny aggregation shuffle
    — each stage is pure-expression codegen, so the chain pipelines
    without materialization. At 100 TB this is the shape the whole
    engine exists for: the dedup exchange carries ~50-byte projected
    rows for gate survivors only (never text), and the final exchange
    is |source×lang| rows."""
    return _corpus_pipeline(load_table(spark, sf_dir, "documents"))


def _corpus_pipeline(
    docs: DataFrame, *, with_classifier: bool = False
) -> DataFrame:
    """Shared pipeline body; ``with_classifier=True`` inserts the
    linear quality-classifier stage (``T.quality_clf_logit`` ≥ 0)
    after the heuristic gates — the fastText-shaped scoring pass real
    corpus builds run. The classifier is pure folded-literal
    expressions, so the flag changes only a filter predicate, never
    the plan shape (still one scan + two exchanges)."""
    gate = T.quality_gate("text")
    if with_classifier:
        gate = gate & (T.quality_clf_logit("text") >= 0)
    # r13 optimization round (guide §2.3: project before the
    # exchange, aggregate before you shuffle): the former fp-window
    # dedup (row_number over fp, keep rn=1) shuffled the FULL text
    # column through the fingerprint exchange and sorted each fp
    # partition. First-doc-wins is min(doc_id) per fp, and every
    # downstream consumer needs only (source, lang, n_tok, n_chars)
    # of the kept row — so dedup is ONE min_by aggregate over rows
    # projected down to ~50 bytes before the exchange (text length is
    # computed map-side and never crosses). Map-side partial min_by
    # additionally collapses duplicate fingerprints per partition.
    # Neutral at sf0.1 (the scan + gate expressions dominate locally,
    # measured 0.73 s ~ 0.76 s both forms); at 100 TB the exchange
    # drops from corpus-text bytes + per-partition sort to narrow
    # partially-aggregated rows.
    gated = docs.filter(gate).select(
        "doc_id",
        "lang",
        "source",
        T.token_count("text").cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_chars_kept"),
        T.fingerprint_md5("text").alias("fp"),
    )
    kept = gated.groupBy("fp").agg(
        F.min_by(
            F.struct("source", "lang", "n_tok", "n_chars_kept"), "doc_id"
        ).alias("k")
    )
    return (
        kept.groupBy("k.source", "k.lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("k.n_tok").alias("total_tokens"),
            F.sum("k.n_chars_kept").alias("total_chars"),
        )
        .orderBy("source", "lang")
    )


@register(
    "curation_quality_score",
    oracle=(
        "SELECT doc_id, "
        f"CAST({T.quality_clf_logit_sql('text')} AS DOUBLE) AS logit, "
        f"({T.quality_clf_logit_sql('text')}) >= 0 AS quality_pass "
        "FROM documents ORDER BY doc_id"
    ),
    tags=("llm", "text", "pipeline"),
)
def curation_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scores for every document: exact
    decimal dot product of token-length-bucket counts with literal
    weights (``functions/text.py`` — the weights fold into codegen, so
    this is a broadcast-free map stage), logit cast to double, pass
    decided ON THE DECIMAL so the cut is bit-exact across engines."""
    docs = load_table(spark, sf_dir, "documents")
    logit = T.quality_clf_logit("text")
    return docs.select(
        "doc_id",
        logit.cast("double").alias("logit"),
        (logit >= 0).alias("quality_pass"),
    ).orderBy("doc_id")


@register(
    "curation_corpus_pipeline_scored",
    oracle=(
        "WITH t AS (SELECT doc_id, text, lang, source, "
        f"{T.QUALITY_COLS_SQL}, md5(text) AS fp, "
        f"({T.quality_clf_logit_sql('text')}) AS logit "
        "FROM documents), "
        f"q AS (SELECT * FROM t WHERE ({T.QUALITY_WHERE_SQL}) "
        "AND logit >= 0), "
        "d AS (SELECT * FROM (SELECT q.*, row_number() OVER "
        "(PARTITION BY fp ORDER BY doc_id) AS rn FROM q) WHERE rn = 1) "
        "SELECT source, lang, count(*) AS n_docs, "
        "CAST(SUM(n_tok) AS BIGINT) AS total_tokens, "
        "CAST(SUM(length(text)) AS BIGINT) AS total_chars "
        "FROM d GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("llm", "pipeline", "dedup", "text"),
)
def curation_corpus_pipeline_scored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The corpus pipeline with the classifier stage enabled — proves
    the scoring pass composes into the curation chain without adding
    an exchange (the flag only strengthens the gate predicate)."""
    return _corpus_pipeline(
        load_table(spark, sf_dir, "documents"), with_classifier=True
    )


@register(
    "sketch_distinct_users",
    oracle=(
        "SELECT event_type, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
        "TRUE AS hll_partition_invariant_ok, TRUE AS hll_in_bound_ok "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("sketch", "approx", "agg", "checked"),
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per event type
    (``approx_count_distinct``, rsd 1%), hash-gated (round 12; was
    rows-only) with TWO pinned contracts next to the exact count:

    - ``hll_partition_invariant_ok`` — the estimate from the table
      as-stored equals the estimate after ``repartition(7, user_id)``.
      HLL merge is register-wise max (commutative, associative,
      idempotent), so the estimate is a pure function of the VALUE SET
      — independent of partitioning, ordering, and duplication. This
      is the property that makes the sketch safe to pre-aggregate per
      partition at 100 TB, and it is a theorem, not a measured bound.
    - ``hll_in_bound_ok`` — |estimate − exact| ≤ max(5, 5% · exact)
      (≈5σ at rsd 1%; same slack tests/test_sketches.py uses).

    The oracle recomputes the exact count and pins both booleans TRUE.
    Fixed-size sketch per group merges associatively across
    partitions — at 100 TB the exchange carries a few KB per group
    where exact COUNT(DISTINCT) shuffles every distinct value."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_a"),
    )
    reparted = (
        ev.repartition(7, "user_id")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("_b"))
    )
    return (
        base.join(reparted, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.col("_a") == F.col("_b")).alias("hll_partition_invariant_ok"),
            (
                F.abs(F.col("_a") - F.col("exact_users"))
                <= F.greatest(F.lit(5.0), F.col("exact_users") * F.lit(0.05))
            ).alias("hll_in_bound_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_value_quantiles",
    oracle=(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "TRUE AS quantiles_monotone_ok, TRUE AS quantiles_are_elements_ok "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("sketch", "approx", "agg", "checked"),
)
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantile sketch of event value per type
    (``percentile_approx``, accuracy 10000), hash-gated (round 12;
    was rows-only — the raw array column also crashed the driver's
    pandas canonicalizer). Two pinned THEOREM contracts ride next to
    the exact group count:

    - ``quantiles_monotone_ok`` — p50 ≤ p90 ≤ p99. The sketch answers
      all three queries from one summary, so monotonicity in the
      quantile argument is structural.
    - ``quantiles_are_elements_ok`` — each estimate is an actual
      element of the group's value set: Spark's ApproximatePercentile
      (Greenwald–Khanna) stores and returns input samples, never
      interpolated values, so bit-exact membership is guaranteed.

    (The rank-error contract — the harder, accuracy-side guarantee —
    is gated separately in ``sketch_quantiles_checked``.) Like the HLL
    entry, the sketch is mergeable: quantiles of 100 TB without
    sorting or shuffling raw values. Membership is verified with one
    broadcast of the |types|×3 estimates back onto the scan."""
    ev = load_table(spark, sf_dir, "events")
    est = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("_q"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "n",
            F.element_at("_q", 1).alias("_p50"),
            F.element_at("_q", 2).alias("_p90"),
            F.element_at("_q", 3).alias("_p99"),
        )
    )
    member = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            (
                (F.max(F.when(F.col("value") == F.col("_p50"), 1).otherwise(0)) == 1)
                & (F.max(F.when(F.col("value") == F.col("_p90"), 1).otherwise(0)) == 1)
                & (F.max(F.when(F.col("value") == F.col("_p99"), 1).otherwise(0)) == 1)
            ).alias("quantiles_are_elements_ok")
        )
    )
    # NULL-safe: percentile_approx ignores NULL values, so a group
    # whose values are all NULL yields NULL estimates — both theorems
    # are then vacuously true, not false/NULL (keeps the pinned-TRUE
    # booleans unconditional rather than corpus-dependent).
    no_values = F.col("_p50").isNull()
    return (
        est.join(member, "event_type")
        .select(
            "event_type",
            "n",
            F.when(no_values, F.lit(True))
            .otherwise(
                (F.col("_p50") <= F.col("_p90")) & (F.col("_p90") <= F.col("_p99"))
            )
            .alias("quantiles_monotone_ok"),
            F.when(no_values, F.lit(True))
            .otherwise(F.col("quantiles_are_elements_ok"))
            .alias("quantiles_are_elements_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "profile_documents_table",
    oracle=(
        "SELECT count(*) AS n_rows, "
        "CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        "  AS n_text_null, "
        "count(DISTINCT lang) AS n_lang, "
        "count(DISTINCT source) AS n_source, "
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, "
        "CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars "
        "FROM documents"
    ),
    tags=("llm", "curation", "profiling"),
)
def profile_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile — row count, null counts, exact distinct
    cardinalities of the low-cardinality columns, numeric min/max/sum:
    the data-quality report a pipeline emits before admitting a crawl
    snapshot.

    All aggregates are algebraic or low-cardinality-exact, so the map
    side collapses each partition to one row and the single-partition
    final agg merges |partitions| rows. Exact ``count(DISTINCT)`` is
    deliberate for the enum-like columns (lang, source); for
    unbounded-cardinality columns the HLL form in
    ``sketch_distinct_users`` is the scale path.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias(
            "n_text_null"
        ),
        F.countDistinct("lang").alias("n_lang"),
        F.countDistinct("source").alias("n_source"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
    )


@register(
    "heavy_hitters_misra_gries",
    oracle=(
        "WITH tot AS (SELECT count(*) AS n FROM events), "
        "c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) "
        "SELECT user_id, n_events FROM c, tot "
        "WHERE n_events >= 0.0075 * tot.n ORDER BY 1"
    ),
    tags=("sketch", "heavy-hitters", "llm"),
)
def heavy_hitters_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (users with >= 0.75% of all events) via
    mergeable Misra-Gries summaries + an exact recheck of the
    surviving candidates (operators/sketches.py).

    Identical output to the plain ``GROUP BY ... HAVING`` oracle, but
    the first pass's exchange is bounded by the summary size (k=256
    entries per Arrow batch) instead of the distinct-key count, and
    the second pass aggregates only candidate-matching rows — the
    shape that survives billions of distinct keys (URLs, hosts,
    n-grams) at 100 TB, where the exact aggregate's key-wide shuffle
    is the bottleneck. The candidate superset is provable (MG never
    undercounts by more than the summed batch cuts), so exactness
    doesn't depend on batching or partition boundaries.
    """
    from ..operators.sketches import heavy_hitters_exact

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_exact(ev, "user_id", fraction=0.0075, k=256).orderBy(
        "user_id"
    )


@register(
    "sketch_point_freq_cms",
    oracle=(
        "WITH probes AS (SELECT CAST(range AS BIGINT) AS user_id "
        "                FROM range(0, 20)), "
        "c AS (SELECT user_id, COUNT(*) AS n FROM events "
        "      WHERE user_id BETWEEN 0 AND 19 GROUP BY 1) "
        "SELECT p.user_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS exact_cnt, "
        "TRUE AS cms_never_undercounts_ok "
        "FROM probes p LEFT JOIN c USING (user_id) ORDER BY p.user_id"
    ),
    tags=("sketch", "approx", "agg", "checked"),
)
def sketch_point_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point-frequency estimates for a fixed probe
    set (user_ids 0-19) — the third mergeable sketch next to the HLL
    and quantile entries. Hash-gated (round 12; was rows-only —
    estimates depend on xxhash64, which the SQL oracle can't
    reproduce, so the exact counts are the payload and the sketch's
    ONE-SIDED THEOREM is the pinned boolean):
    ``cms_never_undercounts_ok`` — estimate ≥ exact count, with ZERO
    slack. Every CMS cell a key hashes to holds that key's count plus
    non-negative collision mass, so the row-wise minimum can only
    overcount (Cormode & Muthukrishnan '05). The probabilistic
    overcount bound (which needs measured slack) is gated separately
    in ``sketch_cms_freq_checked``. The cell table (5 x 4096) is the
    ONLY thing the exchange carries at 100 TB."""
    from ..operators.sketches import cms_cells, cms_point_estimates

    ev = load_table(spark, sf_dir, "events")
    cells = cms_cells(ev, "user_id", depth=5, width=4096)
    probes = spark.range(0, 20).select(F.col("id").alias("user_id"))
    est = cms_point_estimates(cells, probes, "user_id", depth=5, width=4096)
    exact = (
        ev.filter(F.col("user_id").between(0, 19))
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return (
        est.join(exact, "user_id", "left")
        .fillna(0, subset=["exact_cnt"])
        .select(
            "user_id",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias(
                "cms_never_undercounts_ok"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "sketch_hll_union_daily",
    oracle=(
        "WITH d AS (SELECT CAST(EXTRACT(day FROM ts) AS INT) AS d, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users "
        "FROM events GROUP BY 1), "
        "t AS (SELECT CAST(NULL AS INT) AS d, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users "
        "FROM events) "
        "SELECT d, exact_users, TRUE AS hll_in_bound_ok "
        "FROM (SELECT * FROM d UNION ALL SELECT * FROM t) "
        "ORDER BY d NULLS LAST"
    ),
    tags=("sketch", "approx", "mergeable", "checked"),
)
def sketch_hll_union_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL as a PERSISTABLE, mergeable aggregate
    (``hll_sketch_agg`` / ``hll_union_agg`` — unlike
    approx_count_distinct, the sketch itself is a first-class binary
    you can store): per-day distinct-user sketches, plus their union
    rolled up to the whole table (day NULL). This is the "sketch
    warehouse" pattern — keep one KB-sized sketch per day/partition,
    answer any date-range distinct query by unioning sketches, never
    rescan raw data. Union is register-max: commutative, associative,
    partitioning-independent.

    Hash-gated (round 12; was rows-only): each row carries the EXACT
    distinct count (per day, and whole-table for the union row) plus
    ``hll_in_bound_ok`` = |estimate − exact| ≤ max(5, 5% · exact)
    (the datasketches default lgK=12 gives rsd ≈1.6%, so 5% is ≈3σ;
    same slack tests/test_sketches.py measures). Crucially the union
    row's estimate comes FROM THE MERGED SKETCH, not a rescan — so
    the gate certifies ``hll_union_agg`` itself, where
    ``sketch_distinct_users`` certifies ``approx_count_distinct``.
    Persistence round-trip (store per-day sketches in parquet, read
    back, union) is asserted in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    bound = lambda est, exact: F.abs(est - exact) <= F.greatest(  # noqa: E731
        F.lit(5.0), exact * F.lit(0.05)
    )
    day = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    daily = day.select(
        "d",
        "exact_users",
        bound(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "hll_in_bound_ok"
        ),
    )
    exact_total = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    total = (
        day.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(exact_total))
        .select(
            F.lit(None).cast("int").alias("d"),
            "exact_users",
            bound(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
                "hll_in_bound_ok"
            ),
        )
    )
    return daily.unionByName(total).orderBy(F.col("d").asc_nulls_last())


@register(
    "sketch_approx_topk_types",
    oracle=(
        "SELECT event_type AS item, count(*) AS cnt FROM events "
        "GROUP BY 1 ORDER BY cnt DESC, item LIMIT 3"
    ),
    tags=("sketch", "topk"),
)
def sketch_approx_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (frequent-items sketch) over event_type,
    exploded to (item, cnt) rows. With cardinality far below the
    sketch's tracked-item capacity the counts are EXACT, which is what
    makes this oracle-checkable; past capacity it degrades to
    bounded-error heavy hitters — the one-expression cousin of the
    Misra-Gries operator (which this repo uses when exactness at scale
    is required). The sketch is a partial aggregate: one row per
    partition crosses the wire."""
    ev = load_table(spark, sf_dir, "events")
    topk = ev.select(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
        .orderBy(F.desc("cnt"), "item")
    )


@register(
    "dq_validate_events",
    oracle=(
        "WITH s AS (SELECT "
        "CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS nn_ts, "
        "CAST(SUM(CASE WHEN value IS NULL OR value < 0 OR value > 1000 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS rng_value, "
        "CAST(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN "
        "('click','view','purchase','signup','error') THEN 1 ELSE 0 END) "
        "AS BIGINT) AS set_type, "
        "CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) "
        "AS uniq_id FROM events) "
        "SELECT rule, violations, CAST(violations = 0 AS INT) AS ok FROM ("
        "SELECT 'not_null:ts' AS rule, nn_ts AS violations FROM s "
        "UNION ALL SELECT 'in_range:value', rng_value FROM s "
        "UNION ALL SELECT 'in_set:event_type', set_type FROM s "
        "UNION ALL SELECT 'unique:event_id', uniq_id FROM s"
        ") t ORDER BY rule"
    ),
    tags=("quality", "validation", "curation"),
)
def dq_validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative admission gate over the events table
    (operators/expectations.py): null / range / enum / uniqueness
    expectations compiled into one conditional-count pass (plus one
    distinct branch for uniqueness) and reported per rule. The
    data-as-rules front door the reference's silently-null-filling
    ingest lacks; at 100 TB the scalar report costs one scan
    regardless of rule count."""
    from ..operators.expectations import Rule, validate

    ev = load_table(spark, sf_dir, "events")
    rules = [
        Rule("not_null", "ts"),
        Rule("in_range", "value", lo=0.0, hi=1000.0),
        Rule(
            "in_set",
            "event_type",
            values=("click", "view", "purchase", "signup", "error"),
        ),
        Rule("unique", "event_id"),
    ]
    return validate(ev, rules).orderBy("rule")


@register(
    "bitmap_distinct_users_daily",
    oracle=(
        "SELECT CAST(day(ts) AS INT) AS d, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events "
        "GROUP BY 1 "
        "UNION ALL "
        "SELECT CAST(NULL AS INT) AS d, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events "
        "ORDER BY d NULLS LAST"
    ),
    tags=("bitmap", "distinct", "mergeable"),
)
def bitmap_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable roaring-style bitmaps
    (``bitmap_construct_agg`` over (bucket, position) decomposition):
    per-day distinct users, plus the whole-table distinct computed by
    OR-merging the per-day bitmaps — NOT by rescanning.

    This is the segment-analytics middle ground between exact
    COUNT(DISTINCT) (shuffles every value, not mergeable across
    precomputed partitions) and HLL (mergeable but approximate):
    bitmaps are both mergeable AND exact, at a cost linear in the id
    range per bucket. The oracle re-derives both levels with plain
    COUNT DISTINCT — equality IS the exactness proof, driver-hashed.
    At 100 TB: a bitmap per (day, bucket) is the stored aggregate;
    any date-range distinct query is a bitmap OR, the same pattern
    as the HLL sketch-warehouse entry but with zero error."""
    ev = load_table(spark, sf_dir, "events")
    day_bm = ev.groupBy(
        F.dayofmonth("ts").alias("d"),
        F.bitmap_bucket_number("user_id").alias("b"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    daily = (
        day_bm.select("d", F.bitmap_count("bm").alias("n"))
        .groupBy("d")
        .agg(F.sum("n").alias("n_users"))
    )
    total = (
        day_bm.groupBy("b")
        .agg(F.bitmap_count(F.bitmap_or_agg("bm")).alias("n"))
        .agg(
            F.lit(None).cast("int").alias("d"),
            F.sum("n").alias("n_users"),
        )
    )
    return daily.unionByName(total).orderBy(F.col("d").asc_nulls_last())


@register(
    "sketch_histogram_numeric",
    oracle=(
        "SELECT event_type, CAST(COUNT(value) AS BIGINT) AS n, "
        "MIN(value) AS min_v, MAX(value) AS max_v, "
        "TRUE AS weights_sum_ok, TRUE AS centroids_in_range_ok, "
        "TRUE AS bins_sorted_ok "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("sketch", "approx", "histogram", "checked"),
)
def sketch_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``histogram_numeric``: the streaming mergeable equi-height
    histogram sketch (Ben-Haim & Tom-Tov's decision-tree histogram) —
    per event type, 5 (centroid, weight) bins over value. Completes
    the sketch family's distribution summary next to the quantile
    sketch: fixed-size, mergeable, one pass.

    Hash-gated (round 12; was rows-only — bin centroids are sketch-
    AND-partitioning-defined, and the raw array column also crashed
    the driver's pandas canonicalizer). The exact group stats (count,
    min, max) are the payload; three STRUCTURAL THEOREMS of the BHTT
    histogram ride as pinned booleans, all partitioning-independent
    even though the centroids themselves are not:

    - ``weights_sum_ok`` — Σ weights == row count (every point
      contributes weight exactly 1; bin merges sum weights).
    - ``centroids_in_range_ok`` — every centroid is a weighted mean
      of input values, so it lies in [min, max]; weights positive.
    - ``bins_sorted_ok`` — centroids ascend (the sketch keeps bins
      ordered by x; merges preserve order).

    All three checks are SQL lambda functions over the bins array —
    no Python, no extra shuffle beyond the one groupBy."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__hist_ev")
    return spark.sql(
        # COUNT(value), not COUNT(*): histogram_numeric ignores NULL
        # values, so the weights-sum theorem must count non-null rows
        # or a NULL value would flip the pinned-TRUE boolean.
        "WITH g AS (SELECT event_type, histogram_numeric(value, 5) AS bins, "
        "COUNT(value) AS n, MIN(value) AS min_v, MAX(value) AS max_v "
        "FROM __hist_ev GROUP BY event_type) "
        "SELECT event_type, n, min_v, max_v, "
        "abs(aggregate(bins, CAST(0.0 AS DOUBLE), "
        "    (acc, b) -> acc + CAST(b.y AS DOUBLE)) - CAST(n AS DOUBLE)) "
        "  < 1e-6 AS weights_sum_ok, "
        "forall(bins, b -> b.x >= min_v AND b.x <= max_v AND b.y > 0) "
        "  AS centroids_in_range_ok, "
        "aggregate(bins, "
        "  named_struct('prev', CAST('-Infinity' AS DOUBLE), 'ok', true), "
        "  (acc, b) -> named_struct('prev', CAST(b.x AS DOUBLE), "
        "              'ok', acc.ok AND b.x >= acc.prev), "
        "  acc -> acc.ok) AS bins_sorted_ok "
        "FROM g ORDER BY event_type"
    )


# ---------------------------------------------------------------------------
# Bound-gated sketch entries (round 5).
#
# The rows-only sketch entries above cannot hash-match a SQL oracle
# (the estimates are implementation-defined), but their *accuracy
# contracts* are SQL-expressible: emit the EXACT statistic (hash-
# checkable) plus a boolean asserting the sketch landed inside its
# published error bound, and let the oracle emit the same exact
# statistic with a literal TRUE. The driver's hash gate then fails
# if either the exact arithmetic drifts OR the sketch violates its
# bound — promoting the sketch family from rows-only to hard-gated.
# ---------------------------------------------------------------------------


@register(
    "sketch_hll_distinct_checked",
    oracle=(
        "SELECT event_type, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
        "TRUE AS hll_ok "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("sketch", "approx", "agg", "checked"),
)
def sketch_hll_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-count with its error bound promoted into the
    driver hash gate: per event type, the EXACT distinct-user count
    plus ``hll_ok`` = |HLL(rsd=1%) - exact| <= max(5, 5% of exact)
    (the same bound tests/test_sketches.py asserts). The oracle
    recomputes the exact count and emits TRUE — so the row hash fails
    if the sketch ever leaves its bound. Both aggregates share one
    shuffle on event_type; at 100 TB you'd drop the exact branch and
    keep the sketch, which is the point being certified."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.greatest(
                    F.lit(5.0), F.col("exact_users") * F.lit(0.05)
                )
            ).alias("hll_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_cms_freq_checked",
    oracle=(
        "WITH probes AS (SELECT CAST(range AS BIGINT) AS user_id "
        "                FROM range(0, 20)), "
        "c AS (SELECT user_id, COUNT(*) AS n FROM events "
        "      WHERE user_id BETWEEN 0 AND 19 GROUP BY 1) "
        "SELECT p.user_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS exact_cnt, "
        "TRUE AS cms_ok "
        "FROM probes p LEFT JOIN c USING (user_id) ORDER BY p.user_id"
    ),
    tags=("sketch", "approx", "checked"),
)
def sketch_cms_freq_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point-frequency estimates with the CMS guarantee in
    the hash gate: for probe keys 0-19, the EXACT event count plus
    ``cms_ok`` = (estimate never undercounts) AND (overcount <=
    max(5 * e*N/width, 3) — 5x the expected-value bound of Cormode &
    Muthukrishnan '05, the slack tests/test_sketches.py uses on this
    deterministic data). N (total rows) rides a 1-row broadcast
    scalar attach; the cell table itself is the only sketch-sized
    exchange."""
    import math

    from ..operators.sketches import cms_cells, cms_point_estimates

    depth, width = 5, 4096
    ev = load_table(spark, sf_dir, "events")
    cells = cms_cells(ev, "user_id", depth=depth, width=width)
    probes = spark.range(0, 20).select(F.col("id").alias("user_id"))
    est = cms_point_estimates(
        cells, probes, "user_id", depth=depth, width=width
    )
    exact = (
        ev.filter(F.col("user_id").between(0, 19))
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    total = ev.agg(F.count("*").alias("_n"))
    return (
        est.join(exact, "user_id", "left")
        .fillna(0, subset=["exact_cnt"])
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "exact_cnt",
            (
                (F.col("est") >= F.col("exact_cnt"))
                & (
                    F.col("est") - F.col("exact_cnt")
                    <= F.greatest(
                        F.lit(5.0 * math.e) * F.col("_n") / F.lit(width),
                        F.lit(3.0),
                    )
                )
            ).alias("cms_ok"),
        )
        .orderBy("user_id")
    )


@register(
    "sketch_quantiles_checked",
    oracle=(
        "SELECT event_type, q, CAST(COUNT(*) AS BIGINT) AS n, "
        "TRUE AS rank_ok "
        "FROM events CROSS JOIN "
        "  (SELECT UNNEST(['p50', 'p90', 'p99']) AS q) qs "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("sketch", "approx", "checked"),
)
def sketch_quantiles_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile sketch with its rank-error contract in
    the hash gate. ``percentile_approx(value, q, acc)`` guarantees the
    returned element's rank is within n/acc of ceil(q*n); the check
    brackets the estimate's rank — count(value < est) <= q*n + tol
    and count(value <= est) >= q*n - tol, tol = n/acc + 1 — per
    (event_type, quantile), and the oracle emits the exact group
    counts with literal TRUE. The estimate rows (|types| x 3) are
    broadcast back onto the events scan, so the verify pass costs one
    extra aggregation shuffle on (event_type, q)."""
    acc = 10000
    ev = load_table(spark, sf_dir, "events")
    est = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], acc).alias("_e")
        )
        .select(
            "event_type",
            F.explode(
                F.arrays_zip(
                    F.array(F.lit("p50"), F.lit("p90"), F.lit("p99")).alias(
                        "q"
                    ),
                    F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)).alias(
                        "frac"
                    ),
                    F.col("_e").alias("est"),
                )
            ).alias("z"),
        )
        .select("event_type", "z.q", "z.frac", "z.est")
    )
    joined = ev.join(F.broadcast(est), "event_type")
    tol = F.col("n") / F.lit(acc) + F.lit(1.0)
    target = F.col("frac") * F.col("n")
    return (
        joined.groupBy("event_type", "q")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") < F.col("est"), 1).otherwise(0)).alias(
                "_lt"
            ),
            F.sum(
                F.when(F.col("value") <= F.col("est"), 1).otherwise(0)
            ).alias("_le"),
            F.first("frac").alias("frac"),
        )
        .select(
            "event_type",
            "q",
            "n",
            (
                (F.col("_lt") <= target + tol)
                & (F.col("_le") >= target - tol)
            ).alias("rank_ok"),
        )
        .orderBy("event_type", "q")
    )


@register(
    "sketch_hll_union_checked",
    oracle=(
        "SELECT CAST(day(ts) AS INT) AS d, "
        "       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
        "       TRUE AS hll_ok "
        "FROM events GROUP BY 1 "
        "UNION ALL "
        "SELECT CAST(NULL AS INT), "
        "       CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE "
        "FROM events "
        "ORDER BY d NULLS LAST"
    ),
    tags=("sketch", "approx", "mergeable", "checked"),
)
def sketch_hll_union_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistable-HLL 'sketch warehouse' pattern under the hash
    gate: per-day exact distinct users + the whole-table rollup (day
    NULL), each with ``hll_ok`` asserting the datasketches estimate —
    per-day from ``hll_sketch_agg``, total from ``hll_union_agg`` over
    the daily sketches — lands within max(5, 5% of exact). The union
    bound is the one that certifies the pattern: answering the total
    from MERGED daily sketches (never rescanning raw data) must stay
    in-bound, which is exactly what lets a 100 TB warehouse keep one
    KB sketch per partition and answer any date-range distinct query
    by register-max union."""
    ev = load_table(spark, sf_dir, "events")

    def ok(est: F.Column, exact: F.Column) -> F.Column:
        return F.abs(est - exact) <= F.greatest(
            F.lit(5.0), exact * F.lit(0.05)
        )

    day = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    daily = day.select(
        "d",
        "exact_users",
        ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias("hll_ok"),
    )
    total_exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    total = (
        day.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(total_exact))
        .select(
            F.lit(None).cast("int").alias("d"),
            "exact_users",
            ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
                "hll_ok"
            ),
        )
    )
    return daily.unionByName(total).orderBy(F.col("d").asc_nulls_last())


@register(
    "sketch_histogram_checked",
    oracle=(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "MIN(value) AS min_v, MAX(value) AS max_v, TRUE AS hist_ok "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("sketch", "approx", "histogram", "checked"),
)
def sketch_histogram_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi-height histogram sketch (`histogram_numeric`, Ben-Haim
    & Tom-Tov) with its invariants promoted into the driver hash gate.
    Bin centroids are sketch-defined (merge-order dependent), so the
    hashed payload is the EXACT per-type row count and value min/max
    (raw column doubles — no arithmetic, bit-identical across
    engines), plus ``hist_ok`` asserting the sketch's hard contract:
    ≤ 5 bins, every weight positive, weights summing exactly to the
    row count (bins partition the input), and every centroid inside
    [min, max] (centroids are weighted means of member values). The
    oracle recomputes the exact statistics and emits TRUE, so the
    hash fails if the exact arithmetic drifts OR the sketch violates
    its contract. One shuffle: the sketch aggregates in the same
    groupBy as the exact stats."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__histchk_ev")
    return spark.sql(
        "SELECT event_type, n_rows, min_v, max_v, "
        "  size(bins) <= 5 "
        "  AND aggregate(bins, CAST(0.0 AS DOUBLE), (a, b) -> a + b.y)"
        "      = CAST(n_rows AS DOUBLE) "
        "  AND forall(bins, b -> b.y > 0) "
        "  AND forall(bins, b -> b.x >= min_v AND b.x <= max_v) "
        "  AS hist_ok "
        "FROM ("
        "  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "         MIN(value) AS min_v, MAX(value) AS max_v, "
        "         histogram_numeric(value, 5) AS bins "
        "  FROM __histchk_ev GROUP BY event_type) "
        "ORDER BY event_type"
    )


@register(
    "quality_median_by_source",
    oracle=(
        "WITH s AS (SELECT source, doc_id, "
        f"{T.quality_clf_logit_sql('text')} AS score FROM documents), "
        "r AS (SELECT source, doc_id, score, "
        "row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn, "
        "count(*) OVER (PARTITION BY source) AS n FROM s), "
        "med AS (SELECT source, n AS n_docs, score AS m FROM r "
        "WHERE rn = (n + 1) // 2), "
        "ref AS (SELECT m AS ref FROM (SELECT m, source, "
        "row_number() OVER (ORDER BY m, source) AS rk, "
        "count(*) OVER () AS k FROM med) WHERE rk = (k + 1) // 2) "
        "SELECT source, n_docs, CAST(m AS DOUBLE) AS median_logit, "
        "CAST(m - ref AS DOUBLE) AS calibration_gap "
        "FROM med, ref ORDER BY source"
    ),
    tags=("llm", "text", "pipeline"),
)
def quality_median_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality calibration: the exact (lower) median
    classifier logit of each source, and its gap to the median of
    source medians. A source whose gap is strongly negative is being
    scored systematically lower than its peers — the signal that the
    quality cut needs per-source calibration before it silently
    deletes an entire source (the classic fastText-filter failure on
    out-of-domain-but-good text).

    Determinism: the median is picked by row_number over the exact
    DECIMAL score with doc_id tie-break — no percentile interpolation,
    no floats until the final cast, so the gap is decimal-exact
    cross-engine. Scale shape: one window per source partition
    (rank + count in a single pass), then the \\|sources\\|-row median
    table feeds a bounded window for the reference; the corpus shuffles
    exactly once, on source."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "source", "doc_id", T.quality_clf_logit("text").alias("score")
    )
    wsrc = Window.partitionBy("source").orderBy("score", "doc_id")
    r = s.select(
        "source",
        "score",
        F.row_number().over(wsrc).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    med = r.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "source", F.col("n").alias("n_docs"), F.col("score").alias("m")
    )
    wref = Window.orderBy("m", "source")
    ref = (
        med.select(
            "m",
            F.row_number().over(wref).alias("rk"),
            F.count("*").over(
                Window.partitionBy()
            ).alias("k"),
        )
        .filter(F.col("rk") == F.expr("(k + 1) div 2"))
        .select(F.col("m").alias("ref"))
    )
    return (
        med.crossJoin(F.broadcast(ref))
        .select(
            "source",
            "n_docs",
            F.col("m").cast("double").alias("median_logit"),
            (F.col("m") - F.col("ref")).cast("double").alias("calibration_gap"),
        )
        .orderBy("source")
    )


@register(
    "curation_gate_bitmask",
    oracle=(
        "WITH t AS (SELECT doc_id, text, "
        f"{T.QUALITY_COLS_SQL}, md5(text) AS fp, "
        f"({T.quality_clf_logit_sql('text')}) >= 0 AS clf "
        "FROM documents), "
        "r AS (SELECT *, row_number() OVER "
        "(PARTITION BY fp ORDER BY doc_id) AS rn FROM t), "
        "bits AS (SELECT doc_id, "
        f"CAST(n_tok >= {T.QUALITY_MIN_TOKENS} AS INT) AS b_len, "
        "CAST((CASE WHEN n_tok > 0 THEN sw_hits / n_tok ELSE 0.0 END) "
        f">= {T.QUALITY_MIN_STOPWORD_RATIO} AS INT) AS b_sw, "
        "CAST((CASE WHEN nonspace > 0 THEN punct / nonspace "
        f"ELSE 0.0 END) <= {T.QUALITY_MAX_PUNCT_RATIO} AS INT) AS b_punct, "
        "CAST(rn = 1 AS INT) AS b_canon, "
        "CAST(clf AS INT) AS b_clf FROM r) "
        "SELECT doc_id, "
        "CAST(b_len + 2 * b_sw + 4 * b_punct + 8 * b_canon "
        "+ 16 * b_clf AS BIGINT) AS gate_mask, "
        "b_len + b_sw + b_punct + b_canon = 4 AS keep "
        "FROM bits ORDER BY doc_id"
    ),
    tags=("llm", "pipeline", "governance", "lineage"),
)
def curation_gate_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation lineage: instead of silently dropping
    rows, emit EVERY document with a bitmask of which gates it
    passed — length (bit 0), stopword ratio (1), punctuation ratio
    (2), dedup-canonical (3), linear classifier (4, advisory) — and
    the ``keep`` verdict (bits 0-3, exactly
    ``curation_corpus_pipeline``'s survivor set).  This is the audit
    artifact a governed corpus build ships next to the corpus: every
    exclusion is attributable to a specific gate, filter-rates are
    one GROUP BY over the mask away, and gate changes diff row-by-row
    between builds.

    Ratio bits mirror the Spark functions' empty-input guards (the
    bare pipeline never evaluates ratios on zero-token docs because
    the length gate short-circuits; the bitmask evaluates every bit
    on every doc, so the guards matter here).  Plan: one scan with
    pure-expression bits + the fingerprint window — the same single
    shuffle as the pipeline, output one row per input document."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy("doc_id")
    r = docs.select(
        "doc_id",
        T.token_count("text").alias("n_tok"),
        T.stopword_ratio("text", T.LANG_STOPWORDS["en"]).alias("sw_ratio"),
        T.punctuation_ratio("text").alias("p_ratio"),
        T.fingerprint_md5("text").alias("fp"),
        (T.quality_clf_logit("text") >= 0).alias("clf"),
    ).withColumn("rn", F.row_number().over(w))
    b_len = (F.col("n_tok") >= T.QUALITY_MIN_TOKENS).cast("int")
    b_sw = (F.col("sw_ratio") >= T.QUALITY_MIN_STOPWORD_RATIO).cast("int")
    b_punct = (F.col("p_ratio") <= T.QUALITY_MAX_PUNCT_RATIO).cast("int")
    b_canon = (F.col("rn") == 1).cast("int")
    b_clf = F.col("clf").cast("int")
    return r.select(
        "doc_id",
        (b_len + 2 * b_sw + 4 * b_punct + 8 * b_canon + 16 * b_clf)
        .cast("long")
        .alias("gate_mask"),
        (b_len + b_sw + b_punct + b_canon == 4).alias("keep"),
    ).orderBy("doc_id")


_BLOCKLIST = ("hash join", "merge join", "slow query", "table scan")


@register(
    "blocklist_phrase_audit",
    oracle=(
        "WITH p AS (SELECT unnest(["
        + ", ".join(f"'{x}'" for x in _BLOCKLIST)
        + "]) AS phrase), "
        "j AS (SELECT phrase, CAST(contains(text, phrase) AS INT) AS hit, "
        "len(regexp_extract_all(text, phrase)) AS occ "
        "FROM documents CROSS JOIN p), "
        "tot AS (SELECT count(*) AS n_total FROM documents) "
        "SELECT phrase, CAST(SUM(hit) AS BIGINT) AS n_docs, "
        "CAST(SUM(occ) AS BIGINT) AS n_occurrences, "
        "round(SUM(hit) / CAST(n_total AS DOUBLE), 9) AS doc_rate "
        "FROM j CROSS JOIN tot GROUP BY phrase, n_total ORDER BY phrase"
    ),
    tags=("llm", "text", "governance", "filter"),
)
def blocklist_phrase_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-phrase blocklist audit — the measurement pass every
    corpus filter runs BEFORE enforcing a phrase blocklist (PII
    markers, banned boilerplate, license strings): per phrase, how
    many documents contain it, total occurrence count, and the
    document hit-rate the filter would remove.  Auditing before
    filtering is the governance discipline the gate-bitmask entry
    serves for the heuristic gates; this is its content-blocklist
    sibling.

    Plan: the phrase list is a tiny literal array exploded map-side
    against each document (|phrases|× narrow rows, no shuffle until
    the phrase-keyed aggregate — output bounded by the blocklist
    size).  Substring hits are codegen `contains`; occurrence counts
    are regexp_count on literal patterns.  At 100 TB a thousand-entry
    blocklist rides the same shape — the explode stays map-side and
    the aggregate stays |blocklist|-bounded; only a blocklist too big
    to broadcast would force the Aho-Corasick UDF variant."""
    docs = load_table(spark, sf_dir, "documents")
    p = F.explode(F.array(*[F.lit(x) for x in _BLOCKLIST])).alias("phrase")
    j = docs.select("text", p).select(
        "phrase",
        F.col("text").contains(F.col("phrase")).cast("int").alias("hit"),
        F.regexp_count("text", F.col("phrase")).alias("occ"),
    )
    tot = docs.agg(F.count("*").alias("n_total"))
    return (
        j.groupBy("phrase")
        .agg(
            F.sum("hit").cast("long").alias("n_docs"),
            F.sum("occ").cast("long").alias("n_occurrences"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "phrase",
            "n_docs",
            "n_occurrences",
            F.round(
                F.col("n_docs") / F.col("n_total").cast("double"), 9
            ).alias("doc_rate"),
        )
        .orderBy("phrase")
    )


@register(
    "quality_percentile_by_source",
    oracle=(
        "WITH s AS (SELECT source, doc_id, "
        f"{T.quality_clf_logit_sql('text')} AS score FROM documents "
        "WHERE doc_id % 10 = 0), "
        "r AS (SELECT source, doc_id, score, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY score, doc_id) AS rn, "
        "count(*) OVER (PARTITION BY source) AS n FROM s) "
        "SELECT source, doc_id, CAST(score AS DOUBLE) AS logit, "
        "CASE WHEN n > 1 THEN round(CAST(rn - 1 AS DOUBLE) / (n - 1), 9) "
        "ELSE 0.0 END AS pct_in_source "
        "FROM r ORDER BY source, doc_id"
    ),
    tags=("llm", "text", "quality", "normalization"),
)
def quality_percentile_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Within-source percentile normalization of the quality score —
    the mixing trick that makes quality cuts comparable ACROSS
    sources: a raw-logit threshold deletes whole sources whose score
    distribution sits low (what `quality_median_by_source` measures);
    ranking each doc within its own source and cutting on the
    percentile removes the same FRACTION everywhere.  Emitted over a
    deterministic doc_id subset so the per-doc output stays
    driver-comparable.

    Determinism: ranks order by the EXACT DECIMAL logit with doc_id
    tiebreak (no float comparison flakes), and the percentile
    (rn−1)/(n−1) is one IEEE division of exact integers.  Scale
    shape: one shuffle on source for the rank window — partitions
    bounded by source cardinality × docs-per-source, the same profile
    as every per-source aggregate in the curation family."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    s = docs.select(
        "source",
        "doc_id",
        T.quality_clf_logit("text").alias("score"),
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    wn = Window.partitionBy("source")
    r = s.select(
        "source",
        "doc_id",
        "score",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return r.select(
        "source",
        "doc_id",
        F.col("score").cast("double").alias("logit"),
        F.when(
            F.col("n") > 1,
            F.round(
                (F.col("rn") - 1).cast("double") / (F.col("n") - 1), 9
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("pct_in_source"),
    ).orderBy("source", "doc_id")


@register(
    "curation_calibration_bins",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        f"({T.quality_clf_logit_sql('text')}) AS logit, "
        "CAST(lang = 'en' AS INT) AS y FROM documents), "
        "b AS (SELECT logit, y, ntile(10) OVER "
        "(ORDER BY logit, doc_id) AS bin FROM t) "
        "SELECT CAST(bin AS INT) AS bin, count(*) AS n_docs, "
        "CAST(CAST(SUM(logit) AS DOUBLE) / count(*) AS DOUBLE) "
        "AS mean_logit, "
        "CAST(SUM(y) AS BIGINT) AS n_pos, "
        "CAST(SUM(y) AS DOUBLE) / count(*) AS frac_pos "
        "FROM b GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "quality", "pipeline", "eval"),
)
def curation_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins for the quality classifier — the calibration
    table ECE is read off of: documents sorted by classifier score
    into 10 equal-population bins, each reporting its mean score and
    the observed positive rate against a deterministic reference
    label (lang = 'en', the stand-in gold signal this synthetic
    corpus affords).  A classifier whose mean_logit ordering does not
    track frac_pos is miscalibrated and its `quality_pass` threshold
    is arbitrary — the check a score-gated curation pipeline owes its
    threshold.

    Exactness: the logit is the classifier's exact DECIMAL dot
    product, so bin assignment (ntile over logit, doc_id) is
    bit-identical across engines, per-bin logit sums are exact
    decimal, and both emitted rates are IEEE divisions.  Scale shape:
    the score pipelines with the scan; ntile costs one
    single-partition window over (logit, doc_id) pairs — swap in the
    two-level range-bucket rank (the spearman device) when the corpus
    outgrows one task, the bin ids are identical."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        T.quality_clf_logit("text").alias("logit"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    w = Window.orderBy("logit", "doc_id")
    b = t.select("logit", "y", F.ntile(10).over(w).alias("bin"))
    return (
        b.groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("logit").alias("slogit"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .select(
            "bin",
            "n_docs",
            (F.col("slogit").cast("double") / F.col("n_docs")).alias(
                "mean_logit"
            ),
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n_docs")).alias(
                "frac_pos"
            ),
        )
        .orderBy("bin")
    )


@register(
    "conformal_quality_threshold",
    oracle=(
        "WITH scored AS (SELECT doc_id, "
        f"{T.quality_clf_logit_sql('text')} AS score, "
        "list_reduce(list_transform(regexp_extract_all("
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '.'), "
        "c -> strpos('0123456789abcdef', c) - 1), "
        "(a, d) -> a * 16 + d) % 100 AS bucket FROM documents), "
        "calib AS (SELECT score, row_number() OVER "
        "(ORDER BY score, doc_id) AS rk FROM scored WHERE bucket < 50), "
        "nc AS (SELECT count(*) AS n_calib FROM calib), "
        "kk AS (SELECT greatest(CAST(floor((n_calib + 1) * 0.1) AS BIGINT), 1) "
        "AS k, CAST(n_calib AS BIGINT) AS n_calib FROM nc), "
        "thr AS (SELECT kk.k, kk.n_calib, c.score AS threshold "
        "FROM kk JOIN calib c ON c.rk = kk.k), "
        "test AS (SELECT CAST(count(*) AS BIGINT) AS n_test, "
        "CAST(SUM(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_kept "
        "FROM scored s, thr t WHERE s.bucket >= 50) "
        "SELECT n_calib, k, CAST(threshold AS DOUBLE) AS threshold, "
        "n_test, n_kept, "
        "CAST(n_kept AS DOUBLE) / CAST(n_test AS DOUBLE) AS coverage "
        "FROM thr, test"
    ),
    tags=("llm", "curation", "quality", "eval"),
)
def conformal_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal quality gating at alpha = 0.1: pick the cut
    threshold as the k-th SMALLEST calibration score with
    k = max(floor((n_calib + 1) * alpha), 1), so a fresh exchangeable
    document scores below the threshold with probability <= alpha —
    the finite-sample guarantee a plain empirical quantile lacks.
    Calibration/test split is the deterministic md5 hash bucket
    (50/50); the score is the exact-decimal linear quality logit, so
    the order statistic (ties broken by doc_id) is bit-identical
    cross-engine — no quantile interpolation convention needed at all.
    Emits the threshold plus the held-out coverage check (kept
    fraction ~ 1 - alpha).

    Scale shape: one scan scores + buckets (codegen). The k-th order
    statistic does NOT need the oracle's corpus-wide row_number: ties
    by doc_id cannot change its VALUE, so the engine aggregates to
    per-score counts first and runs the cumulative window over the
    bounded score GRID (the logit is integer features x literal
    weights — a finite value lattice; the drift_mann_whitney device),
    then picks the first score whose cumulative count reaches k. The
    single-task window sees |distinct scores| rows, never the corpus.
    The k-th pick and the two scalar aggregates are 1-row broadcasts."""
    from .sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        T.quality_clf_logit("text").alias("score"),
        hash_bucket("doc_id").alias("bucket"),
    )
    calib = scored.filter(F.col("bucket") < 50)
    g = calib.groupBy("score").agg(F.count("*").alias("c"))
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select("score", F.sum("c").over(w).alias("cum"))
    kk = calib.agg(
        F.greatest(
            F.floor((F.count("*") + 1) * 0.1).cast("long"), F.lit(1)
        ).alias("k"),
        F.count("*").cast("long").alias("n_calib"),
    )
    thr = (
        cum.join(F.broadcast(kk), cum.cum >= kk.k)
        .groupBy("n_calib", "k")
        .agg(F.min("score").cast("double").alias("threshold"))
    )
    test = scored.filter(F.col("bucket") >= 50).crossJoin(
        F.broadcast(thr)
    )
    return (
        test.agg(
            F.first("n_calib").alias("n_calib"),
            F.first("k").alias("k"),
            F.first("threshold").alias("threshold"),
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("score") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "n_calib",
            "k",
            "threshold",
            "n_test",
            "n_kept",
            (
                F.col("n_kept").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


def _hll_pair_overlap(ev, type_a: str, type_b: str):
    """One (type_a, type_b) row of sketch_join_cardinality_checked:
    exact distinct-key cardinalities + the HLL inclusion-exclusion
    intersection estimate's error bound as a boolean."""
    from pyspark.sql import functions as F

    def side(t, suffix):
        return ev.filter(F.col("event_type") == t).agg(
            F.hll_sketch_agg("user_id").alias(f"sk_{suffix}"),
            F.countDistinct("user_id").alias(f"exact_{suffix}"),
        )

    both = side(type_a, "a").crossJoin(F.broadcast(side(type_b, "b")))
    exact_union = (
        ev.filter(F.col("event_type").isin(type_a, type_b))
        .agg(F.countDistinct("user_id").alias("exact_union"))
    )
    exact_inter = (
        ev.filter(F.col("event_type") == type_a)
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == type_b).select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    est_inter = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    )
    return (
        both.crossJoin(F.broadcast(exact_union))
        .crossJoin(F.broadcast(exact_inter))
        .select(
            F.lit(type_a).alias("type_a"),
            F.lit(type_b).alias("type_b"),
            F.col("exact_a").cast("long").alias("exact_a"),
            F.col("exact_b").cast("long").alias("exact_b"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
            F.col("exact_union").cast("long").alias("exact_union"),
            (
                F.abs(est_inter - F.col("exact_inter"))
                <= F.greatest(
                    F.lit(10.0), F.col("exact_union") * F.lit(0.05)
                )
            ).alias("hll_inter_ok"),
        )
    )


def _overlap_oracle_row(a: str, b: str) -> str:
    def d(t):
        return (
            "SELECT DISTINCT user_id FROM events "
            f"WHERE event_type = '{t}'"
        )

    return (
        f"SELECT '{a}' AS type_a, '{b}' AS type_b, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ({d(a)})) AS exact_a, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ({d(b)})) AS exact_b, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ({d(a)} INTERSECT {d(b)}))"
        "  AS exact_inter, "
        "(SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events "
        f" WHERE event_type IN ('{a}', '{b}')) AS exact_union, "
        "TRUE AS hll_inter_ok"
    )


@register(
    "sketch_join_cardinality_checked",
    oracle=(
        _overlap_oracle_row("click", "purchase")
        + " UNION ALL "
        + _overlap_oracle_row("error", "signup")
        + " ORDER BY type_a"
    ),
    tags=("sketch", "approx", "join", "checked"),
)
def sketch_join_cardinality_checked(spark, sf_dir: str):
    """Distinct-key JOIN-SIZE estimation from mergeable sketches — the
    planner question ("how many keys do these two sides share?") that
    decides broadcast vs shuffle and sizes runtime bloom filters,
    answered WITHOUT rescanning either side: |A ∩ B| = est(A) +
    est(B) − est(A ∪ B), where the union sketch is a register-max
    merge of the two sides' persisted HLLs (the sketch-warehouse
    pattern `sketch_hll_union_checked` certifies). Payload: the exact
    cardinalities (DuckDB INTERSECT recomputes them) for two
    event-type key-set pairs, plus ``hll_inter_ok`` pinned TRUE:
    inclusion-exclusion error stays within max(10, 5% of the exact
    UNION size) — the union-relative bound is the honest one, since
    subtracting three estimates amplifies relative error on a small
    intersection (the reason planners treat sketch intersections as
    union-scale bounded, Datasketches' own guidance). lgK is Spark's
    default 12 (~1.6% per-sketch RSE), so the 5% union bound holds
    with wide margin on every SF; deterministic — Datasketches HLL is
    insertion-order independent."""
    from pyspark.sql import functions as F  # noqa: F401

    ev = load_table(spark, sf_dir, "events")
    return (
        _hll_pair_overlap(ev, "click", "purchase")
        .unionByName(_hll_pair_overlap(ev, "error", "signup"))
        .orderBy("type_a")
    )


_KMV_HASH_SQL = _kmv_hash_sql("CAST(event_id AS VARCHAR)")
_KMV_EST = (  # (k-1)/theta estimator with the small-set exact branch
    "CASE WHEN len({sk}) < 128 THEN CAST(len({sk}) AS DOUBLE) "
    "ELSE CAST(127 AS DOUBLE) * " + _KMV_SPACE_SQL + " / {th} END"
)
_KMV_TH = (
    "CASE WHEN len({sk}) >= 128 THEN CAST({sk}[128] AS DOUBLE) "
    "ELSE " + _KMV_SPACE_SQL + " END"
)


@register(
    "sketch_theta_setops_checked",
    oracle=(
        "WITH g AS ("
        "  SELECT event_id,"
        "         bool_or(event_type IN ('click','view')) AS in_a,"
        "         bool_or(event_type IN ('view','purchase')) AS in_b,"
        f"         {_KMV_HASH_SQL} AS h"
        "  FROM events GROUP BY event_id),"
        " ex AS (SELECT"
        "  CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS exact_a,"
        "  CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS exact_b,"
        "  CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS exact_intersect,"
        "  CAST(sum(CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS exact_a_not_b,"
        "  CAST(sum(CASE WHEN in_a OR in_b THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS exact_union"
        "  FROM g),"
        " ka AS (SELECT list(h ORDER BY h) AS kmv_a FROM"
        "   (SELECT h FROM g WHERE in_a ORDER BY h LIMIT 128)),"
        " kb AS (SELECT list(h ORDER BY h) AS kmv_b FROM"
        "   (SELECT h FROM g WHERE in_b ORDER BY h LIMIT 128)),"
        " s AS (SELECT *,"
        f"  {_KMV_TH.format(sk='kmv_a')} AS th_a,"
        f"  {_KMV_TH.format(sk='kmv_b')} AS th_b,"
        "  list_sort(list_distinct(list_cat(kmv_a, kmv_b)))[1:128] AS kmv_u"
        "  FROM ex, ka, kb),"
        " s2 AS (SELECT *, least(th_a, th_b) AS th FROM s),"
        " s3 AS (SELECT exact_a, exact_b, exact_intersect, exact_a_not_b,"
        "  exact_union,"
        f"  {_KMV_EST.format(sk='kmv_a', th='th_a')} AS est_a,"
        f"  {_KMV_EST.format(sk='kmv_b', th='th_b')} AS est_b,"
        f"  {_KMV_EST.format(sk='kmv_u', th=_KMV_TH.format(sk='kmv_u'))}"
        "    AS est_union,"
        "  CAST(len(list_filter(kmv_a, x -> CAST(x AS DOUBLE) < th"
        "    AND list_contains(kmv_b, x))) AS DOUBLE)"
        f"    * {_KMV_SPACE_SQL} / th AS est_intersect,"
        "  CAST(len(list_filter(kmv_a, x -> CAST(x AS DOUBLE) < th"
        "    AND NOT list_contains(kmv_b, x))) AS DOUBLE)"
        f"    * {_KMV_SPACE_SQL} / th AS est_a_not_b"
        "  FROM s2)"
        " SELECT measure, exact, est, TRUE AS within_bound,"
        "  TRUE AS merge_invariant_ok FROM ("
        "  SELECT 'a' AS measure, exact_a AS exact, est_a AS est, 1 AS o"
        "    FROM s3"
        "  UNION ALL SELECT 'b', exact_b, est_b, 2 FROM s3"
        "  UNION ALL SELECT 'union', exact_union, est_union, 3 FROM s3"
        "  UNION ALL SELECT 'intersect', exact_intersect, est_intersect, 4"
        "    FROM s3"
        "  UNION ALL SELECT 'a_not_b', exact_a_not_b, est_a_not_b, 5"
        "    FROM s3) t ORDER BY o"
    ),
    tags=("sketch", "approx", "agg", "checked"),
)
def sketch_theta_setops_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch set algebra — the distinct-count family HLL
    cannot provide: union, INTERSECTION and A-NOT-B cardinality from
    two fixed-size k-minimum-values summaries (k=128 smallest 48-bit
    md5 hashes; Bar-Yossef et al. '02, the theta framework of
    Dasgupta et al. 2016). Sets: A = click/view events, B =
    view/purchase events, keyed by event_id. Unlike the HLL/CMS
    entries, the whole estimator is plain integer+double arithmetic,
    so BOTH the exact counts AND the estimates are hash-gated against
    the oracle's identical computation; two contracts ride as
    oracle-pinned booleans:

    - ``within_bound`` — every estimate lands within
      max(16, 0.25·|A∪B|) of exact. Corpus-measured: worst observed
      error/|union| across sf0.001/0.01/0.1 is 0.0745 (sf0.01 union),
      so 0.25 ≈ 2.8σ of the k=128 estimator (σ≈1/√126≈0.089) carries
      a 3.3× measured margin — same slack device as the NCD brackets.
    - ``merge_invariant_ok`` — the sketch built two-level (32
      disjoint hash buckets, per-bucket k-minima, flatten→sort→k)
      equals the directly-built sketch, array-exactly. This is the
      mergeability theorem that makes the sketch a 100 TB operator:
      partials are k values per bucket regardless of key cardinality,
      and yesterday's trillion-key summary intersects today's without
      rescanning either corpus.

    The exact branch shares one shuffle on event_id; the sketch
    aggregation's exchange carries k values per partial, not raw
    keys (operators/sketches.py:kmv_sketch)."""
    from ..operators.sketches import (
        KMV_SPACE,
        kmv_estimate,
        kmv_hash,
        kmv_sketch,
        theta_combine_estimate,
    )

    k = 128
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy("event_id")
        .agg(
            F.max(F.col("event_type").isin("click", "view")).alias("in_a"),
            F.max(F.col("event_type").isin("view", "purchase")).alias("in_b"),
        )
        .select("event_id", "in_a", "in_b", kmv_hash("event_id").alias("h"))
    )
    agg = g.agg(
        F.sum(F.col("in_a").cast("long")).alias("exact_a"),
        F.sum(F.col("in_b").cast("long")).alias("exact_b"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias(
            "exact_intersect"
        ),
        F.sum((F.col("in_a") & ~F.col("in_b")).cast("long")).alias(
            "exact_a_not_b"
        ),
        F.sum((F.col("in_a") | F.col("in_b")).cast("long")).alias(
            "exact_union"
        ),
        F.slice(
            F.sort_array(F.collect_set(F.when(F.col("in_a"), F.col("h")))),
            1,
            k,
        ).alias("kmv_a"),
        F.slice(
            F.sort_array(F.collect_set(F.when(F.col("in_b"), F.col("h")))),
            1,
            k,
        ).alias("kmv_b"),
    )
    merged = kmv_sketch(g.filter("in_a"), "event_id", k=k, n_buckets=32)
    a, b = F.col("kmv_a"), F.col("kmv_b")
    bound = F.greatest(F.lit(16.0), F.col("exact_union") * F.lit(0.25))

    def ok(est: F.Column, exact: str) -> F.Column:
        return F.abs(est - F.col(exact)) <= bound

    wide = agg.crossJoin(F.broadcast(merged)).select(
        "exact_a",
        "exact_b",
        "exact_intersect",
        "exact_a_not_b",
        "exact_union",
        kmv_estimate(a, k).alias("est_a"),
        kmv_estimate(b, k).alias("est_b"),
        theta_combine_estimate(a, b, k, "union").alias("est_union"),
        theta_combine_estimate(a, b, k, "intersect").alias("est_intersect"),
        theta_combine_estimate(a, b, k, "a_not_b").alias("est_a_not_b"),
        (F.col("kmv") == a).alias("merge_invariant_ok"),
    )
    for m in ("a", "b", "union", "intersect", "a_not_b"):
        wide = wide.withColumn(f"ok_{m}", ok(F.col(f"est_{m}"), f"exact_{m}"))
    return wide.selectExpr(
        "stack(5, "
        " 'a', exact_a, est_a, ok_a,"
        " 'b', exact_b, est_b, ok_b,"
        " 'union', exact_union, est_union, ok_union,"
        " 'intersect', exact_intersect, est_intersect, ok_intersect,"
        " 'a_not_b', exact_a_not_b, est_a_not_b, ok_a_not_b"
        ") AS (measure, exact, est, within_bound)",
        "merge_invariant_ok",
    )
