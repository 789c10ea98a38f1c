"""Deterministic sampling and dataset splitting for training-data
pipelines.

Random sampling (``df.sample`` / ``TABLESAMPLE``) is not reproducible
across engines, runs, or partitionings — useless for a corpus build
that must be re-runnable and auditable. The operators here bucket each
row by a hash of its stable id (first 8 hex chars of md5, mod 100) and
select bucket ranges: the same row lands in the same sample/split on
every engine, every run, at every scale, and adding data never moves
existing rows between splits. Both engines compute the identical
bucket (verified by the oracle hash-equality gate), so the *sampling
itself* is under test, not just counts.

At 100 TB the bucket is a pure codegen expression on the scan — a
sample is a filter (no shuffle), a split is a one-pass conditional
aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table
from .catalog import register


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from a stable id: first 8
    hex chars of md5, parsed base-16, mod n_buckets. Pure expression —
    no RNG state, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return h % n_buckets


def _bucket_sql(expr: str, n_buckets: int = 100) -> str:
    """DuckDB twin of hash_bucket (DuckDB has no base-16 conv; fold
    the hex digits explicitly)."""
    return (
        "list_reduce(list_transform("
        f"regexp_extract_all(substr(md5(CAST({expr} AS VARCHAR)), 1, 8), '.'), "
        "c -> strpos('0123456789abcdef', c) - 1), "
        f"(a, b) -> a * 16 + b) % {n_buckets}"
    )


@register(
    "sample_hash_10pct",
    oracle=(
        f"SELECT doc_id, CAST({_bucket_sql('doc_id')} AS BIGINT) AS bucket "
        f"FROM documents WHERE {_bucket_sql('doc_id')} < 10 ORDER BY doc_id"
    ),
    tags=("llm", "sampling"),
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% document sample: hash-bucket filter on the
    scan. Unlike df.sample, membership is a property of the row, not
    of the run."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", hash_bucket("doc_id"))
        .filter(F.col("bucket") < 10)
        .select("doc_id", "bucket")
        .orderBy("doc_id")
    )


@register(
    "split_train_val_test",
    oracle=(
        "WITH b AS (SELECT doc_id, "
        "len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok, "
        f"{_bucket_sql('doc_id')} AS bucket FROM documents) "
        "SELECT CASE WHEN bucket < 80 THEN 'train' "
        "WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split, "
        "count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens "
        "FROM b GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "sampling"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by id-hash bucket, with per-split
    token budgets. Split assignment is stable under corpus growth:
    new docs never move old docs across splits (no leakage between
    re-builds)."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"), T.token_count("text").cast("long").alias("n_tok")
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("split")
    )


@register(
    "sample_stratified_events",
    oracle=(
        "WITH b AS (SELECT event_type, "
        f"{_bucket_sql('event_id')} AS bucket FROM events) "
        "SELECT event_type, count(*) AS n_sampled FROM b "
        "WHERE bucket < (CASE event_type WHEN 'error' THEN 100 "
        "WHEN 'purchase' THEN 50 ELSE 10 END) "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "sampling"),
)
def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling (sampleBy twin): keep all
    errors, half the purchases, 10% of everything else — per-stratum
    rates as a per-row bucket threshold, one filter on the scan, no
    RNG, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "error", 100)
        .when(F.col("event_type") == "purchase", 50)
        .otherwise(10)
    )
    return (
        ev.withColumn("bucket", hash_bucket("event_id"))
        .filter(F.col("bucket") < rate)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("event_type")
    )


@register(
    "weighted_sample_by_length",
    oracle=(
        f"SELECT doc_id, n_chars, "
        f"       CAST({_bucket_sql('doc_id', 10000)} AS BIGINT) AS draw "
        f"FROM documents "
        f"WHERE {_bucket_sql('doc_id', 10000)} < LEAST(n_chars, 2000) "
        f"ORDER BY doc_id"
    ),
    tags=("llm", "sampling", "weighted"),
)
def weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling with per-row inclusion probability
    proportional to document length (capped): row kept iff its
    deterministic 10k-bucket draw falls below min(n_chars, 2000) —
    inclusion probability min(n_chars, 2000)/10000, importance
    sampling for corpus mixing. Integer compares only (no float RNG,
    no libm), so membership is bit-identical across engines, runs,
    and partitionings, and the sample is re-runnable and auditable
    like every sampler in this module. Pure codegen filter on the
    scan: no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    draw = hash_bucket("doc_id", 10000)
    return (
        docs.select("doc_id", "n_chars", draw.alias("draw"))
        .filter(F.col("draw") < F.least(F.col("n_chars"), F.lit(2000)))
        .orderBy("doc_id")
    )


@register(
    "cap_docs_per_source",
    oracle=(
        f"SELECT doc_id, source, CAST(rnk AS INT) AS rnk FROM ("
        f"  SELECT doc_id, source, row_number() OVER ("
        f"    PARTITION BY source ORDER BY {_bucket_sql('doc_id', 1000000)}, doc_id"
        f"  ) AS rnk FROM documents) t "
        f"WHERE rnk <= 50 ORDER BY source, rnk"
    ),
    tags=("llm", "sampling", "mixture"),
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard per-source document cap (keep at most 50 per source) with
    a deterministic, order-independent survivor set: rank by the
    portable md5 bucket (tie-broken by doc_id) inside each source —
    the same rows survive on every engine, run, and partitioning.
    This is the hard-cap complement to rate-based
    ``mixture_downsample_uniform``: rates reshape a distribution,
    caps bound worst-case dominance of any one source. One window
    shuffle on ``source``; survivors bounded by sources × cap."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        hash_bucket("doc_id", 1000000).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 50)
        .orderBy("source", "rnk")
    )


@register(
    "kfold_assignment",
    oracle=(
        f"SELECT doc_id, CAST({_bucket_sql('doc_id', 100)} % 5 AS BIGINT) AS fold "
        f"FROM documents ORDER BY doc_id"
    ),
    tags=("llm", "sampling", "cv"),
)
def kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5): fold
    membership is a property of the row id, so every engine, run, and
    partitioning produces the same folds, and a grown corpus never
    moves existing rows between folds — the splits' stability
    guarantee extended to CV. Pure codegen on the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", (hash_bucket("doc_id", 100) % 5).alias("fold")
        )
        .orderBy("doc_id")
    )


@register(
    "target_encode_kfold",
    oracle=(
        "WITH cell AS ("
        "  SELECT event_type, "
        f"  CAST({_bucket_sql('event_id', 100)} % 5 AS BIGINT) AS fold, "
        "  COUNT(*) AS c, SUM(CAST(value AS DECIMAL(18,6))) AS s "
        "  FROM events GROUP BY 1, 2), "
        "tot AS (SELECT event_type, SUM(c) AS n_tot, SUM(s) AS s_tot "
        "  FROM cell GROUP BY 1) "
        "SELECT cell.event_type, cell.fold, "
        "  CAST(tot.n_tot - cell.c AS BIGINT) AS n_out, "
        "  CASE WHEN tot.n_tot - cell.c > 0 THEN "
        "    round(CAST(tot.s_tot - cell.s AS DOUBLE) "
        "          / CAST(tot.n_tot - cell.c AS DOUBLE), 6) END AS enc_value "
        "FROM cell JOIN tot USING (event_type) "
        "ORDER BY event_type, fold"
    ),
    tags=("llm", "sampling", "cv", "feature-store"),
)
def target_encode_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free k-fold target encoding (the categorical-feature
    staple): a row's category encoding is the mean target over the
    OTHER folds — its own fold's rows are excluded, so the feature a
    model trains on never contains its own label (the companion to
    the point-in-time join's temporal leakage guarantee, on the CV
    axis). Folds reuse kfold_assignment's stable hash-bucket rule, so
    encodings are reproducible across runs and engines.

    Output is the |categories| x k encoding TABLE (bounded by the
    category domain, never rows): per (event_type, fold) the
    out-of-fold count and mean. The arithmetic is the exact-decimal
    discipline: per-cell decimal sums, totals as sums of cells,
    out-of-fold = total - own cell (exact subtraction), ONE IEEE
    division at the end. Plan: one (category, fold) shuffle for the
    cells, the |cat| totals broadcast back onto them."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        (hash_bucket("event_id", 100) % 5).alias("fold"),
    ).agg(
        F.count("*").alias("c"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("c").alias("n_tot"), F.sum("s").alias("s_tot")
    )
    n_out = F.col("n_tot") - F.col("c")
    return (
        cell.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "fold",
            n_out.cast("bigint").alias("n_out"),
            F.when(
                n_out > 0,
                F.round(
                    (F.col("s_tot") - F.col("s")).cast("double")
                    / n_out.cast("double"),
                    6,
                ),
            ).alias("enc_value"),
        )
        .orderBy("event_type", "fold")
    )


@register(
    "sample_quality_curriculum",
    oracle=(
        "WITH s AS (SELECT doc_id, "
        "least(greatest(CAST('0.5' AS DECIMAL(12,6)) + "
        f"({T.quality_clf_logit_sql('text')}) * CAST('0.25' AS DECIMAL(3,2)), "
        "CAST('0.05' AS DECIMAL(12,6))), CAST('0.95' AS DECIMAL(12,6))) "
        "AS p, "
        f"{_bucket_sql('doc_id', 1000)} AS bucket "
        "FROM documents) "
        "SELECT doc_id, CAST(p AS DOUBLE) AS p_accept "
        "FROM s WHERE bucket < p * 1000 ORDER BY doc_id"
    ),
    tags=("llm", "sampling", "text"),
)
def sample_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted (curriculum-style) document sampling: each
    document's acceptance probability is a piecewise-LINEAR map of its
    quality-classifier logit, p = clamp(0.5 + 0.25·logit, 0.05, 0.95),
    and membership is the deterministic md5 bucket test
    bucket_1000(doc_id) < 1000·p — the weighted generalization of
    ``sample_hash_10pct``. Everything is exact decimal + integer
    arithmetic (the linear map replaces the sigmoid precisely so no
    transcendental enters the membership decision), so the sample SET
    is bit-reproducible across engines and runs — the property
    curriculum schedulers need for resumable training. Pure
    expressions on the scan: no shuffle, no RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    logit = T.quality_clf_logit("text")
    p = F.least(
        F.greatest(
            F.lit("0.5").cast("decimal(12,6)")
            + logit * F.lit("0.25").cast("decimal(3,2)"),
            F.lit("0.05").cast("decimal(12,6)"),
        ),
        F.lit("0.95").cast("decimal(12,6)"),
    )
    return (
        docs.select(
            "doc_id",
            p.alias("p"),
            hash_bucket("doc_id", 1000).alias("bucket"),
        )
        .filter(F.col("bucket") < F.col("p") * 1000)
        .select("doc_id", F.col("p").cast("double").alias("p_accept"))
        .orderBy("doc_id")
    )


@register(
    "split_cluster_safe",
    oracle=(
        "WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents), "
        "rep AS (SELECT fp, min(doc_id) AS rep_id FROM fp GROUP BY 1), "
        "d AS (SELECT fp.doc_id, fp.fp, rep.rep_id, "
        f"{_bucket_sql('fp.doc_id')} AS nb, {_bucket_sql('rep.rep_id')} AS sb "
        "FROM fp JOIN rep USING (fp)), "
        "s AS (SELECT doc_id, fp, "
        "CASE WHEN nb < 80 THEN 'train' WHEN nb < 90 THEN 'val' ELSE 'test' "
        "END AS naive_split, "
        "CASE WHEN sb < 80 THEN 'train' WHEN sb < 90 THEN 'val' ELSE 'test' "
        "END AS safe_split FROM d), "
        "straddle AS (SELECT "
        "CAST(SUM(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS straddle_naive, "
        "CAST(SUM(CASE WHEN n_safe > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS straddle_safe FROM ("
        "SELECT fp, count(DISTINCT naive_split) AS n_naive, "
        "count(DISTINCT safe_split) AS n_safe FROM s GROUP BY fp)) "
        "SELECT safe_split AS split, count(*) AS n_docs, "
        "CAST(SUM(CASE WHEN naive_split <> safe_split THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_moved, straddle_naive, straddle_safe "
        "FROM s, straddle "
        "GROUP BY 1, straddle_naive, straddle_safe ORDER BY 1"
    ),
    tags=("llm", "sampling", "dedup"),
)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: assign each document the
    split of its duplicate-group REPRESENTATIVE (min doc_id per exact
    content fingerprint), so verbatim copies can never straddle
    train/test — the eval-contamination failure mode of the naive
    per-doc hash split (`split_train_val_test`). Emits, per split,
    the doc count, how many docs the safe assignment moved relative
    to the naive one, and the corpus-wide straddle audit: duplicate
    groups spanning >1 split under each policy (safe is 0 by
    construction — the audit PROVES it rather than assuming it).

    Scale shape: one fingerprint aggregate (map-side combined, one row
    per distinct document), one equi-join back on the fingerprint to
    attach rep_id, one group audit, one final conditional aggregation;
    the 1-row straddle audit joins on via broadcast. Near-dup-safe
    splitting swaps the fingerprint for `dedup_resolve_clusters`'
    connected-component label — same shape, iterative label cost."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5("text").alias("fp"))
    rep = fp.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    d = fp.join(rep, "fp")
    nb = hash_bucket("doc_id")
    sb = hash_bucket("rep_id")
    split_of = lambda b: (  # noqa: E731
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    s = d.select(
        "doc_id",
        "fp",
        split_of(nb).alias("naive_split"),
        split_of(sb).alias("safe_split"),
    )
    per_group = s.groupBy("fp").agg(
        F.countDistinct("naive_split").alias("n_naive"),
        F.countDistinct("safe_split").alias("n_safe"),
    )
    straddle = per_group.agg(
        F.sum(F.when(F.col("n_naive") > 1, 1).otherwise(0))
        .cast("long")
        .alias("straddle_naive"),
        F.sum(F.when(F.col("n_safe") > 1, 1).otherwise(0))
        .cast("long")
        .alias("straddle_safe"),
    )
    return (
        s.groupBy(F.col("safe_split").alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("naive_split") != F.col("safe_split"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
        .crossJoin(F.broadcast(straddle))
        .orderBy("split")
    )


@register(
    "split_contamination_report",
    oracle=(
        "WITH b AS (SELECT doc_id, text, "
        f"CASE WHEN {_bucket_sql('doc_id')} < 80 THEN 'train' "
        f"WHEN {_bucket_sql('doc_id')} < 90 THEN 'val' ELSE 'test' END "
        "AS split FROM documents), "
        "g AS (SELECT split, doc_id, unnest(list_distinct(list_transform("
        "generate_series(1, greatest(len(tk) - 4, 0)), "
        "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4])))) "
        "AS gram FROM (SELECT split, doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS tk FROM b "
        "WHERE trim(text) <> '') t), "
        "tg AS (SELECT DISTINCT gram FROM g WHERE split = 'train'), "
        "hit AS (SELECT DISTINCT g.split, g.doc_id FROM g "
        "JOIN tg USING (gram) WHERE g.split <> 'train'), "
        "tot AS (SELECT split, count(*) AS n_docs FROM b "
        "WHERE split <> 'train' GROUP BY 1), "
        "h AS (SELECT split, count(*) AS n_contaminated FROM hit GROUP BY 1) "
        "SELECT t.split, t.n_docs, "
        "CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated, "
        "round(CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / "
        "CAST(t.n_docs AS DOUBLE), 6) AS contamination_pct "
        "FROM tot t LEFT JOIN h USING (split) ORDER BY t.split"
    ),
    tags=("llm", "sampling", "dedup"),
)
def split_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage audit of the hash split: for each held-out split,
    how many documents share at least one verbatim 5-gram with ANY
    train document, and the contaminated fraction. This is the number
    that says whether the per-doc hash split (which `split_cluster_
    safe` fixes only for verbatim copies) is leaking eval content at
    the SUBSTRING level — the same 5-token granularity the
    `dedup_dup_spans` detector uses, applied across the split
    boundary like `decontaminate_substring` applies it against an
    external benchmark.

    Scale shape: one explode of per-doc DISTINCT 5-grams (codegen —
    `operators/dedup.shingles`); the train-gram DISTINCT aggregate is
    the only corpus-sized exchange; eval grams meet it via one
    equi-join on the gram (AQE broadcast at toy scale); everything
    after is ≤2-row arithmetic."""
    from ..operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    b = docs.select("doc_id", "text", split.alias("split"))
    g = b.filter(F.trim(F.col("text")) != "").select(
        "split", "doc_id", F.explode(shingles("text", 5)).alias("gram")
    )
    tg = g.filter(F.col("split") == "train").select("gram").distinct()
    hit = (
        g.filter(F.col("split") != "train")
        .join(tg, "gram")
        .select("split", "doc_id")
        .distinct()
    )
    tot = b.filter(F.col("split") != "train").groupBy("split").agg(
        F.count("*").alias("n_docs")
    )
    h = hit.groupBy("split").agg(F.count("*").alias("n_contaminated"))
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    return (
        tot.join(h, "split", "left")
        .select(
            "split",
            "n_docs",
            n_cont.alias("n_contaminated"),
            F.round(
                n_cont.cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("contamination_pct"),
        )
        .orderBy("split")
    )


@register(
    "feature_woe_value_bins",
    oracle=(
        "WITH b AS (SELECT CAST(floor(value / 50) AS INT) AS bin, "
        "CAST(event_type = 'error' AS INT) AS bad FROM events), "
        "cell AS (SELECT bin, "
        "SUM(1 - bad) AS n_good, SUM(bad) AS n_bad FROM b GROUP BY 1), "
        "tot AS (SELECT SUM(n_good) AS g_tot, SUM(n_bad) AS b_tot "
        "FROM cell) "
        "SELECT bin, CAST(n_good AS BIGINT) AS n_good, "
        "CAST(n_bad AS BIGINT) AS n_bad, "
        "round(ln(((n_bad + 0.5) / (b_tot + 5.0)) "
        "/ ((n_good + 0.5) / (g_tot + 5.0))), 6) AS woe, "
        "round(((n_bad + 0.5) / (b_tot + 5.0) "
        "- (n_good + 0.5) / (g_tot + 5.0)) "
        "* ln(((n_bad + 0.5) / (b_tot + 5.0)) "
        "/ ((n_good + 0.5) / (g_tot + 5.0))), 6) AS iv_contrib "
        "FROM cell CROSS JOIN tot ORDER BY bin"
    ),
    tags=("llm", "features", "encoding"),
)
def feature_woe_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature screening (the
    credit-scoring-born encoding that survives as a fast univariate
    feature-quality test): bin ``value`` into fixed-width bins
    (floor(v/50) — deterministic integer bins, no quantile
    nondeterminism), target = event_type 'error', and per bin
    WOE = ln(bad_frac / good_frac) with 0.5 Laplace smoothing, plus
    the IV contribution (bad_frac − good_frac)·WOE whose sum ranks
    the feature's separating power.  Counts are exact integers; the
    two fractions are single IEEE divisions in identical expression
    order on both engines; only ln() is transcendental and the 6-dp
    round absorbs its ULP noise (the BM25 convention).

    Scale shape: one map-side-combined (bin) aggregate — output
    bounded by the bin domain, never rows — with the 1-row totals
    broadcast back.  The k-fold twin for multi-valued categoricals is
    ``target_encode_kfold``; this is the screening pass that decides
    which features earn an encoder at all."""
    ev = load_table(spark, sf_dir, "events")
    bad = (F.col("event_type") == "error").cast("int")
    cell = ev.select(
        F.floor(F.col("value") / 50).cast("int").alias("bin"),
        bad.alias("bad"),
    ).groupBy("bin").agg(
        F.sum(F.lit(1) - F.col("bad")).alias("n_good"),
        F.sum("bad").alias("n_bad"),
    )
    tot = cell.agg(
        F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot")
    )
    bad_frac = (F.col("n_bad") + 0.5) / (F.col("b_tot") + 5.0)
    good_frac = (F.col("n_good") + 0.5) / (F.col("g_tot") + 5.0)
    woe = F.log(bad_frac / good_frac)
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_good").cast("long").alias("n_good"),
            F.col("n_bad").cast("long").alias("n_bad"),
            F.round(woe, 6).alias("woe"),
            F.round((bad_frac - good_frac) * woe, 6).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


@register(
    "mixture_token_budget_waterfill",
    oracle=(
        "WITH cell AS (SELECT source, "
        "CAST(SUM(n_chars) AS BIGINT) AS avail, "
        "CAST(1 + (CAST(substr(source, 4) AS INT) % 5) AS BIGINT) AS w "
        "FROM documents GROUP BY 1), "
        "tot AS (SELECT (6 * SUM(avail)) // 10 AS budget, "
        "SUM(w) AS w_all FROM cell), "
        "r1 AS (SELECT source, avail, w, "
        "least(avail, (w * budget) // w_all) AS alloc1, budget "
        "FROM cell CROSS JOIN tot), "
        "l1 AS (SELECT budget - SUM(alloc1) AS leftover, "
        "SUM(CASE WHEN alloc1 < avail THEN w ELSE 0 END) AS w_open "
        "FROM r1 GROUP BY budget), "
        "r2 AS (SELECT source, avail, w, alloc1, "
        "CASE WHEN alloc1 < avail AND w_open > 0 "
        "THEN least(avail, alloc1 + (w * leftover) // w_open) "
        "ELSE alloc1 END AS alloc2 FROM r1 CROSS JOIN l1) "
        "SELECT source, avail AS avail_chars, w AS weight, "
        "CAST(alloc1 AS BIGINT) AS alloc_round1, "
        "CAST(alloc2 AS BIGINT) AS alloc_round2, "
        "round(CAST(alloc2 AS DOUBLE) / avail, 9) AS sample_rate, "
        "alloc2 >= avail AS exhausted "
        "FROM r2 ORDER BY source"
    ),
    tags=("llm", "sampling", "mixture"),
)
def mixture_token_budget_waterfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budget allocation across corpus sources with waterfilling
    — the computation behind every training-data mixture spec: given
    per-source target weights and a total token budget (60% of the
    corpus here, per-source weights derived deterministically from
    the source name), allocate weight-proportional budgets CAPPED at
    each source's available tokens, then redistribute the stranded
    remainder of capped (exhausted) sources over the still-open ones
    in a second proportional round.  More rounds repeat the same
    bounded aggregate (the BT/ALS chained-step convention); two
    rounds already exercise the cap-and-redistribute recursion.

    Everything is EXACT integer arithmetic — weights are small
    integers, allocations use integer floor-division — so the entry
    hash-gates with no float convention needed except the final
    cosmetic per-source rate (one IEEE division of exact integers).

    Scale shape: one map-side-combined (source) aggregate over the
    corpus; all waterfilling runs on the source-domain-sized table
    (broadcast 1-row totals), never touching rows again — the
    output IS the sampling plan the hash-samplers then execute."""
    docs = load_table(spark, sf_dir, "documents")
    # weight is a pure function of the group key, computed post-agg
    cell = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("avail")
    ).withColumn(
        "w",
        (
            F.lit(1) + (F.expr("substring(source, 4)").cast("int") % 5)
        ).cast("long"),
    )
    tot = cell.agg(
        F.expr("(6 * SUM(avail)) div 10").alias("budget"),
        F.sum("w").alias("w_all"),
    )
    r1 = cell.crossJoin(F.broadcast(tot)).withColumn(
        "alloc1", F.expr("least(avail, (w * budget) div w_all)")
    )
    l1 = r1.groupBy("budget").agg(
        (F.col("budget") - F.sum("alloc1")).alias("leftover"),
        F.sum(
            F.when(F.col("alloc1") < F.col("avail"), F.col("w")).otherwise(
                F.lit(0)
            )
        ).alias("w_open"),
    ).select("leftover", "w_open")
    r2 = r1.crossJoin(F.broadcast(l1)).withColumn(
        "alloc2",
        F.when(
            (F.col("alloc1") < F.col("avail")) & (F.col("w_open") > 0),
            F.expr("least(avail, alloc1 + (w * leftover) div w_open)"),
        ).otherwise(F.col("alloc1")),
    )
    return r2.select(
        "source",
        F.col("avail").alias("avail_chars"),
        F.col("w").alias("weight"),
        F.col("alloc1").cast("long").alias("alloc_round1"),
        F.col("alloc2").cast("long").alias("alloc_round2"),
        F.round(F.col("alloc2").cast("double") / F.col("avail"), 9).alias(
            "sample_rate"
        ),
        (F.col("alloc2") >= F.col("avail")).alias("exhausted"),
    ).orderBy("source")


@register(
    "sample_weighted_reservoir",
    oracle=(
        # Efraimidis-Spirakis A-ES with hash-derived uniforms:
        # u = (hex13(md5(seed:id)) + 1) / 16^13  (exact: 16^13 = 2^52)
        # key = ln(u) / weight  — top-k largest keys win
        "WITH k AS (SELECT doc_id, source, n_chars, "
        "ln((list_reduce(list_transform(regexp_extract_all("
        "substr(md5('wres42:' || CAST(doc_id AS VARCHAR)), 1, 13), '.'), "
        "c -> strpos('0123456789abcdef', c) - 1), "
        "(a, b) -> a * 16 + b) + 1) / 4503599627370496.0) "
        "/ CAST(n_chars AS DOUBLE) AS key FROM documents), "
        "r AS (SELECT doc_id, source, n_chars, "
        "row_number() OVER (ORDER BY key DESC, doc_id) AS rk FROM k) "
        "SELECT doc_id, source, n_chars FROM r WHERE rk <= 50 "
        "ORDER BY doc_id"
    ),
    tags=("llm", "sampling"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=50, weight = document
    length — the Efraimidis-Spirakis A-ES reservoir: each row draws a
    reproducible uniform u from a seeded id-hash (13 md5 hex digits /
    2^52 — exact dyadic, never 0) and the k largest ln(u)/w keys win;
    P(doc in sample) is the weighted without-replacement probability,
    and membership is a property of the row, not of the run — the
    same auditability contract as the unweighted hash sample.

    The driver gate hash-compares the SELECTED ROWS, not the keys, so
    the check proves both engines draw the identical sample (the only
    cross-engine float in play is one ln whose 1-ulp wobble could
    flip a selection only on an exact key tie — dyadic-rational
    inputs make that measure-zero).

    Scale shape: the key is pure codegen on the scan; top-k compiles
    to TakeOrderedAndProject (per-partition heaps + one k-row merge,
    never a global sort) — at 100 TB this is a single scan with a
    k-row driver merge, the textbook distributed reservoir."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wres42:"), F.col("doc_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    key = F.log((h + 1) / F.lit(4503599627370496.0)) / F.col(
        "n_chars"
    ).cast("double")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("key"))
        .orderBy(F.desc("key"), "doc_id")
        .limit(50)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


# --- differentially-private release (deterministic mechanism) --------

# Two-sided geometric (discrete Laplace) with alpha = exp(-eps),
# eps = 0.5 — the integer-valued DP noise mechanism (Ghosh et al.,
# "Universally Utility-Maximizing Privacy Mechanisms"): P(Z = k) is
# proportional to alpha^|k|. The inverse CDF is evaluated against
# literal double thresholds computed ONCE here and shared verbatim by
# both engines (the bootstrap_mean_ci_value convention), with the
# uniform drawn from md5 — so the "noise" is deterministic,
# hash-gateable, and bit-identical cross-engine. Tails clamp at +-12
# (P(|Z| > 12) ~ 2e-3 at eps=0.5; a clamped geometric is itself a
# standard bounded-noise variant). A production release would key the
# md5 on a secret salt per release; the mechanism and plan shape are
# identical.
import math as _math

_DP_EPS = 0.5
_DP_ALPHA = _math.exp(-_DP_EPS)
_DP_K_MAX = 12
#: (k, P(Z <= k)) for k in [-K, K); u >= last threshold clamps to +K.
_DP_CDF: tuple[tuple[int, str], ...] = tuple(
    (
        k,
        repr(
            _DP_ALPHA ** (-k) / (1 + _DP_ALPHA)
            if k < 0
            else 1 - _DP_ALPHA ** (k + 1) / (1 + _DP_ALPHA)
        ),
    )
    for k in range(-_DP_K_MAX, _DP_K_MAX)
)

_DP_U32_SQL = (
    "list_reduce(list_transform(regexp_extract_all("
    "substr(md5('dp:' || event_type), 1, 8), '.'), "
    "c -> strpos('0123456789abcdef', c) - 1), "
    "(a, d) -> a * 16 + d)"
)

_DP_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN u < {t} THEN ({k})" for k, t in _DP_CDF)
    + f" ELSE {_DP_K_MAX} END"
)


@register(
    "dp_discrete_geometric_counts",
    oracle=(
        "WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1), "
        f"u AS (SELECT event_type, n, CAST({_DP_U32_SQL} AS DOUBLE) "
        "/ 4294967296.0 AS u FROM c) "
        f"SELECT event_type, CAST(n + {_DP_CASE_SQL} AS BIGINT) "
        "AS noisy_count FROM u ORDER BY 1"
    ),
    tags=("llm", "privacy", "release"),
)
def dp_discrete_geometric_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided discrete-geometric (integer Laplace) noise over
    per-event-type counts — the MECHANISM behind eps=0.5 DP count
    release, demonstrated for its plan shape and cross-engine
    determinism. NOT a DP release as shipped (round-10 advice): the
    noise here is a deterministic public function of the bucket key
    (unsalted md5), which provides zero privacy by construction — a
    real release must key a per-release SECRET salt into the md5 (and
    keep it secret), at which point the noise distribution is the
    calibrated geometric and the eps=0.5 guarantee applies (per-bucket
    sensitivity 1, up to the +-12 tail clamp). The determinism is the
    point of the ENTRY, not of the mechanism: it is what lets the
    DuckDB oracle reproduce the identical noise and hash-gate the
    inverse-CDF sampling, tail clamp, and count-domain arithmetic.

    The discrete counterpart to `dp_noisy_counts_by_type` (continuous
    Laplace, eps=0.1, same salt caveat): integer-valued counts get
    integer-valued noise — no post-hoc rounding step to reason about,
    the release stays in the count domain, and the utility-optimality
    result (Ghosh et al.) holds only for this mechanism. Pairs with
    k_anonymity_audit: that entry finds what is unsafe to release raw.

    Scale shape: one map-side-combined count aggregate; the noise is
    pure post-aggregation expression work on |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = u32.cast("double") / F.lit(4294967296.0)
    noise = F.lit(_DP_K_MAX)
    for k, t in reversed(_DP_CDF):
        noise = F.when(u < float(t), F.lit(k)).otherwise(noise)
    return (
        counts.select(
            "event_type",
            (F.col("n") + noise).cast("long").alias("noisy_count"),
        )
        .orderBy("event_type")
    )
