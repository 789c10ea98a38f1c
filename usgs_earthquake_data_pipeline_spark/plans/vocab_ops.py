"""Vocabulary-statistics entries: the corpus-level distributional
measurements a tokenizer-training / data-mixing pipeline runs before
(and between) training jobs.

- ``bpe_merge_pairs_top`` — one iteration of byte-pair-encoding
  training: the adjacent-symbol-pair frequencies over the word-
  frequency table, i.e. exactly the statistic BPE greedily merges on.
  Integer-exact end to end, so the oracle is a straight hash match.
- ``text_unigram_entropy`` — per-document Shannon entropy of the
  unigram (token) distribution, the classic "is this text natural
  language or a log dump" signal (low entropy = repetitive/boiler-
  plate, high = diverse vocabulary).
- ``mixture_js_divergence`` — Jensen-Shannon divergence between the
  unigram distributions of every pair of corpus sources: the
  quantitative "how different are these mixture components" measure
  a data-mixing run consults when reweighting sources.

Float convention (same as the BM25 entry): per-term float
contributions are computed with an IDENTICAL operation order in both
engines, rounded to 6 dp, summed EXACTLY as DECIMAL (order-free), and
the final scalar assembled with one more identically-ordered float
expression rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table
from .catalog import register

# the oracle-side mirror of functions.text.tokens(); proven
# equivalent by every corpus_ops entry since round 2
_SQL_TOKENS = "unnest(regexp_split_to_array(trim(text), '\\s+'))"


@register(
    "bpe_merge_pairs_top",
    oracle=(
        "WITH w AS (SELECT " + _SQL_TOKENS + " AS word FROM documents), "
        "wf AS (SELECT word, count(*) AS wf FROM w "
        "WHERE len(word) >= 2 GROUP BY 1), "
        "p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, wf "
        "FROM wf, unnest(range(1, len(word))) AS t(i)), "
        "c AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS pair_count "
        "FROM p GROUP BY 1) "
        "SELECT pair, pair_count, "
        "CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank "
        "FROM c ORDER BY pair_count DESC, pair LIMIT 20"
    ),
    tags=("llm", "vocab", "tokenizer"),
)
def bpe_merge_pairs_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration: count adjacent character pairs over
    the corpus word-frequency table and surface the top-20 merge
    candidates.  This is the inner statistic of Sennrich-style BPE —
    the pair with rank 1 is the merge the trainer would apply next.

    Scale shape: the corpus collapses to the word-frequency table
    first (one shuffle with map-side partial agg — the corpus-size
    term drops out before any per-character work), pairs explode off
    the |vocab|-sized table only, and the pair aggregate is another
    map-side-combined shuffle over ≤ |alphabet|² keys.  The top-20 is
    TakeOrdered (no global sort), and the final rank is a window over
    20 driver-bound rows.  Integer arithmetic throughout — the oracle
    match is exact, no float convention needed."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(T.tokens("text")).alias("word")).filter(
        F.length("word") >= 2
    )
    wf = words.groupBy("word").agg(F.count("*").alias("wf"))
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "wf",
    )
    counts = pairs.groupBy("pair").agg(F.sum("wf").alias("pair_count"))
    top = counts.orderBy(F.desc("pair_count"), F.asc("pair")).limit(20)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


@register(
    "text_unigram_entropy",
    oracle=(
        "WITH tok AS (SELECT doc_id, " + _SQL_TOKENS + " AS term "
        "FROM documents), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
        "WHERE term <> '' GROUP BY 1, 2), "
        "d AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, "
        "CAST(SUM(CAST(round(CAST(tf AS DOUBLE) * log2(CAST(tf AS DOUBLE)), 6) "
        "AS DECIMAL(28,6))) AS DOUBLE) AS s FROM tf GROUP BY 1) "
        "SELECT doc_id, n_tokens, "
        "round(log2(CAST(n_tokens AS DOUBLE)) - s / CAST(n_tokens AS DOUBLE), 6) "
        "AS entropy FROM d ORDER BY doc_id"
    ),
    tags=("llm", "quality", "vocab"),
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, via the
    factored form  H = log2(n) − (Σ tf·log2 tf)/n  — so the only
    per-term float work is tf·log2(tf) on small integers (rounded to
    6 dp, then summed exactly as DECIMAL, order-free on both
    engines).  Low-entropy documents are repetitive boilerplate; the
    curation pipeline gates on this next to the Gopher repetition
    rules.

    Scale shape: one (doc, term) aggregate with map-side combine,
    then a per-doc reduce — the same two-shuffle profile as TF-IDF;
    no window, no driver state.  Documents that tokenize to nothing
    (all-whitespace text) are absent on both sides by construction."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(
            F.round(
                F.col("tf").cast("double") * F.log2(F.col("tf").cast("double")), 6
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("s"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.log2(F.col("n_tokens").cast("double"))
            - F.col("s") / F.col("n_tokens").cast("double"),
            6,
        ).alias("entropy"),
    ).orderBy("doc_id")


@register(
    "mixture_js_divergence",
    oracle=(
        "WITH tok AS (SELECT source, " + _SQL_TOKENS + " AS term "
        "FROM documents), "
        "tf AS (SELECT source, term, count(*) AS tf FROM tok "
        "WHERE term <> '' GROUP BY 1, 2), "
        "tot AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS n FROM tf GROUP BY 1), "
        "p AS (SELECT tf.source, tf.term, "
        "CAST(tf.tf AS DOUBLE) / CAST(tot.n AS DOUBLE) AS p "
        "FROM tf JOIN tot ON tf.source = tot.source), "
        "pairs AS (SELECT a.source AS source_a, b.source AS source_b "
        "FROM tot a JOIN tot b ON a.source < b.source), "
        "sides AS ("
        "SELECT pr.source_a, pr.source_b, p.term, p.p AS pa, 0.0 AS pb "
        "FROM p JOIN pairs pr ON p.source = pr.source_a "
        "UNION ALL "
        "SELECT pr.source_a, pr.source_b, p.term, 0.0 AS pa, p.p AS pb "
        "FROM p JOIN pairs pr ON p.source = pr.source_b), "
        "m AS (SELECT source_a, source_b, term, SUM(pa) AS pa, SUM(pb) AS pb "
        "FROM sides GROUP BY 1, 2, 3), "
        "contrib AS (SELECT source_a, source_b, "
        "round(CASE WHEN pa > 0 THEN 0.5 * pa * log2(2.0 * pa / (pa + pb)) "
        "ELSE 0.0 END + "
        "CASE WHEN pb > 0 THEN 0.5 * pb * log2(2.0 * pb / (pa + pb)) "
        "ELSE 0.0 END, 9) AS c FROM m) "
        "SELECT source_a, source_b, "
        "round(CAST(SUM(CAST(c AS DECIMAL(28,9))) AS DOUBLE), 6) AS jsd, "
        "CAST(count(*) AS BIGINT) AS n_terms "
        "FROM contrib GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("llm", "mixture", "vocab"),
)
def mixture_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    every source pair — bounded in [0, 1] under log2, symmetric, the
    standard "how far apart are these mixture components" measure for
    corpus reweighting.

    Scale shape: per-source term probabilities are one (source, term)
    aggregate joined to the |sources|-row totals by broadcast; each
    of the O(|sources|²) pairs (a handful — sources are mixture
    components, not documents) is materialized by broadcasting the
    tiny pair table against the probability table from BOTH ends and
    union-aggregating on (pair, term), which aligns pa/pb without a
    full-outer self-join.  Per-term JSD contributions use the same
    op order as the oracle, rounded to 9 dp, then an exact DECIMAL
    sum per pair."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(T.tokens("text")).alias("term"))
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    tot = tf.groupBy("source").agg(F.sum("tf").alias("n"))
    p = tf.join(F.broadcast(tot), "source").select(
        "source",
        "term",
        (F.col("tf").cast("double") / F.col("n").cast("double")).alias("p"),
    )
    a = tot.select(F.col("source").alias("source_a"))
    b = tot.select(F.col("source").alias("source_b"))
    pairs = a.crossJoin(b).filter(F.col("source_a") < F.col("source_b"))
    side_a = p.join(
        F.broadcast(pairs), p["source"] == pairs["source_a"]
    ).select("source_a", "source_b", "term", F.col("p").alias("pa"), F.lit(0.0).alias("pb"))
    side_b = p.join(
        F.broadcast(pairs), p["source"] == pairs["source_b"]
    ).select("source_a", "source_b", "term", F.lit(0.0).alias("pa"), F.col("p").alias("pb"))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("source_a", "source_b", "term")
        .agg(F.sum("pa").alias("pa"), F.sum("pb").alias("pb"))
    )
    half = F.lit(0.5)
    two = F.lit(2.0)
    contrib = merged.select(
        "source_a",
        "source_b",
        F.round(
            F.when(
                F.col("pa") > 0,
                half * F.col("pa") * F.log2(two * F.col("pa") / (F.col("pa") + F.col("pb"))),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("pb") > 0,
                half * F.col("pb") * F.log2(two * F.col("pb") / (F.col("pa") + F.col("pb"))),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("c"),
    )
    return (
        contrib.groupBy("source_a", "source_b")
        .agg(
            F.sum(F.col("c").cast("decimal(28,9)")).cast("double").alias("jsd_raw"),
            F.count("*").alias("n_terms"),
        )
        .select(
            "source_a",
            "source_b",
            F.round("jsd_raw", 6).alias("jsd"),
            "n_terms",
        )
        .orderBy("source_a", "source_b")
    )
