"""URL/domain-scale web-curation catalog entries (round-9 verdict
item 3): URL canonicalization + dedup, registrable-domain rollup with
a per-domain cap (Common-Crawl-style domain down-weighting), and a
domain blocklist join.

The documents table has no URL column, so each entry SYNTHESIZES a
deterministic raw URL from ``doc_id`` — messy on purpose (mixed-case
scheme/host, ``www.`` prefixes, default and non-default ports,
trailing slashes, tracking params in shuffled order, fragments) so
canonicalization has real work to do — and the DuckDB oracle
recomputes the same synthesis + the same canonicalization contract
(the ``multimodal_audio_stats`` pattern: the oracle re-derives the
input from the id, so the differential proves the OPERATOR, not the
generator).

Scale shape shared by all three: URL parsing/canonicalization is pure
codegen string work (zero UDFs, zero exchanges); the first shuffle is
the groupBy on the canonical-URL / domain key — exactly one wide
exchange per entry, map-side combined. The blocklist is a broadcast
anti-join (blocklists are KBs even in production). At 100 TB the
canonical-key groupBy is the same single exchange, and AQE's skew
split covers the one mega-domain every crawl has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import web as W
from ..sources.tables import load_table
from .catalog import register
from .sampling import _bucket_sql, hash_bucket

# --- deterministic raw-URL synthesis (mirrored in every oracle) -----

_SCHEMES = ("HTTPS", "http", "https")
_TLDS = ("com", "co.uk")
_PORTS = ("", ":80", ":8080", "", ":443")
_QUERIES = (
    "?utm_source=feed&b=2&a=1",
    "?a=1&b=2",
    "?b=2&a=1&fbclid=x",
    "?ref=home",
    "",
    "",
)


def _pick(vals: tuple[str, ...], mod: int, id_col: str = "doc_id") -> Column:
    d = F.col(id_col)
    return F.element_at(F.lit(list(vals)), (d % mod).cast("int") + 1)


def _synth_url(id_col: str = "doc_id") -> Column:
    """Raw URL as a pure function of the id column. Canonical form
    depends only on id mod 30 (scheme%3, site%5, tld%2, port%5,
    path%3, query-class%6 — all divide 30), so ~30 canonical groups
    absorb the corpus; raw variants within a group differ by case,
    www, default ports, trailing slash, tracking params, and a %7
    fragment. Parameterized so the streaming entry can synthesize
    over events.event_id (events carry the event-time column a
    watermark needs)."""
    d = F.col(id_col)
    return F.concat(
        _pick(_SCHEMES, 3, id_col),
        F.lit("://"),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(""),
        F.lit("site"),
        (d % 5).cast("string"),
        F.lit("."),
        _pick(_TLDS, 2, id_col),
        _pick(_PORTS, 5, id_col),
        F.lit("/articles/"),
        (d % 3).cast("string"),
        _pick(("", "/"), 2, id_col),
        _pick(_QUERIES, 6, id_col),
        F.when(d % 7 == 0, F.lit("#sec-2")).otherwise(""),
    )


# the same synthesis + canonicalization, as oracle-side SQL. The
# canonicalization fragments restate functions/web.py's contract
# verbatim: lowercase scheme/host, strip www. and default ports,
# collapse trailing slashes, drop tracking params + fragment, sort
# surviving query params.
def _synth_url_expr_sql(i: str) -> str:
    """The raw-URL expression over id column ``i`` — the SQL twin of
    :func:`_synth_url`."""
    return (
        f"(['HTTPS','http','https'])[CAST({i} % 3 AS INT) + 1] || '://' "
        f"|| (CASE WHEN {i} % 2 = 0 THEN 'WWW.' ELSE '' END) "
        f"|| 'site' || CAST({i} % 5 AS VARCHAR) || '.' "
        f"|| (['com','co.uk'])[CAST({i} % 2 AS INT) + 1] "
        f"|| (['',':80',':8080','',':443'])[CAST({i} % 5 AS INT) + 1] "
        f"|| '/articles/' || CAST({i} % 3 AS VARCHAR) "
        f"|| (['','/'])[CAST({i} % 2 AS INT) + 1] "
        "|| (['?utm_source=feed&b=2&a=1','?a=1&b=2','?b=2&a=1&fbclid=x',"
        f"'?ref=home','',''])[CAST({i} % 6 AS INT) + 1] "
        f"|| (CASE WHEN {i} % 7 = 0 THEN '#sec-2' ELSE '' END)"
    )


_SYNTH_SQL = (
    "synth AS (SELECT doc_id, n_chars, "
    + _synth_url_expr_sql("doc_id")
    + " AS url FROM documents)"
)

# the events-table variant (event_id plays the id; n_chars is unused
# by the downstream canon CTEs but kept for shape compatibility)
_SYNTH_EVENTS_SQL = (
    "synth AS (SELECT event_id AS doc_id, CAST(0 AS BIGINT) AS n_chars, "
    + _synth_url_expr_sql("event_id")
    + " AS url FROM events)"
)

_CANON_SQL = (
    "c1 AS (SELECT doc_id, n_chars, url, "
    "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) "
    "AS scheme, "
    "regexp_replace(lower(regexp_extract(url, "
    "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^[^@]*@', '') "
    "AS hp FROM synth), "
    "c2 AS (SELECT *, regexp_extract(hp, ':([0-9]+)$', 1) AS port, "
    "regexp_replace(regexp_replace(hp, ':[0-9]+$', ''), '^www\\.', '') "
    "AS host FROM c1), "
    "c3 AS (SELECT *, "
    "CASE WHEN regexp_replace(regexp_extract(url, "
    "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') = '' "
    "THEN '/' ELSE regexp_replace(regexp_extract(url, "
    "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') END "
    "AS path, "
    "array_to_string(list_sort(list_filter(string_split("
    "regexp_extract(url, '^[^#]*?\\?([^#]*)', 1), '&'), "
    "p -> p <> '' AND NOT regexp_matches(p, "
    "'^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS q2, "
    "(port <> '' AND NOT ((scheme = 'http' AND port = '80') "
    "OR (scheme = 'https' AND port = '443'))) AS keep_port FROM c2), "
    "canon AS (SELECT doc_id, n_chars, url AS raw_url, host, path, "
    "scheme || '://' || host "
    "|| CASE WHEN keep_port THEN ':' || port ELSE '' END || path "
    "|| CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END "
    "AS canonical_url FROM c3)"
)

# Trailing-dot strip (FQDN form "example.com.") mirrors
# functions.web.registrable_domain: the empty last label would
# otherwise shift the [-2:]/[-3:] slices to the wrong eTLD+1.
_DOMAIN_SQL = (
    "dom AS (SELECT doc_id, n_chars, canonical_url, path, "
    "CASE WHEN len(string_split(h, '.')) <= 2 THEN h "
    "WHEN array_to_string((string_split(h, '.'))[-2:], '.') "
    "IN ('co.uk','com.au','co.jp') "
    "THEN array_to_string((string_split(h, '.'))[-3:], '.') "
    "ELSE array_to_string((string_split(h, '.'))[-2:], '.') END "
    "AS domain FROM (SELECT *, regexp_replace(host, '\\.$', '') AS h "
    "FROM canon) canon_h)"
)

_BLOCKLIST = ("site1.com", "site3.co.uk", "blocked.example")

DOMAIN_CAP = 30


def _canon_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    url = _synth_url()
    return docs.select(
        "doc_id",
        "n_chars",
        url.alias("raw_url"),
        W.canonicalize_url(url).alias("canonical_url"),
        W.canonical_host(url).alias("host"),
        W.canonical_path(url).alias("path"),
    )


@register(
    "url_canonicalize_dedup",
    oracle=(
        f"WITH {_SYNTH_SQL}, {_CANON_SQL} "
        "SELECT canonical_url, count(*) AS n_raw, "
        "count(DISTINCT raw_url) AS n_variants FROM canon "
        "GROUP BY 1 ORDER BY n_raw DESC, canonical_url"
    ),
    headline=True,
    tags=("llm", "web", "dedup", "curation"),
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup audit: how many raw crawl records collapse
    onto each canonical URL, and how many distinct raw spellings fed
    each group — the first dedup a web corpus runs (syntactic URL
    variants, BEFORE any content hashing).

    Scale shape: canonicalization is row-local codegen; ONE exchange
    on the canonical key with map-side combine (count + a distinct
    that Spark plans as a partial-agg expand). Output is bounded by
    the canonical-URL population."""
    return (
        _canon_docs(spark, sf_dir)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_raw"),
            F.countDistinct("raw_url").alias("n_variants"),
        )
        .orderBy(F.desc("n_raw"), "canonical_url")
    )


@register(
    "domain_doc_rollup_capped",
    oracle=(
        f"WITH {_SYNTH_SQL}, {_CANON_SQL}, {_DOMAIN_SQL} "
        "SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
        f"CAST(least(count(*), {DOMAIN_CAP}) AS BIGINT) AS capped_docs, "
        f"CAST(least(count(*), {DOMAIN_CAP}) AS DOUBLE) "
        "/ CAST(count(*) AS DOUBLE) AS keep_weight "
        "FROM dom GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "web", "curation", "mixture"),
)
def domain_doc_rollup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain rollup with a document cap — the
    Common-Crawl-style domain down-weighting table: a crawl is
    dominated by a handful of mega-domains, so the mixture keeps at
    most ``DOMAIN_CAP`` docs per domain and ``keep_weight`` is the
    sampling rate a downstream deterministic sampler applies.

    Exactness: keep_weight = least(n, cap)/n is one IEEE division of
    exact integers on both engines. Scale shape: registrable-domain
    extraction is row-local; one domain-keyed exchange, map-side
    combined; output is |domains| rows."""
    d = _canon_docs(spark, sf_dir).select(
        W.registrable_domain(F.col("host")).alias("domain"), "n_chars"
    )
    n = F.count("*")
    capped = F.least(n, F.lit(DOMAIN_CAP))
    return (
        d.groupBy("domain")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            capped.cast("long").alias("capped_docs"),
            (capped.cast("double") / n.cast("double")).alias(
                "keep_weight"
            ),
        )
        .orderBy("domain")
    )


@register(
    "domain_blocklist_filter",
    oracle=(
        f"WITH {_SYNTH_SQL}, {_CANON_SQL}, {_DOMAIN_SQL} "
        "SELECT domain, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM dom WHERE domain NOT IN "
        f"{tuple(_BLOCKLIST)!r} "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "web", "curation", "filter"),
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist join: drop every document whose registrable
    domain is listed, report surviving per-domain counts. The Spark
    side is a broadcast LEFT ANTI join against the blocklist table —
    the shape that still works when the blocklist is a real table
    instead of a literal (production lists are KBs-to-MBs: always
    broadcastable)."""
    d = _canon_docs(spark, sf_dir).select(
        W.registrable_domain(F.col("host")).alias("domain")
    )
    block = spark.createDataFrame(
        [(b,) for b in _BLOCKLIST], "domain string"
    )
    return (
        d.join(F.broadcast(block), "domain", "left_anti")
        .groupBy("domain")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("domain")
    )


_PREFIX_RULES = (
    ("site0.com", "/articles/0"),
    ("site2.co.uk", "/articles/"),  # blocks the whole domain's tree
    ("site4.com", "/articles/2"),
)

_PREFIX_RULES_SQL = ", ".join(
    f"('{d}', '{p}')" for d, p in _PREFIX_RULES
)


@register(
    "url_path_prefix_block",
    oracle=(
        f"WITH {_SYNTH_SQL}, {_CANON_SQL}, {_DOMAIN_SQL}, "
        f"rules(r_domain, prefix) AS (VALUES {_PREFIX_RULES_SQL}), "
        "b AS (SELECT DISTINCT doc_id FROM dom JOIN rules "
        "ON dom.domain = rules.r_domain "
        "AND starts_with(dom.path, rules.prefix)) "
        "SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_blocked, "
        "CAST(SUM(CASE WHEN b.doc_id IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_allowed "
        "FROM dom LEFT JOIN b USING (doc_id) "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "web", "curation", "filter"),
)
def url_path_prefix_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-style (domain, path-prefix) disallow rules — the other
    half of crawl filtering next to the whole-domain blocklist: a rule
    blocks every document whose canonical path starts with the prefix
    on that registrable domain (one rule here disallows a domain's
    entire tree via the bare '/articles/' prefix).

    Spark shape: the rule table is a broadcast LEFT SEMI join keyed on
    domain with the starts_with predicate riding the join (never a
    cartesian — the equi-key is the domain); the per-domain audit is
    one map-side-combined exchange. Production robots rule sets are
    MBs — still broadcastable, same plan."""
    d = _canon_docs(spark, sf_dir).select(
        "doc_id",
        W.registrable_domain(F.col("host")).alias("domain"),
        "path",
    )
    rules = spark.createDataFrame(
        list(_PREFIX_RULES), "r_domain string, prefix string"
    )
    blocked = d.join(
        F.broadcast(rules),
        (F.col("domain") == F.col("r_domain"))
        & F.col("path").startswith(F.col("prefix")),
        "left_semi",
    ).select("doc_id", F.lit(1).alias("b"))
    return (
        d.join(blocked, "doc_id", "left")
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("b").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_blocked"),
            F.sum(F.when(F.col("b").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_allowed"),
        )
        .orderBy("domain")
    )


@register(
    "split_leakage_safe_by_domain",
    oracle=(
        f"WITH {_SYNTH_SQL}, {_CANON_SQL}, {_DOMAIN_SQL}, "
        "b AS (SELECT doc_id, n_chars, domain, "
        + _bucket_sql("domain")
        + " AS bucket FROM dom) "
        "SELECT CASE WHEN bucket < 80 THEN 'train' "
        "WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(DISTINCT domain) AS BIGINT) AS n_domains, "
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
        "FROM b GROUP BY 1 ORDER BY 1"
    ),
    tags=("llm", "web", "sampling", "curation"),
)
def split_leakage_safe_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split keyed by REGISTRABLE DOMAIN,
    not by document: near-duplicate pages overwhelmingly share a
    domain (templates, mirrors, pagination), so hashing the doc id —
    `split_train_val_test` — lets one site's near-dups straddle
    train and test and inflate eval. Bucketing the eTLD+1 instead puts
    every page of a site on the same side; the audit emits per-split
    doc/domain/char counts (doc-level splits show ~all domains in
    every split, this one shows disjoint domain sets by
    construction).

    Scale shape: domain + bucket are pure codegen string work on the
    scan (no join against a domain table — the split is a property of
    the row); the only exchange is the audit's (split, domain)
    two-phase distinct-count, bounded by |domains|. Assignment is
    stable under corpus growth: new pages of a known site inherit its
    side, new domains hash independently."""
    d = _canon_docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        W.registrable_domain(F.col("host")).alias("domain"),
    )
    bucket = hash_bucket("domain")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "domain", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("domain").cast("long").alias("n_domains"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )
