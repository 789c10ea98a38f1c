"""URL canonicalization / registrable-domain unit tests — edge cases
the synthetic catalog URLs don't all reach (non-default ports kept,
default ports stripped per scheme, root path, suffix-list domains,
bare hosts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions.web import (
    canonical_host,
    canonicalize_url,
    registrable_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r[0]
        for r in df.select(canonicalize_url(F.col("url"))).collect()
    ]


def test_canonicalize_case_port_fragment(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a/b/#frag",
            "http://example.com:80/a/b",
            "https://example.com:8080/a/b",  # non-default: kept
            "http://example.com:443/a/b",  # 443 NOT default for http
        ],
    )
    assert got == [
        "https://example.com/a/b",
        "http://example.com/a/b",
        "https://example.com:8080/a/b",
        "http://example.com:443/a/b",
    ]


def test_canonicalize_path_and_query(spark):
    got = _canon(
        spark,
        [
            "https://a.com",  # empty path -> /
            "https://a.com///",  # slashes collapse to /
            "https://a.com/p?utm_source=x&b=2&a=1&fbclid=y#s",
            "https://a.com/p?b=2&a=1",
            "https://a.com/p?utm_campaign=z",  # all params tracked
        ],
    )
    assert got == [
        "https://a.com/",
        "https://a.com/",
        "https://a.com/p?a=1&b=2",
        "https://a.com/p?a=1&b=2",
        "https://a.com/p",
    ]


def test_canonical_host_strips_www_and_port(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Sub.Site.ORG:8080/x",)], "url string"
    )
    assert df.select(canonical_host(F.col("url"))).collect()[0][0] == (
        "sub.site.org"
    )


def test_registrable_domain_suffix_list(spark):
    df = spark.createDataFrame(
        [
            ("a.b.site.co.uk",),
            ("x.site.com",),
            ("site.com",),
            ("localhost",),
            ("deep.sub.example.com.au",),
        ],
        "host string",
    )
    got = [
        r[0]
        for r in df.select(registrable_domain(F.col("host"))).collect()
    ]
    assert got == [
        "site.co.uk",
        "site.com",
        "site.com",
        "localhost",
        "example.com.au",
    ]


def test_registrable_domain_fqdn_trailing_dot(spark):
    """DNS FQDN form ('example.com.') must resolve like the dotless
    host — the empty last label used to make last2 'com.' and return
    the wrong eTLD+1."""
    df = spark.createDataFrame(
        [
            ("example.com.",),
            ("a.b.site.co.uk.",),
            ("localhost.",),
        ],
        "host string",
    )
    got = [
        r[0]
        for r in df.select(registrable_domain(F.col("host"))).collect()
    ]
    assert got == ["example.com", "site.co.uk", "localhost"]


def test_catalog_entries_zero_udf_plans(spark, sf_dir):
    """The web entries must stay pure codegen — no BatchEvalPython /
    ArrowEvalPython nodes in any plan."""
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    for name in (
        "url_canonicalize_dedup",
        "domain_doc_rollup_capped",
        "domain_blocklist_filter",
    ):
        plan = CATALOG[name].spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, name


def test_blocklist_is_broadcast(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    plan = (
        CATALOG["domain_blocklist_filter"]
        .spark_fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_prefix_block_partitions_and_tree_rule(spark, sf_dir):
    """blocked + allowed must partition every domain's docs, and the
    bare '/articles/' rule must block site2.co.uk's ENTIRE tree."""
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = CATALOG["url_path_prefix_block"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_blocked + r.n_allowed == r.n_docs
    by_dom = {r.domain: r for r in rows}
    assert by_dom["site2.co.uk"].n_allowed == 0
    # unlisted domains fully allowed
    assert by_dom["site1.com"].n_blocked == 0


def test_sqrt_temperature_invariants(spark, sf_dir):
    """Weights sum to 1 on both scales; sqrt temperature compresses
    the distribution (boost > 1 below-average sources, < 1 above)."""
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = (
        CATALOG["mixture_sqrt_temperature"].spark_fn(spark, sf_dir).collect()
    )
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.w_sqrt for r in rows) - 1.0) < 1e-9
    for r in rows:
        if r.p_raw < 1.0 / len(rows):
            assert r.boost > 1.0
        elif r.p_raw > 1.0 / len(rows):
            assert r.boost < 1.0


def test_canonicalize_idempotent_on_combinatorial_grid(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a nasty
    combinatorial grid (userinfo, mixed case, default/odd ports,
    trailing slashes, tracking params, ?-inside-fragment) — the
    property that makes the canonical URL a stable identity key when
    re-crawled pages arrive already canonicalized."""
    import itertools

    schemes = ["http", "HTTPS"]
    userinfos = ["", "USER:pw@"]
    hosts = ["WWW.Site.COM", "a.b.co.uk"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/P/q//", "/x"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?a=1&utm_b=2&fbclid=z"]
    frags = ["", "#sec", "#f?notaquery=1"]
    urls = [
        "".join(parts)
        for parts in itertools.product(
            schemes, ["://"], userinfos, hosts, ports, paths, queries, frags
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r.c1, r.c2) for r in out if r.c1 != r.c2]
    assert not bad, bad[:5]
    # and the fragment's ? never leaks into the canonical query
    assert all("notaquery" not in r.c1 for r in out)
    assert all("@" not in r.c1 and "USER" not in r.c1 for r in out)
