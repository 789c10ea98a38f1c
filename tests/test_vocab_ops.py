"""Vocabulary-statistics tests: BPE pair counting against a hand
computation, entropy bounds/identities, and JSD's metric properties
(bounds, symmetry of the underlying formula, zero on identical
distributions)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions import text as T
from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def _run_on(entry_name, spark, df, tmp_path):
    path = str(tmp_path / entry_name)
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return CATALOG[entry_name].spark_fn(spark, path)


def test_bpe_pairs_hand_check(spark, tmp_path):
    # corpus: "abab ab" x2, "cd" x1 -> word freqs: abab:2, ab:2, cd:1
    # pairs: abab -> ab,ba,ab (x2); ab -> ab (x2); cd -> cd (x1)
    # counts: ab = 2*2 + 2 = 6, ba = 2, cd = 1
    df = _docs(spark, [("abab ab", "s"), ("abab ab", "s"), ("cd", "s")])
    got = {
        r.pair: (r.pair_count, r.rank)
        for r in _run_on("bpe_merge_pairs_top", spark, df, tmp_path).collect()
    }
    assert got == {"ab": (6, 1), "ba": (2, 2), "cd": (1, 3)}


def test_bpe_single_char_words_ignored(spark, tmp_path):
    df = _docs(spark, [("a b c d e", "s")])
    assert _run_on("bpe_merge_pairs_top", spark, df, tmp_path).count() == 0


def test_entropy_identities(spark, tmp_path):
    df = _docs(
        spark,
        [
            ("x x x x", "s"),  # one distinct token -> H = 0
            ("a b c d", "s"),  # uniform over 4 -> H = 2
            ("a a b b", "s"),  # uniform over 2 -> H = 1
            ("   ", "s"),  # tokenizes to nothing -> absent
        ],
    )
    rows = {
        r.doc_id: r for r in _run_on("text_unigram_entropy", spark, df, tmp_path).collect()
    }
    assert rows[0].entropy == 0.0 and rows[0].n_tokens == 4
    assert rows[1].entropy == 2.0
    assert rows[2].entropy == 1.0
    assert 3 not in rows  # whitespace-only doc has no token rows


def test_entropy_bounded_by_log2_n(spark, sf_dir):
    out = CATALOG["text_unigram_entropy"].spark_fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert -1e-6 <= r.entropy <= math.log2(r.n_tokens) + 1e-6, r


def test_jsd_identical_sources_zero(spark, tmp_path):
    df = _docs(spark, [("a b c", "s1"), ("a b c", "s2")])
    rows = _run_on("mixture_js_divergence", spark, df, tmp_path).collect()
    assert len(rows) == 1
    assert rows[0].source_a == "s1" and rows[0].source_b == "s2"
    assert rows[0].jsd == 0.0


def test_jsd_disjoint_sources_one(spark, tmp_path):
    # disjoint vocabularies -> JSD = 1 bit exactly (log2 base)
    df = _docs(spark, [("a a b", "s1"), ("c d d", "s2")])
    rows = _run_on("mixture_js_divergence", spark, df, tmp_path).collect()
    assert rows[0].jsd == 1.0


def test_jsd_bounds_on_testdata(spark, sf_dir):
    out = CATALOG["mixture_js_divergence"].spark_fn(spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        assert -1e-6 <= r.jsd <= 1.0 + 1e-6, r
        assert r.source_a < r.source_b  # each unordered pair exactly once


def test_bpe_top_is_take_ordered(spark, sf_dir):
    # the top-20 must come from TakeOrdered, not a global sort of the
    # full pair table
    plan = (
        CATALOG["bpe_merge_pairs_top"]
        .spark_fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_pearson_matches_builtin_corr(spark, sf_dir):
    # the exact-decimal five-sums identity must agree with Spark's own
    # corr() to float precision
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    got = {
        r.grp: r.pearson_r
        for r in CATALOG["pearson_quantity_price"].spark_fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    ref = {
        r.grp: r.c
        for r in li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert set(got) == set(ref)
    for g in got:
        assert abs(got[g] - ref[g]) < 1e-5, (g, got[g], ref[g])


def test_pearson_perfect_correlation(spark, tmp_path):
    # y = 3x + 1 exactly -> r = 1
    path = str(tmp_path / "perf")
    df = spark.range(1, 101).select(
        F.lit("A").alias("l_returnflag"),
        F.col("id").cast("double").alias("l_quantity"),
        (F.col("id") * 3 + 1).cast("double").alias("l_extendedprice"),
    )
    df.write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    rows = CATALOG["pearson_quantity_price"].spark_fn(spark, path).collect()
    assert rows[0].pearson_r == 1.0


def test_good_turing_hand_corpus(spark, tmp_path):
    import pyspark.sql.functions as F
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    docs = spark.createDataFrame(
        [
            (1, "a b a b", "en", "s", 7),   # bigrams: "a b" x2, "b a"
            (2, "a b c d", "en", "s", 7),   # "a b", "b c", "c d"
            (3, "x", "en", "s", 1),         # too short: no bigrams
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    row = (
        CATALOG["vocab_good_turing_unseen"]
        .spark_fn(spark, str(tmp_path))
        .collect()[0]
    )
    # counts: "a b"->3, "b a"->1, "b c"->1, "c d"->1 → N=6, types=4,
    # hapax=3, dis=0
    assert (row.n_types, row.n_tokens, row.n_hapax, row.n_dis) == (4, 6, 3, 0)
    assert row.unseen_mass == round(3 / 6, 9)
    assert row.hapax_type_share == round(3 / 4, 9)


def test_blocklist_audit_hand_corpus(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    docs = spark.createDataFrame(
        [
            (1, "the table scan and the table scan again", "en", "s", 9),
            (2, "a slow query", "en", "s", 9),
            (3, "nothing here", "en", "s", 9),
            (4, "table scan plus slow query", "en", "s", 9),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.phrase: r
        for r in CATALOG["blocklist_phrase_audit"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert (got["table scan"].n_docs, got["table scan"].n_occurrences) == (2, 3)
    assert (got["slow query"].n_docs, got["slow query"].n_occurrences) == (2, 2)
    assert got["hash join"].n_docs == 0
    assert got["table scan"].doc_rate == round(2 / 4, 9)
    # every blocklist phrase reports, even at zero hits
    assert len(got) == 4


def test_bpe_train_checkpoint_invariant(spark, sf_dir):
    """Lineage checkpointing must not change the training trajectory.

    Two comparisons: (a) k=6 with and WITHOUT checkpointing — direct
    proof truncation is a no-op on results; (b) k=12 at two different
    cadences (every 2 vs every 5 — boundaries fall on different
    rounds), which exercises the trainer past the gated k=4 depth.
    k=12 UNCHECKED is deliberately absent: each merge layer re-uses
    the split column ~5× and Catalyst's projection collapse inlines
    the layers multiplicatively, so the unchecked 12-deep plan OOMs
    the JVM — the measured reason the parameter exists."""
    from usgs_earthquake_data_pipeline_spark.plans.vocab_ops import _bpe_train

    m6_ck, f6_ck = _bpe_train(spark, sf_dir, 6, checkpoint_every=3)
    m6_no, f6_no = _bpe_train(spark, sf_dir, 6, checkpoint_every=None)
    assert m6_ck == m6_no and len(m6_ck) == 6
    assert sorted(tuple(r) for r in f6_ck.collect()) == sorted(
        tuple(r) for r in f6_no.collect()
    )

    m12_a, f12_a = _bpe_train(spark, sf_dir, 12, checkpoint_every=2)
    m12_b, f12_b = _bpe_train(spark, sf_dir, 12, checkpoint_every=5)
    assert m12_a == m12_b and len(m12_a) == 12
    assert sorted(tuple(r) for r in f12_a.collect()) == sorted(
        tuple(r) for r in f12_b.collect()
    )


def test_pagerank_checkpoint_invariant(spark):
    """Same invariant for pagerank at 9 rounds (crosses one
    checkpoint boundary at 8)."""
    from usgs_earthquake_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 3)],
        "src long, dst long",
    )
    a = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(edges, iterations=9, checkpoint_every=4).collect()
    }
    b = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(edges, iterations=9, checkpoint_every=None).collect()
    }
    assert a == b and len(a) == 4
