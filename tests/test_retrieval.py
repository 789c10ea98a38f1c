"""BM25 retrieval (operators.retrieval): scores against a
hand-computed reference corpus, ranking/tiebreak determinism, and the
plan-shape contract (r13 single-pass form: ONE tokenize pass whose
per-doc aggregate carries |Q| conditional term counters, corpus stats
from a one-row aggregate over that materialized frame — no term-stats
join, no scan behind the lazy checkpoint, TakeOrdered top-k — never a
global sort)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.retrieval import bm25_topk
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ref_bm25(corpus, query, k1=1.2, b=0.75):
    """Plain-python BM25 reference (same Lucene variant)."""
    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    sum_dl = sum(len(t) for t in toks.values())
    scores = {}
    for i, t in toks.items():
        dl = len(t)
        s = 0.0
        for q in set(query):
            tf = t.count(q)
            if tf == 0:
                continue
            df_t = sum(1 for tt in toks.values() if q in tt)
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dl * n / sum_dl)
            )
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_hand_reference(spark):
    corpus = {
        1: "a b a",
        2: "a c",
        3: "d d d",
        4: "b c e",  # no query terms — must not appear
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id LONG, text STRING")
    got = bm25_topk(df, "doc_id", "text", ["a", "d"], k=10).collect()
    ref = _ref_bm25(corpus, ["a", "d"])
    assert {r.id: r.score for r in got} == ref
    # ranking: score desc, id asc tiebreak; ranks are 1..n
    expect_order = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.id, r.rank) for r in got] == [
        (i, rk + 1) for rk, (i, _) in enumerate(expect_order)
    ]


def test_bm25_k1_zero_no_nan(spark):
    """k1=0 is a legal BM25 parameter (pure presence scoring). The
    r13 single-pass form divided by (tf + k1·norm) for EVERY query
    term including tf==0 ones, which at k1=0 is 0.0/0.0 = NaN —
    poisoning any matched doc that misses one query term. The r14
    guard (tf>0 branch) must reproduce the reference exactly."""
    corpus = {
        1: "a b a",  # has a, not d — the NaN victim before the guard
        2: "a d",
        3: "c c c",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id LONG, text STRING")
    got = {r.id: r.score for r in
           bm25_topk(df, "doc_id", "text", ["a", "d"], k=10, k1=0.0).collect()}
    ref = _ref_bm25(corpus, ["a", "d"], k1=0.0)
    assert got == ref
    assert all(s == s for s in got.values())  # no NaN


def test_bm25_k_truncates_and_rank_is_dense(spark):
    df = spark.createDataFrame(
        [(i, "hit " * (i + 1)) for i in range(6)], "doc_id LONG, text STRING"
    )
    got = bm25_topk(df, "doc_id", "text", ["hit"], k=3).collect()
    assert len(got) == 3
    assert [r.rank for r in got] == [1, 2, 3]


def test_bm25_plan_prunes_broadcasts_and_takeordered(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = bm25_topk(docs, "doc_id", "text", ["spark", "merge", "window"], k=10)
    plan = _plan(df)
    # top-k is TakeOrdered, never a global Sort+Limit over the corpus
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # single tokenize pass (r13): the corpus scan lives behind ONE
    # lazily checkpointed per-doc aggregate — the final plan consumes
    # the checkpoint, so no parquet scan of documents remains and no
    # term-stats join exists (df_t rides the one-row stats aggregate)
    assert plan.count("Scan parquet") == 0
    assert "SortMergeJoin" not in plan
    df.count()  # the plan executes


def test_curriculum_sample_is_subset_with_monotone_quality(spark, sf_dir):
    """sample_quality_curriculum keeps a deterministic subset whose
    acceptance follows the clamped linear map of the classifier
    logit; re-running yields the identical set (resumable-training
    requirement)."""
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    entry = CATALOG["sample_quality_curriculum"]
    a = [tuple(r) for r in entry.spark_fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in entry.spark_fn(spark, sf_dir).collect()]
    assert a == b and a
    for _, p in a:
        assert 0.05 <= p <= 0.95


def test_bm25_fuzz_against_reference(spark):
    """Randomized corpora (fixed seed — reproducible) vs the pure
    python reference: scores, membership, and ranking must agree for
    every query against every corpus."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e", "f"]
    for trial in range(5):
        corpus = {
            i: " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 12))
            )
            for i in range(rng.randint(2, 12))
        }
        query = rng.sample(vocab, rng.randint(1, 3))
        df = spark.createDataFrame(
            list(corpus.items()), "doc_id LONG, text STRING"
        )
        got = bm25_topk(df, "doc_id", "text", query, k=100).collect()
        ref = _ref_bm25(corpus, query)
        assert {r.id: r.score for r in got} == ref, (trial, query, corpus)
        expect_order = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [r.id for r in got] == [i for i, _ in expect_order]


def test_ndcg_eval_hand_corpus(spark, tmp_path):
    import math

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    # 3 relevant docs (contain spark+merge+window); doc 4 scores on
    # 'spark spark' but is not relevant; doc 5 is noise
    docs = spark.createDataFrame(
        [
            (1, "spark merge window", "en", "s", 18),
            (2, "spark merge window extra words here", "en", "s", 30),
            (3, "big spark and merge and window", "en", "s", 30),
            (4, "spark spark spark spark", "en", "s", 23),
            (5, "totally unrelated content", "en", "s", 25),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    row = (
        CATALOG["rag_eval_ndcg_bm25"].spark_fn(spark, str(tmp_path)).collect()[0]
    )
    assert row.n_relevant == 3
    # all 3 relevant docs rank in the top 10 (only 4 docs score)
    assert row.hits_at_10 == 3
    assert 0.0 < row.ndcg_at_10 <= 1.0
    assert row.mrr_at_10 in (1.0, 0.5, round(1 / 3, 6), 0.25)
    # perfect-ordering check: if the 3 relevant docs occupy the top 3
    # ranks, ndcg must be exactly 1.0 (DCG == IDCG by construction)
    ranked = bm25_topk(
        docs, "doc_id", "text", ["spark", "merge", "window"], k=10
    ).collect()
    hits = {r.id: r.rank for r in ranked}
    if all(hits.get(d, 99) <= 3 for d in (1, 2, 3)):
        assert row.ndcg_at_10 == 1.0


def test_pmi_prefers_exclusive_pair(spark, tmp_path):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    # "alpha beta" always co-occur exclusively (5 times, the support
    # floor); "the of" are frequent but independent filler
    rows = []
    for i in range(5):
        rows.append((i, "alpha beta", "en", "s", 10))
    for i in range(5, 25):
        rows.append((i, "the of the of the of", "en", "s", 20))
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = CATALOG["vocab_pmi_collocations"].spark_fn(
        spark, str(tmp_path)
    ).collect()
    assert got, "support-floor pairs must exist"
    # the exclusive pair outranks the independent filler pairs
    assert got[0].gram == "alpha beta"
    assert all(got[0].pmi >= r.pmi for r in got)


def test_ranker_shootout_bounds_and_composition(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = {
        r.ranker: r
        for r in CATALOG["rag_eval_ranker_shootout"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"bm25", "cosine", "rrf", "maxsim"}
    for r in rows.values():
        assert 0 <= r.hits_at_10 <= 10
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert 0.0 <= r.mrr_at_10 <= 1.0
    # the shootout's bm25 row must agree with the standalone eval
    solo = CATALOG["rag_eval_ndcg_bm25"].spark_fn(spark, sf_dir).collect()[0]
    assert rows["bm25"].hits_at_10 == solo.hits_at_10
    assert rows["bm25"].ndcg_at_10 == solo.ndcg_at_10
    assert rows["bm25"].mrr_at_10 == solo.mrr_at_10
