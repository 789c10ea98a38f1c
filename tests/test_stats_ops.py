"""Independent numpy cross-checks for the round-8 drift/concentration/
sampling entries — the oracle gate proves Spark == DuckDB; these prove
both equal a from-scratch reimplementation of the statistic."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def _events(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "value", "day(ts) <= 15 AS in_a")
        .collect()
    )
    return rows


def test_chi_square_matches_numpy(spark, sf_dir):
    rows = _events(spark, sf_dir)
    types = sorted({r.event_type for r in rows})
    obs = np.zeros((len(types), 2))
    for r in rows:
        obs[types.index(r.event_type)][0 if r.in_a else 1] += 1
    rt = obs.sum(axis=1, keepdims=True)
    ct = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    exp = rt @ ct / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    got = CATALOG["drift_chi_square_type"].spark_fn(spark, sf_dir).collect()[0]
    assert got.n_types == len(types)
    assert got.dof == len(types) - 1
    assert abs(got.chi2 - chi2) < 1e-5, (got.chi2, chi2)
    assert abs(got.cramers_v - math.sqrt(chi2 / n)) < 1e-6
    assert 0.0 <= got.cramers_v <= 1.0


def test_mann_whitney_matches_numpy(spark, sf_dir):
    rows = _events(spark, sf_dir)
    a = np.array([r.value for r in rows if r.in_a])
    b = np.array([r.value for r in rows if not r.in_a])
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    # average ranks over ties
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n1, n2 = len(a), len(b)
    u = float(ranks[: n1].sum()) - n1 * (n1 + 1) / 2.0
    _, counts = np.unique(allv, return_counts=True)
    ties = float((counts.astype(np.float64) ** 3 - counts).sum())
    nn = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1))))
    z = (u - n1 * n2 / 2.0) / sigma
    got = (
        CATALOG["drift_mann_whitney_value"].spark_fn(spark, sf_dir).collect()[0]
    )
    assert (got.n1, got.n2) == (n1, n2)
    assert got.u_scaled2 == int(round(2 * u))
    assert abs(got.u_stat - u) < 1e-9
    assert abs(got.z_score - z) < 1e-9, (got.z_score, z)


def test_gini_matches_numpy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).collect()
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    got = {
        r.source: r
        for r in CATALOG["gini_length_by_source"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        x = np.sort(np.array(xs, dtype=np.float64))
        n = len(x)
        gini = float(
            (2 * (np.arange(1, n + 1) * x).sum() - (n + 1) * x.sum())
            / (n * x.sum())
        )
        assert got[src].n_docs == n
        assert abs(got[src].gini - gini) < 1e-12
        assert 0.0 <= got[src].gini < 1.0


def test_weighted_reservoir_matches_replication(spark, sf_dir):
    """Replicate the A-ES draw from scratch (md5 → dyadic uniform →
    ln(u)/w → top-50) and demand the identical sample."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    keys = []
    for r in docs:
        h = int(
            hashlib.md5(f"wres42:{r.doc_id}".encode()).hexdigest()[:13], 16
        )
        u = (h + 1) / 4503599627370496.0
        keys.append((math.log(u) / float(r.n_chars), r.doc_id))
    want = sorted(
        d for _, d in sorted(keys, key=lambda t: (-t[0], t[1]))[:50]
    )
    got = [
        r.doc_id
        for r in CATALOG["sample_weighted_reservoir"].spark_fn(spark, sf_dir).collect()
    ]
    assert got == want


def test_weighted_reservoir_prefers_heavy_docs(spark, sf_dir):
    """Sanity on the weighting itself: the sampled docs' mean length
    must exceed the corpus mean (length-proportional inclusion)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg({"n_chars": "avg"}).collect()[0][0]
    sample = CATALOG["sample_weighted_reservoir"].spark_fn(spark, sf_dir)
    sample_mean = sample.agg({"n_chars": "avg"}).collect()[0][0]
    assert sample_mean > corpus_mean


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def _run_on(entry_name, spark, df, tmp_path):
    path = str(tmp_path / entry_name)
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return CATALOG[entry_name].spark_fn(spark, path)


def test_dsir_prefers_target_like_docs(spark, tmp_path):
    """A raw doc written in the target's vocabulary must out-weigh a
    raw doc written in vocabulary the target never uses."""
    target = [("alpha beta alpha beta gamma", "src0")] * 3
    like = ("alpha beta gamma alpha", "srcX")
    unlike = ("zeta eta theta iota", "srcY")
    df = _docs(spark, target + [like, unlike])
    got = {
        r.source: r.dsir_logweight
        for r in _run_on(
            "dsir_importance_resample", spark, df, tmp_path
        ).collect()
    }
    assert set(got) == {"srcX", "srcY"}
    assert got["srcX"] > 0 > got["srcY"], got


def test_fertility_hand_check(spark, tmp_path):
    """'don't stop!' = 2 words, 5 BPE-ish tokens (don / ' / t / stop
    / !) → fertility 2.5."""
    df = _docs(spark, [("don't stop!", "s")])
    r = _run_on("tokenizer_fertility_by_lang", spark, df, tmp_path).collect()
    assert len(r) == 1
    assert (r[0].total_words, r[0].total_tokens) == (2, 5)
    assert abs(r[0].fertility - 2.5) < 1e-12


def test_distinct2_bounds_and_hand_check(spark, tmp_path):
    df = _docs(
        spark,
        [
            ("a b a b a b", "rep"),   # bigrams: ab,ba,ab,ba,ab → 2/5
            ("v w x y z", "div"),     # 4 distinct of 4 → 1.0
        ],
    )
    got = {
        r.source: r
        for r in _run_on(
            "diversity_distinct_ngrams", spark, df, tmp_path
        ).collect()
    }
    assert got["rep"].n_grams == 5 and got["rep"].n_distinct == 2
    assert abs(got["rep"].distinct_2 - 0.4) < 1e-12
    assert got["div"].distinct_2 == 1.0


def test_kn_bigram_hand_check(spark, tmp_path):
    """Corpus 'a b a c': c(ab)=c(ba)=c(ac)=1, c(a·)=2 with 2
    continuation types, c(b·)=1 with 1; N₁₊(·b)=N₁₊(·a)=N₁₊(·c)=1 of
    3 bigram types.  P(b|a)=P(c|a)=0.25/2+0.75·(2/2)·(1/3)=0.375,
    P(a|b)=0.25+0.75·(1/3)=0.5."""
    import math

    df = _docs(spark, [("a b a c", "s")])
    r = _run_on("quality_kn_bigram_bits", spark, df, tmp_path).collect()
    assert len(r) == 1 and r[0].n_bigrams == 3

    def lg(p):
        x = math.log2(p) * 1e6
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    want = -((lg(0.375) + lg(0.5) + lg(0.375)) / 3) / 1e6
    assert abs(r[0].kn_bits - want) < 1e-12
    assert abs(want - 1.2766917) < 1e-6


def test_bucketed_batching_waste_invariants(spark, sf_dir):
    """pad_bucketed ≤ pad_global per bucket (bucketing can only help),
    both non-negative, and the bucket max bounds its members."""
    rows = CATALOG["pack_bucketed_batching_waste"].spark_fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.pad_bucketed <= r.pad_global
        assert r.sum_tok <= r.n_docs * r.max_tok
        assert 16 * r.bucket <= r.max_tok < 16 * (r.bucket + 1)


def test_hill_alpha_matches_numpy(spark, sf_dir):
    """Replicate the Hill estimator (with the micro-unit rounding)
    from the raw lengths."""
    import math

    xs = sorted(
        (
            r.n_chars
            for r in load_table(spark, sf_dir, "documents")
            .select("n_chars")
            .collect()
        ),
        reverse=True,
    )[:100]
    xk = min(xs)

    def lg(v):
        x = math.log(v / xk) * 1e6
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    terms = [lg(x) for x in xs if x > xk]
    mean_log = (sum(terms) / len(terms)) / 1e6
    got = CATALOG["tail_index_hill_length"].spark_fn(spark, sf_dir).collect()[0]
    assert got.n_exceed == len(terms)
    assert abs(got.hill_mean_log - mean_log) < 1e-12
    assert abs(got.hill_alpha - 1.0 / mean_log) < 1e-9


def test_calibration_bins_partition_evenly(spark, sf_dir):
    rows = CATALOG["curation_calibration_bins"].spark_fn(
        spark, sf_dir
    ).collect()
    assert [r.bin for r in rows] == list(range(1, 11))
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile's equal-population law
    # mean_logit must be non-decreasing across bins (sorted binning)
    ml = [r.mean_logit for r in rows]
    assert all(a <= b for a, b in zip(ml, ml[1:]))


def test_mann_kendall_matches_numpy(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("day(ts) AS d")
        .groupBy("d")
        .count()
        .collect()
    )
    xs = [r["count"] for r in sorted(rows, key=lambda r: r.d)]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(c * (c - 1) * (2 * c + 5) for c in Counter(xs).values())
    import math

    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    z = (s - cc) / math.sqrt(var)
    got = CATALOG["trend_mann_kendall_daily"].spark_fn(spark, sf_dir).collect()[0]
    assert got.s == s and got.n_days == n
    assert abs(got.z_score - z) < 1e-9


def test_cohens_kappa_identity_and_bounds(spark, sf_dir):
    """kappa == (agree*N - pe_num)/(N^2 - pe_num) recomputed from the
    gated confusion matrix, and bounded by (-1, 1]."""
    cm = CATALOG["lang_id_confusion_matrix"].spark_fn(spark, sf_dir).collect()
    n = sum(r.n_docs for r in cm)
    agree = sum(r.n_docs for r in cm if r.declared == r.guessed)
    row = {}
    col = {}
    for r in cm:
        row[r.declared] = row.get(r.declared, 0) + r.n_docs
        col[r.guessed] = col.get(r.guessed, 0) + r.n_docs
    pe_num = sum(row[k] * col.get(k, 0) for k in row)
    got = CATALOG["lang_id_cohens_kappa"].spark_fn(spark, sf_dir).collect()[0]
    assert (got.n, got.agree, got.pe_num) == (n, agree, pe_num)
    want = (agree * n - pe_num) / (n * n - pe_num)
    assert got.kappa == want  # single exact-int division: bit equality
    assert -1.0 < got.kappa <= 1.0


def test_centroid_dist_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", "embedding")
        .collect()
    )
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            np.round(np.array(r.embedding, dtype=np.float64) * 1e6)
        )
    cents = {
        k: np.stack(v).sum(axis=0) / len(v) for k, v in by_label.items()
    }
    got = CATALOG["embedding_label_centroid_dist"].spark_fn(
        spark, sf_dir
    ).collect()
    labels = sorted(by_label)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for r in got:
        want = float(
            np.linalg.norm(cents[r.label_a] - cents[r.label_b]) / 1e6
        )
        assert abs(r.centroid_dist - want) < 1e-5, (r, want)
