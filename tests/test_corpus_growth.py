"""Property and invariant tests for the round-7 corpus-growth /
exact-substring entries: duplicated-span detection must equal a
pure-Python reference (island merging included); the cluster-safe
split must provably never straddle a duplicate group; the Heaps /
novelty curves must satisfy their defining monotonicity and boundary
identities; the source-overlap matrix must equal a set-arithmetic
reference. Every property writes its generated corpus as a documents
table and runs the real catalog entry over it."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

# tiny word alphabet => 5-gram collisions actually occur at corpus
# sizes hypothesis can afford
_WORDS = st.lists(st.sampled_from(["a", "b", "c", "aa"]), max_size=14)
_CORPUS = st.lists(
    st.tuples(_WORDS, st.sampled_from(["s1", "s2", "s3"])),
    min_size=1,
    max_size=10,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_counter = iter(range(10**6))


@pytest.fixture(scope="module")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("corpus_growth")


def _write_docs(spark, tmp_root, rows, tag):
    path = str(tmp_root / f"prop_{tag}")
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def _py_tokens(s: str) -> list[str]:
    t = s.strip()
    return re.split(r"\s+", t) if t else []


def _py_spans(texts: list[str], n: int = 5) -> list[tuple[int, int, int]]:
    """Reference: maximal runs of stride-1 n-gram positions whose gram
    occurs more than once corpus-wide. Returns (doc, start, end_excl)."""
    gram_count: Counter = Counter()
    positions: list[tuple[int, int, str]] = []
    for d, text in enumerate(texts):
        tk = _py_tokens(text)
        for p in range(len(tk) - n + 1):
            gm = " ".join(tk[p : p + n])
            gram_count[gm] += 1
            positions.append((d, p, gm))
    by_doc: dict[int, list[int]] = {}
    for d, p, gm in positions:
        if gram_count[gm] > 1:
            by_doc.setdefault(d, []).append(p)
    spans = []
    for d, ps in by_doc.items():
        ps.sort()
        start = prev = ps[0]
        for p in ps[1:]:
            if p == prev + 1:
                prev = p
            else:
                spans.append((d, start, prev + n))
                start = prev = p
        spans.append((d, start, prev + n))
    return sorted(spans)


@given(corpus=_CORPUS)
@_SETTINGS
def test_dup_spans_match_python_reference(spark, tmp_root, corpus):
    rows = [(" ".join(ws), s) for ws, s in corpus]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    got = [
        (r.doc_id, r.span_start, r.span_end)
        for r in CATALOG["dedup_dup_spans"].spark_fn(spark, path).collect()
    ]
    assert got == _py_spans([t for t, _ in rows])


def test_dup_spans_constructed_shapes(spark, tmp_root):
    """Hand-built corpus: a shared 7-token run appears in two docs =>
    one maximal 7-token span each (islands merge the 3 overlapping
    5-gram hits); a doc with no repeated 5-gram yields nothing."""
    shared = "q w e r t y u"
    rows = [
        (f"{shared} one two three", "s1"),
        (f"zero {shared} four five", "s2"),
        ("totally fresh words nothing repeats here at all", "s3"),
    ]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    got = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in CATALOG["dedup_dup_spans"].spark_fn(spark, path).collect()
    }
    assert got == {0: (0, 7, 7), 1: (1, 8, 7)}


@given(corpus=_CORPUS)
@_SETTINGS
def test_dup_spans_invariants(spark, tmp_root, corpus):
    rows = [(" ".join(ws), s) for ws, s in corpus]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in CATALOG["dedup_dup_spans"].spark_fn(spark, path).collect():
        assert r.span_tokens == r.span_end - r.span_start >= 5
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        # maximal spans never touch: a gap of 0 would have merged
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 - 4  # next island starts past the previous run


def test_split_cluster_safe_never_straddles(spark, tmp_root):
    """Force duplicate texts whose doc_ids hash into different naive
    splits: the safe policy must co-assign them (straddle_safe == 0)
    while the naive policy straddles at least one group."""
    dup_text = "the same exact document body repeated verbatim"
    rows = [(dup_text, "s1") for _ in range(40)] + [
        (f"unique filler number {i}", "s2") for i in range(40)
    ]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    out = CATALOG["split_cluster_safe"].spark_fn(spark, path).collect()
    assert sum(r.n_docs for r in out) == len(rows)
    assert all(r.straddle_safe == 0 for r in out)
    assert all(r.straddle_naive >= 1 for r in out)  # 40 copies straddle
    # the duplicate block lands whole: some split holds >= 40 docs
    assert max(r.n_docs for r in out) >= 40


@given(corpus=_CORPUS)
@_SETTINGS
def test_split_cluster_safe_conserves_and_caps(spark, tmp_root, corpus):
    rows = [(" ".join(ws), s) for ws, s in corpus]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    out = CATALOG["split_cluster_safe"].spark_fn(spark, path).collect()
    assert sum(r.n_docs for r in out) == len(rows)
    assert all(r.straddle_safe == 0 for r in out)
    assert all(0 <= r.n_moved <= r.n_docs for r in out)


def test_heaps_curve_identities(spark, tmp_root):
    """All-new-words corpus: vocabulary == tokens at every decile
    (beta == 1 exactly on the log-log line); all-same-doc corpus:
    vocabulary flat after the first decile."""
    fresh = [
        (" ".join(f"w{d}x{i}" for i in range(6)), "s1") for d in range(20)
    ]
    path = _write_docs(spark, tmp_root, fresh, next(_counter))
    rows = CATALOG["vocab_heaps_beta"].spark_fn(spark, path).collect()
    assert [r.cum_vocab for r in rows] == [r.cum_tokens for r in rows]
    assert all(abs(r.heaps_beta - 1.0) < 1e-6 for r in rows)

    same = [("alpha beta gamma delta", "s1") for _ in range(20)]
    path = _write_docs(spark, tmp_root, same, next(_counter))
    rows = CATALOG["vocab_heaps_beta"].spark_fn(spark, path).collect()
    assert all(r.cum_vocab == 4 for r in rows)
    # monotone token growth, sorted bucket output
    toks = [r.cum_tokens for r in rows]
    assert toks == sorted(toks) and len(set(toks)) == len(toks)


@given(corpus=_CORPUS)
@_SETTINGS
def test_novelty_decile_identities(spark, tmp_root, corpus):
    rows_in = [(" ".join(ws), s) for ws, s in corpus]
    path = _write_docs(spark, tmp_root, rows_in, next(_counter))
    rows = CATALOG["ngram_novelty_decile"].spark_fn(spark, path).collect()
    grams_by_bucket: dict[int, set] = {}
    n_docs = len(rows_in)
    max_id = n_docs - 1
    for d, (text, _) in enumerate(rows_in):
        tk = _py_tokens(text)
        b = d * 10 // (max_id + 1)
        for p in range(len(tk) - 2):
            grams_by_bucket.setdefault(b, set()).add(" ".join(tk[p : p + 3]))
    if not grams_by_bucket:
        assert rows == []
        return
    first_bucket = min(grams_by_bucket)
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_new <= r.n_grams == len(grams_by_bucket[r.bucket])
        if r.bucket == first_bucket:
            assert r.novelty == 1.0 and r.n_new == r.n_grams
    # every distinct gram is new exactly once
    assert sum(r.n_new for r in rows) == len(set().union(*grams_by_bucket.values()))


@given(corpus=_CORPUS)
@_SETTINGS
def test_source_overlap_matches_set_arithmetic(spark, tmp_root, corpus):
    rows_in = [(" ".join(ws), s) for ws, s in corpus]
    path = _write_docs(spark, tmp_root, rows_in, next(_counter))
    got = {
        (r.src_a, r.src_b): (r.n_inter, r.jaccard)
        for r in CATALOG["source_overlap_jaccard"].spark_fn(spark, path).collect()
    }
    sets: dict[str, set] = {}
    for text, src in rows_in:
        tk = _py_tokens(text)
        for p in range(len(tk) - 2):
            sets.setdefault(src, set()).add(" ".join(tk[p : p + 3]))
    want = {}
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = (inter, round(inter / len(sets[a] | sets[b]), 6))
    assert got.keys() == want.keys()
    for k, (n_i, jac) in want.items():
        assert got[k][0] == n_i
        assert abs(got[k][1] - jac) < 1e-9


def _py_removal(texts: list[str]) -> dict[int, tuple[int, int, str]]:
    """Reference keep-one span removal: group spans by exact text,
    keep the (doc_id, start)-smallest occurrence, drop the rest."""
    groups: dict[str, list[tuple[int, int, int]]] = {}
    for d, s, e in _py_spans(texts):
        tk = _py_tokens(texts[d])
        groups.setdefault(" ".join(tk[s:e]), []).append((d, s, e))
    rem: dict[int, list[tuple[int, int]]] = {}
    for occ in groups.values():
        occ.sort()
        for d, s, e in occ[1:]:
            rem.setdefault(d, []).append((s, e))
    out = {}
    for d, sps in rem.items():
        tk = _py_tokens(texts[d])
        drop = {i for s, e in sps for i in range(s, e)}
        kept = [t for i, t in enumerate(tk) if i not in drop]
        out[d] = (len(tk), len(tk) - len(kept), " ".join(kept))
    return out


@given(corpus=_CORPUS)
@_SETTINGS
def test_span_removal_matches_python_reference(spark, tmp_root, corpus):
    rows = [(" ".join(ws), s) for ws, s in corpus]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in CATALOG["dedup_dup_span_removal"].spark_fn(spark, path).collect()
    }
    assert got == _py_removal([t for t, _ in rows])


def test_span_removal_keeps_canonical_copy(spark, tmp_root):
    """Two identical docs: the later copy is removed entirely, the
    canonical first copy is untouched (absent from the output). A doc
    repeating its own 5-gram run keeps exactly one occurrence."""
    body = "alpha beta gamma delta epsilon zeta"
    rows = [
        (body, "s1"),
        (body, "s2"),
        ("x1 y1 z1 w1 v1 x1 y1 z1 w1 v1", "s3"),
    ]
    path = _write_docs(spark, tmp_root, rows, next(_counter))
    got = {
        r.doc_id: (r.n_removed, r.clean_text)
        for r in CATALOG["dedup_dup_span_removal"].spark_fn(spark, path).collect()
    }
    assert got == {1: (6, ""), 2: (5, "x1 y1 z1 w1 v1")}


def test_sq8_quantization_error_certificate(spark, tmp_root):
    """SQ8 certificate against numpy: per-dim min/max ranges, codes
    floor(x*255/range + 0.5), and every vector's error within half a
    step. Constructed vectors include exact range endpoints (code 0
    and 255 => zero error) and a constant dimension (denom == 0)."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-2, 3, size=(30, 64)).astype(np.float32)
    vecs[:, 5] = 1.25  # constant dim: denom == 0 path
    vecs[0, 0] = -4.0  # forced endpoints on dim 0
    vecs[1, 0] = 6.0
    path = str(tmp_root / "sq8")
    spark.createDataFrame(
        [(i, [float(v) for v in row], 0) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    rows = (
        CATALOG["embedding_sq8_error_checked"].spark_fn(spark, path).collect()
    )
    assert len(rows) == 30
    x = vecs.astype(np.float64)
    mn, mx = x.min(axis=0), x.max(axis=0)
    denom = mx - mn
    safe = np.where(denom == 0, 1.0, denom)
    code = np.clip(np.floor((x - mn) * 255.0 / safe + 0.5), 0, 255)
    code[:, denom == 0] = 0.0
    err = np.round(np.abs(x - (mn + code * denom / 255.0)), 9)
    for r in rows:
        assert r.within_bound, r
        assert abs(r.mean_abs_err - round(err[r.vec_id].sum() / 64.0, 6)) <= 1e-6
        assert abs(r.max_abs_err - round(err[r.vec_id].max(), 6)) <= 1e-6
    # endpoint vectors quantize dim 0 exactly
    assert err[0, 0] == 0.0 and err[1, 0] == 0.0


def test_threshold_sweep_consistent_with_single_threshold(spark, sf_dir):
    """The sweep's cumulative count at bin 7 must equal the number of
    pairs the single-threshold t=0.7 operator finds, and the bin-3
    cumulative must equal the t=0.3 headline entry's row count — the
    curve and its point evaluations are the same measurement."""
    rows = {
        r.bin: r
        for r in CATALOG["dedup_jaccard_threshold_sweep"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert rows, "sweep found no pairs at sf0.001 — corpus has dups"
    total_03 = CATALOG["dedup_ngram_jaccard"].spark_fn(spark, sf_dir).count()
    cum_at_3 = sum(r.n_pairs for b, r in rows.items() if b >= 3)
    assert cum_at_3 == total_03
    min_bin = min(rows)
    for b, r in rows.items():
        assert 1 <= b <= 10
        assert abs(r.jaccard_lo - b / 10.0) < 1e-12
    # cumulative is a suffix sum: decreasing in bin, consistent totals
    bins = sorted(rows)
    for lo, hi in zip(bins, bins[1:]):
        assert rows[lo].n_pairs_at_or_above >= rows[hi].n_pairs_at_or_above
    assert sum(r.n_pairs for r in rows.values()) == rows[min_bin].n_pairs_at_or_above


def test_quality_median_calibration_identities(spark, sf_dir):
    """calibration_gap must be median_logit minus ONE shared reference,
    and that reference must be the lower median of the source medians;
    every source present, doc counts conserved."""
    rows = CATALOG["quality_median_by_source"].spark_fn(spark, sf_dir).collect()
    import duckdb

    con = duckdb.connect()
    n_docs, n_src = con.execute(
        f"SELECT count(*), count(DISTINCT source) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    assert len(rows) == n_src
    assert sum(r.n_docs for r in rows) == n_docs
    refs = {round(r.median_logit - r.calibration_gap, 6) for r in rows}
    assert len(refs) == 1  # one shared reference
    meds = sorted((r.median_logit, r.source) for r in rows)
    want_ref = meds[(len(meds) + 1) // 2 - 1][0]
    assert abs(refs.pop() - round(want_ref, 6)) <= 1e-9


def test_split_contamination_constructed(spark, tmp_root):
    """Constructed corpus: doc_ids picked so the hash split puts one
    copy of a shared 5-gram run in train and one in each held-out
    split; a fully-unique eval doc stays clean."""
    from usgs_earthquake_data_pipeline_spark.plans.sampling import hash_bucket

    # find doc ids landing in each split under the real hash
    buckets = {}
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    for r in df.select("doc_id", hash_bucket("doc_id").alias("b")).collect():
        split = "train" if r.b < 80 else ("val" if r.b < 90 else "test")
        buckets.setdefault(split, []).append(r.doc_id)
    shared = "s1 s2 s3 s4 s5 filler words here"
    rows = []
    rows.append((buckets["train"][0], shared))
    rows.append((buckets["val"][0], shared))                 # contaminated
    rows.append((buckets["val"][1], "clean v1 v2 v3 v4 v5 v6"))  # clean
    rows.append((buckets["test"][0], shared))                # contaminated
    path = str(tmp_root / "contam")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = {
        r.split: (r.n_docs, r.n_contaminated, r.contamination_pct)
        for r in CATALOG["split_contamination_report"].spark_fn(spark, path).collect()
    }
    assert out == {"val": (2, 1, 0.5), "test": (1, 1, 1.0)}
