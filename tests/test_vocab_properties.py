"""Property-based tests (hypothesis) for the vocabulary-statistics
entries: BPE pair counts must equal a pure-Python reference exactly;
entropy and pairwise JSD must agree with the textbook formulas to
well inside their documented rounding slack (per-term 9 dp rounding +
final 6 dp round). Each property writes the generated corpus as a
documents table and runs the real catalog entry over it."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Nd"),
        whitelist_characters=" .-",
    ),
    max_size=60,
)

_CORPUS = st.lists(
    st.tuples(_TEXT, st.sampled_from(["s1", "s2", "s3"])),
    min_size=1,
    max_size=12,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_tokens(s: str) -> list[str]:
    t = s.strip(" ")
    toks = re.split(r"[ \t\n\x0b\f\r]+", t) if t else []
    return [w for w in toks if w]


def _write_docs(spark, tmp_path, rows, tag):
    path = str(tmp_path / f"prop_{tag}")
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


_counter = iter(range(10**6))


@pytest.fixture(scope="module")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("vocab_props")


@given(corpus=_CORPUS)
@_SETTINGS
def test_bpe_pairs_match_python_reference(spark, tmp_root, corpus):
    path = _write_docs(spark, tmp_root, corpus, next(_counter))
    got = {
        r.pair: r.pair_count
        for r in CATALOG["bpe_merge_pairs_top"].spark_fn(spark, path).collect()
    }
    wf = Counter(
        w for text, _ in corpus for w in _py_tokens(text) if len(w) >= 2
    )
    pairs: Counter = Counter()
    for w, c in wf.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    want = dict(
        sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    )
    assert got == want


@given(corpus=_CORPUS)
@_SETTINGS
def test_entropy_matches_python_reference(spark, tmp_root, corpus):
    path = _write_docs(spark, tmp_root, corpus, next(_counter))
    got = {
        r.doc_id: (r.n_tokens, r.entropy)
        for r in CATALOG["text_unigram_entropy"].spark_fn(spark, path).collect()
    }
    for i, (text, _) in enumerate(corpus):
        tf = Counter(_py_tokens(text))
        n = sum(tf.values())
        if n == 0:
            assert i not in got
            continue
        h = -sum((c / n) * math.log2(c / n) for c in tf.values())
        n_got, h_got = got[i]
        assert n_got == n
        assert abs(h_got - h) < 1e-4, (i, h_got, h)


@given(corpus=_CORPUS)
@_SETTINGS
def test_jsd_matches_python_reference(spark, tmp_root, corpus):
    path = _write_docs(spark, tmp_root, corpus, next(_counter))
    rows = CATALOG["mixture_js_divergence"].spark_fn(spark, path).collect()
    dists: dict[str, Counter] = {}
    for text, src in corpus:
        dists.setdefault(src, Counter()).update(_py_tokens(text))
    dists = {s: c for s, c in dists.items() if sum(c.values()) > 0}
    present = sorted(dists)
    want_pairs = {
        (a, b) for i, a in enumerate(present) for b in present[i + 1 :]
    }
    assert {(r.source_a, r.source_b) for r in rows} == want_pairs
    for r in rows:
        pa_n = sum(dists[r.source_a].values())
        pb_n = sum(dists[r.source_b].values())
        terms = set(dists[r.source_a]) | set(dists[r.source_b])
        jsd = 0.0
        for t in terms:
            pa = dists[r.source_a][t] / pa_n
            pb = dists[r.source_b][t] / pb_n
            m = (pa + pb) / 2
            if pa > 0:
                jsd += 0.5 * pa * math.log2(pa / m)
            if pb > 0:
                jsd += 0.5 * pb * math.log2(pb / m)
        assert abs(r.jsd - jsd) < 2e-5, (r.source_a, r.source_b, r.jsd, jsd)
        assert r.n_terms == len(terms)


@given(corpus=_CORPUS)
@_SETTINGS
def test_bigram_perplexity_matches_python_reference(spark, tmp_root, corpus):
    path = _write_docs(spark, tmp_root, corpus, next(_counter))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in CATALOG["quality_perplexity_bigram"].spark_fn(spark, path).collect()
    }
    uni: Counter = Counter()
    bigrams: Counter = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for i, (text, _) in enumerate(corpus):
        toks = _py_tokens(text)
        uni.update(toks)
        bg = list(zip(toks, toks[1:]))
        bigrams.update(bg)
        if bg:
            per_doc[i] = bg
    v = len(uni)
    assert set(got) == set(per_doc)
    for i, bg in per_doc.items():
        n_got, s_got = got[i]
        assert n_got == len(bg)
        want = sum(
            -math.log((bigrams[p] + 0.5) / (uni[p[0]] + 0.5 * v)) for p in bg
        ) / len(bg)
        # per-term 6 dp rounding + final 6 dp round → ≤ ~1e-6 slack/term
        assert abs(s_got - want) < 2e-6, (i, s_got, want)


# ASCII-only corpus for the BPE trainer property: the argmax tiebreak
# compares pair STRINGS, and ASCII is where Python (code points),
# Spark (UTF-16 units) and DuckDB (UTF-8 bytes) orderings provably
# coincide — non-ASCII ordering is not part of the entry's contract.
_ASCII_CORPUS = st.lists(
    st.tuples(
        st.text(alphabet="ab cde.19", max_size=30),
        st.sampled_from(["s1", "s2"]),
    ),
    min_size=1,
    max_size=10,
)


def _py_bpe(corpus, k=4):
    wf = Counter(w for text, _ in corpus for w in _py_tokens(text))
    sym = {w: list(w) for w in wf}
    merges = []
    for it in range(1, k + 1):
        pairs: Counter = Counter()
        for w, c in wf.items():
            s = sym[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((it, f"{a} {b}", cnt))
        for w, s in sym.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            sym[w] = out
    symcounts: Counter = Counter()
    for w, c in wf.items():
        for s in sym[w]:
            symcounts[s] += c
    return merges, symcounts


@given(corpus=_ASCII_CORPUS)
@_SETTINGS
def test_bpe_trainer_matches_python_reference(spark, tmp_root, corpus):
    path = _write_docs(spark, tmp_root, corpus, next(_counter))
    got = [
        (r.iteration, r.pair, r.pair_count)
        for r in CATALOG["bpe_train_merges_k4"].spark_fn(spark, path).collect()
    ]
    assert got == _py_bpe(corpus)[0]


@given(corpus=_ASCII_CORPUS)
@_SETTINGS
def test_bpe_encode_matches_python_reference(spark, tmp_root, corpus):
    path = _write_docs(spark, tmp_root, corpus, next(_counter))
    got = [
        (r.sym, r.n_occurrences)
        for r in CATALOG["bpe_encode_vocab_top"].spark_fn(spark, path).collect()
    ]
    _, symcounts = _py_bpe(corpus)
    want = sorted(symcounts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want
    # chars conserved: symbol lengths weighted by frequency = corpus chars
    total_chars = sum(len(w) for text, _ in corpus for w in _py_tokens(text))
    assert sum(len(s) * c for s, c in symcounts.items()) == total_chars
