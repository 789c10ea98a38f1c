"""Round-7 additions: late-interaction MaxSim retrieval, mutual k-NN
graph, JL projection certificate, WOE/IV screening — each checked
against a plain-python/numpy reference on hand-built frames, plus the
plan-shape contracts (TakeOrdered top-k, intended join strategies)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.linalg import (
    jl_sign_matrix,
)
from usgs_earthquake_data_pipeline_spark.operators.retrieval import (
    maxsim_topk,
)
from usgs_earthquake_data_pipeline_spark.operators.similarity import (
    mutual_knn_edges,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# MaxSim
# ---------------------------------------------------------------------------


def _ref_maxsim(corpus: dict[int, list[float]], q: list[float], m: int):
    sub = len(q) // m
    qs = [q[i * sub : (i + 1) * sub] for i in range(m)]
    out = {}
    for i, v in corpus.items():
        ds = [v[j * sub : (j + 1) * sub] for j in range(m)]
        out[i] = round(
            sum(
                max(sum(a * b for a, b in zip(qv, dv)) for dv in ds)
                for qv in qs
            ),
            6,
        )
    return out


def test_maxsim_matches_hand_reference(spark):
    corpus = {
        1: [1.0, 0.0, 0.0, 1.0],
        2: [0.0, 1.0, 1.0, 0.0],
        3: [0.5, 0.5, -0.5, 0.5],
    }
    q = [1.0, 0.0, 0.0, 1.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in corpus.items()], "id LONG, vec ARRAY<DOUBLE>"
    )
    got = {r.id: r.score for r in maxsim_topk(df, "id", "vec", q, m=2, k=10).collect()}
    assert got == _ref_maxsim(corpus, q, m=2)


def test_maxsim_self_score_bounded_below_by_slot_norms(spark):
    # against itself, each query slot's max includes the aligned slot,
    # so self-score ≥ Σ_i ||Q_i||² (self need NOT rank first — cross-
    # slot alignment can favor another doc; that asymmetry vs plain
    # cosine is the point of late interaction)
    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=8).tolist() for i in range(1, 6)}
    q = vecs[3]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id LONG, vec ARRAY<DOUBLE>"
    )
    got = {
        r.id: r.score
        for r in maxsim_topk(df, "id", "vec", q, m=4, k=10).collect()
    }
    norm2 = sum(x * x for x in q)
    assert got[3] >= round(norm2, 6) - 1e-9


def test_maxsim_exceeds_single_vector_dot(spark):
    # maxsim with m slots upper-bounds the single-vector dot: each
    # slot's best match is at least the aligned slot's contribution
    rng = np.random.default_rng(11)
    vecs = {i: rng.normal(size=8).tolist() for i in range(1, 9)}
    q = rng.normal(size=8).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id LONG, vec ARRAY<DOUBLE>"
    )
    got = {
        r.id: r.score
        for r in maxsim_topk(df, "id", "vec", q, m=4, k=10).collect()
    }
    for i, v in vecs.items():
        plain = sum(a * b for a, b in zip(q, v))
        assert got[i] >= round(plain, 6) - 1e-9


def test_maxsim_plan_is_takeordered_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 0.5]) for i in range(20)],
        "id LONG, vec ARRAY<DOUBLE>",
    )
    plan = _plan(maxsim_topk(df, "id", "vec", [1.0, 0.0, 0.0, 1.0], m=2, k=5))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_maxsim_rejects_bad_slot_count(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id LONG, vec ARRAY<DOUBLE>")
    try:
        maxsim_topk(df, "id", "vec", [1.0, 2.0, 3.0], m=2)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("m must divide dim")


# ---------------------------------------------------------------------------
# Mutual k-NN
# ---------------------------------------------------------------------------


def _ref_mutual(vecs: dict[int, np.ndarray], k: int):
    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    topk = {}
    for s, va in vecs.items():
        sims = sorted(
            ((cos(va, vb), -d, d) for d, vb in vecs.items() if d != s),
            key=lambda t: (-t[0], t[2]),
        )[:k]
        topk[s] = {d: r + 1 for r, (_, _, d) in enumerate(sims)}
    edges = {}
    for s, nbrs in topk.items():
        for d, rf in nbrs.items():
            if s < d and s in topk.get(d, {}):
                edges[(s, d)] = (rf, topk[d][s])
    return edges


def test_mutual_knn_matches_numpy_reference(spark):
    rng = np.random.default_rng(42)
    vecs = {i: rng.normal(size=6) for i in range(12)}
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = mutual_knn_edges(df, "vec_id", "embedding", k=3).collect()
    ref = _ref_mutual(vecs, k=3)
    assert {(r.src, r.dst): (r.rank_fwd, r.rank_back) for r in got} == ref
    # canonical direction + rank bounds
    for r in got:
        assert r.src < r.dst
        assert 1 <= r.rank_fwd <= 3 and 1 <= r.rank_back <= 3


def test_mutual_knn_hub_edges_drop(spark):
    # a hub everyone points at, but whose own top-k excludes most of
    # them, must not retain those one-directional edges
    hub = np.ones(4)
    vecs = {0: hub}
    rng = np.random.default_rng(5)
    # spokes: hub-aligned (so hub is their #1) plus orthogonal noise
    for i in range(1, 8):
        vecs[i] = hub + rng.normal(scale=0.05, size=4)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = mutual_knn_edges(df, "vec_id", "embedding", k=2).collect()
    hub_degree = sum(1 for r in got if r.src == 0 or r.dst == 0)
    # hub keeps at most k mutual edges — never the full in-degree (7)
    assert hub_degree <= 2


def test_mutual_knn_uses_broadcast_candidates(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5]) for i in range(10)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    plan = _plan(mutual_knn_edges(df, "vec_id", "embedding", k=2))
    # the bounded candidate step is an explicit broadcast nested loop
    # (documented contract), not a shuffled cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# JL certificate + WOE
# ---------------------------------------------------------------------------


def test_jl_sign_matrix_deterministic_and_balanced():
    s1 = jl_sign_matrix(64, 16)
    s2 = jl_sign_matrix(64, 16)
    assert s1 == s2
    flat = [x for col in s1 for x in col]
    assert set(flat) == {1.0, -1.0}
    # md5 bytes are uniform: the sign balance must be near 50/50
    assert 0.4 <= flat.count(1.0) / len(flat) <= 0.6
    assert jl_sign_matrix(64, 16, seed="other") != s1


def test_jl_distortion_gate_holds_on_testdata(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    row = (
        CATALOG["embedding_jl_distortion_checked"]
        .spark_fn(spark, sf_dir)
        .collect()[0]
    )
    assert row.jl_bound_ok
    assert row.n_pairs > 0
    # chi²₁₆ concentration: mean |ratio−1| ≈ 0.28 — the gate carries
    # ≥1.5× margin, and the measurement must sit in a sane band
    assert 0.1 <= row.mean_abs_distortion <= 0.45


def test_woe_iv_contributions_nonnegative(spark, sf_dir):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    rows = (
        CATALOG["feature_woe_value_bins"].spark_fn(spark, sf_dir).collect()
    )
    assert rows, "bins must exist"
    for r in rows:
        # (bad_frac − good_frac) and ln(bad_frac/good_frac) share sign
        assert r.iv_contrib >= 0
        # smoothed WOE reproduces from the emitted counts
        g_tot = sum(x.n_good for x in rows)
        b_tot = sum(x.n_bad for x in rows)
        expect = math.log(
            ((r.n_bad + 0.5) / (b_tot + 5.0))
            / ((r.n_good + 0.5) / (g_tot + 5.0))
        )
        assert abs(r.woe - round(expect, 6)) <= 1e-6


# ---------------------------------------------------------------------------
# Bradley-Terry MM
# ---------------------------------------------------------------------------


def test_bradley_terry_mm_matches_hand_reference(spark, tmp_path):
    # 3 players, hand-built match record via per-user value totals:
    # users each emit events for two types; totals decide the winner
    rows = []
    # u1: A=3 > B=1  -> A beats B      u2: A=1 < B=2 -> B beats A
    # u3: A=5 > C=1  -> A beats C      u4: B=4 > C=2 -> B beats C
    # u5: B=1 < C=3  -> C beats B
    data = [
        (1, "A", 3.0), (1, "B", 1.0),
        (2, "A", 1.0), (2, "B", 2.0),
        (3, "A", 5.0), (3, "C", 1.0),
        (4, "B", 4.0), (4, "C", 2.0),
        (5, "B", 1.0), (5, "C", 3.0),
    ]
    for i, (u, t, v) in enumerate(data):
        rows.append((i, u, t, v))
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    # point the entry at the tmp dir by monkey-loading: the entry
    # reads <sf_dir>/events.parquet via load_table
    got = {
        r.event_type: r
        for r in CATALOG["preference_bradley_terry_mm"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    # wins: A=2 (u1,u3), B=2 (u2,u4), C=1 (u5); matches: A=3, B=4, C=3
    assert (got["A"].wins, got["A"].n_matches) == (2, 3)
    assert (got["B"].wins, got["B"].n_matches) == (2, 4)
    assert (got["C"].wins, got["C"].n_matches) == (1, 3)
    # MM step 1 from uniform start: s1 = 2W/N
    assert got["A"].score_mm1 == round(2 * 2 / 3, 9)
    assert got["B"].score_mm1 == round(2 * 2 / 4, 9)
    assert got["C"].score_mm1 == round(2 * 1 / 3, 9)
    # MM step 2: s2_i = W_i / Σ_j n_ij/(s1_i + s1_j)  (python replay)
    s1 = {t: got[t].score_mm1 for t in "ABC"}
    n = {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 2}
    for t in "ABC":
        denom = 0.0
        for (p, q_), cnt in n.items():
            if t not in (p, q_):
                continue
            other = q_ if p == t else p
            denom += round(cnt / (s1[t] + s1[other]), 9)
        assert got[t].score_mm2 == round(got[t].wins / denom, 6)
