"""Distributed linear algebra (operators/linalg.py + the embedding
covariance / PCA catalog entries): numpy differentials and
partitioning-stability."""

from __future__ import annotations

import math

import numpy as np
import pytest

from usgs_earthquake_data_pipeline_spark.operators import linalg as L
from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    labels = np.array([r.label for r in rows])
    return X, labels


def test_covariance_matches_numpy(spark, sf_dir, emb_np):
    X, _ = emb_np
    want = np.cov(X, rowvar=False)  # sample covariance, ddof=1
    got = CATALOG["embedding_covariance_upper"].spark_fn(spark, sf_dir).collect()
    assert len(got) == X.shape[1] * (X.shape[1] + 1) // 2
    for r in got:
        # slack: per-term 9 dp rounds over n terms + final 6 dp round
        assert abs(r.cov - want[r.i, r.j]) < 5e-6, (r.i, r.j)


def test_covariance_stable_under_repartition(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = L.covariance_entries(emb, "embedding").collect()
    b = L.covariance_entries(emb.repartition(13), "embedding").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pca_profile_matches_numpy(spark, sf_dir, emb_np):
    X, labels = emb_np
    cov_rows = CATALOG["embedding_covariance_upper"].spark_fn(spark, sf_dir).collect()
    d = X.shape[1]
    w, comps = L.pca_top_components(cov_rows, d)
    assert list(w) == sorted(w, reverse=True)
    # same rounded-covariance input → same eigensolve as the entry;
    # reference projection via numpy dot
    p = X @ comps[0]
    got = {
        r.label: (r.n_vecs, r.pc1_mean, r.pc1_var)
        for r in CATALOG["embedding_pca_label_profile"].spark_fn(spark, sf_dir).collect()
    }
    for lab in np.unique(labels):
        sel = p[labels == lab]
        n, m, v = got[int(lab)]
        assert n == len(sel)
        assert abs(m - sel.mean()) < 1e-5
        if len(sel) > 1:
            assert abs(v - sel.var(ddof=1)) < 1e-4


def test_pca_sign_convention_deterministic():
    rows = [
        {"i": 0, "j": 0, "cov": 2.0},
        {"i": 0, "j": 1, "cov": -1.0},
        {"i": 1, "j": 1, "cov": 2.0},
    ]
    w1, v1 = L.pca_top_components(rows, 2)
    w2, v2 = L.pca_top_components(rows, 2)
    assert np.allclose(v1, v2) and np.allclose(w1, w2)
    # largest-|component| entry of every component is positive
    for k in range(2):
        lead = np.argmax(np.abs(v1[k]))
        assert v1[k][lead] > 0


def test_projection_fold_matches_numpy(spark, emb_np):
    X, _ = emb_np
    comp = [1.0 / math.sqrt(X.shape[1])] * X.shape[1]
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X[:50])],
        "id long, embedding array<double>",
    )
    got = {
        r.id: r.p
        for r in df.select("id", L.project_component("embedding", comp).alias("p")).collect()
    }
    for i in range(50):
        assert abs(got[i] - float(X[i] @ np.array(comp))) < 1e-9


def test_power_method_int_matches_numpy_pc1(spark, sf_dir, emb_np):
    """The integer matrix-powering eigensolve (the SQL-expressible
    twin of eigh) must land on numpy's leading eigenvector despite
    the corpus' tiny eigengap (λ1/λ2 ≈ 1.01-1.07), under the SAME
    sign convention as pca_top_components."""
    X, _ = emb_np
    emb = load_table(spark, sf_dir, "embeddings")
    cov_rows = L.covariance_entries(emb, "embedding", upper_only=True).collect()
    d = X.shape[1]
    vint = L.power_method_int(cov_rows, d)
    v = np.array(vint, dtype=np.float64) / 1e9
    _, comps = L.pca_top_components(cov_rows, d)
    cos = float(v @ comps[0]) / float(np.linalg.norm(v))
    assert cos > 0.999999, cos  # signed: conventions must agree too


def test_power_method_int_unit_norm_and_sign():
    """Planted 3x3 matrix with a dominant direction: exact recovery,
    ~unit scaled norm, and the largest-|entry| component positive."""
    rows = [
        {"i": 0, "j": 0, "cov": 4.0},
        {"i": 0, "j": 1, "cov": 0.0},
        {"i": 0, "j": 2, "cov": 0.0},
        {"i": 1, "j": 1, "cov": 1.0},
        {"i": 1, "j": 2, "cov": 0.0},
        {"i": 2, "j": 2, "cov": 0.25},
    ]
    v = L.power_method_int(rows, 3)
    assert v[0] == 1_000_000_000 and v[1] == 0 and v[2] == 0
