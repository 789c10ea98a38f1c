"""ALS step (catalog entry ``als_implicit_rank2_step``): numpy
differential and the monotone-improvement property that makes it an
optimization step at all."""

from __future__ import annotations

import numpy as np

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

LAM = 0.1


def _numpy_step(R: np.ndarray, V0: np.ndarray):
    """Unrounded reference of the same closed-form step."""
    M0 = np.linalg.inv(V0.T @ V0 + LAM * np.eye(2))
    U = R @ V0 @ M0
    M1 = np.linalg.inv(U.T @ U + LAM * np.eye(2))
    V1 = R.T @ U @ M1
    return U, V1


def _collect_problem(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    )
    users = sorted({r.user_id for r in rows})
    types = sorted({r.event_type for r in rows})
    ui = {u: i for i, u in enumerate(users)}
    ti = {t: i for i, t in enumerate(types)}
    R = np.zeros((len(users), len(types)))
    for r in rows:
        R[ui[r.user_id], ti[r.event_type]] = r["count"]
    V0 = np.array([[1.0, round(0.1 * ((len(t) % 3) - 1), 9)] for t in types])
    return R, V0, types


def test_als_step_matches_numpy(spark, sf_dir):
    R, V0, types = _collect_problem(spark, sf_dir)
    _, V1 = _numpy_step(R, V0)
    got = {
        r.event_type: (r.v1, r.v2)
        for r in CATALOG["als_implicit_rank2_step"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(types)
    for k, t in enumerate(types):
        # slack: 9 dp per-term rounds through three staged aggregates
        assert abs(got[t][0] - V1[k, 0]) < 1e-4, (t, got[t], V1[k])
        assert abs(got[t][1] - V1[k, 1]) < 1e-4, (t, got[t], V1[k])


def test_als_step_decreases_objective(spark, sf_dir):
    """One (U, V) sweep must not increase the regularized implicit
    loss — the property that distinguishes an ALS step from noise."""
    R, V0, _ = _collect_problem(spark, sf_dir)
    U, V1 = _numpy_step(R, V0)

    def loss(U, V):
        return (
            np.sum((R - U @ V.T) ** 2)
            + LAM * (np.sum(U**2) + np.sum(V**2))
        )

    # U was solved against V0; compare full sweeps
    U0 = R @ V0 @ np.linalg.inv(V0.T @ V0 + LAM * np.eye(2))
    assert loss(U0, V1) <= loss(U0, V0) + 1e-9
