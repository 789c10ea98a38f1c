"""Uncertainty-quantification entries (r9): deterministic Poisson
bootstrap CI and split-conformal quality gating. The oracle gate
proves cross-engine equality; these tests pin the statistical
semantics themselves."""

from __future__ import annotations

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, sf_dir):
    r1 = CATALOG["bootstrap_mean_ci_value"].spark_fn(spark, sf_dir).collect()
    r2 = CATALOG["bootstrap_mean_ci_value"].spark_fn(spark, sf_dir).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    (row,) = r1
    assert row.ci_lo < row.mean_value < row.ci_hi
    assert row.n_replicates == 32
    # CI width shrinks roughly as 1/sqrt(n): sanity bound, not exact
    width = row.ci_hi - row.ci_lo
    assert 0 < width < row.mean_value  # not degenerate, not absurd


def test_bootstrap_weights_follow_poisson1(spark, sf_dir):
    """The md5-derived weights must empirically look Poisson(1):
    mean ~1, P(0) ~ 1/e, across the (row, replicate) grid."""
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    rep = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = u32.cast("double") / F.lit(4294967296.0)
    from usgs_earthquake_data_pipeline_spark.plans.relational import (
        _POIS1_CDF,
    )

    w = F.lit(len(_POIS1_CDF))
    for k in reversed(range(len(_POIS1_CDF))):
        w = F.when(u < float(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    stats = rep.agg(
        F.avg(w).alias("mean_w"),
        F.avg((w == 0).cast("double")).alias("p0"),
    ).collect()[0]
    assert abs(stats.mean_w - 1.0) < 0.02
    assert abs(stats.p0 - 0.36788) < 0.02


def test_conformal_coverage_and_threshold_semantics(spark, sf_dir):
    (row,) = (
        CATALOG["conformal_quality_threshold"].spark_fn(spark, sf_dir).collect()
    )
    # finite-sample guarantee direction: held-out coverage ~ 1 - alpha
    assert row.coverage >= 0.8  # alpha = 0.1, generous slack at toy n
    assert row.n_kept <= row.n_test
    assert 1 <= row.k <= row.n_calib
    # threshold is an actual calibration score: k-th smallest
    from usgs_earthquake_data_pipeline_spark.functions.text import (
        quality_clf_logit,
    )
    from usgs_earthquake_data_pipeline_spark.plans.sampling import hash_bucket
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    calib = (
        docs.select(
            quality_clf_logit("text").cast("double").alias("score"),
            hash_bucket("doc_id").alias("bucket"),
        )
        .filter(F.col("bucket") < 50)
        .orderBy("score")
        .collect()
    )
    assert row.threshold == calib[row.k - 1].score
