"""Time-decay attribution, KS drift, CUSUM, and binary-segmentation
changepoint: hand-replayed references on constructed event logs."""

from __future__ import annotations

import datetime

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, "
    "event_type STRING, value DOUBLE, props STRING"
)
BASE = datetime.datetime(2024, 5, 1)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _ev(eid, day_offset, uid, etype, value, hours=0):
    return (
        eid,
        BASE + datetime.timedelta(days=day_offset, hours=hours),
        uid,
        etype,
        value,
        "{}",
    )


def test_time_decay_attribution_hand_case(spark, tmp_path):
    rows = [
        # purchase on day 10; touches at ages 0 (same-day click),
        # 2 (view), 6 (click) -> weights 1, 1/4, 1/64
        _ev(1, 10, 1, "purchase", 5.0, hours=12),
        _ev(2, 10, 1, "click", 0.0, hours=1),   # age 0 days
        _ev(3, 8, 1, "view", 0.0, hours=12),    # age 2 days
        _ev(4, 4, 1, "click", 0.0, hours=12),   # age 6 days
        _ev(5, 1, 1, "click", 0.0),             # age 9 — outside lookback
        # second user: single view 1 day before its purchase
        _ev(6, 20, 2, "purchase", 5.0),
        _ev(7, 19, 2, "view", 0.0),
    ]
    sf = _write(spark, tmp_path, rows)
    got = {
        r.channel: r
        for r in CATALOG["attribution_time_decay"].spark_fn(spark, sf).collect()
    }
    wsum = 1.0 + 0.25 + 1.0 / 64
    click_credit = round(round(1.0 / wsum, 9) + round((1 / 64) / wsum, 9), 6)
    view_credit = round(round(0.25 / wsum, 9) + round(1.0, 9), 6)
    assert got["click"].n_touches == 2
    assert got["view"].n_touches == 2
    assert abs(got["click"].credit - click_credit) < 1e-9
    assert abs(got["view"].credit - view_credit) < 1e-9
    # each conversion distributes exactly one unit of credit
    total = got["click"].credit + got["view"].credit
    assert abs(total - 2.0) < 1e-5


def test_ks_two_sample_hand_case(spark, tmp_path):
    # sample A (days 1..15): values 1,2,3,4 — sample B (days 16+):
    # values 3,4,5,6.  EDFs diverge most at value 2: F1=0.5, F2=0 →
    # D = 0.5
    rows = [
        _ev(1, 1, 1, "view", 1.0),
        _ev(2, 2, 1, "view", 2.0),
        _ev(3, 3, 1, "view", 3.0),
        _ev(4, 4, 1, "view", 4.0),
        _ev(5, 20, 1, "view", 3.0),
        _ev(6, 21, 1, "view", 4.0),
        _ev(7, 22, 1, "view", 5.0),
        _ev(8, 23, 1, "view", 6.0),
    ]
    sf = _write(spark, tmp_path, rows)
    row = CATALOG["drift_ks_two_sample"].spark_fn(spark, sf).collect()[0]
    assert (row.n1, row.n2) == (4, 4)
    assert row.d_scaled == 8  # |2*4 - 0*4| at value 2
    assert row.ks_d == 0.5
    # n=4 per side: crit = 1.358*sqrt(8/16) ≈ 0.96 > 0.5 → no drift
    assert not row.drift_flag


def test_cusum_fires_after_level_shift(spark, tmp_path):
    # 10 quiet days at 10/day, then 5 loud days at 30/day.
    rows = []
    eid = 0
    for d in range(10):
        eid += 1
        rows.append(_ev(eid, d, 1, "view", 10.0))
    for d in range(10, 15):
        eid += 1
        rows.append(_ev(eid, d, 1, "view", 30.0))
    sf = _write(spark, tmp_path, rows)
    out = CATALOG["anomaly_cusum_daily"].spark_fn(spark, sf).collect()
    assert len(out) == 15
    # python replay: mu over all days, k = 1.05 mu, h = 0.5 mu
    mu = (10 * 10 + 5 * 30) / 15.0
    k, h, s = mu * 1.05, mu * 0.5, 0.0
    for r, x in zip(out, [10.0] * 10 + [30.0] * 5):
        s = max(0.0, s + x - k)
        assert r.cusum == round(s, 6)
        assert r.alarm == (s > h)
    # quiet days never alarm; the shift must alarm before it ends
    assert not any(r.alarm for r in out[:10])
    assert any(r.alarm for r in out[10:])


def test_changepoint_finds_the_step(spark, tmp_path):
    # step function: 8 days at 5, then 8 days at 50 — the split must
    # land exactly at the boundary (i=8)
    rows = []
    eid = 0
    for d in range(8):
        eid += 1
        rows.append(_ev(eid, d, 1, "view", 5.0))
    for d in range(8, 16):
        eid += 1
        rows.append(_ev(eid, d, 1, "view", 50.0))
    sf = _write(spark, tmp_path, rows)
    row = CATALOG["changepoint_binary_seg_daily"].spark_fn(spark, sf).collect()[0]
    assert row.split_idx == 8
    assert row.n_days == 16
    assert row.mean_left == 5.0
    assert row.mean_right == 50.0
    assert row.gain > 0


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    # perfect slope-10 line except one wild outlier day — OLS would
    # bend, Theil-Sen must not
    rows = []
    for d in range(10):
        v = 10.0 * (d + 1) if d != 5 else 100000.0
        rows.append(_ev(d + 1, d, 1, "view", v))
    sf = _write(spark, tmp_path, rows)
    row = CATALOG["trend_theil_sen_daily"].spark_fn(spark, sf).collect()[0]
    assert row.n_days == 10
    assert row.n_pairs == 45
    assert row.slope == 10.0


def test_gate_bitmask_consistent_with_pipeline(spark, sf_dir):
    import pyspark.sql.functions as F

    masks = CATALOG["curation_gate_bitmask"].spark_fn(spark, sf_dir)
    pipeline_total = (
        CATALOG["curation_corpus_pipeline"]
        .spark_fn(spark, sf_dir)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    kept = masks.filter("keep").count()
    assert kept == pipeline_total
    # keep is exactly bits 0-3 of the mask
    bad = masks.filter(
        (F.col("gate_mask").bitwiseAND(15) == 15) != F.col("keep")
    ).count()
    assert bad == 0
    # every input document appears exactly once
    docs_total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert masks.count() == docs_total


def test_holt_linear_tracks_a_ramp(spark, tmp_path):
    # a pure linear ramp: Holt's trend must converge toward the true
    # slope and the 7-day forecast must overshoot the last level
    rows = [_ev(d + 1, d, 1, "view", 10.0 * (d + 1)) for d in range(20)]
    sf = _write(spark, tmp_path, rows)
    out = CATALOG["forecast_holt_linear_daily"].spark_fn(spark, sf).collect()
    assert len(out) == 20
    # python replay of the recursion (alpha = beta = 1/2); compare
    # with 1e-6 tolerance — python round() is banker's, Spark HALF_UP
    l, b = 10.0, 0.0
    for i, (r, x) in enumerate(zip(out, [10.0 * (d + 1) for d in range(20)])):
        if i > 0:
            l_new = (x + (l + b)) / 2
            b = ((l_new - l) + b) / 2
            l = l_new
        assert r.daily_value == round(x, 6)
        assert abs(r.level - l) <= 1e-6
        assert abs(r.trend - b) <= 1e-6
        assert abs(r.forecast_7d - (l + 7 * b)) <= 1e-6
    # trend converged near the true slope on a clean ramp
    assert abs(out[-1].trend - 10.0) < 2.0
    assert out[-1].forecast_7d > out[-1].level


def test_er_blocking_quality_bounds(spark, sf_dir):
    row = CATALOG["er_blocking_quality"].spark_fn(spark, sf_dir).collect()[0]
    n = row.n_records
    assert row.n_all_pairs == n * (n - 1) // 2
    assert 0 <= row.n_found <= row.n_true <= row.n_all_pairs
    assert 0 <= row.n_candidates <= row.n_all_pairs
    assert 0.0 <= row.reduction_ratio <= 1.0
    if row.pair_completeness is not None:
        assert 0.0 <= row.pair_completeness <= 1.0
    # prefix blocking on these name distributions must prune hard
    assert row.reduction_ratio > 0.5


def test_segmented_fit_recovers_two_slopes(spark, tmp_path):
    # slope 5 for 10 days, then a level jump and slope 30: the split
    # and both slopes must be recovered exactly
    rows = []
    for d in range(10):
        rows.append(_ev(d + 1, d, 1, "view", 5.0 * (d + 1)))
    for d in range(10, 20):
        rows.append(_ev(d + 1, d, 1, "view", 1000.0 + 30.0 * (d + 1)))
    sf = _write(spark, tmp_path, rows)
    got = {
        r.side: r
        for r in CATALOG["changepoint_segmented_fit"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert set(got) == {"left", "right"}
    assert got["left"].n_days + got["right"].n_days == 20
    # both sides of the jump are clean lines — exact slopes
    assert got["left"].slope == 5.0
    assert got["right"].slope == 30.0
    assert got["left"].split_day == got["right"].split_day


def test_rfm_segments_invariants(spark, sf_dir):
    rows = CATALOG["rfm_user_segments"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.r_days >= 0
    # equal metrics must get equal scores (threshold-binning promise)
    by_f = {}
    for r in rows:
        by_f.setdefault(r.f_events, set()).add(r.f_score)
    assert all(len(s) == 1 for s in by_f.values())
    # scores are monotone in the metric
    fs = sorted(rows, key=lambda r: r.f_events)
    assert all(
        a.f_score <= b.f_score for a, b in zip(fs, fs[1:])
    )
    # more recent users never score lower on recency
    rs = sorted(rows, key=lambda r: r.r_days)
    assert all(a.r_score >= b.r_score for a, b in zip(rs, rs[1:]))
