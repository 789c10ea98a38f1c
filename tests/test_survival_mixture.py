"""Kaplan-Meier survival and token-budget waterfilling: hand-replayed
references and structural invariants (censoring semantics, budget
conservation, cap monotonicity)."""

from __future__ import annotations

import datetime

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG


def _km_reference(times_churned: list[tuple[int, int]]):
    """Textbook KM over (t, churned) observations: returns
    {t: (n_at_risk, d, survival)} for every distinct t."""
    from collections import Counter

    m = Counter(t for t, _ in times_churned)
    d = Counter(t for t, c in times_churned if c)
    n_total = len(times_churned)
    out = {}
    import math

    seen = 0
    lsum = 0.0
    dead_zone = False
    for t in sorted(m):
        n = n_total - seen
        dt = d.get(t, 0)
        if dt == n:
            dead_zone = True
        elif dt > 0:
            lsum += math.log(1.0 - dt / n)
        # HALF_UP like both engines — python round() is banker's and
        # diverges on exact half-ULP ties (e.g. 0.6015625)
        import decimal

        surv = (
            0.0
            if dead_zone
            else float(
                decimal.Decimal(math.exp(lsum)).quantize(
                    decimal.Decimal("0.000001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
        )
        out[t] = (n, dt, surv)
        seen += m[t]
    return out


def test_kaplan_meier_hand_reference(spark, tmp_path):
    base = datetime.datetime(2024, 3, 1)

    def ev(eid, uid, day):
        return (
            eid,
            base + datetime.timedelta(days=day),
            uid,
            "view",
            1.0,
            "{}",
        )

    rows = [
        # uA: t=10, churned (last day 10 <= 30-7)
        ev(1, 1, 0), ev(2, 1, 10),
        # uB: t=28, censored (last day 28 > 23)
        ev(3, 2, 0), ev(4, 2, 28),
        # uC: t=10, churned
        ev(5, 3, 5), ev(6, 3, 15),
        # uD: t=0, churned (single early event)
        ev(7, 4, 3),
        # uE: t=27, censored
        ev(8, 5, 2), ev(9, 5, 29),
        # uF: t=0, censored (single event at the horizon, day 30)
        ev(10, 6, 30),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.t_days: (r.n_at_risk, r.n_churned, r.survival)
        for r in CATALOG["survival_kaplan_meier_daily"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    ref = _km_reference(
        [(10, 1), (28, 0), (10, 1), (0, 1), (27, 0), (0, 0)]
    )
    assert got == ref
    # censored users never count as deaths
    assert got[28][1] == 0 and got[27][1] == 0
    # survival is non-increasing
    surv = [got[t][2] for t in sorted(got)]
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_kaplan_meier_monotone_on_testdata(spark, sf_dir):
    rows = (
        CATALOG["survival_kaplan_meier_daily"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert rows
    surv = [r.survival for r in rows]  # already t-ordered
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)
    # risk sets shrink as t grows
    risk = [r.n_at_risk for r in rows]
    assert all(a > b for a, b in zip(risk, risk[1:]))


def test_waterfill_budget_invariants(spark, sf_dir):
    rows = (
        CATALOG["mixture_token_budget_waterfill"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert rows
    total_avail = sum(r.avail_chars for r in rows)
    budget = (6 * total_avail) // 10
    # never allocate beyond a source's supply, nor beyond the budget
    for r in rows:
        assert 0 <= r.alloc_round1 <= r.alloc_round2 <= r.avail_chars
        assert r.exhausted == (r.alloc_round2 >= r.avail_chars)
        assert 0.0 <= r.sample_rate <= 1.0
    assert sum(r.alloc_round2 for r in rows) <= budget
    # the second round must strictly shrink the stranded remainder
    # whenever some source was capped and another still open
    left1 = budget - sum(r.alloc_round1 for r in rows)
    left2 = budget - sum(r.alloc_round2 for r in rows)
    capped = any(r.alloc_round1 >= r.avail_chars for r in rows)
    open_ = any(r.alloc_round1 < r.avail_chars for r in rows)
    if capped and open_ and left1 > 0:
        assert left2 < left1
    # weights drive proportions: among non-exhausted sources with the
    # same availability class, higher weight never gets less
    by_w = sorted(
        (r for r in rows if not r.exhausted),
        key=lambda r: (r.weight, r.alloc_round2),
    )
    for a, b in zip(by_w, by_w[1:]):
        if a.weight == b.weight:
            continue
        # strictly higher weight, round-1 proportional share is higher
        assert b.alloc_round1 >= a.alloc_round1 or b.exhausted


# ---------------------------------------------------------------------------
# Hypothesis fuzz: waterfill and KM vs python references
# ---------------------------------------------------------------------------

import datetime

from hypothesis import given, settings, strategies as st


def _py_waterfill(avail: dict[int, int]):
    """Python replay of mixture_token_budget_waterfill's integer
    arithmetic: weights 1+(i%5), budget 60%, two rounds."""
    w = {i: 1 + (i % 5) for i in avail}
    total = sum(avail.values())
    budget = (6 * total) // 10
    w_all = sum(w.values())
    a1 = {i: min(avail[i], (w[i] * budget) // w_all) for i in avail}
    leftover = budget - sum(a1.values())
    w_open = sum(w[i] for i in avail if a1[i] < avail[i])
    a2 = {}
    for i in avail:
        if a1[i] < avail[i] and w_open > 0:
            a2[i] = min(avail[i], a1[i] + (w[i] * leftover) // w_open)
        else:
            a2[i] = a1[i]
    return a1, a2


@settings(max_examples=10, deadline=None)
@given(
    avails=st.lists(
        st.integers(min_value=1, max_value=100_000), min_size=2, max_size=8
    )
)
def test_waterfill_fuzz_vs_python(spark, tmp_path_factory, avails):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    tmp = tmp_path_factory.mktemp("wf")
    rows = [
        (i, "x", "en", f"src{i}", av) for i, av in enumerate(avails)
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.parquet(str(tmp / "documents.parquet"))
    got = {
        int(r.source[3:]): r
        for r in CATALOG["mixture_token_budget_waterfill"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    a1, a2 = _py_waterfill({i: av for i, av in enumerate(avails)})
    for i, av in enumerate(avails):
        assert got[i].alloc_round1 == a1[i]
        assert got[i].alloc_round2 == a2[i]
        assert got[i].avail_chars == av


@settings(max_examples=10, deadline=None)
@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),  # first-event day
            st.integers(min_value=0, max_value=25),  # extra span days
        ),
        min_size=2,
        max_size=12,
    )
)
def test_kaplan_meier_fuzz_vs_python(spark, tmp_path_factory, spans):
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

    base = datetime.datetime(2024, 7, 1)
    rows = []
    eid = 0
    last_days = []
    for uid, (start, extra) in enumerate(spans):
        end = min(start + extra, 29)
        start = min(start, end)
        for d in {start, end}:
            eid += 1
            rows.append(
                (eid, base + datetime.timedelta(days=d), uid, "view", 1.0, "{}")
            )
        last_days.append((uid, start, end))
    tmp = tmp_path_factory.mktemp("km")
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.parquet(str(tmp / "events.parquet"))

    horizon = max(end for _, _, end in last_days)
    obs = [
        (end - start, 1 if end <= horizon - 7 else 0)
        for _, start, end in last_days
    ]
    ref = _km_reference(obs)
    got = {
        r.t_days: (r.n_at_risk, r.n_churned, r.survival)
        for r in CATALOG["survival_kaplan_meier_daily"]
        .spark_fn(spark, str(tmp))
        .collect()
    }
    assert got == ref


def test_grouped_km_matches_per_type_pooled_computation(spark, sf_dir):
    """Each stratum's curve must equal the pooled estimator run on
    that stratum's own observations (python replay per type)."""
    import pyspark.sql.functions as F

    rows = (
        CATALOG["survival_km_by_type"].spark_fn(spark, sf_dir).collect()
    )
    assert rows
    # rebuild the per-type observations driver-side
    from usgs_earthquake_data_pipeline_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w_end = ev.agg(F.max(day)).collect()[0][0]
    obs = (
        ev.groupBy("event_type", "user_id")
        .agg(
            F.datediff(F.max(day), F.min(day)).alias("t"),
            (F.max(day) <= F.date_sub(F.lit(w_end), 7))
            .cast("int")
            .alias("c"),
        )
        .collect()
    )
    by_type = {}
    for r in obs:
        by_type.setdefault(r.event_type, []).append((r.t, r.c))
    got = {}
    for r in rows:
        got.setdefault(r.event_type, {})[r.t_days] = (
            r.n_at_risk,
            r.n_churned,
            r.survival,
        )
    assert set(got) == set(by_type)
    for etype, o in by_type.items():
        assert got[etype] == _km_reference(o), etype


def _logrank_events(spark, tmp_path, spans_a, spans_b):
    base = datetime.datetime(2024, 9, 1)
    rows, eid = [], 0
    for grp, spans in (("purchase", spans_a), ("error", spans_b)):
        for uid_off, (start, end) in enumerate(spans):
            uid = (1000 if grp == "error" else 0) + uid_off
            for d in {start, end}:
                eid += 1
                rows.append(
                    (eid, base + datetime.timedelta(days=d), uid, grp, 1.0, "{}")
                )
    # horizon pin: one far-future event in each group keeps w_end fixed
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_logrank_flags_divergent_hazards(spark, tmp_path):
    # purchase cohort churns instantly (t=0..2); error cohort survives
    # to the horizon (censored) — strongly different hazards
    spans_a = [(0, d % 3) for d in range(15)]           # churn fast
    spans_b = [(0, 28 + (d % 2)) for d in range(15)]    # censored
    sf = _logrank_events(spark, tmp_path, spans_a, spans_b)
    row = (
        CATALOG["survival_logrank_purchase_vs_error"]
        .spark_fn(spark, sf)
        .collect()[0]
    )
    assert row.chi_sq is not None and row.chi_sq > 3.841
    assert row.significant_5pct
    # direction: purchase observed far above expectation
    assert row.observed_a > row.expected_a


def test_logrank_identical_cohorts_not_significant(spark, tmp_path):
    spans = [(0, 5 + (d % 7)) for d in range(12)] + [(2, 27)]
    sf = _logrank_events(spark, tmp_path, spans, spans)
    row = (
        CATALOG["survival_logrank_purchase_vs_error"]
        .spark_fn(spark, sf)
        .collect()[0]
    )
    # identical observation sets: O == E exactly, chi-square 0
    assert row.chi_sq == 0.0
    assert not row.significant_5pct


def test_rmst_replays_from_km_curve(spark, sf_dir):
    """RMST@14 must equal the step integral of the pooled KM entry's
    own curve (S=1 before the first step, S(t_i) over [t_i, t_i+1))."""
    km = {
        r.t_days: r.survival
        for r in CATALOG["survival_kaplan_meier_daily"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    row = CATALOG["survival_rmst_14d"].spark_fn(spark, sf_dir).collect()[0]
    assert row.tau_days == 14
    ts = sorted(t for t in km if t < 14)
    area = min(14, ts[0]) if ts else 14.0
    for i, t in enumerate(ts):
        t_next = min(ts[i + 1], 14) if i + 1 < len(ts) else 14
        area += round(km[t] * (t_next - t), 6)
    assert abs(row.rmst_days - round(area, 6)) <= 1e-6
    assert 0.0 <= row.rmst_days <= 14.0
