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
        surv = 0.0 if dead_zone else round(math.exp(lsum), 6)
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
