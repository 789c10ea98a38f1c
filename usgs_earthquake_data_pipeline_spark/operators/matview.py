"""Incremental materialized-view maintenance.

The reference rebuilds its silver fact tables from scratch on every
run (/root/reference/usgs_tsunami_count_fact_silver.py:57-72 —
full-table overwrite). At 100 TB a rebuild re-scans everything for a
day's worth of new rows; the standard fix is algebraic view
maintenance: keep the view as mergeable partial aggregates and fold
each new batch in with a key-wise merge — work proportional to the
DELTA, not the table.

Supported aggregate classes (all algebraic / self-mergeable):
``sum``, ``count`` (merge = SUM), ``min`` (merge = MIN), ``max``
(merge = MAX). AVG is maintained as (sum, count) and derived at read
time — the caller stores the pair, not the quotient.

Scale: merge = unionByName + one groupBy on the view key. The union
reads the OLD VIEW (|keys| rows, small) plus the delta's partial
aggregate — the base table is never touched. One shuffle, bounded by
view cardinality; map-side partial aggregation folds the old-view row
and the delta rows per key before the exchange.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summation
    "min": F.min,
    "max": F.max,
}


def merge_aggregate_state(
    view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    merges: Mapping[str, str],
) -> DataFrame:
    """Fold a delta's partial aggregates into the view's.

    ``merges`` maps each aggregate column to its class
    (``sum`` / ``count`` / ``min`` / ``max``). Both inputs must carry
    exactly ``keys + list(merges)``. Keys present only in the delta
    appear (inserts); keys only in the view persist unchanged.
    """
    keys = list(keys)
    cols = keys + list(merges)
    bad = {c: m for c, m in merges.items() if m not in _MERGE_FNS}
    if bad:
        raise ValueError(f"unsupported merge classes: {bad}")
    for side, df in (("view", view), ("delta", delta)):
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"{side} is missing columns: {missing}")
    unioned = view.select(*cols).unionByName(delta.select(*cols))
    aggs = [_MERGE_FNS[m](c).alias(c) for c, m in merges.items()]
    return unioned.groupBy(*keys).agg(*aggs)


def merge_join_state(
    view: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incrementally maintain an equi-JOIN view under append-only
    deltas (the join counterpart of :func:`merge_aggregate_state`;
    the differential-dataflow bilinearity identity):

        Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
        (B_new = B_old ∪ ΔB; the ΔA⋈ΔB cross term rides the first
        part, and the three produced categories — (ΔA,B_old),
        (ΔA,ΔB), (A_old,ΔB) — are disjoint from the view's
        (A_old,B_old), so plain UNION ALL is exact)

    Work is delta-proportional on the delta side of each term; the
    old-side scans are key-restricted by the (broadcast) delta —
    at 100 TB the stored A/B would be bucketed or stats-pruned on the
    join key so ``A_old ⋈ ΔB`` touches only the buckets/files holding
    ΔB's keys, never the full table; the VIEW itself is never
    re-joined, only unioned. Append-only by contract: updates and
    deletes flow through the CDC merge operators instead.

    All three inputs' join outputs are projected to ``view.columns``,
    so the view schema defines the maintained shape.
    """
    cols = view.columns
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    b_new = b_old.unionByName(delta_b)
    d1 = da.join(b_new, on=on).select(*cols)
    d2 = a_old.join(db, on=on).select(*cols)
    return view.unionByName(d1).unionByName(d2)
