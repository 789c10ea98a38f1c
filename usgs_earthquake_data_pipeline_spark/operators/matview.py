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
