"""Skew-mitigation operators.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew; these are the explicit tools for the cases AQE can't fix:

- ``salted_aggregate``: two-phase aggregation for *algebraic*
  aggregates (count/sum/min/max) over heavily skewed group keys. A
  random-ish salt (hash of a unique column, not an RNG — deterministic
  and resume-safe) fans each hot key out over ``n_salts`` reducers for
  the partial phase; the final phase combines ``n_salts`` rows per
  key. At 100 TB this turns a one-straggler-reducer plan into an even
  one at the cost of a second (tiny) shuffle.
- ``salted_join``: replicate the small side per salt, salt the big
  side — the classic skew-join when a broadcast won't fit and one key
  dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (function, input column) with
    function in {count, sum, min, max}. ``salt_col`` (any
    high-cardinality column; first key column by default) seeds the
    deterministic salt.
    """
    for fn, _ in aggs.values():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    seed = salt_col or keys[0]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(seed), F.lit(42)), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(f"__p_{out}")
            for out, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{out}")).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew join: salt the big side, replicate the small side
    ``n_salts``× so every salted key still finds its match. Use when
    the small side is too large to broadcast and the big side's key
    distribution is dominated by few values."""
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_rep, [on, "__salt"], how).drop("__salt")
