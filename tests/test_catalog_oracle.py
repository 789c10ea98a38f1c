"""Differential test: every SQL-expressible catalog query must match
its DuckDB oracle — row count, column names, and values (order- and
row-order-insensitive), the same contract the driver's correctness
harness enforces."""

from __future__ import annotations

import math

import pytest

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

SQL_ENTRIES = [e for e in CATALOG.values() if e.oracle is not None]


def _canon(value):
    """Canonicalize a scalar for comparison across engines."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # exact: engines must agree bit-for-bit on doubles
        return value
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return value


def _sort_key(row):
    # None-safe, type-stable ordering (rows may hold NULLs; the check
    # is multiset equality, so any consistent total order works)
    return tuple((v is None, repr(v)) for v in row)


def _rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_canon(row[i]) for i in order) for row in rows]
    return sorted(canon, key=_sort_key), [columns[i] for i in order]


@pytest.mark.parametrize("entry", SQL_ENTRIES, ids=[e.name for e in SQL_ENTRIES])
def test_catalog_query_matches_oracle(entry, spark, oracle, sf_dir):
    spark_df = entry.spark_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    duck = oracle.sql(entry.oracle)
    duck_cols = list(duck.columns)
    duck_rows = [tuple(r) for r in duck.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{entry.name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{entry.name}: row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    )

    s_set, cols = _rowset(spark_cols, spark_rows)
    d_set, _ = _rowset(duck_cols, duck_rows)
    mismatches = [
        (s, d) for s, d in zip(s_set, d_set) if s != d
    ]
    assert not mismatches, (
        f"{entry.name}: {len(mismatches)} mismatched rows "
        f"(cols {cols}); first: {mismatches[:3]}"
    )
