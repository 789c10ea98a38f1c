"""Differential test: every SQL-expressible catalog query must match
its DuckDB oracle — row count, column names, and values (order- and
row-order-insensitive), the same contract the driver's correctness
harness enforces."""

from __future__ import annotations

import collections.abc
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


def _pandas_kind(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's hash compare
    is sensitive to. Integer vs float matters (DuckDB HUGEINT/DECIMAL
    become float64 while Spark BIGINT stays int64 — repr diverges);
    datetime unit does not."""
    kind = dtype.kind
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "M":
        return "datetime"
    if kind == "b":
        return "bool"
    return "object"


def _assert_driver_hashable(entry, spark_df, duck):
    """Mimic the driver's pandas-level canonicalization contract:
    per-column dtype classes must agree after pandas conversion, and no
    cell may hold an unhashable container (array/struct output broke
    kmeans_refine_centroids in round 3)."""
    s_pd = spark_df.toPandas()
    d_pd = duck.df()
    for col in sorted(s_pd.columns):
        s_kind = _pandas_kind(s_pd[col].dtype)
        d_kind = _pandas_kind(d_pd[col].dtype)
        assert s_kind == d_kind, (
            f"{entry.name}.{col}: pandas dtype class diverges "
            f"(spark {s_pd[col].dtype} -> {s_kind}, "
            f"oracle {d_pd[col].dtype} -> {d_kind}); the driver's hash "
            f"compare will mismatch — CAST the oracle (or Spark) side"
        )
        for frame, side in ((s_pd, "spark"), (d_pd, "oracle")):
            if frame[col].dtype.kind == "O":
                for v in frame[col]:
                    if v is not None:
                        assert isinstance(v, collections.abc.Hashable), (
                            f"{entry.name}.{col} ({side}): unhashable "
                            f"{type(v).__name__} cell — no array/struct "
                            f"columns in oracle-gated output"
                        )
                        break


@pytest.mark.parametrize("entry", SQL_ENTRIES, ids=[e.name for e in SQL_ENTRIES])
def test_catalog_query_matches_oracle(entry, spark, oracle, sf_dir):
    spark_df = entry.spark_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    duck = oracle.sql(entry.oracle)
    duck_cols = list(duck.columns)
    duck_rows = [tuple(r) for r in duck.fetchall()]
    # reuse spark_df: rebuilding via spark_fn would re-run streaming
    # jobs (side effects) and double every entry's execution cost
    _assert_driver_hashable(entry, spark_df, duck)

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
