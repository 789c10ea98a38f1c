"""MERGE (upsert) and CDC snapshot-diff operators.

The reference's bronze/silver layers are Delta tables
(/root/reference/save_to_raw_delta_prod.py:92-147); Delta's two
signature table operations beyond append are ``MERGE INTO`` (CDC
upsert) and the change-data-feed diff between versions. delta-spark is
not installable in this environment, so both are provided here as pure
DataFrame algebra over any storage — and wired to the
versioned-parquet layout (``sinks.save_versioned_table``) for the
table-level form.

Scale notes (100 TB target):

- ``merge_upsert`` is anti-join + union. The CDC shape is a SMALL
  change batch against a HUGE target, so the batch side is broadcast
  (explicitly when ``broadcast_source=True``, else AQE decides): the
  target table never shuffles, each target partition streams past a
  broadcast hash set of changed keys. This is exactly Delta's
  file-pruning merge degenerated to the no-stats case.
- ``diff_snapshots`` is one full-outer equi-join on the key — both
  sides hash-partition on the same key, one co-partitioned shuffle
  each, and the change classification is pure codegen on top
  (null-safe ``<=>`` comparisons, no Python).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    *,
    broadcast_source: bool = False,
    duplicate_policy: str = "error",
    last_wins_order: Sequence[str] | None = None,
) -> DataFrame:
    """Delta-style ``MERGE INTO``: WHEN MATCHED THEN UPDATE SET * /
    WHEN NOT MATCHED THEN INSERT *.

    Returns the post-merge table: every source row wins over a
    same-key target row; target rows with no source match survive
    unchanged. Both inputs must share the target schema (``INSERT *``
    semantics — the source carries full rows, as a CDC feed does).

    A source batch with MULTIPLE rows per key is ambiguous — Delta's
    MERGE errors on it ("multiple source rows matched") rather than
    emit duplicates. ``duplicate_policy`` mirrors that contract:

    - ``"error"`` (default): validate key-uniqueness with one bounded
      aggregation over the source (the small side by contract) and
      raise ``ValueError`` on violation. NOTE this is an EAGER action:
      the source plan executes once for the check and again when the
      merged result is materialized (the check-time pin is released
      before returning — a plan-builder must not leak a cache entry
      per call). Cache ``source`` yourself to share one
      materialization across both, which is also REQUIRED for a
      nondeterministic source (it could otherwise pass the check yet
      deliver duplicates at final execution) — or use ``"trusted"``.
    - ``"trusted"``: skip validation entirely (no eager action, fully
      lazy). The caller asserts key-uniqueness; duplicate keys will
      silently produce duplicate rows, exactly like a blind
      anti-join + union.
    - ``"last_wins"``: deterministically keep one row per key — the
      maximum of ``last_wins_order`` columns (required; a DataFrame
      has no inherent row order to make "last" well-defined; they may
      be any SOURCE columns, e.g. a CDC sequence number the target
      doesn't carry). Pure window algebra, no extra action.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("merge_upsert requires at least one key column")
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing target columns: {missing}")
    if duplicate_policy == "last_wins":
        if not last_wins_order:
            raise ValueError(
                "duplicate_policy='last_wins' requires last_wins_order "
                "columns — DataFrames have no inherent row order"
            )
        from pyspark.sql import Window

        # dedup BEFORE the target-column projection so the ordering
        # may use source-only columns (CDC sequence, change timestamp)
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in last_wins_order]
        )
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    elif duplicate_policy not in ("error", "trusted"):
        raise ValueError(f"unknown duplicate_policy: {duplicate_policy!r}")
    src = source.select(*target.columns)
    if duplicate_policy == "error":
        # The check is a SINGLE action — a persist around exactly one
        # job buys no cross-action consistency and only adds
        # cache-write + memory cost per call, so none is taken. The
        # merged result re-evaluates the source once at final
        # execution (documented above); a caller who wants the check
        # and the execution to share one materialization caches
        # ``source`` themselves, and a nondeterministic source must
        # be cached by the caller regardless (it could otherwise
        # pass the check yet deliver duplicates at execution).
        dup = (
            src.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_vals = tuple(dup[0][k] for k in keys)
            raise ValueError(
                "merge_upsert: multiple source rows share key "
                f"{dict(zip(keys, key_vals))} — ambiguous MERGE "
                "(Delta would raise); dedup the batch or pass "
                "duplicate_policy='last_wins' with last_wins_order"
            )
    src_keys = src.select(*keys)
    if broadcast_source:
        src_keys = F.broadcast(src_keys)
    kept = target.join(src_keys, on=keys, how="left_anti")
    return kept.unionByName(src)


def merge_delete(
    target: DataFrame,
    tombstones: DataFrame,
    keys: Sequence[str],
    *,
    broadcast_source: bool = False,
) -> DataFrame:
    """WHEN MATCHED THEN DELETE: drop target rows whose key appears in
    ``tombstones`` (a key-only CDC delete feed)."""
    keys = list(keys)
    tomb = tombstones.select(*keys)
    if broadcast_source:
        tomb = F.broadcast(tomb)
    return target.join(tomb, on=keys, how="left_anti")


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-feed between two snapshots of the same keyed table.

    Output: key columns + ``change_type`` (``'insert'`` /
    ``'delete'`` / ``'update'``) + ``old_<c>`` / ``new_<c>`` for each
    compared column (pre/post images, as Delta CDF emits). Rows whose
    compared values are null-safely equal are excluded — the feed
    carries changes only.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    compare_cols = list(compare_cols)

    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))

    j = o.join(n, on=keys, how="full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~(F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")))
    change_type = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_cols = (
        keys
        + [F.col(f"old_{c}") for c in compare_cols]
        + [F.col(f"new_{c}") for c in compare_cols]
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", *[f"old_{c}" for c in compare_cols],
                *[f"new_{c}" for c in compare_cols])
    )
