"""Frequency sketches: Misra-Gries heavy-hitter summaries and a
count-min point-frequency sketch.

Why these exist when ``groupBy(key).count()`` is already one shuffle:
the exact aggregate's exchange is bounded by the number of DISTINCT
keys. For web-corpus keys (URLs, hosts, n-grams) that is billions of
rows of shuffle at 100 TB when all anyone wants is the handful of
keys above a frequency threshold. Both sketches here bound the
exchange by the SKETCH size instead — k entries per partition
(Misra-Gries) or depth x width cells (CMS) — independent of key
cardinality.

The heavy-hitter path stays EXACT end-to-end (and therefore
oracle-checkable): Misra-Gries can undercount but provably never
misses a key above the threshold, so a second exact pass over just
the surviving candidates reproduces ``HAVING count(*) >= T``
verbatim. The classic guarantee (Misra & Gries 1982; Manku & Motwani
"lossy counting", VLDB'02): compressing a batch of n_b rows to k
entries subtracts at most n_b/(k+1) from any key's count, and the
subtractions are additive across batches/partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker values for the side-channel rows the summary generator emits
# alongside (key, residual) entries: per-batch subtracted mass and
# per-batch row count ride the same mapInPandas output so the whole
# sketch needs exactly ONE pass over the data
_TAG_ENTRY = "mg"
_TAG_CUT = "cut"
_TAG_ROWS = "n"


def mg_summaries(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Per-Arrow-batch Misra-Gries summaries of ``key_col``:
    ``(key, cnt, tag)`` rows where tag 'mg' rows carry at most ``k``
    residual counts per batch, 'cut' rows carry the batch's subtracted
    mass c* (every key's undercount in that batch is <= c*), and 'n'
    rows carry the batch's row count.

    Vectorized per batch: the batch's exact ``value_counts`` IS a
    frequency summary; Misra-Gries compression of it is "subtract the
    (k+1)-th largest count from everything, keep the positive part" —
    two pandas ops, no Python row loop. Merging summaries is plain
    ``groupBy(key).sum()`` because residuals and cuts are additive.

    Output size is <= (k + 2) rows per Arrow batch regardless of key
    cardinality — the exchange bound that replaces shuffling billions
    of distinct keys.
    """
    import pandas as pd

    schema = "key long, cnt long, tag string"

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vc = pdf[key_col].value_counts()  # exact per-batch counts
            if len(vc) > k:
                cstar = int(vc.iloc[k])  # (k+1)-th largest count
                kept = vc - cstar
                kept = kept[kept > 0]
            else:
                cstar = 0
                kept = vc
            # nullable Int64 keeps 64-bit keys exact through the
            # concat with the null-key side rows (plain int64 + None
            # would upcast to float64 and round large ids)
            out = pd.DataFrame(
                {
                    "key": pd.array(kept.index.to_numpy(), dtype="Int64"),
                    "cnt": kept.to_numpy(),
                    "tag": _TAG_ENTRY,
                }
            )
            side = pd.DataFrame(
                {
                    "key": pd.array([None, None], dtype="Int64"),
                    "cnt": [cstar, len(pdf)],
                    "tag": [_TAG_CUT, _TAG_ROWS],
                }
            )
            yield pd.concat([out, side], ignore_index=True)

    return df.select(key_col).mapInPandas(gen, schema)


def heavy_hitters_exact(
    df: DataFrame, key_col: str, fraction: float, k: int = 256
) -> DataFrame:
    """EXACT keys with ``count >= fraction * N`` (N = total rows),
    computed with a key-cardinality-independent exchange:

    1. one pass builds merged Misra-Gries residuals (exchange <=
       (k+2) rows per Arrow batch, then one groupBy over <= k-ish
       surviving keys);
    2. candidates = keys whose merged residual >= fraction*N - U,
       where U (the summed per-batch cuts) bounds every key's total
       undercount — NO true heavy hitter can fall below this bar, so
       the candidate set is a provable superset;
    3. a second pass counts ONLY rows matching a candidate key
       (broadcast semi-join at realistic candidate sizes) and applies
       the exact threshold.

    Requires ``k + 1 > 1/fraction`` — otherwise U can exceed the
    threshold and the candidate bar degenerates to "every key seen"
    (still correct, no longer pruned). Deterministic for any
    partitioning/batching: the candidate SUPERSET varies with batch
    boundaries, the final exact output never does.
    """
    if (k + 1) * fraction <= 1.0:
        raise ValueError(
            f"k={k} too small for fraction={fraction}: need k+1 > 1/fraction "
            "or the undercount bound exceeds the threshold"
        )
    summ = mg_summaries(df, key_col, k)
    merged = summ.groupBy("key", "tag").agg(F.sum("cnt").alias("cnt"))
    residuals = merged.filter(F.col("tag") == _TAG_ENTRY).select("key", "cnt")
    totals = merged.filter(F.col("tag") != _TAG_ENTRY).groupBy().pivot(
        "tag", [_TAG_CUT, _TAG_ROWS]
    ).sum("cnt").select(
        F.coalesce(F.col(_TAG_CUT), F.lit(0)).alias("undercount"),
        F.col(_TAG_ROWS).alias("n_rows"),
    )
    # 1-row totals cross-joined onto the <= k residual keys: trivial
    candidates = (
        residuals.crossJoin(F.broadcast(totals))
        .filter(
            F.col("cnt")
            >= F.lit(fraction) * F.col("n_rows") - F.col("undercount")
        )
        .select(F.col("key").alias(key_col))
    )
    threshold = totals.select(
        (F.lit(fraction) * F.col("n_rows")).alias("threshold")
    )
    return (
        df.join(F.broadcast(candidates), key_col, "leftsemi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("n_events") >= F.col("threshold"))
        .select(key_col, "n_events")
    )


def cms_cells(
    df: DataFrame, key_col: str, *, depth: int = 5, width: int = 4096
) -> DataFrame:
    """Count-min sketch as a (row, col, cnt) cell table: each key
    increments one column per hash row. Map-side partial aggregation
    collapses each partition to <= depth*width cells, so the exchange
    is sketch-sized whatever the key cardinality; cell tables from
    different datasets/days merge by summing — the mergeability that
    makes CMS the standard streaming/rollup frequency sketch."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    return (
        df.select(F.col(key_col).alias("k"))
        .select("k", rows)
        .select(
            "r", F.pmod(F.xxhash64("k", F.col("r")), F.lit(width)).alias("c")
        )
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimates(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 5,
    width: int = 4096,
) -> DataFrame:
    """Point-frequency estimates for a (small) probe-key set: hash
    each probe into its depth cells, look them up in the cell table,
    take the row-wise minimum. Estimates never undercount; expected
    overcount <= e*N/width per the standard CMS bound (Cormode &
    Muthukrishnan '05). The cells side joins on (r, c) — a sketch-
    sized equi-join, no scan of the original data."""
    probes = (
        keys.select(F.col(key_col).alias("k"))
        .distinct()
        .select(
            "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
        )
        .select(
            "k",
            "r",
            F.pmod(F.xxhash64("k", F.col("r")), F.lit(width)).alias("c"),
        )
    )
    return (
        probes.join(cells, ["r", "c"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("k")
        .agg(F.min("cnt").alias("est"))
        .select(F.col("k").alias(key_col), "est")
    )


# ---------------------------------------------------------------------------
# KMV / theta sketches: distinct-count SET ALGEBRA (union, intersect,
# A-not-B) under a fixed-size sample of the hash space. HLL unions
# losslessly but cannot subtract or intersect; the k-minimum-values
# sketch (Bar-Yossef et al. '02; Dasgupta et al., "Theta sketch
# framework", 2016) keeps the k smallest distinct hash values, so any
# set expression evaluates on the retained samples below
# theta = min(k-th values) and scales by 1/theta. At 100 TB this is
# what answers "how many of today's keys are NEW vs yesterday's
# trillion-key set" from two KB-sized summaries.
# ---------------------------------------------------------------------------

KMV_SPACE = float(1 << 48)  # hash range: 12 md5 hex chars


def kmv_hash(col) -> F.Column:
    """Deterministic 48-bit integer hash of a key: first 12 hex chars
    of md5, base-16 — the same cross-engine idiom as
    plans/sampling.hash_bucket, sized so (k-1)*SPACE/theta arithmetic
    stays exact in doubles (2^48 < 2^53)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame, key_col: str, k: int = 128, n_buckets: int = 0
) -> DataFrame:
    """One-row DataFrame holding the KMV sketch of a key column: the
    ``k`` smallest DISTINCT 48-bit hashes, ascending. With
    ``n_buckets`` > 0 the sketch is built two-level — per-bucket
    partial sketches (bucket = hash % n_buckets, so buckets partition
    the hash space and partials are disjoint) merged by
    flatten→sort→take-k. The two paths are provably identical: each
    bucket keeps its k smallest, and the global k smallest all
    survive their own bucket's cut — the mergeability theorem
    ``sketch_theta_setops_checked`` pins. Scale shape, stated
    honestly: the EXCHANGE into the merge carries exactly k longs per
    bucket (the slice runs inside the per-bucket aggregate), but the
    per-bucket ``collect_set`` buffer itself is O(distinct/bucket) —
    the same working set as any exact distinct — so n_buckets is the
    memory dial: size it so distinct/n_buckets fits an executor
    (10⁵ buckets over a trillion keys → 10⁷-value buffers), or
    pre-filter ``h < θ_est`` from a first-pass estimate to cut the
    buffer to ~k before aggregating."""
    h = kmv_hash(key_col).alias("h")
    if n_buckets:
        per = (
            df.select(h)
            .groupBy((F.col("h") % n_buckets).alias("b"))
            .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("p"))
        )
        return per.agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("p"))), 1, k
            ).alias("kmv")
        )
    return df.select(h).agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmv")
    )


def kmv_theta(sk: F.Column, k: int) -> F.Column:
    """Effective theta (raw hash units): the k-th smallest value when
    the sketch is full, else the whole space (the sketch IS the set)."""
    return F.when(
        F.size(sk) >= k, F.element_at(sk, k).cast("double")
    ).otherwise(F.lit(KMV_SPACE))


def kmv_estimate(sk: F.Column, k: int) -> F.Column:
    """Distinct-count estimate: exact size below k, else the
    unbiased (k-1)/theta estimator."""
    return F.when(
        F.size(sk) < k, F.size(sk).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / kmv_theta(sk, k))


def theta_combine_estimate(
    a: F.Column, b: F.Column, k: int, op: str
) -> F.Column:
    """Set-expression cardinality estimate from two same-k KMV
    sketches, theta-framework style: theta = min(theta_a, theta_b);
    evaluate the expression on retained hashes below theta; scale by
    SPACE/theta. ``op`` is 'union', 'intersect', or 'a_not_b'. For
    union the combined sketch may re-saturate, so the k-th combined
    value tightens theta further (this IS the union KMV sketch)."""
    theta = F.least(kmv_theta(a, k), kmv_theta(b, k))
    if op == "union":
        merged = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
        return kmv_estimate(merged, k)
    if op == "intersect":
        kept = F.array_intersect(a, b)
    elif op == "a_not_b":
        kept = F.array_except(a, b)
    else:
        raise ValueError(f"unknown theta op: {op}")
    n_kept = F.size(F.filter(kept, lambda v: v.cast("double") < theta))
    return n_kept.cast("double") * F.lit(KMV_SPACE) / theta


def kmv_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`kmv_hash` for the entries' oracles
    (DuckDB has no base-16 conv; fold the 12 md5 hex digits
    explicitly — the same device as plans/sampling._bucket_sql)."""
    return (
        "list_reduce(list_transform(regexp_extract_all("
        f"substr(md5({expr}),1,12),'.'),"
        " c -> strpos('0123456789abcdef', c) - 1), (a,b) -> a*16+b)"
    )


KMV_SPACE_SQL = "CAST(281474976710656 AS DOUBLE)"  # 2^48, the hash range
