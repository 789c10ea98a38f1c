"""Distributed linear algebra over embedding columns: covariance /
Gram accumulation and PCA projection.

The scale decomposition is the classic one (the same shape MLlib's
RowMatrix.computeCovariance uses): the only corpus-sized work is
accumulating d² cross-products — expressed as a double-posexplode into
a (i, j)-keyed aggregate, which Spark's partial (map-side) hash
aggregation collapses to d² rows PER PARTITION before the shuffle, so
shuffle volume is partitions×d², never rows×d².  The d×d eigensolve is
driver-side numpy on a BOUNDED matrix (d ≤ a few thousand — for wider
embeddings you switch to randomized/iterative sketches, which change
this one bounded step, not the distributed accumulation).  The
projection back over the corpus is a broadcast-free zip_with dot
product — pure codegen, no shuffle.

Float convention for the oracle-gated covariance: per-term products
are rounded to 9 dp and summed as DECIMAL (order-free, so the
aggregate is deterministic under any partitioning), matching the
catalog's decimal-exact summation convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cross_moment_sums(
    df: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """Σ xᵢ·xⱼ (per-term 9 dp rounds, DECIMAL-exact sums), Σ xᵢ and n
    for every dimension pair — the sufficient statistics for a
    covariance / Gram matrix, in one pass.

    Output: (i, j, s_ij, s_i, s_j, n) with 0-based dims, i ≤ j when
    ``upper_only``.  The double explode feeds a partial hash
    aggregate whose key space is d² — each partition reduces to d²
    rows before anything shuffles."""
    from .dedup import _widen

    v = F.col(vec_col).cast("array<double>")
    # the d²-per-row explode is the CPU-heavy stage: widen a
    # single-file scan to cluster parallelism first (no-op at real
    # scale where the scan already has many partitions) — without
    # this, a one-file embeddings table runs the whole accumulation
    # on one core.
    src = _widen(df.select(v.alias("v")))
    ij = (
        src.select(F.posexplode("v").alias("i", "x"), "v")
        .select("i", "x", F.posexplode("v").alias("j", "y"))
    )
    if upper_only:
        ij = ij.filter(F.col("i") <= F.col("j"))
    sij = ij.groupBy("i", "j").agg(
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(38,9)"))
        .alias("s_ij_dec"),
        F.count("*").alias("n"),
    )
    si = (
        src.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(
            F.sum(F.round(F.col("x"), 9).cast("decimal(38,9)")).alias(
                "s_dec"
            )
        )
    )
    return (
        sij.join(si.select(F.col("i"), F.col("s_dec").alias("s_i_dec")), "i")
        .join(
            si.select(F.col("i").alias("j"), F.col("s_dec").alias("s_j_dec")),
            "j",
        )
        .select(
            "i",
            "j",
            F.col("s_ij_dec").cast("double").alias("s_ij"),
            F.col("s_i_dec").cast("double").alias("s_i"),
            F.col("s_j_dec").cast("double").alias("s_j"),
            "n",
        )
    )


def covariance_entries(
    df: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """Sample covariance cov(i, j) from the cross-moment sums:
    (Σxy − Σx·Σy/n) / (n−1), one identically-ordered float expression
    per cell, rounded to 6 dp."""
    s = cross_moment_sums(df, vec_col, upper_only)
    # `+ 0.0` normalizes IEEE negative zero: a cell rounding to zero
    # from below would otherwise be -0.0 on one engine and 0.0 on the
    # other (repr-sensitive hash compares see different rows)
    cov = (
        F.round(
            (
                F.col("s_ij")
                - F.col("s_i") * F.col("s_j") / F.col("n").cast("double")
            )
            / (F.col("n").cast("double") - 1),
            6,
        )
        + 0.0
    )
    return s.select("i", "j", cov.alias("cov")).orderBy("i", "j")


def pca_top_components(cov_rows, d: int):
    """Driver-side eigensolve over collected covariance cells (a
    BOUNDED d×d matrix — the one deliberate driver step).  Returns
    (eigenvalues desc, eigenvectors as rows) with the sign convention
    "largest-|component| entry is positive" so downstream projections
    are deterministic despite eigh's sign ambiguity."""
    import numpy as np

    m = np.zeros((d, d))
    for r in cov_rows:
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(m)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order].T  # rows are components
    for k in range(v.shape[0]):
        lead = np.argmax(np.abs(v[k]))
        if v[k][lead] < 0:
            v[k] = -v[k]
    return w, v


def project_component(vec_col: Column | str, component) -> Column:
    """Dot product of the embedding with a (Python-list) component —
    a codegen zip_with/aggregate fold, no UDF, no shuffle."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    lit = F.array(*[F.lit(float(x)) for x in component])
    return F.aggregate(
        F.zip_with(c.cast("array<double>"), lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def jl_sign_matrix(
    d: int, k: int, seed: str = "usgs-jl"
) -> list[list[float]]:
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix as
    ``k`` sign columns of length ``d`` (Achlioptas 2003: Rademacher
    entries satisfy the JL lemma with the same guarantees as
    Gaussian ones, database-friendly because projection is just
    signed addition).  Entries come from a counter hash — no RNG
    state, identical on every executor/run/engine, embeddable as SQL
    literals (the same reproducibility device as the LSH hyperplanes
    and the DP noise seeds)."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{seed}-{i}-{j}".encode()).digest()[0] % 2 == 0
            else -1.0
            for i in range(d)
        ]
        for j in range(k)
    ]


def power_method_int(
    cov_rows,
    d: int,
    *,
    squarings: int = 9,
    matvecs: int = 2,
    cov_scale: int = 1_000_000,
    vec_scale: int = 1_000_000_000,
):
    """Dominant-eigenvector extraction in EXACT integer arithmetic —
    the SQL-expressible eigensolve behind the PCA ``*_checked`` twin.

    Plain power iteration cannot work on this corpus (measured
    eigengap λ1/λ2 ≈ 1.01-1.07: convergence 0.99^k); instead the
    covariance is repeatedly SQUARED — ``squarings`` m rescaled
    integer matrix squarings give the spectral separation of 2^m
    power steps (m=9 → 512, gap^512 ≈ 650 even at λ1/λ2=1.0127) —
    then ``matvecs`` final matrix-vector steps extract the direction.

    Every multiply-accumulate is exact Python int (mirrored by exact
    BIGINT/HUGEINT SQL in the DuckDB twin); floats appear only in the
    per-step rescale round(x/scale·10^k), where both engines see the
    same IEEE doubles: all integers crossing into float stay < 2^53
    (max |M²| ≈ 1.1e13, max |u| ≈ 3.3e15 < 2^53 measured; n² up to
    1.2e32 converts correctly-rounded from exact int in both
    engines), division/sqrt are correctly-rounded IEEE, and the final
    round is HALF_UP away-from-zero in Spark, DuckDB, and the
    ``_halfup`` here.  Sign is pinned by the largest-|entry|
    component (smallest index on ties) being positive — the same
    convention as ``pca_top_components`` so the twin's direction
    matches the numpy eigensolve (cosine ≥ 0.999999999 at sf0.001/
    0.01/0.1, pinned in tests/test_linalg.py).

    Scale shape: runs on the COLLECTED covariance — a bounded d² cell
    table (the one deliberate driver step, same contract as
    ``pca_top_components``); the corpus-sized work (covariance
    accumulation, projection) stays distributed.
    """
    import math

    def _halfup(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    m = [[0] * d for _ in range(d)]
    for r in cov_rows:
        c = _halfup(r["cov"] * cov_scale)
        m[r["i"]][r["j"]] = c
        m[r["j"]][r["i"]] = c
    for _ in range(squarings):
        sq = [
            [sum(m[i][k] * m[k][j] for k in range(d)) for j in range(d)]
            for i in range(d)
        ]
        mx = max(abs(sq[i][j]) for i in range(d) for j in range(d))
        m = [
            [_halfup(float(sq[i][j]) / float(mx) * cov_scale) for j in range(d)]
            for i in range(d)
        ]
    v = [_halfup(float(vec_scale) / math.sqrt(d))] * d
    for _ in range(matvecs):
        u = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
        norm = math.sqrt(float(sum(x * x for x in u)))
        v = [_halfup(float(x) / norm * vec_scale) for x in u]
    lead = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[lead] < 0:
        v = [-x for x in v]
    return v
