"""Z-order (Morton-curve) clustering.

The reference approximates multi-dimensional clustering with a
lexicographic sort and an explicit "z order …" TODO comment
(usgs-earthquake-data-ingest-dynamic-dev.py:290-312). This is the real
thing: quantize each dimension, interleave the bits, range-partition +
sort by the resulting Z-value before writing. Rows close in BOTH
dimensions land in the same files, so min/max file statistics prune
2-D predicates (lat/lon boxes, year+magnitude bands) instead of only
the leading sort column.

Pure column expressions (bit shifts with literal amounts), so the
Z-value computation runs in codegen with the scan; the only exchange
is the range partition that any clustered write needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] to integer cells [0, 2^bits); clamps outliers."""
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells)
    return F.least(
        F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)), F.lit(cells)
    )


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of two ``bits``-wide integers: result bit
    2i holds a's bit i, bit 2i+1 holds b's bit i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value(
    col_a: Column,
    col_b: Column,
    range_a: tuple[float, float],
    range_b: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Z-curve value for a 2-D point (explicit ranges keep this a pure
    expression — no stats pass; pass domain bounds like (-90, 90))."""
    return interleave_bits(
        quantize(col_a, *range_a, bits), quantize(col_b, *range_b, bits), bits
    )


def z_order_sort(
    df: DataFrame,
    col_a: str,
    col_b: str,
    range_a: tuple[float, float],
    range_b: tuple[float, float],
    bits: int = 16,
) -> DataFrame:
    """Cluster a DataFrame along the Z-curve of two columns (the
    write-layout step; follow with a partitioned write)."""
    with_z = df.withColumn(
        "__z", z_value(F.col(col_a), F.col(col_b), range_a, range_b, bits)
    )
    return with_z.repartitionByRange(F.col("__z")).sortWithinPartitions("__z").drop(
        "__z"
    )


def z_value_py(a: int, b: int, bits: int = 16) -> int:
    """Reference Python implementation for tests."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z
