"""Broadcast Bloom-filter pre-filtering for selective semi joins.

The 100 TB problem: a semi join whose build side is selective (say 5%
of ``orders``) still shuffles the ENTIRE probe side (``lineitem``) on
the join key before the join can drop 95% of it.  Spark's own runtime
bloom-filter rewrite (``spark.sql.optimizer.runtime.bloomFilter.*``)
exists for exactly this reason but only fires under planner
heuristics; this module is the explicit, always-on version: build a
fixed-size bitmap from the build-side keys with one aggregate job,
inline it into the probe scan as a literal-array predicate, and let
the (exact) semi join run over survivors only.  The filter is
evaluated JVM-side inside the probe's scan stage — false positives
are removed by the real join, so results are exact.

Design notes:

- The bitmap is ``m_bits``-wide, packed into ``m_bits/64`` longs.
  The driver only ever holds the fixed-size bitmap (16 KiB at the
  default 2**17 bits) — never the keys.  Building is one
  explode→groupBy over the build side; partial aggregation collapses
  each task's contribution to at most ``m_bits/64`` rows before the
  (tiny) shuffle.
- k hash functions come from ``xxhash64(key, seed)`` — appending a
  literal seed column to the hash input is the standard way to derive
  a hash family from Spark's single xxhash64.
- The membership test is pure ``Column`` arithmetic over an
  ``array<bigint>`` literal (element_at + shiftleft + bitwiseAND):
  whole-stage-codegen compatible, no UDF, no broadcast-variable
  machinery needed.
- False-positive rate at fill ratio f is ~f**k; size ``m_bits`` ≥
  ~10× (k × |keys|) to keep f below 10%.  An over-full bloom degrades
  to passing everything — still correct, just useless — so callers
  sizing for 100 TB scale should derive ``m_bits`` from a build-side
  count estimate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_bloom_bitmap",
    "bloom_might_contain",
    "bloom_prefilter_semi_join",
]


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions (as BIGINT columns in [0, m_bits)) of a key."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in range(k)
    ]


def build_bloom_bitmap(
    build: DataFrame, key_col: str, m_bits: int = 1 << 17, k: int = 3
) -> list[int]:
    """Aggregate every build-side key's k hash-bit positions into one
    ``m_bits``-wide bitmap; returns ``m_bits/64`` packed (signed)
    longs.  One Spark job; duplicates need no pre-``distinct`` —
    ``bit_or`` absorbs them and partial aggregation caps the shuffle
    at ``m_bits/64`` rows per task.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = build.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), m_bits, k))).alias("pos")
    ).filter(F.col("pos").isNotNull())
    words = (
        pos.groupBy(F.floor(F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(F.col("pos"), F.lit(64)).cast("int"),
                )
            ).alias("bits")
        )
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for row in words:
        bitmap[row["w"]] = row["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], m_bits: int, k: int = 3
) -> Column:
    """Boolean membership-test Column: True iff all k bits for ``key``
    are set in ``bitmap``.  NULL keys test False (a semi join would
    drop them anyway).  Pure expression — stays in whole-stage
    codegen at the probe scan.
    """
    if len(bitmap) * 64 != m_bits:
        raise ValueError(
            f"bitmap has {len(bitmap)} words; expected {m_bits // 64} for m_bits={m_bits}"
        )
    bmp = F.lit(bitmap)
    cond = key.isNotNull()
    for pos in _bit_positions(key, m_bits, k):
        word = F.element_at(bmp, F.floor(pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(pos, F.lit(64)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """Exact semi join of ``probe`` against ``build`` keys, with a
    broadcast-bloom prefilter so the probe-side shuffle carries only
    rows that MIGHT match.  Result is identical to
    ``probe.join(build, key, "semi")`` — bloom false positives are
    removed by the real join; the bloom has no false negatives.
    """
    bitmap = build_bloom_bitmap(build, build_key, m_bits=m_bits, k=k)
    survivors = probe.filter(
        bloom_might_contain(F.col(probe_key), bitmap, m_bits, k=k)
    )
    return survivors.join(
        build, survivors[probe_key] == build[build_key], "left_semi"
    )
