"""Declarative data-quality expectations (the Deequ/Great-Expectations
shape): a rule list compiles to ONE aggregate pass over the table and
returns a per-rule violations report.

The reference validates nothing on ingest (bad GeoJSON features are
silently null-filled, usgs-earthquake-data-ingest.py:130-163); the
pipeline modules here already enforce schema and referential checks
piecemeal (schema.py required-field filter, audit_referential_
integrity). This operator is the unified front door: admission gates
for a crawl snapshot expressed as data, not code.

Scale shape: every rule is a conditional-count aggregate, so the
whole report is a single map-side-collapsed pass — one row per
partition reaches the final merge no matter how many rules.
Uniqueness is the exception (it needs a distinct count, which is its
own shuffle on the column); it runs as a separate branch and unions
into the same report.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, in_range, in_set,
    matches, unique}; violations are rows (or duplicated values, for
    unique) that break it."""

    kind: str
    col: str
    lo: float | None = None
    hi: float | None = None
    values: tuple[Any, ...] = ()
    pattern: str | None = None

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.col}"


def _violation(rule: Rule) -> Column:
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        return c.isNull() | (c < rule.lo) | (c > rule.hi)
    if rule.kind == "in_set":
        return c.isNull() | ~c.isin(list(rule.values))
    if rule.kind == "matches":
        return c.isNull() | ~c.rlike(rule.pattern)
    raise ValueError(f"unknown rule kind: {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, violations, ok) rows.

    All scalar rules share one aggregate job (a conditional SUM per
    rule); each ``unique`` rule adds one distinct-shuffle branch whose
    violation count is ``count(col) - count(DISTINCT col)`` (NULLs are
    not duplicates — not_null is its own rule)."""
    scalar = [r for r in rules if r.kind != "unique"]
    uniques = [r for r in rules if r.kind == "unique"]

    reports = []
    if scalar:
        agg = df.agg(
            *[
                F.sum(_violation(r).cast("long")).alias(r.name)
                for r in scalar
            ]
        )
        # one row -> |scalar| rows, locally (stack is an Expand)
        pairs = ", ".join(f"'{r.name}', `{r.name}`" for r in scalar)
        reports.append(
            agg.selectExpr(
                f"stack({len(scalar)}, {pairs}) AS (rule, violations)"
            )
        )
    for r in uniques:
        reports.append(
            df.agg(
                (F.count(r.col) - F.countDistinct(r.col)).alias("violations")
            ).select(F.lit(r.name).alias("rule"), "violations")
        )
    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    return out.select(
        "rule",
        F.coalesce("violations", F.lit(0)).alias("violations"),
        (F.coalesce("violations", F.lit(0)) == 0).cast("int").alias("ok"),
    )


def quarantine(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Row-level admission: split the table into (passed, quarantined)
    on the same rule set ``validate`` reports on. Quarantined rows
    carry ``violated_rules`` — a comma-joined rule-name string (not an
    array: quarantine output may feed oracle-gated sinks, and the
    catalog bans container columns) — the dead-letter audit trail.

    ``unique`` rules are report-only (a duplicate is a property of the
    TABLE, not a row; latest-wins dedup is its row-level remedy) and
    are ignored here.

    Scale: one codegen pass — the rule predicates evaluate per-row on
    the scan, no shuffle for either output side.
    """
    row_rules = [r for r in rules if r.kind != "unique"]
    flags = [
        F.when(_violation(r), F.lit(r.name)) for r in row_rules
    ]
    tagged = df.withColumn(
        "violated_rules",
        F.concat_ws(",", F.array_compact(F.array(*flags)))
        if flags
        else F.lit(""),
    )
    passed = tagged.filter(F.col("violated_rules") == "").drop("violated_rules")
    quarantined = tagged.filter(F.col("violated_rules") != "")
    return passed, quarantined
