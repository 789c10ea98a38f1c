"""Dump .explain("formatted") for catalog entries to plans/<round>/.

Usage:
    python tools/dump_plans.py before [name ...]   # all headliners if no names
    python tools/dump_plans.py after  [name ...]

Writes plans/<round>/<name>_<suffix>.txt — the optimization-round
evidence files (the judge checks plan claims against these). The round
dir defaults to r14 (the current optimization round); override with
SPARK_GRAFT_PLAN_ROUND=r13 to regenerate an older census.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    if suffix not in ("before", "after"):
        raise SystemExit("usage: dump_plans.py before|after [entry ...]")
    names = sys.argv[2:]

    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
    from usgs_earthquake_data_pipeline_spark.session import get_spark

    if names:
        unknown = [n for n in names if n not in CATALOG]
        if unknown:
            raise SystemExit(f"unknown entries: {unknown}")
        entries = [CATALOG[n] for n in names]
    else:
        entries = [e for e in CATALOG.values() if e.headline]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump_plans")
    for e in entries:
        df = e.spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{e.name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
