"""Depth stress for the iterative trainers (r8 verdict item 5): the
round-8 lineage checkpointing was only exercised at toy k; these
tests run real depth and assert per-iteration wall time stays FLAT —
the signature of a lineage blow-up is monotone per-round growth, not
a high constant. The deterministic halves of the checks (plan size
bounded, checkpoint node present, correct results) always run and
carry the precision; the late/early wall-clock ratio assertions
depend on shared-box scheduling and are opt-in via
``SPARK_GRAFT_STRICT_TIMING=1`` so the default suite cannot flake
under load (a lineage blow-up still fails the plan-size checks).
"""

from __future__ import annotations

import os
import statistics

import pytest

STRICT_TIMING = os.environ.get("SPARK_GRAFT_STRICT_TIMING") == "1"


def _assert_flat(times: list[float], what: str) -> None:
    """Late-vs-early per-round wall-time flatness — only enforced in
    strict-timing mode; always computed so a strict run exercises the
    same code path the default run does."""
    early = statistics.median(times[4:12])  # skip warmup rounds
    late = statistics.median(times[-8:])
    if STRICT_TIMING:
        assert late < 3.0 * early, (
            f"per-{what} time grew: early median {early:.3f}s -> "
            f"late median {late:.3f}s ({times})"
        )
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.dedup import (
    resolve_dup_clusters,
)
from usgs_earthquake_data_pipeline_spark.plans.vocab_ops import _bpe_train


pytestmark = pytest.mark.slow


def test_bpe_train_k64_per_merge_flat(spark, sf_dir):
    """64 merges (16x the gated k=4, 16 checkpoint truncations at the
    default cadence). Per-merge wall time must not trend upward: with
    checkpoint_every=4 the plan depth is bounded by 4 merges, so the
    late rounds cost what the early rounds cost. (At cadence 8 this
    very test OOM'd the JVM — expression size is ~5^depth per window —
    which is why 4 is the default.)"""
    times: list[float] = []
    merges, cur = _bpe_train(spark, sf_dir, 64, round_times=times)
    assert len(merges) == len(times) == 64
    _assert_flat(times, "merge")
    # lineage truncation evidence: the returned frame's logical plan
    # is rooted in the iteration-64 checkpoint RDD, not 64 stacked
    # aggregate-fold projections
    plan = cur._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert len(plan) < 20_000, f"plan unexpectedly large: {len(plan)} chars"
    # merges are a real monotone-ish frequency schedule, all non-empty
    assert all(cnt > 0 and " " in pair for _, pair, cnt in merges)


def test_bpe_checkpointing_preserves_merges(spark, sf_dir):
    """Two cadences whose truncation boundaries fall on different
    merges must learn the identical merge table at a depth spanning
    several truncations (k=20). Fully unchecked is deliberately
    absent: ~5^20 inlined expression nodes OOM the JVM — the measured
    reason checkpointing exists (tests/test_vocab_ops.py pins the
    unchecked equivalence at safe depth 6)."""
    a, _ = _bpe_train(spark, sf_dir, 20, checkpoint_every=3)
    b, _ = _bpe_train(spark, sf_dir, 20, checkpoint_every=7)
    assert a == b


def test_resolve_clusters_1000_node_chain_flat(spark):
    """A planted 1000-node-diameter path graph — the adversarial case
    for min-label propagation (one hop of progress per round). Run 48
    rounds (far past any lineage-pathology onset the r8 pointer-
    jumping experiment saw at ~16) and assert per-round wall time is
    flat; convergence would need the full diameter, so the bounded
    run must raise the documented RuntimeError rather than return a
    silent partial result."""
    edges = spark.range(1000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    times: list[float] = []
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_dup_clusters(edges, max_iterations=48, round_times=times)
    assert len(times) == 48
    _assert_flat(times, "round")


def test_resolve_clusters_chain_converges_small(spark):
    """Same chain shape at a diameter the loop is expected to finish:
    every node must land on canonical_id 0 in exactly diameter rounds
    (one hop per round — pins the propagation speed the stress test's
    48-round budget assumes)."""
    n = 24
    edges = spark.range(n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    times: list[float] = []
    got = resolve_dup_clusters(
        edges, max_iterations=n + 2, round_times=times
    ).collect()
    assert {r.id for r in got} == set(range(n + 1))
    assert {r.canonical_id for r in got} == {0}
    # n rounds to reach the far end + 1 no-change round to detect
    # convergence
    assert len(times) == n + 1
