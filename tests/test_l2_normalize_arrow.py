"""Edge cases for the mapInArrow L2-normalizer (round-10 advice):
trailing empty lists used to blow np.add.reduceat out of bounds, and
null embeddings lost their validity bitmap (re-emitted as empty
lists). Plus the happy-path contract the catalog entry relies on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators.similarity import (
    l2_normalize_arrow,
)


def _collect(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, tag string"
    )
    out = l2_normalize_arrow(df).orderBy("vec_id").collect()
    return {r["vec_id"]: r for r in out}


def test_normalizes_and_passes_through(spark):
    got = _collect(
        spark,
        [(1, [3.0, 4.0], "a"), (2, [0.0, 0.0], "b"), (3, [2.0], "c")],
    )
    assert got[1]["embedding"] == [0.6, 0.8]
    # zero-norm passes through unscaled (divide-by-1), never NaN
    assert got[2]["embedding"] == [0.0, 0.0]
    assert got[3]["embedding"] == [1.0]
    assert [got[i]["tag"] for i in (1, 2, 3)] == ["a", "b", "c"]


def test_empty_lists_everywhere_do_not_crash(spark):
    # empties at the head, middle, and TAIL of the batch — the tail
    # one puts offset == len(values), the old out-of-bounds case
    got = _collect(
        spark,
        [
            (1, [], "head"),
            (2, [3.0, 4.0], "mid"),
            (3, [], "mid-empty"),
            (4, [6.0, 8.0], "mid2"),
            (5, [], "tail"),
        ],
    )
    assert got[1]["embedding"] == []
    assert got[2]["embedding"] == [0.6, 0.8]
    assert got[3]["embedding"] == []
    assert got[4]["embedding"] == [0.6, 0.8]
    assert got[5]["embedding"] == []


def test_null_embedding_stays_null(spark):
    got = _collect(
        spark,
        [(1, None, "n"), (2, [1.0, 1.0], "v"), (3, None, "tail-null")],
    )
    assert got[1]["embedding"] is None
    assert got[3]["embedding"] is None
    v = got[2]["embedding"]
    assert math.isclose(v[0], 1 / math.sqrt(2))
    assert math.isclose(sum(x * x for x in v), 1.0)


def test_matches_expression_fold_on_regular_vectors(spark):
    """Bit-parity with the JVM expression form on dense vectors — the
    property the hash-gated catalog entry depends on."""
    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (F.col("id") + i).cast("double"),
        ).alias("embedding"),
        F.lit("x").alias("tag"),
    )
    arrow = {
        r["vec_id"]: r["embedding"]
        for r in l2_normalize_arrow(df).collect()
    }
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x * x
        )
    )
    expr = {
        r["vec_id"]: r["norm_vec"]
        for r in df.select(
            "vec_id",
            F.transform("embedding", lambda x: x / norm).alias("norm_vec"),
        ).collect()
    }
    for k in expr:
        for a, b in zip(arrow[k], expr[k]):
            assert math.isclose(a, b, rel_tol=1e-12)
