"""Product quantization: codebook training, encoding, ADC search.

Random embeddings give PQ little structure to exploit, so the recall
test plants it: vectors built from per-subspace prototype patterns
(+ small deterministic noise) must be near-perfectly recoverable —
if the codebooks learn anything, same-pattern vectors quantize to the
same codes and ADC ranks them first. Distortion and determinism are
asserted on the driver-provided corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.operators import pq as PQ
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

M, K, DIM = 4, 4, 16
D_SUB = DIM // M


def _planted_df(spark, n_rows: int = 120):
    """Vectors whose every subspace copies one of K prototype patterns with
    deterministic noise — cluster id = (row % K)."""
    rows = []
    for i in range(n_rows):
        proto = i % K
        vec = []
        for j in range(M):
            base = [math.sin(proto * 10 + j * 3 + d) * 5 for d in range(D_SUB)]
            noise = [math.sin(i * 7 + j + d) * 0.05 for d in range(D_SUB)]
            vec.extend(b + n for b, n in zip(base, noise))
        rows.append((i, vec, proto))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, proto int")


def test_train_shape_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = PQ.train_pq_codebooks(emb, m=8, k_codes=8, dim=64, iterations=1)
    b2 = PQ.train_pq_codebooks(emb, m=8, k_codes=8, dim=64, iterations=1)
    assert len(b1) == 8 and len(b1[0]) == 8 and len(b1[0][0]) == 8
    assert b1 == b2


def test_encode_codes_in_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = PQ.train_pq_codebooks(emb, m=8, k_codes=8, dim=64, iterations=1)
    enc = PQ.pq_encode(emb, books)
    stats = enc.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("m"), F.max("m"), F.min("lo"), F.max("hi")
    ).collect()[0]
    assert stats[0] == 8 and stats[1] == 8
    assert stats[2] >= 0 and stats[3] <= 7


def test_reconstruction_beats_mean_baseline(spark, sf_dir):
    """Quantization distortion must be well under the per-dimension
    variance (what predicting the global mean would score)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = PQ.train_pq_codebooks(emb, m=8, k_codes=16, dim=64, iterations=1)
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    enc = PQ.pq_encode(emb, books)
    recon = enc.select("id", PQ.pq_reconstruct(F.col("codes"), books).alias("r"))
    err = (
        vecs.join(recon, "id")
        .select(
            F.aggregate(
                F.zip_with("v", "r", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("se")
        )
        .agg(F.avg("se"))
        .collect()[0][0]
    )
    # total variance of the corpus around its mean, per vector
    dims = vecs.select(F.posexplode("v").alias("d", "x"))
    var_total = (
        dims.groupBy("d")
        .agg((F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("var"))
        .agg(F.sum("var"))
        .collect()[0][0]
    )
    assert err < var_total, (err, var_total)


def test_planted_clusters_recall(spark):
    df = _planted_df(spark)
    books = PQ.train_pq_codebooks(
        df, m=M, k_codes=K, dim=DIM, iterations=2
    )
    queries = df.filter(F.col("vec_id") < 8)
    got = PQ.pq_adc_topk(df, queries, books, k=5).collect()
    proto_of = {r.vec_id: r.proto for r in df.select("vec_id", "proto").collect()}
    # every returned neighbor must share the query's prototype, and the
    # estimated distance of same-proto neighbors must be near zero
    for r in got:
        assert proto_of[r.neighbor_id] == proto_of[r.query_id], r
        assert r.est_dist < 1.0, r
    assert len(got) == 8 * 5


def test_adc_agrees_with_exact_on_planted(spark):
    """ADC top-1 must equal exact-L2 top-1 on well-separated data."""
    df = _planted_df(spark, n_rows=60)
    books = PQ.train_pq_codebooks(df, m=M, k_codes=K, dim=DIM, iterations=2)
    queries = df.filter(F.col("vec_id") < 5)
    adc1 = {
        r.query_id: r.neighbor_id
        for r in PQ.pq_adc_topk(df, queries, books, k=1).collect()
    }
    vecs = df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    )
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    d = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact1 = {
        r.query_id: r.neighbor_id
        for r in vecs.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d.alias("d"))
        .withColumn("rank", F.row_number().over(w))
        .filter("rank = 1")
        .collect()
    }
    # ADC quantizes same-cluster members to identical codes, so its
    # top-1 is the tie-broken (lowest-id) member — which may differ
    # from the exact-L2 winner separated only by the planted noise.
    # The correctness claim is cluster-level: both must agree on WHICH
    # cluster is nearest.
    proto_of = {r.vec_id: r.proto for r in df.select("vec_id", "proto").collect()}
    for qid, exact_n in exact1.items():
        assert proto_of[adc1[qid]] == proto_of[exact_n], (
            qid,
            adc1[qid],
            exact_n,
        )


def test_ivf_pq_full_probe_equals_adc(spark):
    """With n_probe == n_lists the IVF candidate set is the whole
    corpus, so IVF-PQ must reproduce pq_adc_topk exactly — list
    pruning is the only approximation it adds."""
    df = _planted_df(spark, n_rows=80)
    books = PQ.train_pq_codebooks(df, m=M, k_codes=K, dim=DIM, iterations=1)
    queries = df.filter(F.col("vec_id") < 6)
    full = PQ.ivf_pq_topk(
        df, queries, books, k=5, n_lists=8, n_probe=8
    ).collect()
    adc = PQ.pq_adc_topk(df, queries, books, k=5).collect()
    assert sorted(map(tuple, full), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, adc), key=lambda t: (t[0], t[3])
    )


def test_ivf_pq_planted_recall(spark):
    """Probing a strict subset of lists must still land every neighbor
    in the query's own prototype cluster on well-separated data."""
    df = _planted_df(spark)
    books = PQ.train_pq_codebooks(df, m=M, k_codes=K, dim=DIM, iterations=2)
    queries = df.filter(F.col("vec_id") < 8)
    got = PQ.ivf_pq_topk(df, queries, books, k=5, n_lists=8, n_probe=3).collect()
    proto_of = {r.vec_id: r.proto for r in df.select("vec_id", "proto").collect()}
    assert len(got) == 8 * 5
    for r in got:
        assert proto_of[r.neighbor_id] == proto_of[r.query_id], r
