"""Similarity search over an embedding column (``array<float>``).

Two tiers:

- ``brute_force_topk``: exact cosine top-k. The query side is
  driver-collected (small by definition, the same bound as a
  broadcast); the corpus is scanned once by an Arrow-batched
  ``mapInPandas`` that scores whole batches with numpy matmuls and
  emits only per-batch top-k candidates, so the single shuffle
  carries ~|queries|·k·n_batches rows. This is the correctness
  baseline and the right plan for "few queries × huge corpus":
  cost is one vectorized corpus scan.
- ``lsh_topk``: approximate top-k via random-hyperplane (signed
  projection) buckets. Corpus and queries hash to ``n_planes``-bit
  signatures; candidates are corpus rows sharing a bucket with the
  query under multi-probe (flip each single bit); exact cosine ranks
  the candidates. At 100 TB the bucket join replaces the full scan
  with a hash-partitioned equi-join on the signature — the scale
  path. Hyperplanes are generated from a deterministic counter hash
  (no RNG state, reproducible across runs/executors).

Embedding-cosine near-dup (the fifth dedup modality) is
``embedding_near_dup_pairs`` — same bucketing, symmetric self-join.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _widen
from ..materialize import materialize_lazy


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two vectors (arrays cast to double)."""
    ad, bd = _as_double(a), _as_double(b)
    denom = l2_norm(ad) * l2_norm(bd)
    return F.when(denom > 0, dot(ad, bd) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    The query side is driver-collected and closed over (queries are
    small by contract — same bound as a broadcast); the corpus is
    scanned ONCE by an Arrow-batched ``mapInPandas`` that scores each
    batch against all queries with one numpy matmul and keeps only the
    per-batch top-k per query. The final exchange therefore carries
    ~|queries| × k × n_batches candidate rows — not |queries| × |corpus|
    scored pairs (the round-2 review's shuffle-trim) — and a window
    ranks the candidates exactly (the global top-k is always a subset
    of the per-batch top-k union, ties broken by neighbor_id asc at
    both levels).
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    q_norm = np.linalg.norm(q_mat, axis=1)

    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, score double"

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # deterministic tie-break: pre-sort by neighbor id, then
            # stable argsort by -score keeps id order within ties
            pdf = pdf.sort_values(id_col, kind="mergesort")
            ids = pdf[id_col].to_numpy()
            c_mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            c_norm = np.linalg.norm(c_mat, axis=1)
            denom = c_norm[:, None] * q_norm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(denom > 0, (c_mat @ q_mat.T) / denom, 0.0)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = scores[:, j]
                mask = np.ones(len(ids), dtype=bool)
                if not include_self:
                    mask &= ids != qid
                idx = np.flatnonzero(mask)
                top = idx[np.argsort(-col[idx], kind="mergesort")[:k]]
                out_q.extend([qid] * len(top))
                out_n.extend(ids[top].tolist())
                out_s.extend(col[top].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    cand = _widen(corpus.select(id_col, vec_col)).mapInPandas(
        score_batches, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "usgs-lsh") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from a counter
    hash (Box-Muller over md5-derived uniforms). No RNG state — the
    same planes materialize on every run and executor."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        vec: list[float] = []
        j = 0
        while len(vec) < dim:
            h = hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()
            u1 = (int.from_bytes(h[:8], "big") + 1) / (2**64 + 2)
            u2 = (int.from_bytes(h[8:], "big") + 1) / (2**64 + 2)
            r = math.sqrt(-2 * math.log(u1))
            vec.append(r * math.cos(2 * math.pi * u2))
            if len(vec) < dim:
                vec.append(r * math.sin(2 * math.pi * u2))
            j += 1
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        planes.append([x / norm for x in vec])
    return planes


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-projection signature: bit p = (vec · plane_p) >= 0."""
    vd = _as_double(vec)
    bits = [
        F.when(
            dot(vd, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(1 << i))
    return sig


def _probe_signatures(sig: Column, n_planes: int) -> Column:
    """Multi-probe set: the signature plus every single-bit flip."""
    return F.array(
        sig, *[sig.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    include_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH bucketing with
    single-bit multi-probe. Returns (query_id, neighbor_id, score,
    rank) — same schema as brute force, possibly missing true
    neighbors that hash far away (the recall/cost dial is
    ``n_planes``)."""
    planes = _hyperplanes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("c_norm", l2_norm(F.col("c_vec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
        F.explode(
            _probe_signatures(signature_col(F.col(vec_col), planes), n_planes)
        ).alias("bucket"),
    ).withColumn("q_norm", l2_norm(F.col("q_vec")))
    pairs = c.join(F.broadcast(q), "bucket")
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    denom = F.col("q_norm") * F.col("c_norm")
    scored = pairs.dropDuplicates(["query_id", "neighbor_id"]).select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("q_vec"), F.col("c_vec")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def default_ivf_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
) -> DataFrame:
    """The deterministic default coarse quantizer: the first
    ``n_lists`` corpus vectors by id as ``(list_id, centroid)`` rows —
    no RNG, no iterative training (``clustering.kmeans_lloyd`` output
    plugs into the same seam for trained lists)."""
    w_c = Window.orderBy(F.asc(id_col))
    return (
        corpus.orderBy(F.asc(id_col))
        .limit(n_lists)
        .select(
            F.row_number().over(w_c).alias("list_id"),
            _as_double(F.col(vec_col)).alias("centroid"),
        )
    )


def _centroid_array(centroid_src: DataFrame):
    """Collapse the centroid rows to a ONE-ROW array a broadcast
    nested-loop join attaches to every input row — list assignment
    then stays a pure per-row expression (no explode/window/shuffle
    of the corpus on its own id)."""
    return F.broadcast(
        centroid_src.agg(
            F.collect_list(F.struct("list_id", "centroid")).alias("__cents")
        )
    )


def _ranked_lists(vec: str) -> Column:
    # array<struct<sim,list_id>> sorted desc by sim, asc by list_id
    return F.array_sort(
        F.transform(
            "__cents",
            lambda c: F.struct(
                cosine(F.col(vec), c["centroid"]).alias("sim"),
                c["list_id"].alias("list_id"),
            ),
        ),
        lambda l, r: F.when(l["sim"] > r["sim"], F.lit(-1))
        .when(l["sim"] < r["sim"], F.lit(1))
        .otherwise(l["list_id"] - r["list_id"]),
    )


def _nearest_lists(df: DataFrame, vec: str, n: int, centroid_array) -> DataFrame:
    scored = df.crossJoin(centroid_array)
    if n == 1:
        # scalar argmax — a straight projection, no row multiplication
        out = scored.withColumn(
            "list_id", F.element_at(_ranked_lists(vec), 1)["list_id"]
        )
    else:
        out = scored.withColumn(
            "list_id",
            F.explode(
                F.transform(
                    F.slice(_ranked_lists(vec), 1, n),
                    lambda s: s["list_id"],
                )
            ),
        )
    return out.drop("__cents")


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each corpus row to its nearest inverted list:
    ``(id_col, vec, list_id)`` rows — THE persistable index. This is
    the append seam an IVF deployment maintains: assignment is a pure
    per-row function of (row, centroid set), so a new batch is indexed
    by running ``ivf_assign`` on the batch alone and appending the
    rows, never touching (or recomputing) the already-indexed corpus.
    ``ivf_search_assigned`` consumes the table; ``ivf_topk`` is the
    one-shot assign+search composition."""
    c = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    )
    return _nearest_lists(c, "vec", 1, _centroid_array(centroids)).select(
        F.col(id_col), "vec", "list_id"
    )


def ivf_search_assigned(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    include_self: bool = False,
) -> DataFrame:
    """Search a PRE-ASSIGNED inverted-list table (``ivf_assign``
    output — possibly read back from storage, possibly the union of
    an old index and freshly-assigned appends): each query probes its
    ``n_probe`` nearest lists and exact-ranks only those candidates.
    The corpus side's only wide exchange is the candidate equi-join
    on ``list_id``."""
    c_assigned = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("c_vec"),
        "list_id",
    ).withColumn("c_norm", l2_norm(F.col("c_vec")))

    q = queries.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("q_vec")
    )
    q_probes = _nearest_lists(
        q, "q_vec", n_probe, _centroid_array(centroids)
    ).select(
        F.col(id_col).alias("query_id"), "q_vec", "list_id"
    ).withColumn("q_norm", l2_norm(F.col("q_vec")))

    pairs = c_assigned.join(F.broadcast(q_probes), "list_id")
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    denom = F.col("q_norm") * F.col("c_norm")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("q_vec"), F.col("c_vec")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    include_self: bool = False,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer partitions the
    corpus into ``n_lists`` inverted lists; each query probes its
    ``n_probe`` nearest lists and exact-ranks only those candidates.

    Default centroids are the first ``n_lists`` corpus vectors by id —
    deterministic, no RNG, no iterative training. Pass ``centroids``
    (``(list_id, centroid)`` rows, e.g. ``clustering.kmeans_lloyd``
    output) to use trained lists instead — the production pairing; the
    plan shape — broadcast centroids, one assignment pass, equi-join
    on list id — is identical either way, and that shape is the point:
    the full scan becomes a join that touches ~n_probe/n_lists of the
    corpus per query.

    List assignment is a *pure per-row expression*: the centroid set
    collapses to a one-row array that a broadcast nested-loop join
    attaches to every row, and the nearest list(s) come from an
    ``array_sort`` over the per-centroid similarities. The corpus is
    never exploded, windowed, or shuffled on its own id — its only
    wide exchange is the final candidate equi-join on ``list_id``.
    (Round-2 review: the previous crossJoin+row_number assignment
    shuffled n_lists× the corpus.)

    Round 12 split this into the ``ivf_assign`` / ``ivf_search_assigned``
    seam (index maintenance needs the assigned table as a first-class
    object); this composition is plan-identical to the old monolith.
    """
    if centroids is None:
        centroid_src = default_ivf_centroids(
            corpus, id_col=id_col, vec_col=vec_col, n_lists=n_lists
        )
    else:
        centroid_src = centroids.select(
            "list_id", _as_double(F.col("centroid")).alias("centroid")
        )
    # the centroid table is consumed twice (corpus assignment + query
    # probing) and the default derivation is a full-corpus TakeOrdered
    # — un-materialized, each consumer re-ran it (r13 optimization
    # round, guide §2.4; n_lists rows, trivial to hold)
    centroid_src = centroid_src.transform(materialize_lazy)
    assigned = ivf_assign(
        corpus, centroid_src, id_col=id_col, vec_col=vec_col
    )
    return ivf_search_assigned(
        assigned,
        queries,
        centroid_src,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        n_probe=n_probe,
        include_self=include_self,
    )


def embedding_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """The (id, vec, nrm, bucket) hyperplane-signature frame
    ``embedding_near_dup_pairs`` buckets on, materialized via the
    session policy. Exposed (r14) so a caller that derives a second
    corpus from the same vectors — e.g. the planted-duplicate
    augmentation in ``dedup_embedding_cosine``, where every planted
    copy has the SAME embedding and therefore the SAME signature —
    can reuse one signature fold instead of re-running it over the
    derived corpus (guide §2.4). The signature is a pure per-row
    function of the vector (fixed seeded hyperplanes), so a reused
    frame is exactly what a fresh fold would compute.

    ``nrm`` is the per-vector L2 norm, precomputed here so each
    candidate pair costs ONE dot fold instead of three (dot + both
    norms) — bit-identical to evaluating ``cosine()`` per pair, since
    the denominator multiplies the same doubles either way (the
    ``semantic_dedup`` expr-comparator convention; at n_planes=0 the
    single bucket makes this the O(n²) exact tier, where the 3x fold
    cut is the dominant cost — r14)."""
    planes = _hyperplanes(dim, n_planes)
    vd = _as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("id"),
        vd.alias("vec"),
        l2_norm(vd).alias("nrm"),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    ).transform(materialize_lazy)


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, score >=
    threshold) via the same hyperplane buckets — near-identical
    vectors land in the same bucket with overwhelming probability at
    high thresholds.

    ``sigs``: optional precomputed ``embedding_signatures`` frame for
    ``df`` (same id/vec/plane config). The bucket join and verify are
    identical either way; passing it lets several consumers share ONE
    signature fold."""
    # the signature fold (n_planes × dim per row) feeds BOTH sides of
    # the bucket self-join; un-materialized it would evaluate twice
    # per call (r13 optimization round, guide §2.4). Narrow frame:
    # (id, vec, bucket) — corpus-sized but no wider than the input.
    if sigs is None:
        sigs = embedding_signatures(
            df, id_col=id_col, vec_col=vec_col, n_planes=n_planes, dim=dim
        )
    left = sigs.select(
        "bucket",
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
    )
    right = sigs.select(
        "bucket",
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
    )
    # one dot fold per candidate pair; the norms ride the signature
    # frame (see embedding_signatures — bit-identical to cosine())
    denom = F.col("nrm_a") * F.col("nrm_b")
    score = F.when(
        denom > 0, dot(F.col("vec_a"), F.col("vec_b")) / denom
    ).otherwise(F.lit(0.0))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    dim: int = 64,
    iterations: int = 2,
    threshold: float = 0.9,
    exact: bool = True,
    comparator: str = "arrow",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal
    by clustering embeddings first and comparing pairs ONLY within a
    cluster — the k-means partition caps the pair space at
    Σ|cluster|², the whole point at web scale where all-pairs cosine
    is impossible and hashing misses paraphrases.

    Keep rule: a vector is dropped iff some LOWER-id vector in its
    cluster has cosine ≥ threshold (keep-min — deterministic, order-
    free; transitive chains over-drop slightly, the conservative
    direction for training-data dedup). Returns surviving
    (id, list_id) rows.

    Scale: centroids come from the Lloyd operator and broadcast;
    assignment is the same no-shuffle argmin expression k-means
    itself uses (linear in corpus; ``exact=False`` switches both
    from the oracle-stable interpreted decimal arithmetic to the
    float64 codegen fast path — identical assignments on the bench
    tables, tests/test_maintenance.py); the within-cluster
    comparison shuffles once on list_id. Grow k with the corpus to
    hold cluster sizes — and each Arrow group's |cluster|²
    similarity matrix — bounded.

    ``comparator`` picks the within-cluster cosine engine: ``"arrow"``
    (default, the production fast path — one numpy matmul per
    cluster) or ``"expr"`` — the JVM sequential-fold pair join, whose
    doubles are bit-identical to DuckDB's ``list_cosine_similarity``
    (numpy's pairwise/SIMD summation is not, so a pair within ~1 ulp
    of the threshold could flip between engines). The hash-gated
    exactness entry uses ``"expr"``; ``tests`` assert arrow == expr
    on the bench corpus, so a boundary pair would surface as a test
    failure, never as a nondeterministic driver-hash break.
    """
    from .clustering import _nearest_list_id, kmeans_lloyd

    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if k == 1:
        # single cluster: Lloyd refinement cannot change a k=1
        # assignment, so skip the iterative job entirely (the exact-
        # rule configuration the hash-gated entries run — ~2-3 s off
        # every dedup_semdedup_exact / dedup_semantic_semdedup pass).
        # Constant 1 matches kmeans_lloyd's 1-based row_number ids.
        assigned = vecs.withColumn("list_id", F.lit(1).cast("int"))
    else:
        cents = kmeans_lloyd(
            df,
            id_col=id_col,
            vec_col=vec_col,
            k=k,
            iterations=iterations,
            dim=dim,
            exact=exact,
        ).select("list_id", F.col("centroid").alias("c"))
        cent_arr = F.broadcast(
            cents.agg(
                F.collect_list(F.struct("list_id", "c")).alias("__cents")
            )
        )
        assigned = vecs.crossJoin(cent_arr).select(
            "id",
            "v",
            _nearest_list_id(F.col("v"), exact=exact).alias("list_id"),
        )
    if comparator == "expr":
        # expression-form keep-min: a vector drops iff some LOWER-id
        # same-cluster vector has fold-cosine >= threshold — the
        # DuckDB-bit-compatible comparator (see docstring). Norms are
        # precomputed per VECTOR (sqrt of the same self-dot fold), so
        # each pair costs one dot fold, not three — bit-identical to
        # evaluating cosine() per pair, since the denominator factors
        # are the same doubles either way (caught as a 2.2x profile
        # regression when every pair re-folded both norms).
        with_norm = assigned.select(
            "id", "v", "list_id", l2_norm(F.col("v")).alias("nrm")
        )
        lo = with_norm.select(
            F.col("list_id").alias("list_id"),
            F.col("id").alias("id_lo"),
            F.col("v").alias("v_lo"),
            F.col("nrm").alias("nrm_lo"),
        )
        denom = F.col("nrm_lo") * F.col("nrm")
        cos = F.when(
            denom > 0, dot(F.col("v_lo"), F.col("v")) / denom
        ).otherwise(F.lit(0.0))
        dropped = (
            with_norm.join(lo, "list_id")
            .filter(F.col("id_lo") < F.col("id"))
            .filter(cos >= threshold)
            .select("id")
            .distinct()
        )
        return (
            assigned.join(dropped, "id", "left_anti")
            .select(F.col("id").alias(id_col), "list_id")
        )
    if comparator != "arrow":
        raise ValueError(f"unknown comparator: {comparator!r}")
    # within-cluster near-dup detection: one Arrow batch per cluster,
    # cosine matrix via numpy matmul. The expression-form twin
    # (self-join + the `cosine` fold) is interpreted per element and
    # measured 8x slower at 5k vectors; the grouped-pandas kernel is
    # the same sanctioned fast path brute_force_topk uses. Memory per
    # group is |cluster|^2 floats — exactly the quantity k is chosen
    # to bound (SemDeDup's premise).
    import numpy as np
    import pandas as pd

    def drop_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        mat = np.vstack(pdf["v"].to_numpy())
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        vn = mat / norms[:, None]
        sim = vn @ vn.T
        # strictly-lower-id neighbor above threshold => drop
        mask = np.triu(sim >= threshold, k=1).any(axis=0)
        out = pdf.loc[~mask, ["id", "list_id"]]
        return out

    survivors = assigned.groupBy("list_id").applyInPandas(
        drop_in_cluster, "id long, list_id int"
    )
    return survivors.select(F.col("id").alias(id_col), "list_id")


def mutual_knn_edges(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Mutual k-NN graph over an embedding set: directed cosine top-k
    per node, kept only where BOTH endpoints rank each other — the
    symmetric neighborhood graph that seeds NN-descent, agglomerative
    near-dup clustering, and manifold methods (UMAP's first stage).
    Mutuality is the standard cheap filter against hub nodes: a hub
    that everyone ranks (but that ranks almost nobody back) loses its
    spurious edges without any degree heuristic.

    Determinism: ranking is by cosine ROUNDED to 6 dp with the
    neighbor id as tiebreak (the ANN-family convention), so the top-k
    set — and therefore the mutual edge set — is reproducible across
    engines.  Returns canonical (src < dst) edges with the rank each
    endpoint gave the other.

    Scale shape: the quadratic candidate step here is an explicit
    broadcast nested-loop — correct ONLY because callers pass a
    bounded node set (a cluster, a bucket, a sampled probe set; the
    catalog entry filters to a hash subset).  At corpus scale the
    candidate generator swaps for the LSH bucket join (``lsh_topk``)
    or IVF lists — the window rank, mutual self-join, and
    canonicalization below are unchanged, which is exactly why they
    live behind this one function.
    """
    a = vectors.select(
        F.col(id_col).alias("src"), _as_double(F.col(vec_col)).alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("dst"), _as_double(F.col(vec_col)).alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("src") != F.col("dst"))
    sims = pairs.select(
        "src",
        "dst",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
    )
    w = Window.partitionBy("src").orderBy(
        F.col("sim").desc(), F.col("dst")
    )
    topk = (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("src", "dst", "sim", "rnk")
    )
    rev = topk.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("rnk").alias("rnk_back"),
    )
    return (
        topk.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            "sim",
            F.col("rnk").cast("long").alias("rank_fwd"),
            F.col("rnk_back").cast("long").alias("rank_back"),
        )
        .orderBy("src", "dst")
    )


def l2_normalize_arrow(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize an embedding column via ``mapInArrow`` — the
    Arrow-NATIVE batch path (SPARK-43964 family): record batches cross
    to Python with zero pandas materialization, the kernel is
    vectorized numpy over the flat value buffer, and one RecordBatch
    goes back. This is the lowest-overhead Python crossing Spark
    offers, the right tool when the kernel is pure array math over a
    list column (the pandas_udf/mapInPandas twins pay a
    pandas-conversion tax per batch for no benefit here).

    Passthrough columns survive untouched (the caller can precompute
    JVM-side audit columns and route them through). Zero-norm vectors
    pass through unscaled (divide-by-1) rather than NaN-ing. Narrow
    map: partitioning is preserved, nothing shuffles."""
    import numpy as np
    import pyarrow as pa

    in_fields = df.schema.fieldNames()
    vec_idx = in_fields.index(vec_col)
    out_schema = ", ".join(
        f"{f.name} {'array<double>' if f.name == vec_col else f.dataType.simpleString()}"
        for f in df.schema.fields
    )

    def normalize(batches):
        for batch in batches:
            lst = batch.column(vec_idx)
            if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
                lst = lst.combine_chunks()
            offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            # slice-safe: offsets are PHYSICAL indices into the
            # unsliced child buffer; rebase to the window they span
            base, stop = offsets[0], offsets[-1]
            values = lst.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )[base:stop]
            starts = offsets[:-1] - base
            ends = offsets[1:] - base
            norms = np.ones(len(starts))
            # reduceat only over NON-EMPTY rows: an empty/null row's
            # start can equal len(values) (trailing empties blew the
            # old unconditional reduceat out of bounds — round-10
            # advice), and zero-width rows need no norm anyway. With
            # empty rows excluded, consecutive selected starts are
            # exactly each non-empty row's [start, end) — empty rows
            # in between contribute zero width.
            nz = ends > starts
            if nz.any():
                sq = values * values
                norms[nz] = np.sqrt(np.add.reduceat(sq, starts[nz]))
            norms = np.where(norms == 0.0, 1.0, norms)
            normalized = (
                values / np.repeat(norms, ends - starts)
                if len(values)
                else values
            )
            # re-attach the validity bitmap: from_arrays without a mask
            # re-emits null rows as empty lists (round-10 advice)
            mask = lst.is_null() if lst.null_count else None
            out_vec = pa.ListArray.from_arrays(
                pa.array(starts.tolist() + [int(stop - base)],
                         type=pa.int32()),
                pa.array(normalized, type=pa.float64()),
                mask=mask,
            )
            arrays = [
                out_vec if i == vec_idx else batch.column(i)
                for i in range(batch.num_columns)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=in_fields)

    return df.withColumn(vec_col, _as_double(F.col(vec_col))).mapInArrow(
        normalize, out_schema
    )
