"""Product quantization (PQ) for embedding compression + ADC search
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

The vector space is split into ``m`` orthogonal subspaces; each
subspace gets its own tiny codebook (``k_codes`` centroids of
``dim/m`` floats); a vector is stored as ``m`` small codes. At 100 TB
this is the difference between shipping/holding 256 bytes per vector
and 8: the corpus-side state of a search shrinks ~32x, and distance
estimation against a query needs only ``m`` table lookups per vector
(asymmetric distance computation, ADC) instead of a ``dim``-wide dot
product.

Spark mapping:

- **training** (:func:`train_pq_codebooks`) is Lloyd's algorithm run
  on all m subspaces AT ONCE: one explode to (id, sub_idx, subvector)
  rows, per-round one broadcast of the m*k codebook and one
  (sub_idx, code)-keyed shuffle bounded by m*k*d_sub — corpus size
  never crosses the wire. The trained codebook (m*k*d_sub doubles,
  a few KB) is collected to the driver: the same bounded-by-contract
  collect as a broadcast dim table.
- **encoding** (:func:`pq_encode`) is a pure Column expression — the
  codebook is inlined as ONE flat array<double> literal (a single
  Literal node: the r8 per-centroid struct-literal encoding spent
  ~85% of the entries' cold cost in codegen compilation), the
  per-subspace argmin is ``array_position(d, array_min(d)) - 1``,
  ties to the lower code id. Zero shuffles, zero Python rows.
- **search** (:func:`pq_adc_topk`) builds each query's m*k lookup
  table once (again pure expressions over the literal codebook),
  broadcasts the queries, and scores code rows with m array lookups
  per (vector, query) — then a per-query top-k window. The shuffle
  carries candidate rows only.

Rows-only catalog entry: PQ distances are approximations with no SQL
twin; recall against ``brute_force_topk`` and reconstruction-error
bounds are asserted in tests (the exact-math baseline itself is
oracle-checked).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential double fold (row-local, exact
    enough for argmin/ranking; PQ is an approximation regardless)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@lru_cache(maxsize=64)
def _flat_lit_cached(vals: tuple[float, ...]) -> Column:
    # lit(ndarray) converts through one Arrow-ish buffer (~4x faster
    # than lit(list)'s per-element py4j walk), and the lru_cache makes
    # the 2nd..nth use of the same codebook free — one entry builds
    # the same flat literal 3-4 times (encode, LUT, reconstruct).
    import numpy as np

    return F.lit(np.asarray(vals, dtype=np.float64))


def _flat_lit(books: list[list[list[float]]]) -> Column:
    """The whole [m][k][d_sub] codebook as ONE flat array<double>
    literal. A single ArrayType Literal compiles to one constant
    reference; the per-centroid ``F.array(F.lit, ...)``/struct-literal
    encoding this replaces made the PQ plans ~85% codegen-compile time
    (PROFILE.md r8: 20.4s/13.9s cold at sf0.01)."""
    return _flat_lit_cached(
        tuple(float(v) for book in books for cent in book for v in cent)
    )


def _sub_dists(sv: Column, flat: Column, base, k: int, d_sub: int) -> Column:
    """array<double> of squared L2 distances from subvector ``sv`` to
    the ``k`` centroids stored at ``flat[base : base + k*d_sub]``.
    ``base`` may be an int or a Column (runtime subspace index)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda c: _sq_dist(sv, F.slice(flat, base + c * d_sub + 1, d_sub)),
    )


def _argmin_idx(dists: Column) -> Column:
    """0-based index of the minimum — first occurrence, so ties break
    to the lower code id (array_position returns the FIRST match, and
    the min is bitwise-equal to some element, so exact equality is
    safe)."""
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def train_pq_codebooks(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    iterations: int = 1,
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks; returns ``[m][k_codes][d_sub]``.

    Deterministic throughout: init = the subvectors of the first
    ``k_codes`` corpus vectors by id (the convention kmeans_lloyd and
    ivf_topk use), assignment ties to the lower code, means in plain
    double (approximation-internal — nothing downstream requires
    cross-engine bit equality). Each Lloyd round: one broadcast join
    against the current codebook + one (sub_idx, code, dim)-keyed
    aggregate whose output is m*k*d_sub rows, independent of corpus
    size.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m

    vecs = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    # (id, sub_idx, sv) — one row per subvector
    subv = vecs.select(
        "id",
        F.posexplode(
            F.array(*[F.slice("v", j * d_sub + 1, d_sub) for j in range(m)])
        ).alias("sub_idx", "sv"),
    )

    init_rows = (
        vecs.orderBy("id").limit(k_codes).select("v").collect()
    )
    if len(init_rows) < k_codes:
        raise ValueError(
            f"corpus has only {len(init_rows)} vectors but k_codes="
            f"{k_codes}; an under-filled codebook would silently skew "
            "every downstream code assignment"
        )
    books: list[list[list[float]]] = [
        [list(r[0])[j * d_sub : (j + 1) * d_sub] for r in init_rows]
        for j in range(m)
    ]

    for _ in range(iterations):
        # assign every subvector under its own subspace's codebook —
        # one expression indexed by sub_idx at runtime, not m chained
        # whens over per-centroid literals
        flat = _flat_lit(books)
        code = _argmin_idx(
            _sub_dists(
                F.col("sv"),
                flat,
                F.col("sub_idx") * (k_codes * d_sub),
                k_codes,
                d_sub,
            )
        )
        assigned = subv.withColumn("code", code)
        # per-dimension means; a code that lost all members keeps its
        # previous centroid (same disappearing-cluster semantics as
        # kmeans_lloyd, but the codebook must stay k-sized for lookup)
        means = (
            assigned.select(
                "sub_idx",
                "code",
                F.posexplode("sv").alias("dim_idx", "val"),
            )
            .groupBy("sub_idx", "code", "dim_idx")
            .agg(F.avg("val").alias("mu"))
            .collect()
        )
        for row in means:
            books[row["sub_idx"]][row["code"]][row["dim_idx"]] = row["mu"]
    return books


def _codes_col(vec: Column, books: list[list[list[float]]], d_sub: int) -> Column:
    """``array<int>`` of m PQ codes for a double-array vector."""
    m, k = len(books), len(books[0])
    flat = _flat_lit(books)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _argmin_idx(
            _sub_dists(
                F.slice(vec, j * d_sub + 1, d_sub),
                flat,
                j * (k * d_sub),
                k,
                d_sub,
            )
        ),
    )


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — the 32x-compressed corpus representation."""
    d_sub = len(books[0][0])
    return df.select(
        F.col(id_col).alias("id"),
        _codes_col(_as_double(F.col(vec_col)), books, d_sub).alias("codes"),
    )


def pq_reconstruct(codes: Column, books: list[list[list[float]]]) -> Column:
    """Decode codes back to the centroid-concatenation vector (for
    distortion measurement)."""
    m, k = len(books), len(books[0])
    d_sub = len(books[0][0])
    flat = _flat_lit(books)
    return F.flatten(
        F.zip_with(
            codes,
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, j: F.slice(
                flat, (j * k + code) * d_sub + 1, d_sub
            ),
        )
    )


def _adc_lut(qv: Column, books: list[list[list[float]]], d_sub: int) -> Column:
    """The query's m*k ADC lookup table — ``lut[j][c]`` is the exact
    squared distance from the query's j-th subvector to centroid c of
    subspace j. Pure expression over the one flat codebook literal."""
    m, k = len(books), len(books[0])
    flat = _flat_lit(books)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _sub_dists(
            F.slice(qv, j * d_sub + 1, d_sub),
            flat,
            j * (k * d_sub),
            k,
            d_sub,
        ),
    )


def pq_adc_scores(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Every (query, corpus) pair's ADC distance estimate —
    (query_id, neighbor_id, est_dist), unrounded, unranked.

    The shared scoring front end: each query precomputes its
    m*k_codes lookup table (exact squared distances from its
    subvectors to every centroid); every encoded corpus row is then
    scored with m array lookups — the PQ bargain: per-pair cost
    independent of ``dim``. Queries (with LUTs) are broadcast.
    :func:`pq_adc_topk` ranks this; the ADC-identity check consumes
    it directly (ranking all pairs just to keep them all would be a
    dead per-query sort)."""
    d_sub = len(books[0][0])
    enc = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col).select(
        F.col("id").alias("neighbor_id"), "codes"
    )
    qv = _as_double(F.col(vec_col))
    lut = _adc_lut(qv, books, d_sub)
    q = queries.select(F.col(id_col).alias("query_id"), lut.alias("lut"))
    pairs = enc.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    est = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda code, table: F.element_at(table, code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return pairs.select("query_id", "neighbor_id", est.alias("est_dist"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Approximate L2 top-k via asymmetric distance computation:
    (query_id, neighbor_id, est_dist, rank), est_dist ascending.

    :func:`pq_adc_scores` does the scoring; the only wide exchange is
    the per-query top-k window over candidate rows.
    """
    w = Window.partitionBy("query_id").orderBy(
        F.asc("est_dist"), F.asc("neighbor_id")
    )
    return (
        pq_adc_scores(
            corpus,
            queries,
            books,
            id_col=id_col,
            vec_col=vec_col,
            include_self=include_self,
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("est_dist", 6).alias("est_dist"),
            "rank",
        )
    )


def _nearest_lists(
    vec: Column, centroids: list[list[float]], n: int
) -> Column:
    """array<int> of the n nearest coarse-centroid list ids (0-based,
    L2, ties to the lower id) — pure expression over one flat centroid
    literal. Default struct array_sort orders by (d, list_id)
    lexicographically, which IS the tie-break — no comparator lambda
    to compile."""
    n_c = len(centroids)
    dim = len(centroids[0])
    flat = _flat_lit_cached(tuple(float(v) for c in centroids for v in c))
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_c - 1)),
            lambda i: F.struct(
                _sq_dist(vec, F.slice(flat, i * dim + 1, dim)).alias("d"),
                i.cast("int").alias("list_id"),
            ),
        )
    )
    return F.transform(F.slice(ranked, 1, n), lambda s: s["list_id"])


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    include_self: bool = False,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC serving shape, non-residual variant):
    a coarse quantizer buckets the corpus into inverted lists; each
    query probes its ``n_probe`` nearest lists and ADC-scores only the
    PQ codes living there.

    This composes the two scale levers: the IVF equi-join touches
    ~n_probe/n_lists of the corpus per query (instead of the ADC
    cross-join's full pass), and each touched row costs m lookups
    against 8 bytes of state (instead of a dim-wide dot product over
    256 bytes). Coarse centroids are the first ``n_lists`` corpus
    vectors by id — the same deterministic convention as
    ``similarity.ivf_topk`` (pass ``kmeans_lloyd`` output through
    ``train_pq_codebooks``-style refinement for trained lists).

    With ``n_probe == n_lists`` the candidate set is the whole corpus
    and the result equals :func:`pq_adc_topk` exactly — asserted in
    tests, so the list pruning is the ONLY approximation added on top
    of PQ itself.
    """
    d_sub = len(books[0][0])
    cent_rows = (
        corpus.select(_as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.asc(id_col))
        .limit(n_lists)
        .collect()
    )
    centroids = [list(r[0]) for r in cent_rows]

    vec = _as_double(F.col(vec_col))
    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(_nearest_lists(vec, centroids, 1), 1).alias("list_id"),
        _codes_col(vec, books, d_sub).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(_nearest_lists(vec, centroids, n_probe)).alias("list_id"),
        _adc_lut(vec, books, d_sub).alias("lut"),
    )
    pairs = enc.join(F.broadcast(q), "list_id")
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    est = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda code, table: F.element_at(table, code + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("est_dist"), F.asc("neighbor_id")
    )
    return (
        pairs.select("query_id", "neighbor_id", est.alias("est_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("est_dist", 6).alias("est_dist"),
            "rank",
        )
    )
