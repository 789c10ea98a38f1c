"""Chunking parity: the pure-expression chunker (the production path,
catalog entry docs_chunk_fixed) vs a Python UDTF twin.

The UDTF exists as API-surface coverage (SURVEY §2.11: UDF/UDAF/UDTF)
and as the escape hatch for chunkers expressions can't express
(sentence-boundary, tokenizer-aligned); for fixed windows the
expression form wins — it pipelines with the scan — and this test
pins both to identical output.
"""

from __future__ import annotations

import math

from pyspark.sql.functions import col, udtf

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG


@udtf(returnType="chunk_idx int, chunk_len int")
class _ChunkText:
    def eval(self, text: str):
        size, stride = 512, 448
        t = text or ""
        n = max(math.ceil((len(t) - size) / stride), 0) + 1
        for i in range(n):
            yield i, len(t[i * stride : i * stride + size])


def test_udtf_matches_expression_chunker(spark, sf_dir):
    expr_rows = {
        (r.doc_id, r.chunk_idx, r.chunk_len)
        for r in CATALOG["docs_chunk_fixed"].spark_fn(spark, sf_dir).collect()
    }
    spark.udtf.register("chunk_text", _ChunkText)
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs_chunk")
    udtf_rows = {
        (r.doc_id, r.chunk_idx, r.chunk_len)
        for r in spark.sql(
            "SELECT doc_id, c.chunk_idx, c.chunk_len "
            "FROM __docs_chunk, LATERAL chunk_text(text) c"
        ).collect()
    }
    assert udtf_rows == expr_rows
    assert len(expr_rows) > 0


def test_chunker_covers_every_character(spark, sf_dir):
    """Window arithmetic safety: chunks tile each doc — first chunk
    starts at 0, consecutive chunks overlap by 64 chars, and the last
    chunk reaches the end of the text."""
    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 512), (3, "z" * 513), (4, "w" * 2000), (5, "")],
        "doc_id long, text string",
    )
    # the catalog fn reads from sf_dir; replicate its expression here
    import pyspark.sql.functions as F

    n_chunks = (
        F.greatest(F.ceil((F.length("text") - F.lit(512)) / F.lit(448.0)), F.lit(0))
        + 1
    )
    out = (
        df.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.length(F.expr("substring(text, chunk_idx * 448 + 1, 512)")).alias(
                "chunk_len"
            ),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_len))
    lengths = {1: 100, 2: 512, 3: 513, 4: 2000, 5: 0}
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        n = lengths[doc_id]
        # chunk i covers [i*448, i*448 + len_i); the union must be [0, n)
        assert chunks[0][0] == 0
        end = 0
        for idx, clen in chunks:
            start = idx * 448
            assert start <= end  # no gap
            end = max(end, start + clen)
        assert end == n
