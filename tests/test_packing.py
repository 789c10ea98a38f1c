"""Sequence packing (operators.packing): lineage and bin invariants
on the real documents table, plus a hypothesis property run over
adversarial token-count multisets. The invariants are the operator's
contract: token conservation doc-by-doc, no document split unless it
exceeds the context length, no bin over the context length, bin
offsets that tile each bin without overlap, and deterministic output
across reruns."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions import text as T
from usgs_earthquake_data_pipeline_spark.operators.packing import (
    chunk_long_docs,
    pack_sequences,
    packing_quality,
)
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def _check_invariants(rows, tok_by_id, ctx):
    """Pure-python invariant audit of collected packed rows."""
    by_doc = defaultdict(list)
    by_bin = defaultdict(list)
    for r in rows:
        by_doc[r.id].append(r)
        by_bin[(r.grp, r.bin_id)].append(r)
    # doc-level: conservation, contiguous ctx-aligned chunking, no
    # split unless the doc exceeds ctx
    assert set(by_doc) == {i for i, n in tok_by_id.items() if n > 0}
    for doc_id, chunks in by_doc.items():
        n = tok_by_id[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert sum(c.chunk_tokens for c in chunks) == n
        if n <= ctx:
            assert len(chunks) == 1
        for c in chunks:
            assert c.doc_offset == c.chunk_idx * ctx
            assert 0 < c.chunk_tokens <= ctx
        # one deterministic group per document
        assert len({c.grp for c in chunks}) == 1
    # bin-level: fits in ctx, offsets tile without overlap
    for (_, _), members in by_bin.items():
        members.sort(key=lambda r: r.bin_offset)
        cursor = 0
        for m in members:
            assert m.bin_offset == cursor, "bin offsets must tile"
            cursor += m.chunk_tokens
        assert cursor <= ctx


def test_pack_documents_invariants_and_determinism(spark, sf_dir):
    ctx = 64  # smaller than the longest docs so splitting is exercised
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("long").alias("n_tok")
    )
    tok_by_id = {r.doc_id: r.n_tok for r in docs.collect()}
    assert max(tok_by_id.values()) > ctx, "fixture must exercise splits"
    packed = pack_sequences(docs, "doc_id", "n_tok", ctx=ctx, n_groups=4)
    rows = packed.collect()
    _check_invariants(rows, tok_by_id, ctx)
    # deterministic: a rerun yields the identical placement
    rows2 = pack_sequences(
        docs, "doc_id", "n_tok", ctx=ctx, n_groups=4
    ).collect()
    key = lambda r: (r.id, r.chunk_idx)
    assert sorted(map(tuple, rows), key=lambda t: t[:2]) == sorted(
        map(tuple, rows2), key=lambda t: t[:2]
    )
    # the quality gate passes on a genuine packing
    q = packing_quality(packed, ctx).collect()[0]
    assert q.caps_ok and q.halffull_ok and q.binbound_ok
    assert q.total_tokens == sum(tok_by_id.values())
    assert q.n_docs == len(tok_by_id)


def test_chunking_is_pure_expression_no_python(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 64), (3, 65), (4, 200), (5, 0)], "id LONG, n LONG"
    )
    out = chunk_long_docs(df, "id", "n", 64).collect()
    got = sorted((r.id, r.chunk_idx, r.doc_offset, r.chunk_tokens) for r in out)
    assert got == [
        (1, 0, 0, 10),
        (2, 0, 0, 64),
        (3, 0, 0, 64),
        (3, 1, 64, 1),
        (4, 0, 0, 64),
        (4, 1, 64, 64),
        (4, 2, 128, 64),
        (4, 3, 192, 8),
    ]
    plan = chunk_long_docs(df, "id", "n", 64)._jdf.queryExecution().toString()
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    ctx=st.integers(min_value=8, max_value=24),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_pack_property_fuzz(spark, sizes, ctx):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "id LONG, n LONG"
    )
    tok_by_id = {i: n for i, n in enumerate(sizes)}
    rows = pack_sequences(df, "id", "n", ctx=ctx, n_groups=3).collect()
    _check_invariants(rows, tok_by_id, ctx)
    # first-fit guarantee: at most one bin per group at most half full
    fills = defaultdict(int)
    for r in rows:
        fills[(r.grp, r.bin_id)] += r.chunk_tokens
    half_per_grp = defaultdict(int)
    for (g, _), fill in fills.items():
        if fill * 2 <= ctx:
            half_per_grp[g] += 1
    assert all(c <= 1 for c in half_per_grp.values())
