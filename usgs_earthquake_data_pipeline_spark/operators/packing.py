"""Sequence packing: fit variable-length tokenized documents into
fixed context-length bins for LLM training batches.

The standard training-data shape: a corpus of documents with wildly
varying token counts must be packed into ``ctx``-token sequences with
minimal padding waste, while keeping (doc, offset) lineage so labels /
attention masks can be reconstructed downstream.

This is the NO-SPLIT bin-packing variant (a document is never divided
across bins unless it alone exceeds ``ctx``) — the right choice when
examples must stay attention-contiguous. Its sibling
``plans/corpus_ops.py pack_sequences_2048`` is the GPT-style
CONCATENATED-stream variant (one global token stream chunked at exact
``ctx`` boundaries, documents split wherever the boundary falls, via
a scale-safe two-level cumsum); the two cover both packing
conventions real training pipelines use.

Scale design (100 TB): packing is inherently sequential WITHIN a bin
stream, so the parallel unit is a deterministic hash GROUP of
documents — each group packs independently with first-fit-decreasing
(FFD). Groups are the analogue of output shards: their count grows
linearly with the corpus while per-group work stays bounded, and group
assignment is a pure expression (no shuffle beyond the one groupBy).
Only the (id, n_tokens) projection crosses into Python — never text —
so the Arrow batches are a few dozen bytes per document.

Quality contract (the oracle-gateable part, sketch-``_checked`` style):
- no bin exceeds ``ctx`` (documents longer than ``ctx`` are split into
  ctx-sized chunks first; nothing else is ever split);
- token conservation: packed chunk tokens sum exactly to the input;
- first-fit guarantee: per group at most ONE bin is ≤ half full (two
  half-empty bins contradict first-fit — the later bin's items all fit
  in the earlier), hence n_bins ≤ ceil(2 · group_tokens / ctx).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACKED_SCHEMA = (
    "id long, chunk_idx int, doc_offset long, chunk_tokens long, "
    "grp int, bin_id int, bin_offset long"
)


def chunk_long_docs(
    df: DataFrame, id_col: str, tokens_col: str, ctx: int
) -> DataFrame:
    """Split documents longer than ``ctx`` tokens into ctx-sized
    chunks; shorter documents pass through as chunk 0. Pure
    expressions — ``posexplode`` over a ``sequence`` of chunk indices,
    no Python. Output: (id, chunk_idx, doc_offset, chunk_tokens).

    ``doc_offset`` is the chunk's token offset within its document —
    the lineage needed to slice the actual token stream later."""
    n = F.col(tokens_col).cast("long")
    n_chunks = F.ceil(n / F.lit(ctx)).cast("int")
    return (
        df.filter(n > 0)
        .select(
            F.col(id_col).alias("id"),
            n.alias("__n"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_idx", "__c"
            ),
        )
        .select(
            "id",
            "chunk_idx",
            (F.col("chunk_idx").cast("long") * ctx).alias("doc_offset"),
            F.least(
                F.lit(ctx).cast("long"),
                F.col("__n") - F.col("chunk_idx").cast("long") * ctx,
            ).alias("chunk_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    ctx: int = 4096,
    n_groups: int = 32,
) -> DataFrame:
    """Pack (id, token_count) rows into ``ctx``-token bins, FFD per
    deterministic hash group. Returns one row per packed chunk:
    (id, chunk_idx, doc_offset, chunk_tokens, grp, bin_id, bin_offset).

    ``n_groups`` is the parallelism knob: size it so a group's token
    mass is a few bins' worth (each group packs independently and its
    chunk list must fit one Arrow batch — at 16 bytes/chunk a
    million-chunk group is still ~16 MB, so the constraint is soft).
    Group assignment hashes the document id, so the packing is fully
    deterministic given (corpus, ctx, n_groups) — reruns and resumed
    jobs produce identical bins, which checkpointed training loaders
    rely on.

    FFD within a group: chunks sorted by (tokens desc, id, chunk_idx),
    each placed in the FIRST bin it fits, else a new bin. The loop is
    per-group Python over a plain int array — the classic case where
    imperative logic is genuinely unavoidable (bin state feeds every
    later decision) and the data crossing the boundary is tiny."""
    if ctx <= 0:
        raise ValueError("ctx must be positive")
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")
    chunks = chunk_long_docs(df, id_col, tokens_col, ctx).withColumn(
        "grp", F.pmod(F.xxhash64("id"), F.lit(n_groups)).cast("int")
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["chunk_tokens", "id", "chunk_idx"],
            ascending=[False, True, True],
        ).reset_index(drop=True)
        fills: list[int] = []  # running token count per bin
        bin_ids = []
        bin_offsets = []
        for t in pdf["chunk_tokens"]:
            t = int(t)
            for b, fill in enumerate(fills):
                if fill + t <= ctx:
                    bin_ids.append(b)
                    bin_offsets.append(fill)
                    fills[b] = fill + t
                    break
            else:
                bin_ids.append(len(fills))
                bin_offsets.append(0)
                fills.append(t)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int32")
        pdf["bin_offset"] = pd.Series(bin_offsets, dtype="int64")
        return pdf[
            [
                "id",
                "chunk_idx",
                "doc_offset",
                "chunk_tokens",
                "grp",
                "bin_id",
                "bin_offset",
            ]
        ]

    return chunks.groupBy("grp").applyInPandas(ffd, _PACKED_SCHEMA)


def packing_quality(packed: DataFrame, ctx: int) -> DataFrame:
    """One-row quality summary of a ``pack_sequences`` result — the
    oracle-gateable contract (exact totals + guarantee booleans):

    - ``total_tokens`` / ``n_chunks`` / ``n_docs``: exact, recomputed
      FROM the packed output so conservation through the pack is what
      the hash gate checks;
    - ``caps_ok``: no bin holds more than ``ctx`` tokens;
    - ``halffull_ok``: at most one bin per group ≤ ctx/2 (the
      first-fit invariant);
    - ``binbound_ok``: per group, n_bins ≤ ceil(2·tokens/ctx) (implied
      by the half-full invariant; checked independently)."""
    bins = packed.groupBy("grp", "bin_id").agg(
        F.sum("chunk_tokens").alias("bin_tokens")
    )
    groups = bins.groupBy("grp").agg(
        F.sum("bin_tokens").alias("grp_tokens"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("bin_tokens").alias("max_bin"),
        F.sum(
            F.when(F.col("bin_tokens") * 2 <= ctx, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_halffull"),
    )
    return (
        groups.agg(
            F.sum("grp_tokens").cast("long").alias("total_tokens"),
            F.max(F.col("max_bin") > ctx).alias("__cap_violated"),
            F.max(F.col("n_halffull") > 1).alias("__half_violated"),
            F.max(
                F.col("n_bins")
                > F.ceil(F.col("grp_tokens") * 2 / F.lit(ctx))
            ).alias("__bound_violated"),
        )
        .crossJoin(
            packed.agg(
                F.count(F.lit(1)).cast("long").alias("n_chunks"),
                F.countDistinct("id").cast("long").alias("n_docs"),
            )
        )
        .select(
            "total_tokens",
            "n_chunks",
            "n_docs",
            (~F.col("__cap_violated")).alias("caps_ok"),
            (~F.col("__half_violated")).alias("halffull_ok"),
            (~F.col("__bound_violated")).alias("binbound_ok"),
        )
    )
