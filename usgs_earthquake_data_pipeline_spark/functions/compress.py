"""Compression-ratio quality signal.

deflate(text)/len(text) is the classic cheap "how repetitive is this
document really" signal (used alongside the Gopher repetition rules in
web-corpus pipelines): boilerplate and template spam compress far
below natural text, random noise compresses above it.

There is deliberately a Python kernel here: DEFLATE is not
expressible as Column algebra, and this module is the repo's worked
example of the CORRECT escape hatch — an Arrow-batched pandas UDF
(one Python hop per ~10k-row batch, zlib's C loop doing the work),
never a row-at-a-time Python UDF. zlib output is fully deterministic
for a fixed (input, level), so the signal is reproducible and
testable to exact equality (tests/test_compression.py pins it to a
driver-side reference byte for byte).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: fixed compression level — part of the signal's identity; changing
#: it changes every stored score, so treat like a schema version.
DEFLATE_LEVEL = 6


def _make_deflate_ratio():
    # built lazily: pandas_udf resolves its return type against the
    # ACTIVE session, so decorating at import time fails (and would
    # pin the UDF to whichever session imported the module first)
    @pandas_udf("double")
    def deflate_ratio(texts: pd.Series) -> pd.Series:
        def ratio(t: str | None) -> float | None:
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, DEFLATE_LEVEL)) / len(raw)

        return texts.map(ratio)

    return deflate_ratio


def compression_ratio(col: Column | str, decimals: int = 6) -> Column:
    """deflate-compressed size over raw utf-8 size, rounded; NULL for
    empty/NULL text. Arrow-batched — the only Python crossing is one
    Series per batch."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(_make_deflate_ratio()(c), decimals)


def _make_deflate_size():
    # lazy for the same session-binding reason as _make_deflate_ratio
    @pandas_udf("long")
    def deflate_size(texts: pd.Series) -> pd.Series:
        def size(t: str | None) -> int | None:
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, DEFLATE_LEVEL))

        return texts.map(size)

    return deflate_size


def deflate_size(col: Column | str) -> Column:
    """deflate-compressed byte size of the utf-8 text; NULL for
    empty/NULL. The building block of normalized compression distance
    (NCD) — same Arrow-batched discipline as ``compression_ratio``."""
    c = F.col(col) if isinstance(col, str) else col
    return _make_deflate_size()(c)
