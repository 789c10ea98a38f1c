"""Scalar Arrow pandas_udf parity — completes the UDF-surface matrix
(scalar pandas UDF here; grouped-map = pandas_grouped_mad entry;
UDTF = tests/test_chunking.py; mapInPandas = multimodal/ANN;
applyInPandasWithState = sessionize).

The engine's rule is built-ins first: the expression form of
token_count is the production path (whole-stage codegen, pipelines
with the scan). The scalar pandas_udf twin exists as the documented
escape hatch for vectorizable logic expressions can't reach, and this
test pins it to identical output so the hatch is known-correct."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from usgs_earthquake_data_pipeline_spark.functions import text as T
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table


def test_scalar_pandas_udf_matches_expression(spark, sf_dir):
    # decorated inside the test: pandas_udf resolves its return type
    # against the active session, which doesn't exist at import time
    @pandas_udf("int")
    def _token_count_vec(texts: pd.Series) -> pd.Series:
        return (
            texts.fillna("")
            .str.strip()
            .map(lambda t: len(t.split()) if t else 0)
        )

    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        "doc_id",
        T.token_count("text").alias("expr_n"),
        _token_count_vec(F.col("text")).alias("udf_n"),
    )
    diff = both.filter(F.col("expr_n") != F.col("udf_n")).count()
    assert diff == 0
    assert both.count() > 0
