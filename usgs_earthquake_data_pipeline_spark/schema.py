"""Canonical schemas.

The reference declares the 32-column earthquake-events schema three
times as identical Polars dtype dicts (reference
usgs-earthquake-data-ingest.py:40-73, usgs-earthquake-data-ingest-dynamic.py:44-77,
usgs-earthquake-data-ingestion-prod.py:51-84). This module is the single
canonical declaration, as a Spark ``StructType``, plus the GeoJSON
FeatureCollection schema that the parse operator (P1) uses with
``from_json`` so flattening happens JVM-side instead of row-by-row in
Python.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- the bronze/raw events table (SURVEY.md §1.1) -----------------------

USGS_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("magnitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
        T.StructField("depth", T.DoubleType(), True),
        T.StructField("eventtime", T.TimestampType(), False),
        T.StructField("updated", T.TimestampType(), True),
        T.StructField("place", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("felt", T.IntegerType(), True),
        T.StructField("cdi", T.DoubleType(), True),
        T.StructField("mmi", T.DoubleType(), True),
        T.StructField("alert", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("tsunami", T.IntegerType(), True),
        T.StructField("significance", T.IntegerType(), True),
        T.StructField("network", T.StringType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("ids", T.StringType(), True),
        T.StructField("sources", T.StringType(), True),
        T.StructField("types", T.StringType(), True),
        T.StructField("nst", T.IntegerType(), True),
        T.StructField("dmin", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("gap", T.DoubleType(), True),
        T.StructField("magnitude_type", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        # full GeoJSON geometry re-serialized as a JSON string, exactly as
        # the reference stores it (usgs-earthquake-data-ingest.py:164-166)
        T.StructField("geometry", T.StringType(), False),
    ]
)

EVENT_COLUMNS = [f.name for f in USGS_EVENTS_SCHEMA.fields]

# --- the raw USGS FDSN GeoJSON document (parse input, operator P1) ------

# feature.properties.* — all nullable; missing keys become NULL natively
# under from_json (operator P7, usgs-earthquake-data-ingest.py:130-163).
GEOJSON_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("mag", T.DoubleType(), True),
        T.StructField("place", T.StringType(), True),
        T.StructField("time", T.LongType(), True),  # epoch millis
        T.StructField("updated", T.LongType(), True),  # epoch millis
        T.StructField("url", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("felt", T.IntegerType(), True),
        T.StructField("cdi", T.DoubleType(), True),
        T.StructField("mmi", T.DoubleType(), True),
        T.StructField("alert", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("tsunami", T.IntegerType(), True),
        T.StructField("sig", T.IntegerType(), True),
        T.StructField("net", T.StringType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("ids", T.StringType(), True),
        T.StructField("sources", T.StringType(), True),
        T.StructField("types", T.StringType(), True),
        T.StructField("nst", T.IntegerType(), True),
        T.StructField("dmin", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("gap", T.DoubleType(), True),
        T.StructField("magType", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
    ]
)

GEOJSON_GEOMETRY_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        # [lon, lat, depth?] — depth optional (2-element coords allowed)
        T.StructField("coordinates", T.ArrayType(T.DoubleType()), True),
    ]
)

GEOJSON_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("properties", GEOJSON_PROPERTIES_SCHEMA, True),
        T.StructField("geometry", GEOJSON_GEOMETRY_SCHEMA, True),
    ]
)

GEOJSON_FEATURE_COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("generated", T.LongType(), True),
                    T.StructField("count", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField("features", T.ArrayType(GEOJSON_FEATURE_SCHEMA), True),
    ]
)

# --- silver fact tables (SURVEY.md §1.1) --------------------------------

FACT_TSUNAMI_YEARLY_SCHEMA = T.StructType(
    [
        T.StructField("year", T.IntegerType(), True),
        T.StructField("tsunami_yearly_count", T.LongType(), False),
    ]
)

FACT_TSUNAMI_MONTHLY_SCHEMA = T.StructType(
    [
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("tsunami_monthly_count", T.LongType(), False),
    ]
)
