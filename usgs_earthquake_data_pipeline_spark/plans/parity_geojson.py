"""Driver-gate entry for the GeoJSON parse path (operators P1-P7).

The driver's parquet tables carry no GeoJSON column, so P1-P8 were
previously pytest-verified only. This entry inlines a deterministic
FeatureCollection corpus (exercising nested-array indexing P2, the
conditional depth P3, epoch-ms timestamps P4, year/month derivation
P5/P6, null-defaulting access P7, and the required-column invalid-row
filter of P10) and oracles the flatten against DuckDB's typed
``json_transform`` over the *same* literals — single-sourced below so
the two sides can never drift.

Reference parity: usgs-earthquake-data-ingest.py:104-170
(``parse_geojson_to_dataframe``); the Spark implementation is
``sources/geojson.py`` (pure ``from_json``+``explode`` codegen).

The ``geometry`` JSON string itself is excluded from the compared
columns (documented re-serialization divergence — see
``geojson_docs_to_events``); its *content* is covered via
latitude/longitude/depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.geojson import events_from_geojson_strings
from .catalog import register

# One corpus, three documents: a 3-feature page (incl. a 2-element
# coordinate array and an id-less feature that must be dropped), an
# empty page (F3: zero rows, not a failure), and a 1-feature page with
# a JSON null magnitude and a missing place key (P7).
GEOJSON_DOCS: list[str] = [
    (
        '{"type":"FeatureCollection","metadata":{"count":3},"features":['
        '{"type":"Feature","id":"ev1","properties":{"mag":4.5,'
        '"place":"10km N of Town","time":1717200000000,'
        '"updated":1717203600000,"tsunami":1,"sig":312,'
        '"type":"earthquake","title":"M 4.5"},'
        '"geometry":{"type":"Point","coordinates":[10.1,20.2,5.5]}},'
        '{"type":"Feature","id":"ev2","properties":{"mag":2.0,'
        '"time":1735689600000,"tsunami":0,"sig":62,"type":"quarry blast"},'
        '"geometry":{"type":"Point","coordinates":[30.5,-15.25]}},'
        '{"type":"Feature","properties":{"mag":1.0,"time":1735689600000},'
        '"geometry":{"type":"Point","coordinates":[1.0,2.0]}}'
        "]}"
    ),
    '{"type":"FeatureCollection","features":[]}',
    (
        '{"type":"FeatureCollection","features":['
        '{"type":"Feature","id":"ev3","properties":{"mag":null,'
        '"time":1704067200000,"tsunami":0,"sig":0,"type":"earthquake"},'
        '"geometry":{"type":"Point","coordinates":[0.25,0.5,1.0]}}'
        "]}"
    ),
]

_TRANSFORM_SPEC = (
    '{"features":[{"id":"VARCHAR",'
    '"properties":{"mag":"DOUBLE","time":"BIGINT","place":"VARCHAR",'
    '"tsunami":"INTEGER","sig":"INTEGER","type":"VARCHAR"},'
    '"geometry":{"coordinates":["DOUBLE"]}}]}'
)

_DOC_VALUES = ", ".join(f"('{d}')" for d in GEOJSON_DOCS)

_ORACLE = f"""
WITH docs(value) AS (VALUES {_DOC_VALUES}),
parsed AS (
  SELECT json_transform(value, '{_TRANSFORM_SPEC}') AS doc FROM docs
),
feats AS (SELECT unnest(doc.features) AS f FROM parsed),
ev AS (
  SELECT
    f.id AS id,
    make_timestamp(f.properties.time * 1000) AS ts,
    f.properties.mag AS magnitude,
    f.geometry.coordinates[2] AS latitude,
    f.geometry.coordinates[1] AS longitude,
    CASE WHEN len(f.geometry.coordinates) > 2
         THEN f.geometry.coordinates[3] END AS depth,
    f.properties.time * 1000 AS epoch_us,
    f.properties.place AS place,
    f.properties.tsunami AS tsunami,
    f.properties.sig AS significance,
    f.properties.type AS type
  FROM feats
)
SELECT id, CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
       magnitude, latitude, longitude, depth, epoch_us, place, tsunami,
       significance, type
FROM ev
WHERE id IS NOT NULL AND latitude IS NOT NULL
  AND longitude IS NOT NULL AND epoch_us IS NOT NULL
ORDER BY id
"""


@register("geojson_flatten", oracle=_ORACLE, tags=("parity", "P1"))
def geojson_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P7 flatten of the inline corpus (input is deterministic and
    sf-independent; ``sf_dir`` is unused by design)."""
    ev = events_from_geojson_strings(spark, GEOJSON_DOCS)
    return ev.select(
        "id",
        "year",
        "month",
        "magnitude",
        "latitude",
        "longitude",
        "depth",
        F.unix_micros("eventtime").alias("epoch_us"),
        "place",
        "tsunami",
        "significance",
        "type",
    ).orderBy("id")
