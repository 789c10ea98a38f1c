"""Property-based tests (hypothesis) for the GeoJSON parse operator:
randomized feature documents must always satisfy the flattening
invariants from FIXTURES.md §1."""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.sources.geojson import (
    events_from_geojson_strings,
)

# epoch-ms range 2000..2030 keeps timestamps in sane calendar space
_TIME_MS = st.integers(min_value=946684800000, max_value=1893456000000)
_FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def features(draw):
    coords = draw(
        st.lists(_FLOATS, min_size=2, max_size=3).map(
            lambda c: [round(x, 6) for x in c]
        )
    )
    props = {"time": draw(_TIME_MS)}
    if draw(st.booleans()):
        props["mag"] = draw(_FLOATS)
    if draw(st.booleans()):
        props["tsunami"] = draw(st.integers(min_value=0, max_value=1))
    if draw(st.booleans()):
        props["place"] = draw(st.text(max_size=30))
    if draw(st.booleans()):
        props["updated"] = draw(_TIME_MS)
    return {
        "type": "Feature",
        "id": draw(st.text(alphabet="abcdefghij0123456789", min_size=4, max_size=12)),
        "properties": props,
        "geometry": {"type": "Point", "coordinates": coords},
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    feats=st.lists(
        features(), min_size=0, max_size=8, unique_by=lambda f: f["id"]
    )
)
def test_flatten_invariants(spark, feats):
    doc = json.dumps(
        {"type": "FeatureCollection", "metadata": {"count": len(feats)}, "features": feats}
    )
    df = events_from_geojson_strings(spark, [doc])
    rows = df.collect()
    # row count: one per feature with a valid id/coords/time
    assert len(rows) == len(feats)
    by_input = {f["id"]: f for f in feats}
    for r in rows:
        f = by_input[r["id"]]
        coords = f["geometry"]["coordinates"]
        assert r["longitude"] == coords[0] and r["latitude"] == coords[1]
        if len(coords) > 2:
            assert r["depth"] == coords[2]
        else:
            assert r["depth"] is None
        # month/year always consistent with eventtime (UTC)
        assert r["month"] == r["eventtime"].month
        assert r["year"] == r["eventtime"].year
        # epoch-ms round trip (collected timestamps are naive UTC —
        # pin the tz explicitly rather than trusting the host TZ)
        from datetime import timezone

        ms = f["properties"]["time"]
        got_ms = r["eventtime"].replace(tzinfo=timezone.utc).timestamp() * 1000
        assert math.isclose(got_ms, ms, abs_tol=1)
        # geometry column re-parses to the same coordinates
        geom = json.loads(r["geometry"])
        assert geom["coordinates"] == coords
        # optional fields: absent key → NULL
        if "mag" not in f["properties"]:
            assert r["magnitude"] is None
        if "updated" not in f["properties"]:
            assert r["updated"] is None
