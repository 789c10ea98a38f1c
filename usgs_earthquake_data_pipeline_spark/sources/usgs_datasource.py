"""Custom PySpark DataSource (Spark 4 Python data-source API) for the
USGS FDSN GeoJSON feed: ``spark.read.format("usgs_geojson")``.

SURVEY.md §2.1 names this as the idiomatic Spark form of S1: instead
of the driver fetching pages serially (the reference's shape, kept in
``pipeline.py``), each *input partition* is one month window and the
fetch runs on executors — N windows download in parallel, and the
rows land already flattened to the canonical 32-column schema.

Offline/testing: the ``fixture_dir`` option reads one
``<starttime>.json`` FeatureCollection file per window instead of
hitting the network — the same partition/flatten code path.

Flattening here is per-row Python on the executor (the data-source
API yields Python tuples). That is the right trade for a
network-bound source: the fetch dominates, and parallelism comes from
partitioning. For bulk on-disk GeoJSON the JVM-side
``sources.geojson.read_geojson_files`` path remains the fast lane.

Usage::

    spark.dataSource.register(UsgsGeoJsonDataSource)
    df = (spark.read.format("usgs_geojson")
          .option("start_year", 2020).option("end_year", 2021)
          .option("fixture_dir", "/path/to/fixtures")  # or live API
          .load())

    # streaming (see UsgsGeoJsonStreamReader): continuous ingest with
    # offset-checkpointed event-time windows
    events = (spark.readStream.format("usgs_geojson")
              .option("start_ms", 1704067200000)
              .option("window_ms", 3_600_000)
              .load())
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from ..schema import USGS_EVENTS_SCHEMA


class UsgsWindowPartition(InputPartition):
    def __init__(self, start: str, end: str):
        self.start = start
        self.end = end


def _flatten_feature_py(feature: dict):
    """Row-wise flatten of one GeoJSON feature to the 32-column tuple
    (executor-side Python; mirrors the JVM expression flatten in
    sources/geojson.py — same semantics, same column order)."""
    props = feature.get("properties") or {}
    geom = feature.get("geometry") or {}
    coords = geom.get("coordinates") or []

    def ts(ms):
        if ms is None:
            return None
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    eventtime = ts(props.get("time"))
    if feature.get("id") is None or len(coords) < 2 or eventtime is None:
        return None  # required-field validation, as in geojson_docs_to_events

    def _int(v):
        return int(v) if v is not None else None

    def _float(v):
        return float(v) if v is not None else None

    return (
        feature.get("id"),
        eventtime.month,
        eventtime.year,
        _float(props.get("mag")),
        float(coords[1]),
        float(coords[0]),
        float(coords[2]) if len(coords) > 2 else None,
        eventtime,
        ts(props.get("updated")),
        props.get("place"),
        props.get("url"),
        props.get("detail"),
        _int(props.get("felt")),
        _float(props.get("cdi")),
        _float(props.get("mmi")),
        props.get("alert"),
        props.get("status"),
        _int(props.get("tsunami")),
        _int(props.get("sig")),
        props.get("net"),
        props.get("code"),
        props.get("ids"),
        props.get("sources"),
        props.get("types"),
        _int(props.get("nst")),
        _float(props.get("dmin")),
        _float(props.get("rms")),
        _float(props.get("gap")),
        props.get("magType"),
        props.get("type"),
        props.get("title"),
        json.dumps(geom),
    )


class UsgsGeoJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        from ..pipeline import month_windows

        start_year = int(self.options.get("start_year", "2024"))
        end_year = int(self.options.get("end_year", str(start_year)))
        return [
            UsgsWindowPartition(s, e) for s, e in month_windows(start_year, end_year)
        ]

    def read(self, partition: UsgsWindowPartition):
        fixture_dir = self.options.get("fixture_dir")
        if fixture_dir:
            path = os.path.join(fixture_dir, f"{partition.start}.json")
            if not os.path.exists(path):
                return
            with open(path) as fh:
                doc = json.load(fh)
        else:  # pragma: no cover - live network path
            from .rest import fetch_earthquake_data

            api_url = self.options.get(
                "api_url", "https://earthquake.usgs.gov/fdsnws/event/1/query"
            )
            doc = fetch_earthquake_data(api_url, partition.start, partition.end)
        for feature in doc.get("features") or []:
            row = _flatten_feature_py(feature)
            if row is not None:
                yield row


class UsgsGeoJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the feed: ``spark.readStream.format(
    "usgs_geojson")`` — the Spark-idiomatic replacement for the
    reference's cron-driven polling loop (its C1/C3 orchestration;
    reference usgs-earthquake-data-ingest.py drives the same endpoint
    hour by hour from a scheduler).

    Offsets are event-time watermarks: ``{"end_ms": N}`` means
    everything before N has been emitted, and each micro-batch covers
    the next ``window_ms`` slice ``[end_ms, end_ms + window_ms)`` —
    so the checkpoint alone makes re-ingest idempotent and gap-free
    (the property the reference gets from its month/week windowing,
    here for free from Structured Streaming's offset log, including
    exactly-once replay via ``readBetweenOffsets``).

    The simple stream-reader API reads on the driver — the right
    trade for a rate-limited HTTP feed (one request per batch); the
    flatten is the same per-feature path the batch reader uses.
    ``fixture_file`` replaces the network with a local
    FeatureCollection filtered by each window (tests)."""

    def __init__(self, options: dict):
        self.options = options
        self.window_ms = int(options.get("window_ms", 3_600_000))
        self.start_ms = int(options.get("start_ms", 0))

    def initialOffset(self) -> dict:
        return {"end_ms": self.start_ms}

    def read(self, start: dict):
        s = int(start["end_ms"])
        e = s + self.window_ms
        return iter(self._fetch(s, e)), {"end_ms": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._fetch(int(start["end_ms"]), int(end["end_ms"])))

    def _fetch(self, s_ms: int, e_ms: int) -> list:
        fixture_file = self.options.get("fixture_file")
        if fixture_file:
            with open(fixture_file) as fh:
                doc = json.load(fh)
        else:  # pragma: no cover - live network path
            from .rest import fetch_earthquake_data

            api_url = self.options.get(
                "api_url", "https://earthquake.usgs.gov/fdsnws/event/1/query"
            )

            def iso(ms):
                return (
                    datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
                    .replace(tzinfo=None)
                    .isoformat()
                )

            doc = fetch_earthquake_data(api_url, iso(s_ms), iso(e_ms))
        rows = []
        for feature in doc.get("features") or []:
            t = (feature.get("properties") or {}).get("time")
            # window filter is half-open [s, e) — batches never overlap
            if t is None or not (s_ms <= t < e_ms):
                continue
            row = _flatten_feature_py(feature)
            if row is not None:
                rows.append(row)
        return rows


class GeoJsonCommit(WriterCommitMessage):
    def __init__(self, path: str, n_features: int):
        self.path = path
        self.n_features = n_features


class UsgsGeoJsonWriter(DataSourceWriter):
    """Batch write half of the Python data-source API: each task
    serializes its partition as ONE GeoJSON FeatureCollection file
    (the reference's row→Feature path, P9/K2 — SURVEY §2.3/2.9 — as a
    first-class sink: ``df.write.format("usgs_geojson")``). Rows with
    longitude/latitude become Point features (depth as the third
    coordinate when present); all other fields land in ``properties``
    with timestamps ISO-formatted. Commit is atomic-ish: tasks write
    ``part-*.json`` named by partition + task attempt (speculative
    retries cannot collide), and the driver's commit() records the
    winning files in ``_MANIFEST.json`` — readers that honor the
    manifest never see an aborted attempt's output.

    Mode semantics (round-10 advice — overwrite previously behaved as
    append for part-file globbers): ``overwrite`` deletes, AT COMMIT,
    every pre-existing ``part-*.json`` that is not in the winning set —
    old data stays intact if the job dies mid-write, and after commit
    both manifest-honoring readers AND naive globbers see exactly the
    new data. Commit ordering (round-12 advice): the new manifest is
    published FIRST (temp file + ``os.replace``, so it is never torn),
    THEN stale parts are deleted — a crash mid-commit leaves extra
    unreferenced files, never a manifest pointing at removed ones.
    Naive globbers may therefore transiently over-read between such a
    crash and the next commit: the NEXT commit self-heals by sweeping
    every part file referenced by neither the prior manifest nor its
    own winning set before publishing (round-13).
    ``append`` MERGES the prior manifest's file list into the new one
    (name-keyed, new wins), so manifest readers keep seeing earlier
    appends instead of silently losing them."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path") or ""
        if not self.path:
            raise ValueError("usgs_geojson writer requires a path")
        self.overwrite = overwrite
        # per-JOB uniqueness token for part names (round-11 review):
        # taskAttemptId alone is only unique within one SparkContext,
        # so a second application appending to the same directory with
        # a deterministic DAG could reuse (partition, attempt) and
        # truncate a previously COMMITTED file. Drawn once on the
        # driver, serialized to every write task.
        import uuid

        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        out = os.path.join(
            self.path,
            f"part-{self.job_token}-{ctx.partitionId():05d}"
            f"-{ctx.taskAttemptId()}.json",
        )
        os.makedirs(self.path, exist_ok=True)
        features = []
        for row in iterator:
            props = {}
            lon = lat = depth = None
            for name, value in row.asDict().items():
                if name == "longitude":
                    lon = value
                elif name == "latitude":
                    lat = value
                elif name == "depth":
                    depth = value
                elif hasattr(value, "isoformat"):
                    props[name] = value.isoformat()
                else:
                    props[name] = value
            feature = {"type": "Feature", "properties": props}
            if lon is not None and lat is not None:
                coords = [lon, lat] + ([depth] if depth is not None else [])
                feature["geometry"] = {"type": "Point", "coordinates": coords}
            fid = props.pop("id", None)
            if fid is not None:
                feature["id"] = fid
            features.append(feature)
        doc = {
            "type": "FeatureCollection",
            "metadata": {"count": len(features)},
            "features": features,
        }
        with open(out, "w") as fh:
            json.dump(doc, fh)
        return GeoJsonCommit(out, len(features))

    def commit(self, messages):
        new_files = {
            os.path.basename(m.path): m.n_features
            for m in messages
            if m is not None
        }
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        # Self-heal (round-12 advice): a crash in a PRIOR commit
        # between the manifest os.replace and its stale-part deletes
        # leaves orphaned part-*.json that naive globbers would read
        # as live data. Sweep any part file referenced by neither the
        # current manifest nor this job's winning set before
        # publishing — single-writer directories, so unreferenced
        # parts can only be crash/abort leftovers.
        prior_names: set[str] = set()
        if os.path.exists(manifest_path):
            try:
                with open(manifest_path) as fh:
                    prior_names = set(json.load(fh).get("files", []))
            except (json.JSONDecodeError, OSError):  # pragma: no cover
                prior_names = set()
        for name in os.listdir(self.path):
            if (
                name.startswith("part-")
                and name.endswith(".json")
                and name not in prior_names
                and name not in new_files
            ):
                try:  # best-effort: a failed heal must not fail the commit
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass
        if self.overwrite:
            files = new_files
        else:
            # append: carry forward the previously committed file list
            files = {}
            if os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    prior = json.load(fh)
                prior_counts = prior.get("file_counts")
                if prior_counts is None:
                    # pre-file_counts manifest: recover each file's
                    # count from its own metadata rather than zeroing
                    # it (round-11 review — a zero would undercount
                    # n_features forever after)
                    prior_counts = {}
                    for n in prior.get("files", []):
                        fp = os.path.join(self.path, n)
                        if os.path.exists(fp):
                            with open(fp) as pfh:
                                prior_counts[n] = (
                                    json.load(pfh)
                                    .get("metadata", {})
                                    .get("count", 0)
                                )
                files.update(
                    {
                        n: c
                        for n, c in prior_counts.items()
                        if os.path.exists(os.path.join(self.path, n))
                    }
                )
            files.update(new_files)
        manifest = {
            "files": sorted(files),
            "file_counts": files,
            "n_features": sum(files.values()),
        }
        # commit order (round-12 advice): publish the new manifest
        # FIRST — written to a temp file and os.replace'd so readers
        # never see a torn manifest — THEN delete stale parts. A crash
        # between the two steps leaves extra unreferenced files (which
        # manifest-honoring readers ignore), never a manifest that
        # references removed files.
        tmp = f"{manifest_path}.{self.job_token}.tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, manifest_path)
        if self.overwrite:
            for name in os.listdir(self.path):
                if (
                    name.startswith("part-")
                    and name.endswith(".json")
                    and name not in new_files
                ):
                    os.remove(os.path.join(self.path, name))

    def abort(self, messages):  # pragma: no cover - failure path
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class UsgsGeoJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "usgs_geojson"

    def schema(self):
        return USGS_EVENTS_SCHEMA

    def reader(self, schema) -> UsgsGeoJsonReader:
        return UsgsGeoJsonReader(self.options)

    def simpleStreamReader(self, schema) -> UsgsGeoJsonStreamReader:
        return UsgsGeoJsonStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> UsgsGeoJsonWriter:
        return UsgsGeoJsonWriter(self.options, overwrite)
