"""K7-K9 upgrade: drive save_to_cassandra's REAL executor code path —
prepared-statement construction, per-partition session, batched
concurrent execution — against a fake in-process `cassandra` driver
shipped to the executors with addPyFile. Only the network hop is
faked: the fake records every (statement, args) it receives to disk,
and the test asserts the full DataFrame arrived exactly once.

(The reference itself never runs live inserts either — its calls ship
commented out, save_to_cassandra.py:18-19 — so a live-cluster test is
out of scope; this covers everything up to the socket.)
"""

from __future__ import annotations

import json
import os
import zipfile
from pathlib import Path

import pytest

from usgs_earthquake_data_pipeline_spark.sinks import save_to_cassandra
from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

_CLUSTER_SRC = """
class _Session:
    def __init__(self, contact_points, keyspace):
        self.contact_points = contact_points
        self.keyspace = keyspace

    def prepare(self, stmt):
        return {{"stmt": stmt}}


class Cluster:
    def __init__(self, contact_points):
        self.contact_points = contact_points

    def connect(self, keyspace):
        return _Session(self.contact_points, keyspace)
"""

_CONCURRENT_SRC = """
import json
import os
import uuid

_OUT_DIR = {out_dir!r}


def execute_concurrent_with_args(session, prepared, args, concurrency=20):
    path = os.path.join(_OUT_DIR, uuid.uuid4().hex + ".jsonl")
    with open(path, "w") as f:
        for a in args:
            f.write(json.dumps({{"stmt": prepared["stmt"],
                                 "keyspace": session.keyspace,
                                 "args": list(a)}}) + "\\n")
"""


@pytest.fixture()
def fake_driver_zip(spark, tmp_path_factory):
    # module-scope tmp dir: executors write insert records here
    out_dir = str(tmp_path_factory.mktemp("cassandra_sink"))
    zpath = Path(str(tmp_path_factory.mktemp("pkg"))) / "cassandra.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("cassandra/__init__.py", "")
        z.writestr("cassandra/cluster.py", _CLUSTER_SRC.format())
        z.writestr(
            "cassandra/concurrent.py", _CONCURRENT_SRC.format(out_dir=out_dir)
        )
    spark.sparkContext.addPyFile(str(zpath))
    return out_dir


def test_prepared_concurrent_insert_round_trip(spark, sf_dir, fake_driver_zip):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    expected = {
        (r.event_id, r.user_id, r.event_type) for r in ev.collect()
    }
    save_to_cassandra(
        ev,
        contact_points=["127.0.0.1"],
        keyspace="usgs",
        table="events_by_month",
        batch_size=50,
        enabled=True,
    )
    records = []
    for name in os.listdir(fake_driver_zip):
        with open(os.path.join(fake_driver_zip, name)) as f:
            records.extend(json.loads(line) for line in f)
    # every row arrived exactly once, through the prepared statement
    got = {tuple(r["args"]) for r in records}
    assert got == expected
    assert len(records) == len(expected)
    stmts = {r["stmt"] for r in records}
    assert stmts == {
        "INSERT INTO events_by_month (event_id, user_id, event_type) "
        "VALUES (?, ?, ?)"
    }
    assert {r["keyspace"] for r in records} == {"usgs"}
