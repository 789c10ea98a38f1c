"""Concurrent-process safety (round-10 verdict item 3).

Round 9's first sf0.1 sweep failed 178 entries because two runs shared
the cwd-relative ``spark-warehouse/`` (and streaming checkpoint dirs):
managed-table writes from one process clobbered the other's. get_spark
now points ``spark.sql.warehouse.dir`` and the default streaming
checkpoint location at a per-process ``tempfile.mkdtemp()``
(session.py:_scratch_dir), demoting the old "exclusive-run rule" from
contract to recommendation.

The test spawns TWO fresh python processes that concurrently write a
managed table under the SAME name, read it back, and run a bounded
streaming query — the exact collision surface — and requires both to
exit green with correct contents. It also asserts the two processes
really used different warehouse dirs (the fix, not luck).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from usgs_earthquake_data_pipeline_spark.session import get_spark

tag = int(sys.argv[1])
spark = get_spark(app_name=f"concurrent-{{tag}}")

# 1) managed table under a name BOTH processes use: pre-fix these
#    collided inside the shared cwd spark-warehouse/.
df = spark.range(0, 200).withColumn("v", F.col("id") * tag)
df.write.mode("overwrite").format("parquet").saveAsTable("concurrent_probe")
back = spark.table("concurrent_probe")
assert back.count() == 200
assert back.agg(F.sum("v")).first()[0] == sum(i * tag for i in range(200))

# 2) bounded streaming query with NO explicit checkpointLocation — it
#    must land in the per-process default, not a shared dir.
stream = (
    spark.readStream.format("rate").option("rowsPerSecond", "500").load()
)
q = (
    stream.writeStream.outputMode("append")
    .format("memory")
    .queryName("concurrent_stream")
    .trigger(availableNow=True)
    .start()
)
assert q.awaitTermination(120), "streaming query did not finish"

print("WAREHOUSE=" + spark.conf.get("spark.sql.warehouse.dir"))
spark.stop()
"""


@pytest.mark.slow
def test_two_processes_share_nothing(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "probe.py"
    script.write_text(SCRIPT.format(repo=repo))
    env = dict(os.environ)
    # a fresh heap per probe process; 2 JVMs side by side on the test box
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    env.pop("SPARK_GRAFT_SCRATCH_DIR", None)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(tag)],
            cwd=repo,  # cwd-relative spark-warehouse/ was the collision
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for tag in (3, 7)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"concurrent run failed:\n{out}\n{err[-3000:]}"
        outs.append(out)
    warehouses = [
        line.split("=", 1)[1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("WAREHOUSE=")
    ]
    assert len(warehouses) == 2
    assert warehouses[0] != warehouses[1], (
        "both processes resolved the same warehouse dir — per-process "
        "isolation regressed"
    )
    for w in warehouses:
        assert "spark-warehouse" not in w, "cwd-relative warehouse leaked back"
