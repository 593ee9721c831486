"""Executor-loss recovery probe: kill an executor JVM mid-query on a
multi-worker standalone cluster and verify the job completes with the
IDENTICAL result.

This is the distributed-systems half of the 100 TB story the local
gates cannot exercise: on a 1000-executor cluster, executor loss is
routine (spot reclaim, OOM kill, hardware) and the engine's answer
must not change. Spark's contract is lineage-based recomputation —
lost shuffle map outputs and lost MEMORY_AND_DISK persisted blocks
(what ``materialize_auto`` uses on cluster masters precisely so an
executor loss cannot fail the job) are rebuilt from the plan. The
probe validates our plans actually satisfy that contract end to end:
no collected driver state, no non-deterministic recompute (a rand()
or unstable topK inside a recomputed branch would change the answer).

Usage:
  python tools/chaos_probe.py [master_url] [sf_dir] [query] [kill_after_s]

Defaults: spark://127.0.0.1:7091, /tmp/spark_graft_sf_x10 (built by
scaling_probe), dedup_prefix_filter_pairs (long enough at x10 to kill
mid-flight), kill 2s into the run. Requires >= 2 workers so the job
can finish on the survivor.

Prints baseline/chaos row counts + order-insensitive hashes and
whether an executor was actually killed (the probe is vacuous if the
query finished before the kill).
"""

from __future__ import annotations

import hashlib
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True)
    return [int(p) for p in out.stdout.split()]


def result_hash(rows) -> tuple[int, str]:
    blob = "\n".join(sorted(";".join(str(v) for v in r) for r in rows))
    return len(rows), hashlib.sha256(blob.encode()).hexdigest()[:16]


def streaming_chaos(master: str, sf_dir: str, kill_after: float) -> int:
    """Executor loss DURING a checkpointed stream: the state store's
    executor-held snapshot dies with the JVM; Spark must reload state
    from the checkpoint and retry the batch. Final aggregate must
    equal the batch answer — at-least-once batch delivery with
    idempotent-by-batchId sinks makes the retry invisible."""
    import tempfile

    from pyspark.sql import functions as F

    from data_platform_copilot_spark.queries.core import rnd
    from data_platform_copilot_spark.session import get_spark
    from data_platform_copilot_spark.sources.registry import load_table

    spark = get_spark("chaos-stream", master=master)
    root = Path(tempfile.mkdtemp(prefix="chaos_stream_"))
    src, ckpt, agg_out = root / "src", root / "ckpt", root / "agg"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    events.repartition(16).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    agg = (stream.groupBy("event_type")
           .agg(F.count("*").alias("n"),
                rnd(F.sum("value"), 2).alias("total_value")))

    def sink(bdf, bid):
        bdf.write.mode("overwrite").parquet(str(agg_out))

    q = (agg.writeStream.outputMode("complete")
         .option("checkpointLocation", str(ckpt))
         .trigger(processingTime="300 milliseconds")
         .foreachBatch(sink).start())
    killed: list[int] = []

    def assassin():
        time.sleep(kill_after)
        pids = executor_pids()
        if pids:
            os.kill(pids[0], signal.SIGKILL)
            killed.append(pids[0])

    th = threading.Thread(target=assassin)
    th.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    th.join()

    got = result_hash(spark.read.parquet(str(agg_out)).collect())
    want = result_hash(
        events.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             rnd(F.sum("value"), 2).alias("total_value")).collect())
    print(f"stream-chaos: got rows={got[0]} hash={got[1]} | "
          f"batch rows={want[0]} hash={want[1]} | "
          f"killed_executor_pid={killed[0] if killed else None}")
    if not killed:
        print("VACUOUS: no executor found to kill")
        return 2
    if got != want:
        print("FAIL: streaming state diverged after executor loss")
        return 1
    print("OK: checkpointed stream recovered executor loss; "
          "final state == batch")
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--streaming"]
    if "--streaming" in sys.argv[1:]:
        return streaming_chaos(
            args[0] if args else "spark://127.0.0.1:7091",
            args[1] if len(args) > 1 else "/root/testdata/sf0.1",
            float(args[2]) if len(args) > 2 else 2.0)
    sys.argv = [sys.argv[0]] + args
    master = sys.argv[1] if len(sys.argv) > 1 else "spark://127.0.0.1:7091"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf_x10"
    qname = sys.argv[3] if len(sys.argv) > 3 else "dedup_prefix_filter_pairs"
    kill_after = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0

    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.session import get_spark

    spark = get_spark("chaos-probe", master=master)
    fn = QUERIES[qname]

    # Baseline: undisturbed run (also warms scans + codegen).
    t0 = time.time()
    base_rows = fn(spark, sf_dir).collect()
    base = result_hash(base_rows)
    print(f"baseline: rows={base[0]} hash={base[1]} "
          f"({time.time() - t0:.1f}s)")

    killed: list[int] = []

    def assassin():
        time.sleep(kill_after)
        pids = executor_pids()
        if pids:
            victim = pids[0]
            os.kill(victim, signal.SIGKILL)
            killed.append(victim)

    th = threading.Thread(target=assassin)
    th.start()
    t0 = time.time()
    chaos_rows = fn(spark, sf_dir).collect()
    chaos = result_hash(chaos_rows)
    th.join()
    dt = time.time() - t0
    print(f"chaos:    rows={chaos[0]} hash={chaos[1]} ({dt:.1f}s)"
          f" killed_executor_pid={killed[0] if killed else None}")

    if not killed:
        print("VACUOUS: no executor found to kill (query too fast or "
              "not a cluster master)")
        return 2
    if chaos != base:
        print("FAIL: result changed after executor loss")
        return 1
    print("OK: identical result after mid-query executor loss")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
