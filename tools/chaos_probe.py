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


def main() -> int:
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
