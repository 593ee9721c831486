"""Streaming-sink throughput probe (r12 verdict item 1 "Done"
criterion): drain a >=100k-row versioned_stream SOURCE -> SINK pipe
(availableNow) and print one JSON line. The write path under test is
the Arrow-vectorized ``VersionedStreamWriter`` — RecordBatches
streaming into an incremental ParquetWriter, no row pickling.

    python tools/sink_bench.py [sf_dir]    # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    master = os.environ.get("SPARK_GRAFT_MASTER",
                            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark = (SparkSession.builder.master(master)
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    from data_platform_copilot_spark.sources.registry import load_table
    from data_platform_copilot_spark.sources.versioned import (
        read_version, write_version)
    from data_platform_copilot_spark.streaming import (
        register_stream_source)

    td = Path(tempfile.mkdtemp(prefix="sink_bench_"))
    src, dst, ck = td / "src", td / "dst", td / "ck"
    events = load_table(spark, sf, "events")
    n = events.count()
    write_version(events.repartition(8), src, "overwrite")
    register_stream_source(spark)
    t0 = time.time()
    q = (spark.readStream.format("versioned_stream")
         .option("path", str(src)).load()
         .writeStream.format("versioned_stream")
         .option("path", str(dst))
         .option("appId", "sink-bench")
         .option("checkpointLocation", str(ck))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    dt = time.time() - t0
    rows = read_version(spark, dst).count()
    assert rows == n, f"sink lost rows: {rows} != {n}"
    print(json.dumps({"metric": "sink_drain_sec",
                      "value": round(dt, 3), "rows": rows,
                      "rows_per_sec": int(rows / dt), "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
