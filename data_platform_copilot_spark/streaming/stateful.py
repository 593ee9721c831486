"""Custom stateful streaming operator via applyInPandasWithState.

A running per-user accumulator (event count + value sum + last seen
ts) maintained as explicit GroupState — the pattern for streaming
logic that windowed aggregation can't express (per-key state
machines, custom eviction, cross-batch counters).

Scale notes: state is partitioned by the group key across executors;
the state store checkpoints incrementally. State size is bounded by
|active users| x a few scalars — eviction for idle keys would use
state TTL/timeouts in production (timeout conf is wired, handling
kept minimal here).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, n_events long, total_value double, "
                 "last_ts timestamp")
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or (batch_max is not pd.NaT
                               and batch_max > last_ts):
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n,
        "total_value": round(total, 2), "last_ts": last_ts,
    }])


def run_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful accumulator over the bounded events source;
    returns the final per-user totals as a batch DataFrame."""
    from .events import streaming_events_source
    stream = streaming_events_source(spark, sf_dir)
    out = (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"stream_state_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode may emit a row per micro-batch; keep the last per user
    result = spark.table(name)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (result.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))


def run_streaming_scd2_upsert(spark, sf_dir: str):
    """Streaming CDC -> SCD2: every micro-batch folds into the history
    table via foreachBatch(scd2_merge) — the continuous-upsert pattern
    (with Delta this body becomes MERGE INTO; the per-batch dedup and
    merge semantics are identical). Within a batch only each key's
    LATEST row applies (CDC batch compaction); scd2_merge's
    idempotency makes micro-batch replays safe. Returns the final
    history DataFrame of the bounded run."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..operators.scd import scd2_init, scd2_merge
    from .events import streaming_events_source

    stream = (streaming_events_source(spark, sf_dir)
              .select("user_id", "value", "ts"))
    state = {"hist": None}

    def upsert(batch, _bid):
        latest = (batch.withColumn(
            "__rn", F.row_number().over(
                W.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("value"))))
            .where("__rn = 1").drop("__rn"))
        if state["hist"] is None:
            state["hist"] = scd2_init(latest, "user_id", "ts").localCheckpoint()
        else:
            state["hist"] = scd2_merge(
                state["hist"], latest, "user_id", "ts").localCheckpoint()

    q = stream.writeStream.foreachBatch(upsert).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return state["hist"]
