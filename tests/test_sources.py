"""Source-layer invariants (sources/registry.py).

The load-bearing one: no table the registry hands out may expose a
TIMESTAMP_NTZ column. Spark 4 reads parquet naive timestamps as NTZ,
a type that unix_millis(), withWatermark() and epoch casts all
reject — rounds 3 and 4 each re-paid that bug one call site at a
time. The registry now normalizes NTZ -> session-TZ TIMESTAMP once
at load (registry._normalize_ntz); this test pins the invariant for
every warehouse table so the bug class cannot resurface downstream.
"""
from __future__ import annotations

from pyspark.sql import types as T

from data_platform_copilot_spark.sources.registry import (
    TESTDATA_TABLES, load_table)


def test_no_registered_table_exposes_ntz(spark, sf_dir):
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        ntz = [f.name for f in df.schema.fields
               if isinstance(f.dataType, T.TimestampNTZType)]
        assert not ntz, f"{name} exposes TIMESTAMP_NTZ columns: {ntz}"


def test_events_ts_is_session_tz_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_streaming_source_dtype_matches_batch(spark, sf_dir):
    from data_platform_copilot_spark.streaming.events import (
        streaming_events_source)
    stream = streaming_events_source(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_warm_tables_persist_upgrades_plan_only_entry(spark, sf_dir):
    # r14 ADVICE: the warm memo used to ignore the persist flag — a
    # persist=True warm after a plan-only warm silently no-opped, so
    # probes expecting cached tables measured unpersisted scans. A
    # plan-only entry must now upgrade to the persisted layout.
    from data_platform_copilot_spark.sources.registry import (
        _WARM, warm_tables)
    try:
        warm_tables(spark, sf_dir, tables=("region",), persist=False)
        df = load_table(spark, sf_dir, "region")
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
        warm_tables(spark, sf_dir, tables=("region",), persist=True)
        df2 = load_table(spark, sf_dir, "region")
        assert df2.storageLevel.useMemory or df2.storageLevel.useDisk
    finally:
        # leave no cached state behind for other tests
        app = spark.sparkContext.applicationId
        got = _WARM.pop((app, sf_dir, "region"), None)
        if got is not None:
            got.unpersist()
