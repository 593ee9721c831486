"""True Structured Streaming source over versioned tables
(streaming/stream_source.py): Spark-managed offsets over the
manifest log, append-only tailing with Delta readStream semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_platform_copilot_spark.sources.versioned import (
    evolve_schema,
    merge_version,
    write_version,
)
from data_platform_copilot_spark.streaming import register_stream_source


@pytest.fixture()
def tdir(tmp_path):
    return tmp_path / "src"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("x"))


def _reader(spark, tdir, **options):
    register_stream_source(spark)
    reader = (spark.readStream.format("versioned_stream")
              .option("path", str(tdir)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def _drain_memory(spark, tdir, name, **options):
    q = (_reader(spark, tdir, **options)
         .writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def _drain_files(spark, tdir, out, ckpt, **options):
    """File sink (checkpoint-recoverable, exactly-once): returns the
    CUMULATIVE output — resume semantics show up as the absence of
    duplicates across drains."""
    q = (_reader(spark, tdir, **options)
         .writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.read.parquet(str(out))


class TestVersionedStreamSource:
    def test_stream_equals_batch(self, spark, tdir):
        for i in range(3):
            write_version(_df(spark, i * 10, (i + 1) * 10), tdir,
                          "append" if i else "overwrite")
        got = _drain_memory(spark, tdir, "vs_eq")
        rows = sorted((r["id"], r["x"]) for r in got.collect())
        assert rows == [(i, 2 * i) for i in range(30)]

    @pytest.mark.slow
    def test_checkpoint_resume_is_exactly_once(self, spark, tdir,
                                               tmp_path):
        out, ck = tmp_path / "out", tmp_path / "ck"
        write_version(_df(spark, 0, 10), tdir)
        got = _drain_files(spark, tdir, out, ck)
        assert got.count() == 10
        write_version(_df(spark, 10, 15), tdir, "append")
        got = _drain_files(spark, tdir, out, ck)
        # cumulative output holds each id exactly ONCE: the resumed
        # query processed only the new append
        ids = sorted(r["id"] for r in got.collect())
        assert ids == list(range(15))
        # nothing pending -> third drain adds nothing
        got = _drain_files(spark, tdir, out, ck)
        assert got.count() == 15

    @pytest.mark.slow
    def test_change_commit_fails_loudly(self, spark, tdir, tmp_path):
        out, ck = tmp_path / "out", tmp_path / "ck"
        write_version(_df(spark, 0, 10), tdir)
        _drain_files(spark, tdir, out, ck)
        merge_version(spark, tdir,
                      spark.createDataFrame([(3, 999)],
                                            "id long, x long"), "id")
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException)
        with pytest.raises(StreamingQueryException,
                           match="append-only|change"):
            _drain_files(spark, tdir, out, ck)

    @pytest.mark.slow
    def test_skip_change_commits_passes_over(self, spark, tdir,
                                             tmp_path):
        out, ck = tmp_path / "out", tmp_path / "ck"
        write_version(_df(spark, 0, 10), tdir)
        _drain_files(spark, tdir, out, ck, skipChangeCommits="true")
        merge_version(spark, tdir,
                      spark.createDataFrame([(3, 999)],
                                            "id long, x long"), "id")
        write_version(_df(spark, 100, 105), tdir, "append")
        got = _drain_files(spark, tdir, out, ck,
                           skipChangeCommits="true")
        # the merge version contributes no rows; the append lands once
        ids = sorted(r["id"] for r in got.collect())
        assert ids == list(range(10)) + list(range(100, 105))

    def test_starting_version_skips_history(self, spark, tdir):
        for i in range(3):
            write_version(_df(spark, i * 10, (i + 1) * 10), tdir,
                          "append" if i else "overwrite")
        got = _drain_memory(spark, tdir, "vs_sv", startingVersion="2")
        # version 2's batch is the FULL snapshot at v2 (Delta
        # startingVersion semantics for the first processed version)
        assert got.count() == 30

    def test_initial_snapshot_aligns_evolved_segments(self, spark,
                                                      tdir):
        """A stream started AFTER evolve_schema must read old
        segments through the rename map, null-fill added columns and
        widen-cast narrow physical types — per file, in the
        worker."""
        write_version(
            spark.range(5).select(
                F.col("id").cast("int").alias("k"),
                (F.col("id") * 2).alias("x")), tdir)
        evolve_schema(tdir, rename={"x": "y"},
                      add_columns={"tag": "string"},
                      widen={"k": "bigint"})
        write_version(
            spark.range(5, 8).select(
                F.col("id").alias("k"),
                (F.col("id") * 2).alias("y"),
                F.lit("new").alias("tag")), tdir, "append",)
        got = _drain_memory(spark, tdir, "vs_evo",
                            skipChangeCommits="true")
        assert dict(got.dtypes) == {"k": "bigint", "y": "bigint",
                                    "tag": "string"}
        rows = {r["k"]: (r["y"], r["tag"]) for r in got.collect()}
        assert rows[2] == (4, None) and rows[6] == (12, "new")
        assert len(rows) == 8

    @pytest.mark.slow
    def test_sink_format_end_to_end_exactly_once(self, spark, tdir,
                                                 tmp_path):
        """readStream(A) -> writeStream(B), both through the
        versioned_stream format: B's manifest log accumulates one
        append version per micro-batch, and re-draining with the
        same checkpoint adds nothing (Spark offsets) while a
        REPLAYED batch (same txn) dedupes inside B's commit."""
        from data_platform_copilot_spark.sources.versioned import (
            history, read_version)

        dest, ck = tmp_path / "dest", tmp_path / "ck"
        for i in range(2):
            write_version(_df(spark, i * 10, (i + 1) * 10), tdir,
                          "append" if i else "overwrite")

        def drain():
            q = (_reader(spark, tdir)
                 .writeStream.format("versioned_stream")
                 .option("path", str(dest))
                 .option("appId", "e2e-test")
                 .option("checkpointLocation", str(ck))
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        drain()
        got = {r["id"]: r["x"] for r in
               read_version(spark, dest).collect()}
        assert got == {i: 2 * i for i in range(20)}
        n_versions = len(history(dest))
        drain()  # nothing pending: no new dest version
        assert len(history(dest)) == n_versions
        write_version(_df(spark, 20, 25), tdir, "append")
        drain()
        got = {r["id"]: r["x"] for r in
               read_version(spark, dest).collect()}
        assert got == {i: 2 * i for i in range(25)}  # no dupes

    def test_sink_commit_replay_dedupes(self, spark, tdir, tmp_path):
        """Crash-after-commit-before-checkpoint: the replayed batch
        re-stages files and calls commit with the SAME (app, batch)
        txn — the destination records exactly one data-bearing
        version."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_platform_copilot_spark.sources.versioned import (
            commit_staged_files, history, read_version)

        dest = tmp_path / "dest"
        write_version(_df(spark, 0, 5), dest)

        def stage(name):
            st = dest / "_stage"
            st.mkdir(exist_ok=True)
            pq.write_table(
                pa.table({"id": pa.array([100, 101], pa.int64()),
                          "x": pa.array([200, 202], pa.int64())}),
                st / name)
            return name

        schema = {"id": "bigint", "x": "bigint"}
        v1 = commit_staged_files(dest, [stage("a.parquet")], schema,
                                 txn=("app", 7))
        v2 = commit_staged_files(dest, [stage("b.parquet")], schema,
                                 txn=("app", 7))  # replay
        assert v1 == v2 and len(history(dest)) == 2
        assert read_version(spark, dest).count() == 7
        assert not list((dest / "_stage").glob("*.parquet"))
        # empty batch: no staged files -> no version
        assert commit_staged_files(dest, [], schema,
                                   txn=("app", 8)) == v1
        # incompatible schema append rejected, stage cleaned
        with pytest.raises(Exception, match="incompatible"):
            commit_staged_files(dest, [stage("c.parquet")],
                                {"id": "bigint", "x": "string"},
                                txn=("app", 9))
        assert not list((dest / "_stage").glob("*.parquet"))

    def test_sink_writer_is_arrow_vectorized(self):
        """r12 verdict item 1: the sink must be the Arrow writer —
        batches stream into an incremental ParquetWriter; no
        ``list(iterator)`` buffering, no per-row pickling."""
        import inspect

        from pyspark.sql.datasource import DataSourceStreamArrowWriter

        from data_platform_copilot_spark.streaming.stream_source import (
            VersionedStreamWriter)

        assert issubclass(VersionedStreamWriter,
                          DataSourceStreamArrowWriter)
        src = inspect.getsource(VersionedStreamWriter.write)
        assert "list(iterator)" not in src
        assert "ParquetWriter" in src

    @pytest.mark.slow
    def test_max_versions_per_batch_bounds_catchup(
            self, spark, tdir, tmp_path):
        """r12 verdict item 2: a 10-version backlog with
        maxVersionsPerBatch=4 must catch up in >= 3 bounded
        micro-batches (not one giant batch), completing exactly."""
        import time

        for i in range(10):
            write_version(_df(spark, i * 5, (i + 1) * 5), tdir,
                          "append" if i else "overwrite")
        out, ck = tmp_path / "out", tmp_path / "ck"
        q = (_reader(spark, tdir, maxVersionsPerBatch=4)
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .trigger(processingTime="50 milliseconds").start())
        deadline = time.time() + 150
        done = False
        while time.time() < deadline and not done:
            try:
                done = spark.read.parquet(str(out)).count() == 50
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        got = spark.read.parquet(str(out)).collect()
        assert sorted(r["id"] for r in got) == list(range(50))
        batches = len(list((ck / "offsets").glob("[0-9]*")))
        assert batches >= 3          # ceil(10 / 4) bounded slices

    @pytest.mark.slow
    def test_clean_restart_catchup_stays_capped(self, spark, tdir,
                                                 tmp_path):
        """The restart half of admission control: after a CLEAN stop,
        versions accumulate, and the restarted query must consume the
        gap in capped slices — this only works because Spark's
        AcceptsLatestSeenOffset handshake replays the checkpoint
        offset as a no-op partitions(X, X) call before the first
        latestOffset (pinned here: if that handshake ever vanished,
        the first post-restart batch would be uncapped and the
        offset-entry count below would drop)."""
        import time

        write_version(_df(spark, 0, 5), tdir, "overwrite")
        out, ck = tmp_path / "out", tmp_path / "ck"
        _drain_files(spark, tdir, out, ck, maxVersionsPerBatch=2)
        pre = len(list((ck / "offsets").glob("[0-9]*")))
        # downtime: 6 more versions land while no stream runs
        for i in range(1, 7):
            write_version(_df(spark, i * 5, (i + 1) * 5), tdir,
                          "append")
        q = (_reader(spark, tdir, maxVersionsPerBatch=2)
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .trigger(processingTime="50 milliseconds").start())
        deadline = time.time() + 150
        done = False
        while time.time() < deadline and not done:
            try:
                done = spark.read.parquet(str(out)).count() == 35
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        got = spark.read.parquet(str(out)).collect()
        assert sorted(r["id"] for r in got) == list(range(35))
        post = len(list((ck / "offsets").glob("[0-9]*")))
        assert post - pre >= 3       # 6-version gap / cap 2: no
        #                              uncapped first batch after a
        #                              clean restart

    @pytest.mark.slow
    def test_max_rows_per_batch_bounds_slices(self, spark, tdir,
                                              tmp_path):
        """Row-budget admission (manifest dir_rows): an 8-version,
        40-row backlog with maxRowsPerBatch=10 consumes in >= 4
        bounded micro-batches, completing exactly."""
        import time

        for i in range(8):
            write_version(_df(spark, i * 5, (i + 1) * 5), tdir,
                          "append" if i else "overwrite")
        out, ck = tmp_path / "out", tmp_path / "ck"
        q = (_reader(spark, tdir, maxRowsPerBatch=10)
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .trigger(processingTime="50 milliseconds").start())
        deadline = time.time() + 150
        done = False
        while time.time() < deadline and not done:
            try:
                done = spark.read.parquet(str(out)).count() == 40
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        got = spark.read.parquet(str(out)).collect()
        assert sorted(r["id"] for r in got) == list(range(40))
        batches = len(list((ck / "offsets").glob("[0-9]*")))
        assert batches >= 4          # ceil(40 rows / 10-row budget)

    @pytest.mark.slow
    def test_restart_mid_backlog_resumes_exactly_once(
            self, spark, tdir, tmp_path):
        """Kill a capped catch-up after its first slice; the restart
        must resume from the checkpoint with no duplicate and no
        missing rows (the exactly-once half of verdict item 2)."""
        import time

        for i in range(10):
            write_version(_df(spark, i * 5, (i + 1) * 5), tdir,
                          "append" if i else "overwrite")
        out, ck = tmp_path / "out", tmp_path / "ck"

        def _start():
            return (_reader(spark, tdir, maxVersionsPerBatch=3)
                    .writeStream.format("parquet")
                    .option("path", str(out))
                    .option("checkpointLocation", str(ck))
                    .trigger(processingTime="50 milliseconds")
                    .start())

        q = _start()
        deadline = time.time() + 150
        first = 0
        while time.time() < deadline and first == 0:
            try:
                first = spark.read.parquet(str(out)).count()
            except Exception:
                time.sleep(0.3)
        q.stop()                      # mid-backlog
        q.awaitTermination(60)
        assert 0 < first < 50
        q = _start()
        deadline = time.time() + 150
        total = first
        while time.time() < deadline and total < 50:
            try:
                total = spark.read.parquet(str(out)).count()
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        got = spark.read.parquet(str(out)).collect()
        ids = sorted(r["id"] for r in got)
        assert ids == list(range(50))  # complete AND duplicate-free

    def test_sink_write_failure_unlinks_stage_file(self, tmp_path):
        """Review r13: a task dying mid-iteration must not orphan its
        half-written stage file — abort() only sees commit messages
        from SUCCEEDED tasks and nothing else GCs _stage."""
        import pyarrow as pa
        from pyspark.sql.types import LongType, StructField, StructType

        from data_platform_copilot_spark.streaming.stream_source import (
            VersionedStreamWriter)

        w = VersionedStreamWriter(
            StructType([StructField("id", LongType())]),
            {"path": str(tmp_path / "t")})

        def batches():
            yield pa.record_batch([pa.array([1, 2])], names=["id"])
            raise RuntimeError("upstream died")

        with pytest.raises(RuntimeError, match="upstream died"):
            w.write(batches())
        stage = tmp_path / "t" / "_stage"
        assert list(stage.glob("*.parquet")) == []

    def test_initial_snapshot_with_delete_vectors_fails_loudly(
            self, spark, tdir):
        """ADVICE r12 (high): live MoR deletion vectors at the
        stream's STARTING version would re-emit deleted/stale rows
        through raw file reads — refuse loudly, like every other
        non-representable state, pointing at compact()/the CDF."""
        write_version(_df(spark, 0, 10), tdir)
        merge_version(
            spark, tdir,
            spark.createDataFrame([(1, 999)], "id long, x long"),
            "id", strategy="mor")
        with pytest.raises(Exception, match="deletion vectors"):
            _drain_memory(spark, tdir, "dv_snap", startingVersion=1)

    def test_carried_partition_leaf_streams_its_value(
            self, spark, tdir):
        """ADVICE r12 (medium): a partition-scoped CoW merge carries
        untouched partition LEAVES by reference (data-0-x/p=0) — the
        initial snapshot must parse the partition value from the
        ENTRY path itself, not silently null-fill the column."""
        write_version(
            _df(spark, 0, 10).withColumn("p", F.col("id") % 2),
            tdir, partition_by=["p"])
        # touch only p=1: p=0's leaf is carried by reference
        merge_version(
            spark, tdir,
            spark.createDataFrame([(1, 999, 1)],
                                  "id long, x long, p long"),
            "id")
        got = _drain_memory(spark, tdir, "leafp", startingVersion=1)
        rows = {r["id"]: (r["x"], r["p"]) for r in got.collect()}
        assert sorted(rows) == list(range(10))
        assert rows[1] == (999, 1)
        assert all(rows[i][1] == i % 2 for i in rows)

    @pytest.mark.slow
    def test_evolve_partitions_noop_and_hive_value_injection(
            self, spark, tdir, tmp_path):
        """evolve-partitions is metadata-only (no rows) — silently
        passed over; a subsequent HIVE-PARTITIONED append streams
        with its partition values injected from the path segments
        (the layout stores them outside the parquet footers)."""
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning)

        out, ck = tmp_path / "out", tmp_path / "ck"
        write_version(_df(spark, 0, 10)
                      .withColumn("p", F.col("id") % 2), tdir)
        _drain_files(spark, tdir, out, ck)
        evolve_partitioning(tdir, ["p"])   # metadata-only commit
        write_version(_df(spark, 10, 14)
                      .withColumn("p", F.col("id") % 2), tdir,
                      "append", partition_by=["p"])
        got = _drain_files(spark, tdir, out, ck)
        rows = {r["id"]: r["p"] for r in got.collect()}
        assert sorted(rows) == list(range(14))
        assert all(rows[i] == i % 2 for i in range(14))


@pytest.mark.slow
class TestFullPipelineChaos:
    def test_source_stateful_sink_survives_kill(self, spark, tdir,
                                                tmp_path):
        """r13 verdict #8 (stretch): the FULL format integration —
        format('versioned_stream') source -> applyInPandasWithState
        accumulator -> the Arrow versioned sink — killed mid-backlog
        and resumed on the same checkpoint. The destination log is an
        append-only feed of state snapshots; each user's newest
        snapshot must equal the batch twin exactly (state store +
        source offsets + sink txn dedupe all resumed coherently)."""
        import time

        from data_platform_copilot_spark.sources.versioned import (
            latest_version, read_version)
        from data_platform_copilot_spark.streaming.stateful import (
            OUTPUT_SCHEMA, STATE_SCHEMA, _update_user_state)

        # 0.25 value steps keep incremental and batch double sums
        # bit-identical pre-round
        def _events(i):
            return (spark.range(i * 5, (i + 1) * 5).select(
                (F.col("id") % 7).alias("user_id"),
                F.timestamp_seconds(1700000000 + F.col("id") * 60)
                .alias("ts"),
                ((F.col("id") % 100) * 0.25).alias("value")))

        for i in range(10):   # 10-version backlog
            write_version(_events(i), tdir, "append" if i else "overwrite")
        dest, ck = tmp_path / "dest", tmp_path / "ck"

        def _start(trigger_kwargs):
            return (_reader(spark, tdir, maxVersionsPerBatch=2)
                    .groupBy("user_id")
                    .applyInPandasWithState(
                        _update_user_state,
                        outputStructType=OUTPUT_SCHEMA,
                        stateStructType=STATE_SCHEMA,
                        outputMode="append",
                        timeoutConf="NoTimeout")
                    .writeStream.outputMode("append")
                    .format("versioned_stream")
                    .option("path", str(dest))
                    .option("appId", "pipeline-chaos")
                    .option("checkpointLocation", str(ck))
                    .trigger(**trigger_kwargs).start())

        q = _start({"processingTime": "50 milliseconds"})
        deadline = time.time() + 150
        while time.time() < deadline and latest_version(dest) is None:
            time.sleep(0.2)
        q.stop()                              # mid-backlog kill
        q.awaitTermination(60)
        assert latest_version(dest) is not None
        mid_rows = read_version(spark, dest).count()
        # two more source versions AFTER the kill: the resume always
        # has work even if the first run drained the whole backlog
        # before stop() landed (review r14: timing-robustness)
        for i in (10, 11):
            write_version(_events(i), tdir, "append")

        from pyspark.sql import Window as W
        w = W.partitionBy("user_id").orderBy(F.desc("n_events"))

        def _final():
            return {r["user_id"]: (r["n_events"],
                                   r["total_value"], r["last_ts"])
                    for r in read_version(spark, dest)
                    .withColumn("rn", F.row_number().over(w))
                    .where("rn = 1").collect()}

        twin = {r["user_id"]: (r["n"], r["t"], r["m"])
                for r in read_version(spark, tdir)
                .groupBy("user_id")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("value"), 2).alias("t"),
                     F.max("ts").alias("m")).collect()}

        # resume on the same checkpoint; processingTime (NOT
        # availableNow: under admission caps that trigger drains a
        # single capped window by design — pinned in the test below)
        q = _start({"processingTime": "50 milliseconds"})
        deadline = time.time() + 150
        while time.time() < deadline and _final() != twin:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        assert read_version(spark, dest).count() > mid_rows
        assert _final() == twin and len(twin) == 7

    def test_available_now_with_cap_drains_one_window(
            self, spark, tdir, tmp_path):
        """Documented semantics pin: Trigger.AvailableNow captures
        latestOffset ONCE (Spark's wrapper for Python data sources),
        so with maxVersionsPerBatch=N a single availableNow run
        drains at most N versions past the checkpoint, not the whole
        backlog — capped catch-up needs a processingTime trigger (or
        repeated availableNow runs). If this ever starts draining
        everything, Spark grew per-batch read-limit support for
        Python sources and the guidance in stream_source.py should
        flip."""
        for i in range(6):
            write_version(_df(spark, i * 5, (i + 1) * 5), tdir,
                          "append" if i else "overwrite")
        out, ck = tmp_path / "out", tmp_path / "ck"
        got = _drain_files(spark, tdir, out, ck,
                           maxVersionsPerBatch=2)
        assert got.count() == 10      # versions 0..1 only (one window)
        got = _drain_files(spark, tdir, out, ck,
                           maxVersionsPerBatch=2)
        assert got.count() == 20      # each run advances one window
        for _ in range(2):
            got = _drain_files(spark, tdir, out, ck,
                               maxVersionsPerBatch=2)
        assert sorted(r["id"] for r in got.collect()) \
            == list(range(30))        # repeated runs complete exactly
