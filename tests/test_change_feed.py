"""Streaming change-feed source over versioned tables (r11 verdict
item 6): checkpointed manifest-log tailing, one micro-batch per
version, exactly-once into a txn-idempotent versioned sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_platform_copilot_spark.sources.versioned import (
    diff_versions,
    history,
    latest_version,
    merge_version,
    read_version,
    vacuum,
    write_version,
)
from data_platform_copilot_spark.streaming import (
    FeedBehindRetentionError,
    VersionedChangeFeed,
)


@pytest.fixture()
def tdir(tmp_path):
    return tmp_path / "src"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("x"))


def _three_commits(spark, tdir):
    """v0: ids 0-9; v1: upsert x=999 on 3, insert 50; v2: drop >= 5."""
    write_version(_df(spark, 0, 10), tdir)
    merge_version(spark, tdir,
                  spark.createDataFrame([(3, 999), (50, 777)],
                                        "id long, x long"), "id")
    write_version(_df(spark, 0, 5), tdir, "overwrite")


def _apply(state: dict, rows) -> None:
    for r in rows:
        if r["change_type"] == "delete":
            state.pop(r["id"], None)
        else:
            state[r["id"]] = r["new_x"]


class TestChangeFeedSource:
    def test_stream_equals_batch(self, spark, tdir, tmp_path):
        """Replaying every micro-batch into an empty state must
        reproduce the latest snapshot exactly (the stream==batch
        contract), and the per-version batches must agree with
        adjacent diff_versions slices."""
        _three_commits(spark, tdir)
        feed = VersionedChangeFeed(spark, tdir, "id",
                                   tmp_path / "ckpt")
        state: dict = {}
        seen = feed.run_available(
            lambda df, v: _apply(state, df.collect()))
        assert seen == [0, 1, 2]
        want = {r["id"]: r["x"] for r in
                read_version(spark, tdir).collect()}
        assert state == want
        # net change set also equals the one-shot full-range diff
        # (v1's x=999 on id 3 was transient: v0 and v2 agree there)
        net = {r["id"]: r["change_type"] for r in
               diff_versions(spark, tdir, "id", 0,
                             latest_version(tdir)).collect()}
        assert net == {i: "delete" for i in range(5, 10)}

    def test_restart_resumes_without_reprocessing(self, spark, tdir,
                                                  tmp_path):
        _three_commits(spark, tdir)
        ck = tmp_path / "ckpt"
        feed = VersionedChangeFeed(spark, tdir, "id", ck)
        delivered: list[int] = []
        feed.run_available(lambda df, v: delivered.append(v))
        assert delivered == [0, 1, 2]
        # a NEW instance over the same checkpoint sees nothing pending
        feed2 = VersionedChangeFeed(spark, tdir, "id", ck)
        assert feed2.pending() == []
        assert feed2.run_available(
            lambda df, v: delivered.append(v)) == []
        assert delivered == [0, 1, 2]          # no reprocessing
        # a new commit resumes from the mark, not from zero
        write_version(_df(spark, 100, 103), tdir, "append")
        assert feed2.run_available(
            lambda df, v: delivered.append(v)) == [3]
        assert delivered == [0, 1, 2, 3]

    def test_crash_between_handler_and_checkpoint_redelivers_once(
            self, spark, tdir, tmp_path):
        """At-least-once at the feed boundary: a handler failure (or
        crash before _advance) re-delivers exactly the failed
        version, never earlier ones."""
        _three_commits(spark, tdir)
        feed = VersionedChangeFeed(spark, tdir, "id",
                                   tmp_path / "ckpt")
        calls: list[int] = []

        def boom(df, v):
            calls.append(v)
            if v == 1:
                raise RuntimeError("sink died")

        with pytest.raises(RuntimeError):
            feed.run_available(boom)
        assert calls == [0, 1] and feed.high_water() == 0
        feed.run_available(lambda df, v: calls.append(v))
        assert calls == [0, 1, 1, 2]           # only v1 re-delivered

    def test_exactly_once_into_versioned_sink(self, spark, tdir,
                                              tmp_path):
        _three_commits(spark, tdir)
        dest = tmp_path / "dest"
        feed = VersionedChangeFeed(spark, tdir, "id",
                                   tmp_path / "ckpt")
        feed.pipe_to_versioned(dest, app_id="feed-a")
        rows = read_version(spark, dest).collect()
        # v2's batch both updates id 3 AND deletes others: the rebuild
        # must not leave the stale pre-update row next to the new one
        assert len(rows) == len({r["id"] for r in rows})  # no dupes
        got = {r["id"]: r["x"] for r in rows}
        want = {r["id"]: r["x"] for r in
                read_version(spark, tdir).collect()}
        assert got == want

    @pytest.mark.slow
    def test_duplicate_commit_race_dedupes_in_sink(self, spark, tdir,
                                                   tmp_path):
        """Two feed instances sharing a checkpoint race the same
        version into the destination: the destination's txn protocol
        serializes them to ONE data-bearing commit per version."""
        _three_commits(spark, tdir)
        dest = tmp_path / "dest"
        ck = tmp_path / "ckpt"
        f1 = VersionedChangeFeed(spark, tdir, "id", ck)
        f1.pipe_to_versioned(dest, app_id="feed-a")
        n_versions = len(history(dest))
        # simulate the race: second instance with a STALE checkpoint
        # replays every version against the same destination app id
        (ck / "offset.json").unlink()
        f2 = VersionedChangeFeed(spark, tdir, "id", ck)
        f2.pipe_to_versioned(dest, app_id="feed-a")
        assert len(history(dest)) == n_versions   # all deduped
        got = {r["id"]: r["x"] for r in
               read_version(spark, dest).collect()}
        want = {r["id"]: r["x"] for r in
                read_version(spark, tdir).collect()}
        assert got == want

    def test_feed_behind_retention_fails_loudly(self, spark, tdir,
                                                tmp_path):
        _three_commits(spark, tdir)
        vacuum(tdir, keep_last=1, min_age_s=0.0)
        feed = VersionedChangeFeed(spark, tdir, "id",
                                   tmp_path / "ckpt")
        feed._advance(0)  # pretend v0 was processed pre-vacuum
        with pytest.raises(FeedBehindRetentionError, match="retention"):
            feed.run_available(lambda df, v: None)

    def test_starting_version_snapshot_semantics(self, spark, tdir,
                                                 tmp_path):
        _three_commits(spark, tdir)
        feed = VersionedChangeFeed(spark, tdir, "id",
                                   tmp_path / "ckpt",
                                   starting_version=2)
        batches: dict[int, list] = {}
        feed.run_available(
            lambda df, v: batches.setdefault(v, df.collect()))
        assert list(batches) == [2]
        rows = {r["id"]: (r["change_type"], r["new_x"])
                for r in batches[2]}
        assert rows == {i: ("insert", 2 * i) for i in range(5)}
