"""Manifest-versioned tables (sources/versioned.py): atomic commits,
time travel, append/overwrite composition, compaction, vacuum."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_platform_copilot_spark.sources.versioned import (
    VersionedTableError,
    compact,
    history,
    latest_version,
    read_version,
    vacuum,
    write_version,
)


@pytest.fixture()
def tdir(tmp_path):
    return tmp_path / "tbl"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("x"))


class TestVersionedTable:
    def test_append_overwrite_time_travel(self, spark, tdir):
        assert write_version(_df(spark, 0, 10), tdir) == 0
        assert write_version(_df(spark, 10, 15), tdir, "append") == 1
        assert read_version(spark, tdir).count() == 15
        assert read_version(spark, tdir, version=0).count() == 10  # travel
        assert write_version(_df(spark, 100, 102), tdir,
                             "overwrite") == 2
        assert read_version(spark, tdir).count() == 2
        assert read_version(spark, tdir, version=1).count() == 15
        assert latest_version(tdir) == 2
        modes = [h["mode"] for h in history(tdir)]
        assert modes == ["append", "append", "overwrite"]

    def test_pointer_always_resolves_consistent_snapshot(self, spark,
                                                         tdir):
        """The pointer file only ever names a fully committed
        manifest: every intermediate read during a commit sequence
        returns a complete version's exact rows."""
        write_version(_df(spark, 0, 5), tdir)
        for i in range(1, 4):
            got = read_version(spark, tdir).count()
            assert got == 5 * i  # never a torn intermediate
            write_version(_df(spark, 5 * i, 5 * (i + 1)), tdir, "append")
        assert read_version(spark, tdir).count() == 20

    def test_compact_preserves_rows_and_cuts_files(self, spark, tdir):
        for i in range(5):  # 5 appends -> file spray
            write_version(_df(spark, i * 10, (i + 1) * 10)
                          .repartition(4), tdir, "append")
        before = read_version(spark, tdir)
        n_files_before = len(before.inputFiles())
        rows_before = sorted(r["id"] for r in before.collect())
        v = compact(spark, tdir, target_files=2)
        after = read_version(spark, tdir)
        assert len(after.inputFiles()) <= 2 < n_files_before
        assert sorted(r["id"] for r in after.collect()) == rows_before
        # pre-compaction versions still readable (until vacuum)
        assert read_version(spark, tdir, version=v - 1).count() == 50

    def test_vacuum_drops_unreferenced_dirs_only(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import history

        write_version(_df(spark, 0, 10), tdir)
        write_version(_df(spark, 10, 20), tdir, "append")
        compact(spark, tdir, target_files=1)           # v2 = live set
        h = {m["version"]: set(m["data_dirs"]) for m in history(tdir)}
        dead = (h[0] | h[1]) - h[2]
        assert len(dead) == 2                          # v0 + v1 dirs
        # retention guard first: unreferenced dirs FRESHER than
        # min_age_s are protected (they may be a commit in progress —
        # data lands before the manifest publish)
        assert vacuum(tdir, keep_last=1) == []
        assert dead <= {d.name for d in tdir.glob("data-*")}
        deleted = vacuum(tdir, keep_last=1, min_age_s=0)
        assert set(deleted) == dead
        assert read_version(spark, tdir).count() == 20  # live unharmed
        with pytest.raises(VersionedTableError):
            read_version(spark, tdir, version=0)        # history gone

    def test_crash_before_manifest_publish_leaves_table_intact(
            self, spark, tdir):
        """THE commit point is the atomic manifest publish. A writer
        dying after writing data but BEFORE publishing its manifest
        leaves only unreferenced garbage — readers still see the
        previous version. A writer dying AFTER the publish but before
        the pointer advance HAS committed (the pointer is a hint)."""
        write_version(_df(spark, 0, 10), tdir)
        # torn writer: data dir written, no manifest -> invisible
        _df(spark, 90, 99).write.parquet(str(tdir / "data-1-deadbeef"))
        assert latest_version(tdir) == 0
        assert read_version(spark, tdir).count() == 10
        # manifest published, pointer stale -> committed and visible
        (tdir / "manifest-1.json").write_text(
            '{"version": 1, "mode": "append", '
            '"data_dirs": ["data-1-deadbeef"]}')
        assert latest_version(tdir) == 1
        assert read_version(spark, tdir).count() == 9

    def test_reject_bad_mode_and_missing_table(self, spark, tdir):
        with pytest.raises(VersionedTableError):
            write_version(_df(spark, 0, 1), tdir, "merge")
        with pytest.raises(VersionedTableError):
            read_version(spark, tdir)


class TestSchemaEvolutionAndMerge:
    def test_additive_columns_survive_merged_reads(self, spark, tdir):
        write_version(_df(spark, 0, 5), tdir)
        evolved = _df(spark, 5, 10).withColumn("tag", F.lit("new"))
        write_version(evolved, tdir, "append")
        got = read_version(spark, tdir)
        assert set(got.columns) == {"id", "x", "tag"}
        tags = {r["id"]: r["tag"] for r in got.collect()}
        assert tags[7] == "new" and tags[2] is None  # old rows -> NULL

    def test_type_change_on_append_rejected(self, spark, tdir):
        write_version(_df(spark, 0, 5), tdir)
        bad = _df(spark, 5, 6).withColumn("x", F.col("x").cast("string"))
        with pytest.raises(VersionedTableError, match="incompatible"):
            write_version(bad, tdir, "append")
        assert latest_version(tdir) == 0  # nothing committed

    def test_merge_upserts_by_key(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 10), tdir)
        updates = spark.createDataFrame(
            [(3, 999), (4, 888), (50, 777)], "id long, x long")
        v = merge_version(spark, tdir, updates, "id")
        got = {r["id"]: r["x"] for r in
               read_version(spark, tdir).collect()}
        assert len(got) == 11            # 10 originals + 1 insert
        assert got[3] == 999 and got[4] == 888 and got[50] == 777
        assert got[5] == 10              # untouched row intact
        # pre-merge version still time-travelable
        old = {r["id"]: r["x"] for r in
               read_version(spark, tdir, version=v - 1).collect()}
        assert old[3] == 6 and 50 not in old


class TestPartitionedVersions:
    def test_partition_pruning_across_versions(self, spark, tdir):
        d1 = _df(spark, 0, 40).withColumn(
            "part", (F.col("id") % 4).cast("string"))
        d2 = _df(spark, 40, 80).withColumn(
            "part", (F.col("id") % 4).cast("string"))
        write_version(d1, tdir, partition_by=["part"])
        write_version(d2, tdir, "append", partition_by=["part"])
        full = read_version(spark, tdir)
        assert full.count() == 80
        pruned = full.where(F.col("part") == "1")
        assert pruned.count() == 20
        # pruning is physical: BOTH version-dir scans carry the
        # partition filter (directory-level skipping, not a row filter)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        import re
        pf = re.findall(r"PartitionFilters: \[[^\]]*part[^\]]*\]", plan)
        assert len(pf) == 2, plan[:2000]

    def test_layout_mismatch_on_append_rejected(self, spark, tdir):
        d = _df(spark, 0, 8).withColumn(
            "part", (F.col("id") % 2).cast("string"))
        write_version(d, tdir, partition_by=["part"])
        with pytest.raises(VersionedTableError, match="layout"):
            write_version(d, tdir, "append")  # unpartitioned append

    def test_compact_preserves_layout(self, spark, tdir):
        d = _df(spark, 0, 40).withColumn(
            "part", (F.col("id") % 2).cast("string"))
        write_version(d, tdir, partition_by=["part"])
        compact(spark, tdir, target_files=1)
        pruned = read_version(spark, tdir).where(F.col("part") == "0")
        assert pruned.count() == 20
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "part" in plan


class TestPartitionScopedMerge:
    """merge_version on a partitioned table rewrites ONLY the touched
    partitions; untouched partitions are carried forward by reference
    (same files, byte-identical — the 100 TB contract)."""

    def _write(self, spark, tdir):
        d = _df(spark, 0, 40).withColumn(
            "part", (F.col("id") % 4).cast("string"))
        write_version(d, tdir, partition_by=["part"])

    def test_untouched_partition_files_not_rewritten(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            history, merge_version)

        self._write(spark, tdir)
        before = {}  # partition -> {file: bytes}
        root = tdir / history(tdir)[0]["data_dirs"][0]
        for pdir in sorted(root.glob("part=*")):
            before[pdir.name] = {f.name: f.read_bytes()
                                 for f in pdir.glob("*.parquet")}
        # update keys 1 and 5 (both part=1) + insert key 101 (part=1)
        updates = spark.createDataFrame(
            [(1, 111, "1"), (5, 555, "1"), (101, 101, "1")],
            "id long, x long, part string")
        merge_version(spark, tdir, updates, "id")
        m = history(tdir)[-1]
        assert m["mode"] == "merge"
        # new manifest: one fresh dir + the 3 untouched leaves carried
        carried = [e for e in m["data_dirs"] if "part=" in e]
        assert sorted(e.split("part=")[1] for e in carried) == [
            "0", "2", "3"]
        for leaf in carried:
            pname = "part=" + leaf.split("part=")[1]
            now = {f.name: f.read_bytes()
                   for f in (tdir / leaf).glob("*.parquet")}
            assert now == before[pname]  # byte-identical, not rewritten
        got = {r["id"]: (r["x"], r["part"]) for r in
               read_version(spark, tdir).collect()}
        assert len(got) == 41
        assert got[1] == (111, "1") and got[101] == (101, "1")
        assert got[2] == (4, "2")  # untouched row + partition intact
        # time travel to pre-merge still exact
        assert len(read_version(spark, tdir, version=0).collect()) == 40

    def test_merged_read_still_prunes_partitions(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._write(spark, tdir)
        updates = spark.createDataFrame(
            [(1, 111, "1")], "id long, x long, part string")
        merge_version(spark, tdir, updates, "id")
        pruned = read_version(spark, tdir).where(F.col("part") == "2")
        assert pruned.count() == 10
        # physical pruning, strengthened twice: the part=0/3
        # carried-leaf branches fold away (their literal part column
        # makes the filter constant-false), and since r11 the merge
        # dir itself — whose manifest partition-value stats prove it
        # holds only part=1 — is dropped MANIFEST-level by auto
        # pushdown, leaving exactly ONE scan: the part=2 leaf
        import re
        old = spark.conf.get("spark.sql.maxMetadataStringLength")
        spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
        try:
            plan = pruned._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.maxMetadataStringLength", old)
        locs = re.findall(r"Location: InMemoryFileIndex[^\]]*\]", plan)
        assert len(locs) == 1, plan[:2000]
        assert locs[0].rstrip("]").endswith("part=2"), locs

    def test_merge_conflict_detected(self, spark, tdir):
        """A commit landing between a merge's snapshot read and its
        publish fails the merge with CommitConflict — no lost update."""
        from unittest.mock import patch

        from data_platform_copilot_spark.sources import versioned
        from data_platform_copilot_spark.sources.versioned import (
            CommitConflict, merge_version)

        self._write(spark, tdir)
        updates = spark.createDataFrame(
            [(1, 111, "1")], "id long, x long, part string")

        real_read = versioned.read_version

        def read_then_race(sp, td, version=None):
            out = real_read(sp, td, version=version)
            # interleave: another committer wins version 1
            write_version(_df(spark, 900, 905).withColumn(
                "part", F.lit("9")), tdir, "append",
                partition_by=["part"])
            return out

        with patch.object(versioned, "read_version",
                          side_effect=read_then_race):
            with pytest.raises(CommitConflict):
                merge_version(spark, tdir, updates, "id")
        # the interleaved append is the table's latest; no lost update
        assert latest_version(tdir) == 1
        assert read_version(spark, tdir).count() == 45


class TestOptimisticConcurrency:
    def test_two_committers_both_land_distinct_versions(self, spark,
                                                        tdir):
        """Two threads appending concurrently: the manifest CAS gives
        each a distinct version, both data dirs end up referenced by
        the final manifest, nothing is orphaned or double-referenced."""
        import threading

        from data_platform_copilot_spark.sources.versioned import (
            history)

        write_version(_df(spark, 0, 5), tdir)
        barrier = threading.Barrier(2)
        results, errors = [], []

        def committer(lo):
            try:
                barrier.wait()
                results.append(write_version(
                    _df(spark, lo, lo + 5), tdir, "append"))
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        ts = [threading.Thread(target=committer, args=(lo,))
              for lo in (100, 200)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errors, errors[:2]
        assert sorted(results) == [1, 2]  # distinct versions, both won
        final = history(tdir)[-1]
        assert len(final["data_dirs"]) == 3  # v0 + both appends
        assert len(set(final["data_dirs"])) == 3  # no double-reference
        # no orphans: every data dir on disk is referenced
        on_disk = {d.name for d in tdir.glob("data-*")}
        assert on_disk == set(final["data_dirs"])
        got = sorted(r["id"] for r in read_version(spark, tdir).collect())
        assert got == sorted(list(range(5)) + list(range(100, 105))
                             + list(range(200, 205)))


class TestGroupedScanFastPath:
    def test_same_schema_appends_read_as_one_scan(self, spark, tdir):
        """N same-schema unpartitioned appends must read as ONE
        multi-path relation, not an N-branch union (union analysis
        cost grows with the append count: measured 4.8 s plan build
        at 60 appends vs 0.1 s grouped). Schema evolution starts a
        new group and the groups union by name."""
        import re

        for i in range(6):
            write_version(_df(spark, i * 10, (i + 1) * 10), tdir,
                          "append")
        r = read_version(spark, tdir)
        plan = r._jdf.queryExecution().executedPlan().toString()
        paths = re.findall(r"InMemoryFileIndex\((\d+) paths\)", plan)
        assert paths == ["6"], plan[:1500]
        assert r.count() == 60
        # evolved append -> second group, still by-name correct
        write_version(_df(spark, 60, 65).withColumn("tag", F.lit("t")),
                      tdir, "append")
        r2 = read_version(spark, tdir)
        plan2 = r2._jdf.queryExecution().executedPlan().toString()
        paths2 = sorted(re.findall(r"InMemoryFileIndex\((\d+) paths\)",
                                   plan2))
        assert paths2 == ["1", "6"], plan2[:1500]
        got = {r_["id"]: r_["tag"] for r_ in r2.collect()}
        assert len(got) == 65 and got[62] == "t" and got[5] is None


class TestTxnIdempotence:
    def test_same_txn_commits_once(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import history

        v0 = write_version(_df(spark, 0, 5), tdir, "append",
                           txn=("app", 0))
        v1 = write_version(_df(spark, 5, 9), tdir, "append",
                           txn=("app", 1))
        # replaying batch 1 (at-least-once delivery) is a no-op that
        # returns the originally committed version
        again = write_version(_df(spark, 5, 9), tdir, "append",
                              txn=("app", 1))
        assert (v0, v1, again) == (0, 1, 1)
        assert len(history(tdir)) == 2
        assert read_version(spark, tdir).count() == 9
        # a DIFFERENT app replaying batch id 1 is a distinct txn
        v2 = write_version(_df(spark, 9, 10), tdir, "append",
                           txn=("other", 1))
        assert v2 == 2 and read_version(spark, tdir).count() == 10


class TestConcurrentReaders:
    def test_reader_thread_never_sees_torn_state(self, spark, tdir):
        """Pointer-swap atomicity under concurrency: a reader loop
        racing a committer must only ever observe counts from the
        committed-version set."""
        import threading

        write_version(_df(spark, 0, 5), tdir)
        valid = {5, 10, 15, 20}
        seen, errors = set(), []

        def reader():
            for _ in range(30):
                try:
                    seen.add(read_version(spark, tdir).count())
                except Exception as exc:  # torn read would surface here
                    errors.append(exc)

        th = threading.Thread(target=reader)
        th.start()
        for i in range(1, 4):
            write_version(_df(spark, 5 * i, 5 * (i + 1)), tdir, "append")
        th.join()
        assert not errors, errors[:2]
        assert seen <= valid and seen  # only committed snapshots


def test_daily_sales_versioned_flow(spark, sf_dir, tmp_path):
    """ETL flow through the versioned sink: rerun = new auditable
    version, identical data, previous run still time-travelable."""
    from data_platform_copilot_spark.pipelines import (
        daily_sales, daily_sales_versioned)
    from data_platform_copilot_spark.sources.versioned import history

    t = str(tmp_path / "daily_sales")
    v0 = daily_sales_versioned(spark, sf_dir, t,
                               "1996-01-01", "1997-01-01")
    plain = daily_sales(spark, sf_dir, str(tmp_path / "plain"),
                        "1996-01-01", "1997-01-01")
    assert sorted(map(tuple, v0.collect())) == sorted(
        map(tuple, plain.collect()))
    # rerun: atomic re-commit, history grows, old version readable
    daily_sales_versioned(spark, sf_dir, t, "1996-01-01", "1997-01-01")
    h = history(t)
    assert [m["version"] for m in h] == [0, 1]
    assert read_version(spark, t, version=0).count() == v0.count()


@pytest.mark.slow
class TestModelBasedRandomOps:
    """Model-based property test: a random sequence of append /
    overwrite / merge / merge-on-read / compact / idempotent-txn-
    append / vacuum operations must track a pure-Python dict model
    exactly (row set, per-version history, change feed, retention
    horizon), for every seed. Catches composition bugs no single-op
    test can — e.g. a MoR vector surviving an overwrite, or a CoW
    merge resurrecting vector-masked rows."""

    @pytest.mark.parametrize("seed", [1, 7, 23])
    def test_random_op_sequence_tracks_model(self, spark, tmp_path,
                                             seed):
        import random

        from data_platform_copilot_spark.sources.versioned import (
            merge_version, vacuum)

        rng = random.Random(seed)
        t = tmp_path / f"tbl_{seed}"
        model: dict[int, int] = {}          # id -> x (live version)
        snapshots: list[dict[int, int]] = []  # model per version
        oldest_readable = 0                 # retention horizon
        next_id = 0
        batch_no = 0

        def fresh_batch(n):
            nonlocal next_id
            rows = [(next_id + i, rng.randrange(1000)) for i in range(n)]
            next_id += n
            return rows

        write_version(spark.createDataFrame(
            fresh_batch(5), "id long, x long"), t)
        model = dict(
            (r["id"], r["x"]) for r in
            read_version(spark, t, version=0).collect())
        snapshots.append(dict(model))

        for _ in range(10):
            op = rng.choice(["append", "overwrite", "merge", "merge_mor",
                             "compact", "txn_append", "vacuum"])
            if op == "append":
                rows = fresh_batch(rng.randrange(1, 5))
                write_version(spark.createDataFrame(
                    rows, "id long, x long"), t, "append")
                model.update(dict(rows))
            elif op == "overwrite":
                rows = fresh_batch(rng.randrange(1, 5))
                write_version(spark.createDataFrame(
                    rows, "id long, x long"), t, "overwrite")
                model = dict(rows)
            elif op in ("merge", "merge_mor"):
                upd = [(k, rng.randrange(1000))
                       for k in rng.sample(sorted(model),
                                           min(2, len(model)))]
                upd += fresh_batch(1)
                merge_version(
                    spark, t, spark.createDataFrame(
                        upd, "id long, x long"), "id",
                    strategy="mor" if op == "merge_mor" else "cow")
                model.update(dict(upd))
            elif op == "txn_append":
                rows = fresh_batch(rng.randrange(1, 4))
                df = spark.createDataFrame(rows, "id long, x long")
                v1 = write_version(df, t, "append",
                                   txn=("model", batch_no))
                # at-least-once replay: MUST be a no-op version-wise
                v2 = write_version(df, t, "append",
                                   txn=("model", batch_no))
                assert v1 == v2
                batch_no += 1
                model.update(dict(rows))
            elif op == "vacuum":
                vacuum(t, keep_last=3, min_age_s=0)
                oldest_readable = max(oldest_readable,
                                      len(snapshots) - 3, 0)
                # no version created; live rows must be untouched
                got = {r["id"]: r["x"] for r in
                       read_version(spark, t).collect()}
                assert got == model, "vacuum harmed the live set"
                continue
            else:
                compact(spark, t, target_files=2)
                # model unchanged: compaction is a physical rewrite
            snapshots.append(dict(model))

            got = {r["id"]: r["x"] for r in
                   read_version(spark, t).collect()}
            assert got == model, f"live diverged after {op}"

        # every RETAINED version still matches its snapshot; versions
        # behind the retention horizon must raise, not misread
        for v, snap in enumerate(snapshots):
            if v < oldest_readable:
                with pytest.raises(VersionedTableError):
                    read_version(spark, t, version=v)
                continue
            got = {r["id"]: r["x"] for r in
                   read_version(spark, t, version=v).collect()}
            assert got == snap, f"time travel diverged at v{v}"

        # the change feed between every retained consecutive pair
        # matches the model's set algebra (compaction steps -> empty)
        from data_platform_copilot_spark.sources.versioned import (
            diff_versions)
        for v in range(oldest_readable, len(snapshots) - 1):
            a, b = snapshots[v], snapshots[v + 1]
            want = {**{k: "insert" for k in b.keys() - a.keys()},
                    **{k: "delete" for k in a.keys() - b.keys()},
                    **{k: "update" for k in a.keys() & b.keys()
                       if a[k] != b[k]}}
            got = {r["id"]: r["change_type"] for r in
                   diff_versions(spark, t, "id", v, v + 1).collect()}
            assert got == want, f"change feed diverged at v{v}->v{v+1}"


class TestDiffVersions:
    """diff_versions = table_changes between two snapshots: exact
    insert/delete/update classification from the immutable reads."""

    def test_change_feed_between_versions(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            diff_versions, merge_version)

        write_version(_df(spark, 0, 10), tdir)          # v0: ids 0-9
        updates = spark.createDataFrame(
            [(3, 999), (50, 777)], "id long, x long")
        merge_version(spark, tdir, updates, "id")       # v1
        got = {r["id"]: r["change_type"] for r in
               diff_versions(spark, tdir, "id", 0, 1).collect()}
        assert got == {3: "update", 50: "insert"}
        # deletes: overwrite drops ids >= 5
        write_version(_df(spark, 0, 5), tdir, "overwrite")  # v2
        got2 = {r["id"]: r["change_type"] for r in
                diff_versions(spark, tdir, "id", 1, 2).collect()}
        assert got2 == {3: "update",  # x back to 6 from 999
                        **{i: "delete" for i in (5, 6, 7, 8, 9, 50)}}
        # identical snapshots -> empty feed
        assert diff_versions(spark, tdir, "id", 2, 2).count() == 0

    def test_nullsafe_and_evolved_columns(self, spark, tdir):
        from pyspark.sql import functions as F

        from data_platform_copilot_spark.sources.versioned import (
            diff_versions)

        write_version(_df(spark, 0, 4), tdir)           # v0
        evolved = (_df(spark, 2, 6)
                   .withColumn("tag", F.when(F.col("id") % 2 == 0,
                                             F.lit("t"))))
        write_version(evolved, tdir, "overwrite")       # v1
        got = {r["id"]: r["change_type"] for r in
               diff_versions(spark, tdir, "id", 0, 1).collect()}
        # ids 0,1 deleted; 4,5 inserted; 2,3 unchanged on shared cols
        # (tag exists only in v1 and is not a shared column)
        assert got == {0: "delete", 1: "delete",
                       4: "insert", 5: "insert"}

    def test_all_null_row_presence(self, spark, tdir):
        """A row whose every compared column is NULL still exists:
        it must diff as update/delete, never vanish or read as an
        insert (explicit presence markers, not value-nullability)."""
        from data_platform_copilot_spark.sources.versioned import (
            diff_versions)

        v0 = spark.createDataFrame([(1, None), (2, 5)], "id long, x long")
        v1 = spark.createDataFrame([(1, 9), (3, None)], "id long, x long")
        write_version(v0, tdir)
        write_version(v1, tdir, "overwrite")
        got = {r["id"]: r["change_type"] for r in
               diff_versions(spark, tdir, "id", 0, 1).collect()}
        assert got == {1: "update", 2: "delete", 3: "insert"}


class TestEmptyMergeGuard:
    def test_empty_updates_is_a_noop_on_both_paths(self, spark, tdir):
        """An empty upsert batch must return the current version and
        publish NOTHING — on a partitioned table, partitionBy of a
        0-row frame writes a parquet-less dir, and a manifest over it
        would poison every later read (UNABLE_TO_INFER_SCHEMA)."""
        from data_platform_copilot_spark.sources.versioned import (
            history, merge_version)

        empty = spark.createDataFrame([], "id long, x long, part string")
        d = _df(spark, 0, 8).withColumn(
            "part", (F.col("id") % 2).cast("string"))
        write_version(d, tdir, partition_by=["part"])
        assert merge_version(spark, tdir, empty, "id") == 0
        assert len(history(tdir)) == 1
        assert read_version(spark, tdir).count() == 8  # still readable

        flat = tdir.parent / "flat"
        write_version(_df(spark, 0, 8), flat)
        assert merge_version(spark, flat,
                             empty.drop("part"), "id") == 0
        assert len(history(flat)) == 1

    def test_append_validation_failure_leaves_no_orphan_dir(
            self, spark, tdir):
        d = _df(spark, 0, 8).withColumn(
            "part", (F.col("id") % 2).cast("string"))
        write_version(d, tdir, partition_by=["part"])
        n_dirs = len(list(tdir.glob("data-*")))
        with pytest.raises(VersionedTableError, match="layout"):
            write_version(_df(spark, 8, 12), tdir, "append")
        # validation ran BEFORE the data write: nothing new on disk
        assert len(list(tdir.glob("data-*"))) == n_dirs


class TestMergeConflictResolution:
    def test_unpartitioned_merge_never_loses_interleaved_commit(
            self, spark, tdir):
        """The unpartitioned merge path has the same CAS contract as
        the partitioned one: an interleaved append between the
        merge's snapshot read and its publish raises CommitConflict
        (previously it delegated to write_version(overwrite), whose
        last-writer-wins retry would silently DROP the append)."""
        from unittest.mock import patch

        from data_platform_copilot_spark.sources import versioned
        from data_platform_copilot_spark.sources.versioned import (
            CommitConflict, merge_version)

        write_version(_df(spark, 0, 10), tdir)
        updates = spark.createDataFrame([(3, 999)], "id long, x long")
        real_read = versioned.read_version
        state = {"fired": False}

        def read_then_race(sp, td, version=None):
            out = real_read(sp, td, version=version)
            if not state["fired"]:
                state["fired"] = True
                write_version(_df(spark, 100, 103), tdir, "append")
            return out

        with patch.object(versioned, "read_version",
                          side_effect=read_then_race):
            with pytest.raises(CommitConflict):
                merge_version(spark, tdir, updates, "id")
        # nothing lost: the interleaved append is the latest
        assert read_version(spark, tdir).count() == 13

    def test_merge_retry_recomputes_against_new_latest(self, spark,
                                                       tdir):
        """retries=1 resolves the conflict the sound way: the merge
        RE-RUNS against the post-append snapshot, so the result holds
        both the interleaved rows and the upsert."""
        from unittest.mock import patch

        from data_platform_copilot_spark.sources import versioned
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 10), tdir)
        updates = spark.createDataFrame(
            [(3, 999), (200, 7)], "id long, x long")
        real_read = versioned.read_version
        state = {"fired": False}

        def read_then_race(sp, td, version=None):
            out = real_read(sp, td, version=version)
            if not state["fired"]:
                state["fired"] = True
                write_version(_df(spark, 100, 103), tdir, "append")
            return out

        with patch.object(versioned, "read_version",
                          side_effect=read_then_race):
            v = merge_version(spark, tdir, updates, "id", retries=1)
        got = {r["id"]: r["x"] for r in read_version(spark, tdir).collect()}
        assert v == 2                       # append took v1, merge v2
        assert got[3] == 999 and got[200] == 7
        assert all(got[i] == i * 2 for i in (100, 101, 102))  # kept
        assert len(got) == 14
        # no orphaned data dirs: every dir on disk is referenced by
        # some retained manifest (the stale rewrite was cleaned up)
        from data_platform_copilot_spark.sources.versioned import history
        live = set()
        for m in history(tdir):
            live.update(p.split("/")[0] for p in m["data_dirs"])
        assert {d.name for d in tdir.glob("data-*")} == live


def _process_committer(args):
    """Module-level so multiprocessing can pickle it: race N manifest
    publishes from a separate PROCESS (no shared GIL, real cross-
    process filesystem atomics)."""
    table_dir, worker_id, n_commits = args
    import sys
    sys.path.insert(0, ".")
    from pathlib import Path

    from data_platform_copilot_spark.sources.versioned import (
        CommitConflict, _publish_manifest, latest_version)

    root = Path(table_dir)
    won = []
    for i in range(n_commits):
        while True:
            prev = latest_version(root)
            version = 0 if prev is None else prev + 1
            try:
                _publish_manifest(root, {
                    "version": version, "mode": "append",
                    "data_dirs": [f"data-{version}-w{worker_id}-{i}"],
                    "schema": {}, "partition_by": []})
                won.append(version)
                break
            except CommitConflict:
                continue
    return won


class TestCrossProcessCAS:
    def test_manifest_cas_across_processes(self, tmp_path):
        """4 separate PROCESSES x 10 commits racing on one table dir:
        the os.link create-if-absent commit must hand out all 40
        version numbers exactly once with no gaps — the cross-process
        guarantee the threaded test cannot establish."""
        import multiprocessing as mp

        table = tmp_path / "race"
        table.mkdir()
        with mp.get_context("spawn").Pool(4) as pool:
            results = pool.map(_process_committer,
                               [(str(table), w, 10) for w in range(4)])
        all_versions = sorted(v for r in results for v in r)
        assert all_versions == list(range(40))  # exactly-once, no gaps
        from data_platform_copilot_spark.sources.versioned import (
            latest_version)
        assert latest_version(table) == 39


class TestCompactConflict:
    def test_compact_never_loses_interleaved_append(self, spark, tdir):
        """compact() is read-compute-publish like merge: a commit
        interleaving mid-compaction must raise CommitConflict, not be
        silently dropped by overwrite's last-writer-wins retry; with
        retries=1 the compaction re-runs over the new latest."""
        from unittest.mock import patch

        from data_platform_copilot_spark.sources import versioned
        from data_platform_copilot_spark.sources.versioned import (
            CommitConflict, compact)

        write_version(_df(spark, 0, 10).repartition(4), tdir)
        write_version(_df(spark, 10, 20).repartition(4), tdir, "append")
        real_read = versioned.read_version
        state = {"n": 0}

        def read_then_race(sp, td, version=None):
            out = real_read(sp, td, version=version)
            if state["n"] == 0:
                state["n"] += 1
                write_version(_df(spark, 100, 105), tdir, "append")
            return out

        with patch.object(versioned, "read_version",
                          side_effect=read_then_race):
            with pytest.raises(CommitConflict):
                compact(spark, tdir, target_files=1)
        assert read_version(spark, tdir).count() == 25  # nothing lost

        state["n"] = 0
        with patch.object(versioned, "read_version",
                          side_effect=read_then_race):
            v = compact(spark, tdir, target_files=1, retries=1)
        got = read_version(spark, tdir)
        # second interleaved append (ids 100-104 again -> dup rows by
        # design: append semantics) + compaction of everything
        assert got.count() == 30
        assert len(got.inputFiles()) == 1
        assert latest_version(tdir) == v


class TestChangeDataFeedRefresh:
    """include_values=True turns the diff into a Change Data Feed;
    an aggregate refreshes from the feed's +new/-old deltas and must
    equal a full recompute — incremental view maintenance over
    versioned snapshots without rescanning the table."""

    def test_cdf_values_and_incremental_agg_refresh(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            diff_versions, merge_version)

        base = spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(30)],
            "id long, grp long, val double")
        write_version(base, tdir)                             # v0
        updates = spark.createDataFrame(
            [(4, 1, 100.0),    # update: grp 1, val 4 -> 100
             (50, 2, 7.0)],    # insert into grp 2
            "id long, grp long, val double")
        merge_version(spark, tdir, updates, "id")             # v1

        cdf = diff_versions(spark, tdir, "id", 0, 1,
                            include_values=True)
        got = {r["id"]: r.asDict() for r in cdf.collect()}
        assert set(got) == {4, 50}
        assert got[4]["change_type"] == "update"
        assert (got[4]["old_val"], got[4]["new_val"]) == (4.0, 100.0)
        assert got[50]["change_type"] == "insert"
        assert got[50]["old_val"] is None and got[50]["new_val"] == 7.0

        # incremental refresh: v0 aggregate + feed deltas == v1 agg
        agg0 = (read_version(spark, tdir, version=0)
                .groupBy("grp").agg(F.sum("val").alias("s"),
                                    F.count("*").alias("n")))
        delta = (cdf.select(
            F.coalesce("new_grp", "old_grp").alias("grp"),
            (F.coalesce("new_val", F.lit(0.0))
             - F.coalesce("old_val", F.lit(0.0))).alias("ds"),
            (F.col("new_val").isNotNull().cast("long")
             - F.col("old_val").isNotNull().cast("long")).alias("dn"))
            .groupBy("grp").agg(F.sum("ds").alias("ds"),
                                F.sum("dn").alias("dn")))
        refreshed = (agg0.join(delta, "grp", "full_outer")
                     .select("grp",
                             (F.coalesce("s", F.lit(0.0))
                              + F.coalesce("ds", F.lit(0.0))).alias("s"),
                             (F.coalesce("n", F.lit(0))
                              + F.coalesce("dn", F.lit(0))).alias("n")))
        recomputed = (read_version(spark, tdir, version=1)
                      .groupBy("grp").agg(F.sum("val").alias("s"),
                                          F.count("*").alias("n")))
        assert sorted(map(tuple, refreshed.collect())) == \
            sorted(map(tuple, recomputed.collect()))

    def test_cdf_update_moving_groups(self, spark, tdir):
        """An update that MOVES a row between groups must show both
        sides in the feed (old grp decremented, new grp incremented
        through old_/new_ columns)."""
        from data_platform_copilot_spark.sources.versioned import (
            diff_versions, merge_version)

        write_version(spark.createDataFrame(
            [(1, 10, 5.0), (2, 20, 6.0)],
            "id long, grp long, val double"), tdir)
        merge_version(spark, tdir, spark.createDataFrame(
            [(1, 20, 5.0)], "id long, grp long, val double"), "id")
        row = diff_versions(spark, tdir, "id", 0, 1,
                            include_values=True).collect()
        assert len(row) == 1 and row[0]["change_type"] == "update"
        assert (row[0]["old_grp"], row[0]["new_grp"]) == (10, 20)


class TestCheckpoints:
    """r10: manifest-log checkpoints (the Delta log checkpoint recipe)
    make txn commits O(checkpoint interval) manifest reads instead of
    O(table age), and preserve txn idempotence memory past vacuum."""

    @staticmethod
    def _synthetic_commits(root, n, app="app", schema=None):
        """Publish n append manifests through the real commit point
        (no Spark data write — the read-count contract never opens
        data files), each carrying a txn record."""
        from data_platform_copilot_spark.sources.versioned import (
            _publish_manifest, latest_version)
        schema = schema or {"id": "bigint", "x": "bigint"}
        start = (latest_version(root) or -1) + 1
        for i in range(start, start + n):
            d = f"data-{i}-synth{i:04d}"
            _publish_manifest(root, {
                "version": i, "mode": "append",
                "data_dirs": [d] if i == start else None or [d],
                "schema": schema, "partition_by": [],
                "dir_schemas": {d: schema},
                "txn": {"app": app, "batch": i}})
        return start + n - 1

    def test_commit_reads_o1_manifests_at_200_versions(
            self, spark, tmp_path, monkeypatch):
        from pathlib import Path as _P

        from data_platform_copilot_spark.sources import versioned as V

        t = tmp_path / "aged"
        t.mkdir()
        last = self._synthetic_commits(t, 201)
        assert last == 200
        # checkpoints were rolled every _CHECKPOINT_INTERVAL commits
        assert (t / "checkpoint-200.json").exists()

        counts = {"manifest": 0}
        orig = _P.read_text

        def counting(self, *a, **k):
            if self.name.startswith("manifest-"):
                counts["manifest"] += 1
            return orig(self, *a, **k)

        monkeypatch.setattr(_P, "read_text", counting)
        df = spark.createDataFrame([(1, 2)], "id long, x long")
        v = write_version(df, t, "append", txn=("app", 999))
        assert v == 201
        # txn lookup = checkpoint + tail; append validation +
        # retry-loop recomposition read the prev manifest once each.
        # Without checkpoints this was > 200 reads.
        bound = 2 * V._CHECKPOINT_INTERVAL + 6
        assert counts["manifest"] <= bound, counts
        # replay of the same txn is a no-op with the same bound
        counts["manifest"] = 0
        v2 = write_version(df, t, "append", txn=("app", 999))
        assert v2 == 201
        assert counts["manifest"] <= bound, counts

    @pytest.mark.slow
    def test_txn_replay_stays_deduplicated_past_vacuum(
            self, spark, tmp_path):
        t = tmp_path / "tbl"
        df = spark.createDataFrame([(1, 2)], "id long, x long")
        versions = {}
        for b in range(13):
            versions[b] = write_version(df, t, "append", txn=("app", b))
        # push latest past the txn commits, then vacuum hard
        write_version(df, t, "overwrite")
        write_version(df, t, "append")
        vacuum(t, keep_last=1, min_age_s=0)
        assert len(history(t)) == 1
        # vacuum rolled a checkpoint at the snapshot latest, so the
        # high-water (app, 12) replay is still a no-op...
        v = write_version(df, t, "append", txn=("app", 12))
        assert v == versions[12]
        assert len(history(t)) == 1
        # ...and a sub-high-water replay is reported committed (the
        # exact version degraded to the high-water's — Delta's
        # monotone txnVersion contract)
        v = write_version(df, t, "append", txn=("app", 5))
        assert v == versions[12]
        assert len(history(t)) == 1
        # a genuinely NEW batch still commits
        v = write_version(df, t, "append", txn=("app", 13))
        assert len(history(t)) == 2

    def test_vacuum_never_unlinks_concurrently_published_manifest(
            self, spark, tdir, monkeypatch):
        """ADVICE r9 (medium): vacuum snapshotted keep_versions, then
        unlinked EVERY manifest outside it — including one published
        by a concurrent committer after the snapshot. Simulate the
        race at its widest window: the committer lands right after
        vacuum's latest_version() snapshot."""
        from data_platform_copilot_spark.sources import versioned as V

        for i in range(4):
            write_version(_df(spark, i, i + 1), tdir, "append")
        snap = latest_version(tdir)
        orig = V.latest_version
        fired = {}

        def racing(table_dir):
            v = orig(table_dir)
            if not fired:
                fired["v"] = v
                V._publish_manifest(V.Path(tdir), {
                    "version": v + 1, "mode": "append",
                    "data_dirs": ["data-race-xyz"],
                    "schema": {"id": "bigint", "x": "bigint"},
                    "partition_by": [],
                    "dir_schemas": {"data-race-xyz":
                                    {"id": "bigint", "x": "bigint"}}})
            return v

        monkeypatch.setattr(V, "latest_version", racing)
        vacuum(tdir, keep_last=1, min_age_s=0)
        monkeypatch.undo()
        # the concurrent commit survived vacuum
        assert latest_version(tdir) == snap + 1
        assert (V.Path(tdir) / f"manifest-{snap + 1}.json").exists()
        # and the retained window floor still held for old manifests
        assert not (V.Path(tdir) / "manifest-0.json").exists()


class TestMergeOnRead:
    """merge_version(strategy="mor"): deletion-vector upserts — write
    only the update rows + a key-tombstone sidecar; earlier dirs are
    masked at read time by position (after_index), never rewritten."""

    def _write(self, spark, tdir):
        d = _df(spark, 0, 40).withColumn(
            "part", (F.col("id") % 4).cast("string"))
        write_version(d, tdir, partition_by=["part"])

    @staticmethod
    def _dir_bytes(p):
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())

    def test_mor_merge_rewrites_nothing_and_upserts(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._write(spark, tdir)
        root = tdir / history(tdir)[0]["data_dirs"][0]
        before = {f: f.read_bytes() for f in root.rglob("*.parquet")}
        updates = spark.createDataFrame(
            [(1, 111, "1"), (5, 555, "1"), (101, 101, "1")],
            "id long, x long, part string")
        v = merge_version(spark, tdir, updates, "id", strategy="mor")
        m = history(tdir)[-1]
        assert m["mode"] == "merge-mor"
        assert len(m["delete_vectors"]) == 1
        dv = m["delete_vectors"][0]
        assert dv["key"] == "id" and dv["after_index"] == 1
        # v0's files byte-identical: NOTHING was rewritten
        assert {f: f.read_bytes() for f in root.rglob("*.parquet")} \
            == before
        # merge bytes = update rows + tombstone keys only
        merge_bytes = (self._dir_bytes(tdir / m["data_dirs"][-1])
                       + self._dir_bytes(tdir / dv["dir"]))
        assert merge_bytes < self._dir_bytes(root)
        got = {r["id"]: (r["x"], r["part"]) for r in
               read_version(spark, tdir).collect()}
        assert len(got) == 41
        assert got[1] == (111, "1") and got[5] == (555, "1")
        assert got[101] == (101, "1")
        assert got[2] == (4, "2")  # unmatched keys untouched
        # time travel to pre-merge unaffected by the vector
        assert len(read_version(spark, tdir, version=0).collect()) == 40
        assert v == 1

    def test_stacked_mor_merges_latest_wins(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._write(spark, tdir)
        u1 = spark.createDataFrame(
            [(1, 111, "1"), (2, 222, "2")], "id long, x long, part string")
        u2 = spark.createDataFrame(
            [(2, 2222, "2"), (3, 3333, "3")],
            "id long, x long, part string")
        merge_version(spark, tdir, u1, "id", strategy="mor")
        merge_version(spark, tdir, u2, "id", strategy="mor")
        rows = read_version(spark, tdir).collect()
        got = {r["id"]: r["x"] for r in rows}
        assert len(rows) == len(got) == 40  # exactly one row per key
        assert got[1] == 111          # u1's update survives
        assert got[2] == 2222         # u2 overrides u1 (latest wins)
        assert got[3] == 3333

    def test_append_after_mor_is_never_masked(self, spark, tdir):
        """Positional semantics: a vector masks only dirs BEFORE its
        merge point — a later append re-inserting a masked key must
        survive (and the pre-merge row of that key must stay dead)."""
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 10), tdir)
        merge_version(
            spark, tdir,
            spark.createDataFrame([(3, 999)], "id long, x long"),
            "id", strategy="mor")
        write_version(
            spark.createDataFrame([(3, 42)], "id long, x long"),
            tdir, "append")
        rows = sorted((r["id"], r["x"]) for r in
                      read_version(spark, tdir).collect())
        threes = [x for i, x in rows if i == 3]
        assert sorted(threes) == [42, 999]  # merge row AND appended row
        assert (3, 6) not in rows           # original stays masked
        assert len(rows) == 11

    def test_compact_folds_delete_vectors(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._write(spark, tdir)
        merge_version(
            spark, tdir,
            spark.createDataFrame([(1, 111, "1")],
                                  "id long, x long, part string"),
            "id", strategy="mor")
        want = sorted((r["id"], r["x"]) for r in
                      read_version(spark, tdir).collect())
        compact(spark, tdir)
        m = history(tdir)[-1]
        assert "delete_vectors" not in m
        assert sorted((r["id"], r["x"]) for r in
                      read_version(spark, tdir).collect()) == want

    def test_cow_merge_folds_delete_vectors(self, spark, tdir):
        """Alternating strategies is legal: the first CoW merge after
        a MoR run pays a full rewrite and publishes a vector-free
        manifest (the partition-scoped carry-forward would resurrect
        masked rows, so it must not be used over live vectors)."""
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._write(spark, tdir)
        merge_version(
            spark, tdir,
            spark.createDataFrame([(1, 111, "1")],
                                  "id long, x long, part string"),
            "id", strategy="mor")
        merge_version(
            spark, tdir,
            spark.createDataFrame([(2, 222, "2")],
                                  "id long, x long, part string"),
            "id")  # CoW
        m = history(tdir)[-1]
        assert m["mode"] == "merge" and "delete_vectors" not in m
        got = {r["id"]: r["x"] for r in read_version(spark, tdir).collect()}
        assert len(got) == 40
        assert got[1] == 111 and got[2] == 222  # both upserts held

    def test_vacuum_keeps_live_tombstones_drops_folded(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._write(spark, tdir)
        merge_version(
            spark, tdir,
            spark.createDataFrame([(1, 111, "1")],
                                  "id long, x long, part string"),
            "id", strategy="mor")
        vacuum(tdir, keep_last=1, min_age_s=0)
        # the vector's sidecar is referenced by the retained manifest
        dv_dir = history(tdir)[-1]["delete_vectors"][0]["dir"]
        assert (tdir / dv_dir).exists()
        assert {r["id"] for r in read_version(spark, tdir).collect()} \
            == set(range(40))  # still exactly the 40 original keys
        compact(spark, tdir)
        vacuum(tdir, keep_last=1, min_age_s=0)
        assert not list(tdir.glob("delete-*"))  # folded -> collected

    def test_mor_conflict_recomposes_like_append(self, spark, tdir,
                                                 monkeypatch):
        """A commit interleaving between the MoR merge's snapshot and
        its publish must NOT raise CommitConflict: the mask is defined
        relative to whatever precedes it, so the merge recomposes
        against the new latest (append serialized first -> its rows
        of non-updated keys survive; the updated key still resolves to
        the merge)."""
        from data_platform_copilot_spark.sources import versioned as V
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 10), tdir)
        state = {"fired": False}
        real = V._validate_append

        def validate_then_race(prev_manifest, schema, partition_by):
            out = real(prev_manifest, schema, partition_by)
            if not state["fired"]:
                state["fired"] = True
                write_version(_df(spark, 100, 103), tdir, "append")
            return out

        monkeypatch.setattr(V, "_validate_append", validate_then_race)
        v = merge_version(
            spark, tdir,
            spark.createDataFrame([(3, 999)], "id long, x long"),
            "id", strategy="mor")
        monkeypatch.undo()
        assert v == 2  # append took 1, merge recomposed onto 2
        got = {r["id"]: r["x"] for r in read_version(spark, tdir).collect()}
        assert len(got) == 13      # 10 base + 3 interleaved, 1 upserted
        assert got[3] == 999 and got[100] == 200


class TestVacuumCheckpointGuard:
    def test_failed_checkpoint_blocks_manifest_deletion(
            self, spark, tdir, monkeypatch):
        """vacuum must not erase the only copy of txn records: when
        the checkpoint roll fails (ENOSPC, corrupt manifest in range),
        manifests are retained — and their data dirs stay live so
        nothing dangles — while a later healthy vacuum trims as
        usual."""
        from data_platform_copilot_spark.sources import versioned as V

        for i in range(4):
            write_version(_df(spark, i * 10, i * 10 + 5), tdir,
                          "append" if i else "overwrite",
                          txn=("guard", i))
        monkeypatch.setattr(V, "_write_checkpoint",
                            lambda root, v: False)
        deleted = vacuum(tdir, keep_last=1, min_age_s=0)
        monkeypatch.undo()
        assert deleted == []  # every dir referenced by SOME manifest
        for i in range(4):
            assert (V.Path(tdir) / f"manifest-{i}.json").exists()
        # txn memory intact: a replay is still a no-op
        v = write_version(_df(spark, 0, 5), tdir, "append",
                          txn=("guard", 1))
        assert v == 1
        # healthy vacuum afterwards trims normally
        vacuum(tdir, keep_last=1, min_age_s=0)
        assert not (V.Path(tdir) / "manifest-0.json").exists()

    def test_txn_fallback_requires_vacuumed_gap(self, spark, tdir):
        """With the FULL manifest history intact, a sub-high-water
        batch no manifest records was genuinely never committed —
        _txn_committed must return None (commit proceeds), not
        swallow it as a duplicate; after vacuum opens a real gap the
        high-water fallback applies."""
        from data_platform_copilot_spark.sources.versioned import (
            _txn_committed, latest_version)
        from data_platform_copilot_spark.sources import versioned as V

        batches = [b for b in range(13) if b != 5]
        for j, b in enumerate(batches):
            write_version(_df(spark, j * 10, j * 10 + 3), tdir,
                          "append" if j else "overwrite",
                          txn=("gap", b))
        root = V.Path(tdir)
        assert list(root.glob("checkpoint-*.json"))  # interval crossed
        v = latest_version(root)
        # full history: the skipped batch is NOT reported committed
        assert _txn_committed(root, v, ("gap", 5)) is None
        # a real committed batch resolves exactly
        assert _txn_committed(root, v, ("gap", 3)) == 3
        vacuum(tdir, keep_last=1, min_age_s=0)
        # history vacuumed: sub-high-water unknowns degrade to the
        # high-water version (the documented Delta-style contract)
        got = _txn_committed(root, latest_version(root), ("gap", 5))
        assert got is not None


class TestMorEvolvedKey:
    def test_mor_merge_on_column_older_dirs_never_had(self, spark, tdir):
        """A MoR merge keyed on an additively-evolved column must not
        poison reads: segments whose dirs never carried the key have
        no maskable rows (the anti-join is skipped there), rows with
        a NULL key survive via join semantics, and same-key rows in
        NEWER dirs still mask correctly."""
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 5), tdir)  # columns (id, x)
        u1 = spark.createDataFrame(
            [(100, 1, "u-a"), (101, 2, "u-b")], "id long, x long, uid string")
        merge_version(spark, tdir, u1, "uid", strategy="mor")
        got = {r["id"]: (r["x"], r["uid"]) for r in
               read_version(spark, tdir).collect()}
        assert len(got) == 7                     # nothing masked
        assert got[2] == (4, None)               # old rows: NULL uid
        assert got[100] == (1, "u-a")
        # a second MoR merge re-keying an existing uid masks u1's row
        u2 = spark.createDataFrame(
            [(200, 9, "u-a")], "id long, x long, uid string")
        merge_version(spark, tdir, u2, "uid", strategy="mor")
        got = {r["uid"]: r["id"] for r in
               read_version(spark, tdir).collect() if r["uid"]}
        assert got == {"u-a": 200, "u-b": 101}   # latest u-a wins
        # compact folds cleanly despite the evolved key: 5 originals
        # + u1's surviving u-b + u2's u-a (u1's u-a row stays masked)
        compact(spark, tdir)
        assert read_version(spark, tdir).count() == 7


class TestMorTxnIdempotence:
    def test_replayed_mor_merge_is_version_noop(self, spark, tdir):
        """txn=(app,batch) on a MoR merge: an at-least-once foreachBatch
        replay must add NO version, NO data dir, NO vector (without txn
        a replay is value-idempotent but bloats history)."""
        from data_platform_copilot_spark.sources.versioned import (
            latest_version, merge_version)

        write_version(_df(spark, 0, 10), tdir)
        u = spark.createDataFrame([(3, 999), (50, 777)],
                                  "id long, x long")
        v1 = merge_version(spark, tdir, u, "id", strategy="mor",
                           txn=("cdc", 0))
        v2 = merge_version(spark, tdir, u, "id", strategy="mor",
                           txn=("cdc", 0))
        assert v1 == v2 == 1
        assert latest_version(tdir) == 1
        m = history(tdir)[-1]
        assert len(m["delete_vectors"]) == 1
        got = {r["id"]: r["x"] for r in read_version(spark, tdir).collect()}
        assert len(got) == 11 and got[3] == 999
        # next batch commits normally
        v3 = merge_version(
            spark, tdir,
            spark.createDataFrame([(4, 888)], "id long, x long"),
            "id", strategy="mor", txn=("cdc", 1))
        assert v3 == 2

    def test_txn_on_cow_merge_rejected(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 5), tdir)
        with pytest.raises(VersionedTableError, match="mor"):
            merge_version(spark, tdir, _df(spark, 0, 1), "id",
                          txn=("cdc", 0))

    def test_masked_read_uses_broadcast_anti_join(self, spark, tdir):
        """The 100 TB read contract: the deletion-vector mask must be
        a BroadcastHashJoin LeftAnti (tombstones broadcast), never a
        shuffled join of the full table."""
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 20), tdir)
        merge_version(spark, tdir,
                      spark.createDataFrame([(3, 9)], "id long, x long"),
                      "id", strategy="mor")
        plan = (read_version(spark, tdir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan


class TestZoneMapSkipping:
    """Zone-map data skipping: per-dir [min,max] column stats harvested
    from parquet footers at commit time (no extra Spark job), consumed
    by read_version(skip=[(col, op, value)]) as a manifest-level dir
    pruner + exact row filter."""

    def _appends(self, spark, tdir, n=4, width=10):
        for i in range(n):
            write_version(_df(spark, i * width, (i + 1) * width), tdir,
                          "append" if i else "overwrite")

    def test_stats_recorded_per_dir(self, spark, tdir):
        self._appends(spark, tdir)
        m = history(tdir)[-1]
        assert set(m["dir_stats"]) == set(m["data_dirs"])
        spans = sorted(tuple(s["id"]) for s in m["dir_stats"].values())
        assert spans == [(0, 9), (10, 19), (20, 29), (30, 39)]

    def test_skip_prunes_dirs_and_matches_plain_filter(self, spark, tdir):
        self._appends(spark, tdir)
        skipped = read_version(spark, tdir, skip=[("id", ">=", 25)])
        plain = read_version(spark, tdir).where(F.col("id") >= 25)
        assert sorted(r["id"] for r in skipped.collect()) \
            == sorted(r["id"] for r in plain.collect())
        # the pruned plan touches only the 2 dirs that can match
        dirs_hit = {f.split("/data-")[1].split("/")[0]
                    for f in skipped.inputFiles()}
        assert len(dirs_hit) == 2
        # the plain .where path now prunes too (auto pushdown, r11)
        assert len({f.split("/data-")[1].split("/")[0]
                    for f in plain.inputFiles()}) == 2
        # empty-proof predicate: zero dirs, correct empty schema
        none = read_version(spark, tdir, skip=[("id", ">", 1000)])
        assert none.count() == 0
        assert set(none.columns) == {"id", "x"}

    def test_skip_is_exact_not_just_dir_level(self, spark, tdir):
        self._appends(spark, tdir)
        # 25 lands inside dir 2 (20..29): dir kept, rows filtered
        got = sorted(r["id"] for r in read_version(
            spark, tdir, skip=[("id", "=", 25)]).collect())
        assert got == [25]

    def test_statless_dirs_are_always_kept(self, spark, tdir):
        from data_platform_copilot_spark.sources import versioned as V

        write_version(_df(spark, 0, 10), tdir)
        # simulate a writer whose stats harvest failed (returns empty)
        orig = V._harvest_all
        V._harvest_all = lambda root, d: ({}, {})
        try:
            write_version(_df(spark, 100, 110), tdir, "append")
        finally:
            V._harvest_all = orig
        got = sorted(r["id"] for r in read_version(
            spark, tdir, skip=[("id", ">=", 100)]).collect())
        assert got == list(range(100, 110))  # stat-less dir survived

    def test_skip_composes_with_deletion_vectors(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._appends(spark, tdir, n=3)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555), (25, 2525)],
                                            "id long, x long"),
                      "id", strategy="mor")
        got = {r["id"]: r["x"] for r in read_version(
            spark, tdir, skip=[("id", "<", 10)]).collect()}
        assert got == {**{i: 2 * i for i in range(10) if i != 5}, 5: 555}


class TestSortByFileSkipping:
    """write_version(sort_by=[col]) range-clusters files so their zone
    maps carry disjoint ranges; read_version(skip=...) then prunes at
    FILE granularity inside the dir."""

    def test_sorted_commit_records_disjoint_file_stats(self, spark, tdir):
        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"])
        m = history(tdir)[-1]
        d = m["data_dirs"][0]
        fs = m["file_stats"][d]
        spans = sorted(tuple(st["id"]) for st in fs.values())
        assert len(spans) >= 2
        for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
            assert ahi < blo  # disjoint, ordered ranges
        assert spans[0][0] == 0 and spans[-1][1] == 999

    def test_point_range_read_touches_one_file(self, spark, tdir):
        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"])
        m = history(tdir)[-1]
        n_files = len(m["file_stats"][m["data_dirs"][0]])
        assert n_files >= 4
        skipped = read_version(spark, tdir,
                               skip=[("id", ">=", 5), ("id", "<=", 7)])
        assert len(skipped.inputFiles()) == 1  # one disjoint slice
        assert sorted(r["id"] for r in skipped.collect()) == [5, 6, 7]
        # equality with the plain filter, which now prunes to the
        # same single file via auto pushdown (r11)
        plain = (read_version(spark, tdir)
                 .where((F.col("id") >= 5) & (F.col("id") <= 7)))
        assert len(plain.inputFiles()) == 1
        assert sorted(r["id"] for r in plain.collect()) == [5, 6, 7]

    def test_uncovered_file_disables_file_pruning_only(self, spark, tdir):
        """A parquet file missing from the recorded file stats must
        disable FILE pruning for that dir (never drop unknown data) —
        dir-level pruning still applies."""
        import json as _json

        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"])
        mp = tdir / "manifest-0.json"
        m = _json.loads(mp.read_text())
        d = m["data_dirs"][0]
        m["file_stats"][d].popitem()  # stats no longer cover the dir
        mp.write_text(_json.dumps(m))
        skipped = read_version(spark, tdir, skip=[("id", "<=", 3)])
        assert sorted(r["id"] for r in skipped.collect()) == [0, 1, 2, 3]
        # all files scanned: file pruning correctly disabled
        n_files = len(list((tdir / d).glob("*.parquet")))
        assert len(skipped.inputFiles()) == n_files

    def test_sort_by_with_partition_by_rejected(self, spark, tdir):
        with pytest.raises(VersionedTableError, match="sort_by"):
            write_version(
                _df(spark, 0, 10).withColumn("p", F.lit("a")), tdir,
                "overwrite", partition_by=["p"], sort_by=["id"])


class TestZoneMapEdgeCases:
    """Review-found stats hazards: NaN bounds, nested-leaf name
    collisions, file-stats survival across MoR merges."""

    def test_nan_column_never_prunes_matching_rows(self, spark, tdir):
        """Spark's parquet writer emits max=NaN when a NaN is present;
        a NaN bound must poison that column's zone map (pruning with
        it silently drops the finite matching rows)."""
        df = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, float("nan"))], "id long, x double")
        write_version(df, tdir, "overwrite")
        m = history(tdir)[-1]
        d = m["data_dirs"][0]
        assert "x" not in m.get("dir_stats", {}).get(d, {})
        assert "id" in m["dir_stats"][d]  # clean column still mapped
        got = sorted(r["id"] for r in read_version(
            spark, tdir, skip=[("x", ">", 1.5)]).collect())
        # == plain .where semantics: Spark orders NaN ABOVE all values,
        # so both the finite 2.0 row and the NaN row match — pruning on
        # a NaN-poisoned bound would have dropped the whole dir
        plain = sorted(r["id"] for r in read_version(spark, tdir)
                       .where(F.col("x") > 1.5).collect())
        assert got == plain == [2, 3]

    def test_nested_struct_leaf_does_not_collide_or_crash(self, spark,
                                                          tdir):
        """A struct field sharing its leaf name with a top-level column
        of a different type must neither crash the commit (TypeError in
        the min/max fold) nor pollute the top-level column's range."""
        df = spark.sql(
            "SELECT id, named_struct('id', CAST(id AS STRING)) AS s "
            "FROM range(5, 15)")
        v = write_version(df, tdir, "overwrite")
        assert v == 0
        m = history(tdir)[-1]
        st = m["dir_stats"][m["data_dirs"][0]]
        assert st["id"] == [5, 14]  # top-level range, unpolluted
        assert "s" not in st and "s.id" not in st
        got = sorted(r["id"] for r in read_version(
            spark, tdir, skip=[("id", ">=", 10)]).collect())
        assert got == list(range(10, 15))

    def test_file_stats_survive_mor_merge(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"], sort_files=8)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555)], "id long, x long"),
                      "id", strategy="mor")
        m = history(tdir)[-1]
        assert m["data_dirs"][0] in m.get("file_stats", {})
        skipped = read_version(spark, tdir,
                               skip=[("id", ">=", 900)])
        # sorted dir contributes 1 file; the merge's update dir adds
        # its own (tiny, unsorted) scan
        sorted_dir_files = [f for f in skipped.inputFiles()
                            if m["data_dirs"][0] in f]
        assert len(sorted_dir_files) == 1
        assert sorted(r["id"] for r in skipped.collect()) \
            == list(range(900, 1000))

    def test_sort_files_controls_file_count(self, spark, tdir):
        write_version(_df(spark, 0, 100), tdir, "overwrite",
                      sort_by=["id"], sort_files=4)
        m = history(tdir)[-1]
        assert len(m["file_stats"][m["data_dirs"][0]]) == 4


class TestSkipPredicateValidation:
    def test_nan_predicate_value_never_prunes(self, spark, tdir):
        """Pruning must not fire on a NaN literal (Python comparisons
        to NaN are all False; Spark orders NaN above everything) —
        result stays exactly == plain .where."""
        write_version(_df(spark, 0, 10).withColumn(
            "x", F.col("x").cast("double")), tdir, "overwrite")
        nan = float("nan")
        got = read_version(spark, tdir, skip=[("x", "<", nan)]).count()
        plain = (read_version(spark, tdir)
                 .where(F.col("x") < nan).count())
        assert got == plain  # both honor Spark NaN semantics

    def test_sort_files_without_sort_by_rejected(self, spark, tdir):
        with pytest.raises(VersionedTableError, match="sort_files"):
            write_version(_df(spark, 0, 10), tdir, "overwrite",
                          sort_files=4)
        with pytest.raises(VersionedTableError, match="sort_files"):
            write_version(_df(spark, 0, 10), tdir, "overwrite",
                          sort_by=["id"], sort_files=0)


def _process_mor_merger(args):
    """Module-level for multiprocessing: run N MoR merges from a
    separate PROCESS with its own SparkSession — real cross-process
    CAS recomposition, not a monkeypatched race."""
    table_dir, worker_id, n_merges = args
    import sys
    from pathlib import Path as _P
    # absolute repo root, not cwd: spawn children inherit sys.path,
    # but pin it explicitly so the helper never depends on pytest's
    # invocation directory
    sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
    from pyspark.sql import SparkSession

    from data_platform_copilot_spark.sources.versioned import (
        merge_version)

    spark = (SparkSession.builder.master("local[2]")
             .appName(f"mor-race-{worker_id}")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "2")
             .getOrCreate())
    won = []
    try:
        for i in range(n_merges):
            upd = spark.createDataFrame(
                [(worker_id * 100 + i, 1000 * worker_id + i)],
                "id long, x long")
            won.append(merge_version(spark, table_dir, upd, "id",
                                     strategy="mor"))
    finally:
        spark.stop()
    return won


@pytest.mark.slow
class TestCrossProcessMorRace:
    def test_racing_mor_merges_across_processes(self, spark, tmp_path):
        """2 separate PROCESSES x 3 MoR merges racing on one table:
        every merge must land exactly once on its own version (the
        recompose-on-conflict loop under real cross-process CAS), and
        the final read must hold every upsert plus the untouched
        originals — no lost updates, no duplicate rows."""
        import multiprocessing as mp

        t = tmp_path / "mor_race"
        write_version(_df(spark, 0, 20), t)
        with mp.get_context("spawn").Pool(2) as pool:
            results = pool.map(_process_mor_merger,
                               [(str(t), w, 3) for w in range(2)])
        versions = sorted(v for r in results for v in r)
        assert versions == [1, 2, 3, 4, 5, 6]  # exactly-once, no gaps
        assert latest_version(t) == 6
        got = {r["id"]: r["x"] for r in read_version(spark, t).collect()}
        want = {i: 2 * i for i in range(20)}
        want.update({w * 100 + i: 1000 * w + i
                     for w in range(2) for i in range(3)})
        assert got == want
        m = history(t)[-1]
        assert len(m["delete_vectors"]) == 6


class TestCompactSortBy:
    def test_compact_recluster_keeps_file_skipping(self, spark, tdir):
        """compact(sort_by=...) re-clusters the repair rewrite: the
        compacted commit carries disjoint per-file zone maps, so the
        MoR recipe (upsert tail + periodic compact) keeps 1-of-N
        file-granular reads instead of losing clustering per repair."""
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"], sort_files=8)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555)], "id long, x long"),
                      "id", strategy="mor")
        want = sorted((r["id"], r["x"]) for r in
                      read_version(spark, tdir).collect())
        compact(spark, tdir, target_files=8, sort_by=["id"])
        m = history(tdir)[-1]
        d = m["data_dirs"][0]
        assert "delete_vectors" not in m          # folded
        assert len(m["file_stats"][d]) == 8        # re-clustered
        skipped = read_version(spark, tdir, skip=[("id", ">=", 990)])
        assert len(skipped.inputFiles()) == 1      # 1 file of 8
        assert sorted((r["id"], r["x"]) for r in
                      read_version(spark, tdir).collect()) == want
        assert {r["id"]: r["x"] for r in skipped.collect()}[990] == 1980


class TestAutoSkipPushdown:
    """read_version(...).where(...) — no skip= — must prune via zone
    maps automatically: the returned frame extracts conjunctive
    ``col op literal`` predicates from the analyzed filter condition
    and re-plans the read (r10 verdict item 1)."""

    def _appends(self, spark, tdir, n=24, width=10):
        for i in range(n):
            write_version(_df(spark, i * width, (i + 1) * width), tdir,
                          "append" if i else "overwrite")

    @staticmethod
    def _dirs_hit(df):
        return {f.split("/data-")[1].split("/")[0]
                for f in df.inputFiles()}

    @pytest.mark.slow
    def test_plain_where_scans_one_dir_of_24(self, spark, tdir):
        self._appends(spark, tdir, n=24)
        base = read_version(spark, tdir)
        assert len(self._dirs_hit(base)) == 24
        pruned = base.where(F.col("id") >= 235)
        assert len(self._dirs_hit(pruned)) == 1
        want = [(i, 2 * i) for i in range(235, 240)]
        assert sorted((r["id"], r["x"]) for r in pruned.collect()) == want

    def test_string_condition_and_chained_where(self, spark, tdir):
        self._appends(spark, tdir, n=8)
        df = read_version(spark, tdir).where("id >= 20").where("id < 40")
        assert len(self._dirs_hit(df)) == 2
        assert sorted(r["id"] for r in df.collect()) == list(range(20, 40))

    def test_mixed_condition_prunes_on_extractable_conjunct(
            self, spark, tdir):
        self._appends(spark, tdir, n=8)
        # id >= 70 prunes; the x % 4 term rides along as row filter
        df = read_version(spark, tdir).where(
            (F.col("id") >= 70) & (F.col("x") % 4 == 0))
        assert len(self._dirs_hit(df)) == 1
        assert sorted(r["id"] for r in df.collect()) == [70, 72, 74, 76, 78]

    def test_or_condition_never_prunes_but_stays_correct(self, spark,
                                                         tdir):
        self._appends(spark, tdir, n=4)
        df = read_version(spark, tdir).where(
            (F.col("id") < 5) | (F.col("id") >= 35))
        assert len(self._dirs_hit(df)) == 4
        assert sorted(r["id"] for r in df.collect()) \
            == list(range(5)) + list(range(35, 40))

    def test_matches_manual_skip_and_plain_filter(self, spark, tdir):
        self._appends(spark, tdir, n=6)
        auto = read_version(spark, tdir).where(F.col("id") > 31)
        manual = read_version(spark, tdir, skip=[("id", ">", 31)])
        assert self._dirs_hit(auto) == self._dirs_hit(manual)
        assert sorted(r["id"] for r in auto.collect()) \
            == sorted(r["id"] for r in manual.collect())

    def test_composes_with_deletion_vectors(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._appends(spark, tdir, n=3)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555), (25, 2525)],
                                            "id long, x long"),
                      "id", strategy="mor")
        got = {r["id"]: r["x"] for r in read_version(spark, tdir)
               .where(F.col("id") < 10).collect()}
        assert got == {**{i: 2 * i for i in range(10) if i != 5}, 5: 555}

    def test_foreign_bound_column_falls_back_cleanly(self, spark, tdir):
        self._appends(spark, tdir, n=4)
        df = read_version(spark, tdir)
        got = df.where(df["id"] >= 25)
        assert sorted(r["id"] for r in got.collect()) == list(range(25, 40))

    def test_file_granular_pruning_via_where(self, spark, tdir):
        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"], sort_files=8)
        df = read_version(spark, tdir).where(F.col("id") >= 990)
        assert len(df.inputFiles()) == 1
        assert sorted(r["id"] for r in df.collect()) \
            == list(range(990, 1000))

    def test_time_travel_read_pins_its_version(self, spark, tdir):
        self._appends(spark, tdir, n=4)
        old = read_version(spark, tdir, version=1)
        write_version(_df(spark, 100, 110), tdir, "append")
        got = old.where(F.col("id") >= 0)  # reread must stay at v1
        assert sorted(r["id"] for r in got.collect()) == list(range(20))


class TestSchemaEvolution:
    """evolve_schema (r11 verdict item 5): add-column / type-widening
    / rename as metadata-only commits; readers null-fill and cast per
    segment; time travel returns the as-of schema; appends validate
    against the LATEST schema; zone-map pruning still fires per
    segment."""

    def test_add_column_null_fills_and_appends(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(_df(spark, 0, 10), tdir)              # schema A
        v = evolve_schema(tdir, add_columns={"tag": "string"})
        assert v == 1
        got = read_version(spark, tdir)
        assert dict(got.dtypes)["tag"] == "string"
        assert got.where(F.col("tag").isNull()).count() == 10
        # append WITH the new column spans both segments
        write_version(
            spark.range(10, 15).select(
                "id", (F.col("id") * 2).alias("x"),
                F.lit("b").alias("tag")), tdir, "append")
        rows = {r["id"]: r["tag"]
                for r in read_version(spark, tdir).collect()}
        assert rows[3] is None and rows[12] == "b" and len(rows) == 15
        # AS OF v0 returns schema A (no tag column)
        assert "tag" not in read_version(spark, tdir, version=0).columns

    def test_widen_casts_old_segments(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(
            spark.range(5).select(F.col("id").cast("int").alias("k"),
                                  (F.col("id") * 2).alias("x")), tdir)
        evolve_schema(tdir, widen={"k": "bigint"})
        got = read_version(spark, tdir)
        assert dict(got.dtypes)["k"] == "bigint"
        assert sorted(r["k"] for r in got.collect()) == list(range(5))
        # append with the widened type; narrow appends are rejected
        write_version(
            spark.range(5, 8).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("x")),
            tdir, "append")
        assert read_version(spark, tdir).count() == 8
        with pytest.raises(VersionedTableError, match="incompatible"):
            write_version(
                spark.range(8, 9).select(
                    F.col("id").cast("int").alias("k"),
                    (F.col("id") * 2).alias("x")), tdir, "append")
        # AS OF the pre-evolution version keeps the narrow type
        assert dict(read_version(spark, tdir, version=0).dtypes)["k"] \
            == "int"

    def test_widen_rejects_lossy_paths(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(_df(spark, 0, 5), tdir)  # id/x are bigint
        for bad in ({"id": "int"}, {"id": "double"}, {"id": "string"}):
            with pytest.raises(VersionedTableError, match="widen"):
                evolve_schema(tdir, widen=bad)
        with pytest.raises(VersionedTableError, match="no such"):
            evolve_schema(tdir, widen={"nope": "bigint"})
        with pytest.raises(VersionedTableError, match="exists"):
            evolve_schema(tdir, add_columns={"x": "string"})

    def test_add_columns_alias_normalizes_for_later_append(
            self, spark, tdir):
        """ADVICE r12: add_columns={'x': 'long'} must store the
        canonical 'bigint' spelling — a later append that SUPPLIES x
        validates its df.dtypes ('bigint') against the stored type
        and would otherwise be rejected as an incompatible change."""
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema, read_version)

        write_version(_df(spark, 0, 5), tdir)
        evolve_schema(tdir, add_columns={"extra": "long"})
        # the append that used to raise VersionedTableError
        write_version(
            spark.range(5, 8).select(
                "id", (F.col("id") * 2).alias("x"),
                (F.col("id") + 100).alias("extra")), tdir, "append")
        got = {r["id"]: r["extra"]
               for r in read_version(spark, tdir).collect()}
        assert got[6] == 106 and got[1] is None and len(got) == 8

    def test_append_projection_order_keeps_table_order(
            self, spark, tdir):
        """Review r13: the manifest schema drives reader alignment
        and SELECT * order — an append whose DataFrame happens to
        project columns in a different order must not reorder the
        table's established schema."""
        from data_platform_copilot_spark.sources.versioned import (
            read_version)

        write_version(_df(spark, 0, 3), tdir)       # (id, x)
        write_version(
            spark.range(3, 5).select(
                (F.col("id") * 2).alias("x"), "id"), tdir, "append")
        got = read_version(spark, tdir)
        assert got.columns == ["id", "x"]
        assert {r["id"]: r["x"] for r in got.collect()} \
            == {i: 2 * i for i in range(5)}

    def test_widen_tinyint_and_long_alias(self, spark, tdir):
        """Manifest schemas store df.dtypes spellings (tinyint/
        smallint/bigint); user-facing aliases (byte/short/long) must
        normalize rather than be rejected (review r12)."""
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(
            spark.range(4).select(
                F.col("id").cast("tinyint").alias("t"),
                F.col("id").cast("int").alias("k")), tdir)
        evolve_schema(tdir, widen={"t": "int"})
        evolve_schema(tdir, widen={"k": "long"})   # alias for bigint
        got = read_version(spark, tdir)
        assert dict(got.dtypes) == {"t": "int", "k": "bigint"}
        assert sorted((r["t"], r["k"]) for r in got.collect()) \
            == [(i, i) for i in range(4)]

    def test_rename_reads_all_segments(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(_df(spark, 0, 10), tdir)
        v = evolve_schema(tdir, rename={"x": "y"})
        got = read_version(spark, tdir)
        assert set(got.columns) == {"id", "y"}
        assert sorted(r["y"] for r in got.collect()) \
            == [2 * i for i in range(10)]
        # post-rename append writes the logical name physically
        write_version(
            spark.range(10, 12).select("id",
                                       (F.col("id") * 2).alias("y")),
            tdir, "append")
        assert read_version(spark, tdir).count() == 12
        # time travel: pre-rename schema intact
        assert set(read_version(spark, tdir, version=v - 1).columns) \
            == {"id", "x"}

    def test_rename_pruning_translates_to_physical(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        for i in range(8):
            write_version(_df(spark, i * 10, (i + 1) * 10), tdir,
                          "append" if i else "overwrite")
        evolve_schema(tdir, rename={"id": "doc"})
        pruned = read_version(spark, tdir).where(F.col("doc") >= 70)
        dirs = {f.split("/data-")[1].split("/")[0]
                for f in pruned.inputFiles()}
        assert len(dirs) == 1  # stats keyed by physical 'id' still fire
        assert sorted(r["doc"] for r in pruned.collect()) \
            == list(range(70, 80))

    def test_rename_freed_name_never_misprunes(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        for i in range(4):
            write_version(_df(spark, i * 10, (i + 1) * 10), tdir,
                          "append" if i else "overwrite")
        # free the physical name 'id' (id->doc), then rename x->id:
        # logical 'id' now means the OLD x (= 2*doc) — a predicate on
        # it must never prune against old dirs' physical 'id' stats
        evolve_schema(tdir, rename={"id": "doc"})
        evolve_schema(tdir, rename={"x": "id"})
        got = read_version(spark, tdir).where(F.col("id") >= 60)
        # physical id stats for dir 3 are [30,39]; logical id = x
        # there is [60,78] — rows must survive
        assert sorted(r["doc"] for r in got.collect()) \
            == list(range(30, 40))

    def test_rename_requires_no_live_vectors(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema, merge_version)

        write_version(_df(spark, 0, 10), tdir)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555)],
                                            "id long, x long"),
                      "id", strategy="mor")
        with pytest.raises(VersionedTableError, match="deletion"):
            evolve_schema(tdir, rename={"x": "y"})
        with pytest.raises(VersionedTableError, match="deletion"):
            evolve_schema(tdir, widen={"x": "double"})
        # add_columns is safe with live vectors
        evolve_schema(tdir, add_columns={"tag": "string"})
        got = {r["id"]: r["x"] for r in
               read_version(spark, tdir).collect()}
        assert got[5] == 555 and len(got) == 10

    def test_mor_after_rename_stays_exact(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema, merge_version)

        write_version(_df(spark, 0, 10), tdir)
        evolve_schema(tdir, rename={"x": "y"})
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 999), (20, 40)],
                                            "id long, y long"),
                      "id", strategy="mor")
        got = {r["id"]: r["y"] for r in
               read_version(spark, tdir).collect()}
        assert got[5] == 999 and got[20] == 40 and got[3] == 6
        assert len(got) == 11

    def test_compact_heals_renames_and_widens(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(
            spark.range(6).select(F.col("id").cast("int").alias("k"),
                                  (F.col("id") * 2).alias("x")), tdir)
        evolve_schema(tdir, widen={"k": "bigint"}, rename={"x": "y"})
        compact(spark, tdir, target_files=1)
        m = history(tdir)[-1]
        assert "dir_renames" not in m          # healed to physical
        assert m["schema"] == {"k": "bigint", "y": "bigint"}
        got = read_version(spark, tdir)
        assert dict(got.dtypes) == {"k": "bigint", "y": "bigint"}
        assert sorted(r["y"] for r in got.collect()) \
            == [2 * i for i in range(6)]

    def test_nothing_to_do_rejected(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_schema)

        write_version(_df(spark, 0, 3), tdir)
        with pytest.raises(VersionedTableError, match="nothing"):
            evolve_schema(tdir)


class TestProjectionChainedPushdown:
    """Pruning must survive projection chaining (r11 verdict item 2):
    ``read_version(t).select(...).where(...)`` re-plans over the
    pruned dir/file set exactly like a direct ``.where``. The column
    map only ever traces direct (possibly aliased/renamed) attribute
    references, so a computed or shadowed output can never prune
    against the wrong stored column's stats."""

    def _appends(self, spark, tdir, n=16, width=10):
        for i in range(n):
            write_version(_df(spark, i * width, (i + 1) * width), tdir,
                          "append" if i else "overwrite")

    @staticmethod
    def _dirs_hit(df):
        return {f.split("/data-")[1].split("/")[0]
                for f in df.inputFiles()}

    @staticmethod
    def _fallbacks():
        from data_platform_copilot_spark.metrics import REGISTRY
        return REGISTRY._counters.get("versioned_pushdown_fallback", 0.0)

    def test_select_then_where_prunes(self, spark, tdir):
        self._appends(spark, tdir)
        before = self._fallbacks()
        df = read_version(spark, tdir).select("id").where(
            F.col("id") >= 150)
        assert len(self._dirs_hit(df)) == 1
        assert sorted(r["id"] for r in df.collect()) \
            == list(range(150, 160))
        assert self._fallbacks() == before  # no silent fallback

    @pytest.mark.slow
    def test_alias_rename_drop_chain_prunes(self, spark, tdir):
        self._appends(spark, tdir)
        before = self._fallbacks()
        df = (read_version(spark, tdir)
              .select(F.col("id").alias("doc"), "x")
              .withColumnRenamed("doc", "d")
              .drop("x")
              .where(F.col("d") >= 150))
        assert len(self._dirs_hit(df)) == 1
        assert sorted(r["d"] for r in df.collect()) \
            == list(range(150, 160))
        assert self._fallbacks() == before

    def test_selectexpr_and_withcolumn_prune(self, spark, tdir):
        self._appends(spark, tdir)
        df = (read_version(spark, tdir)
              .selectExpr("id as key", "x")
              .withColumn("y", F.col("x") * 2)
              .where("key >= 150"))
        assert len(self._dirs_hit(df)) == 1
        assert sorted((r["key"], r["y"]) for r in df.collect()) \
            == [(i, 4 * i) for i in range(150, 160)]

    def test_computed_shadow_never_misprunes(self, spark, tdir):
        self._appends(spark, tdir)
        # output 'id' is COMPUTED (id % 10): pruning on stored id's
        # stats would wrongly drop every dir but the first — the map
        # must refuse to trace it
        df = (read_version(spark, tdir)
              .select((F.col("id") % 10).alias("id"), "x")
              .where(F.col("id") < 3))
        assert len(self._dirs_hit(df)) == 16      # nothing pruned
        assert df.count() == 3 * 16

    def test_alias_swap_prunes_on_true_source(self, spark, tdir):
        self._appends(spark, tdir)
        # 'x' output is stored id (x = 2*id stored): filter x >= 150
        # must prune on ID's stats (rows 150..159), not stored x's
        df = (read_version(spark, tdir)
              .select(F.col("id").alias("x"))
              .where(F.col("x") >= 150))
        assert len(self._dirs_hit(df)) == 1
        assert sorted(r["x"] for r in df.collect()) \
            == list(range(150, 160))

    def test_projection_after_filter_keeps_frame(self, spark, tdir):
        self._appends(spark, tdir)
        df = (read_version(spark, tdir)
              .where(F.col("id") >= 100)
              .select("id")
              .where(F.col("id") < 110))
        assert len(self._dirs_hit(df)) == 1
        assert sorted(r["id"] for r in df.collect()) \
            == list(range(100, 110))

    def test_chain_composes_with_mor_vectors(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        self._appends(spark, tdir, n=4)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555), (35, 3535)],
                                            "id long, x long"),
                      "id", strategy="mor")
        got = {r["k"]: r["x"] for r in
               (read_version(spark, tdir)
                .withColumnRenamed("id", "k")
                .where(F.col("k") < 10)).collect()}
        assert got == {**{i: 2 * i for i in range(10) if i != 5}, 5: 555}

    def test_fallback_counter_zero_on_supported_surface(self, spark,
                                                       tdir):
        self._appends(spark, tdir, n=4)
        before = self._fallbacks()
        df = read_version(spark, tdir)
        (df.select("id", "x").where("id >= 20")
         .withColumn("z", F.lit(1)).where(F.col("x") < 70)).collect()
        assert self._fallbacks() == before


class TestMorAutoCompact:
    """merge_version(strategy="mor") auto-compaction policy (r10
    verdict item 2): the k-th stacked merge past the vector-count
    threshold triggers compact() as a follow-up commit — the upsert
    tail + periodic repair recipe becomes engine behavior."""

    def _merge(self, spark, tdir, i, **kw):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)
        return merge_version(
            spark, tdir,
            spark.createDataFrame([(i, 1000 + i)], "id long, x long"),
            "id", strategy="mor", **kw)

    def test_threshold_merge_folds_vectors(self, spark, tdir):
        write_version(_df(spark, 0, 100), tdir)
        for i in range(2):
            self._merge(spark, tdir, i, auto_compact_vectors=3)
        assert len(history(tdir)[-1]["delete_vectors"]) == 2
        v = self._merge(spark, tdir, 2, auto_compact_vectors=3)
        m = history(tdir)[-1]
        assert m["version"] == v + 1          # merge commit, then repair
        assert m["mode"] == "overwrite" and "delete_vectors" not in m
        plan = (read_version(spark, tdir)._jdf.queryExecution()
                .executedPlan().toString())
        assert "LeftAnti" not in plan          # scan cost restored
        got = {r["id"]: r["x"] for r in
               read_version(spark, tdir).collect()}
        want = {i: 2 * i for i in range(100)}
        want.update({i: 1000 + i for i in range(3)})
        assert got == want

    @pytest.mark.slow
    def test_none_disables_policy(self, spark, tdir):
        write_version(_df(spark, 0, 20), tdir)
        for i in range(11):
            self._merge(spark, tdir, i, auto_compact_vectors=None)
        assert len(history(tdir)[-1]["delete_vectors"]) == 11

    def test_metric_emitted(self, spark, tdir):
        from data_platform_copilot_spark.metrics import REGISTRY
        write_version(_df(spark, 0, 10), tdir)
        for i in range(2):
            self._merge(spark, tdir, i, auto_compact_vectors=2)
        assert "versioned_auto_compact_total" in REGISTRY.export()

    def test_recluster_intent_survives_auto_compact(self, spark, tdir):
        write_version(_df(spark, 0, 1000).repartition(8), tdir,
                      "overwrite", sort_by=["id"], sort_files=8)
        for i in range(3):
            self._merge(spark, tdir, i, auto_compact_vectors=3)
        m = history(tdir)[-1]
        assert "delete_vectors" not in m
        assert m.get("sort_by") == ["id"]       # intent carried + kept
        d = m["data_dirs"][0]
        assert m["file_stats"][d]                # clustered rewrite
        skipped = read_version(spark, tdir, skip=[("id", ">=", 990)])
        assert len(skipped.inputFiles()) == 1    # file skipping survives
        assert sorted(r["id"] for r in skipped.collect()) \
            == list(range(990, 1000))

    def test_txn_replay_noop_after_auto_compact(self, spark, tdir):
        write_version(_df(spark, 0, 10), tdir)
        v1 = self._merge(spark, tdir, 1, txn=("app", 7),
                         auto_compact_vectors=1)  # merge then fold
        latest = latest_version(tdir)
        assert latest == v1 + 1
        v2 = self._merge(spark, tdir, 1, txn=("app", 7),
                         auto_compact_vectors=1)  # replay: version no-op
        assert v2 == v1 and latest_version(tdir) == latest


class TestZOrderClustering:
    """Multi-column sort_by interleaves (Morton z-order) instead of
    lexicographic-sorting (r10 verdict item 4): a range predicate on
    the TRAILING column reads strictly fewer files under z-order than
    under lexicographic layout of the same commit."""

    def _grid(self, spark, n=64):
        return (spark.range(n * n)
                .select((F.col("id") % n).alias("a"),
                        (F.col("id") / n).cast("long").alias("b"),
                        F.col("id").alias("v")))

    def test_trailing_column_reads_fewer_files_than_lex(self, spark,
                                                        tmp_path):
        df = self._grid(spark)
        lex, zo = tmp_path / "lex", tmp_path / "zo"
        write_version(df, lex, "overwrite", sort_by=["a", "b"],
                      sort_files=16, cluster="range")
        write_version(df, zo, "overwrite", sort_by=["a", "b"],
                      sort_files=16)  # auto: >=2 cols -> zorder
        assert history(lex)[-1]["cluster"] == "range"
        assert history(zo)[-1]["cluster"] == "zorder"
        pred = [("b", ">=", 10), ("b", "<=", 13)]
        n_lex = len(read_version(spark, lex, skip=pred).inputFiles())
        n_zo = len(read_version(spark, zo, skip=pred).inputFiles())
        assert n_zo < n_lex  # the point of the curve
        want = sorted((r["a"], r["b"], r["v"]) for r in df.where(
            (F.col("b") >= 10) & (F.col("b") <= 13)).collect())
        for t in (lex, zo):  # value equality on both layouts
            got = sorted((r["a"], r["b"], r["v"]) for r in
                         read_version(spark, t, skip=pred).collect())
            assert got == want

    def test_leading_column_still_prunes_under_zorder(self, spark,
                                                      tmp_path):
        zo = tmp_path / "zo"
        write_version(self._grid(spark), zo, "overwrite",
                      sort_by=["a", "b"], sort_files=16)
        df = read_version(spark, zo).where(
            (F.col("a") >= 10) & (F.col("a") <= 13))  # auto pushdown
        assert len(df.inputFiles()) < 16
        assert df.count() == 4 * 64

    def test_zorder_validation(self, spark, tmp_path):
        df = self._grid(spark).withColumn("s", F.lit("x"))
        # auto + non-numeric column: falls back to the pre-r11
        # lexicographic layout (no API break for existing callers)
        write_version(df, tmp_path / "t1", "overwrite",
                      sort_by=["s", "a"], sort_files=4)
        assert history(tmp_path / "t1")[-1]["cluster"] == "range"
        # only an EXPLICIT zorder request raises on non-numeric
        with pytest.raises(VersionedTableError, match="numeric"):
            write_version(df, tmp_path / "t1b", "overwrite",
                          sort_by=["a", "s"], cluster="zorder")
        with pytest.raises(VersionedTableError, match="two sort_by"):
            write_version(df, tmp_path / "t2", "overwrite",
                          sort_by=["a"], cluster="zorder")
        with pytest.raises(VersionedTableError, match="cluster mode"):
            write_version(df, tmp_path / "t3", "overwrite",
                          sort_by=["a"], cluster="hilbert")

    def test_compact_recluster_to_zorder(self, spark, tdir):
        write_version(self._grid(spark), tdir, "overwrite")
        compact(spark, tdir, target_files=16, sort_by=["a", "b"])
        m = history(tdir)[-1]
        assert m["cluster"] == "zorder"
        assert len(m["file_stats"][m["data_dirs"][0]]) == 16
        got = len(read_version(spark, tdir,
                               skip=[("b", "=", 7)]).inputFiles())
        assert got < 16

    def test_auto_compact_preserves_zorder_intent(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(self._grid(spark), tdir, "overwrite",
                      sort_by=["a", "b"], sort_files=8)
        for i in range(2):
            merge_version(
                spark, tdir,
                spark.createDataFrame([(i, i, 9999)],
                                      "a long, b long, v long"),
                "v", strategy="mor", auto_compact_vectors=2)
        m = history(tdir)[-1]
        assert "delete_vectors" not in m
        assert m.get("cluster") == "zorder" and m.get("sort_by") \
            == ["a", "b"]


class TestPartitionEvolution:
    """evolve_partitioning (r10 verdict item 8, implemented): a
    metadata-only commit re-partitions the table going forward;
    readers span layout generations, pruning per generation."""

    def _old(self, spark, lo, hi):
        return _df(spark, lo, hi).withColumn(
            "p", (F.col("id") % 2).cast("string"))

    def test_evolve_append_read_spans_generations(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning)

        write_version(self._old(spark, 0, 20), tdir,
                      partition_by=["p"])
        v = evolve_partitioning(tdir, ["q"])
        assert v == 1
        m = history(tdir)[-1]
        assert m["mode"] == "evolve-partitions"
        assert m["partition_by"] == ["q"]
        assert set(m["dir_partition_by"]) == set(m["data_dirs"])
        # old spec now rejected, new spec accepted
        with pytest.raises(VersionedTableError, match="layout"):
            write_version(self._old(spark, 20, 30), tdir, "append",
                          partition_by=["p"])
        new = _df(spark, 100, 110).withColumn(
            "q", (F.col("id") % 3).cast("string"))
        write_version(new, tdir, "append", partition_by=["q"])
        got = read_version(spark, tdir)
        assert got.count() == 30
        rows = {r["id"]: (r["p"], r["q"]) for r in got.collect()}
        assert rows[5] == ("1", None)      # old generation: q is NULL
        assert rows[105] == (None, "0")    # new generation: p is NULL

    def test_each_generation_prunes_on_its_own_keys(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning)
        import re

        write_version(self._old(spark, 0, 20), tdir,
                      partition_by=["p"])
        evolve_partitioning(tdir, ["q"])
        new = _df(spark, 100, 120).withColumn(
            "q", (F.col("id") % 2).cast("string"))
        write_version(new, tdir, "append", partition_by=["q"])
        pruned = read_version(spark, tdir).where(F.col("p") == "1")
        assert sorted(r["id"] for r in pruned.collect()) \
            == [i for i in range(20) if i % 2 == 1]
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # the OLD dir scans under a partition filter on p; the new
        # generation (no p at all) contributes no matching rows
        assert re.search(r"PartitionFilters: \[[^\]]*p#[^\]]*\]",
                         plan), plan[:2000]
        qpruned = read_version(spark, tdir).where(F.col("q") == "1")
        assert sorted(r["id"] for r in qpruned.collect()) \
            == [i for i in range(100, 120) if i % 2 == 1]

    def test_evolve_to_unpartitioned_and_back(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning)

        write_version(self._old(spark, 0, 10), tdir,
                      partition_by=["p"])
        evolve_partitioning(tdir, None)
        write_version(_df(spark, 50, 60), tdir, "append")  # plain dir
        assert read_version(spark, tdir).count() == 20
        evolve_partitioning(tdir, ["p"])
        write_version(self._old(spark, 90, 95), tdir, "append",
                      partition_by=["p"])
        got = read_version(spark, tdir)
        assert got.count() == 25
        # no-op evolve returns current version, publishes nothing
        latest = latest_version(tdir)
        assert evolve_partitioning(tdir, ["p"]) == latest
        assert latest_version(tdir) == latest

    def test_cow_merge_heals_evolved_table(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning, merge_version)

        write_version(self._old(spark, 0, 20), tdir,
                      partition_by=["p"])
        evolve_partitioning(tdir, ["q"])
        new = _df(spark, 100, 110).withColumn(
            "q", (F.col("id") % 2).cast("string"))
        write_version(new, tdir, "append", partition_by=["q"])
        upd = spark.createDataFrame([(5, 555, "1")],
                                    "id long, x long, q string")
        merge_version(spark, tdir, upd, "id")
        m = history(tdir)[-1]
        assert "dir_partition_by" not in m       # healed to uniform
        assert m["partition_by"] == ["q"]
        got = {r["id"]: r["x"] for r in read_version(spark, tdir)
               .collect()}
        assert got[5] == 555 and len(got) == 30

    def test_mor_merge_and_compact_on_evolved_table(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning, merge_version)

        write_version(self._old(spark, 0, 20), tdir,
                      partition_by=["p"])
        evolve_partitioning(tdir, None)
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555)],
                                            "id long, x long"),
                      "id", strategy="mor")
        m = history(tdir)[-1]
        assert m["dir_partition_by"]              # map rides the merge
        got = {r["id"]: r["x"] for r in read_version(spark, tdir)
               .collect()}
        assert got[5] == 555 and len(got) == 20
        compact(spark, tdir)
        m = history(tdir)[-1]
        assert "dir_partition_by" not in m        # compact heals
        assert {r["id"]: r["x"] for r in read_version(spark, tdir)
                .collect()} == got


class TestPartitionValueStats:
    """Partition columns live in path segments, not parquet footers;
    _harvest_partition_stats folds them into the dir zone map so
    skip/auto-pushdown drops whole version dirs at the MANIFEST level
    — before Spark lists their partition leaves (r11)."""

    def test_partitioned_append_log_prunes_manifest_level(self, spark,
                                                          tdir):
        for i in range(4):  # day-partitioned append log
            df = _df(spark, i * 10, (i + 1) * 10).withColumn(
                "day", F.lit(i))
            write_version(df, tdir, "append" if i else "overwrite",
                          partition_by=["day"])
        m = history(tdir)[-1]
        assert all(m["dir_stats"][d]["day"] == [i, i]
                   for i, d in enumerate(m["data_dirs"]))
        skipped = read_version(spark, tdir, skip=[("day", "=", 2)])
        dirs = {f.split("/data-")[1].split("/")[0]
                for f in skipped.inputFiles()}
        assert len(dirs) == 1
        assert sorted(r["id"] for r in skipped.collect()) \
            == list(range(20, 30))
        auto = read_version(spark, tdir).where(F.col("day") >= 3)
        assert len({f.split("/data-")[1].split("/")[0]
                    for f in auto.inputFiles()}) == 1
        assert sorted(r["id"] for r in auto.collect()) \
            == list(range(30, 40))

    def test_string_partitions_null_leaf_excluded(self, spark, tdir):
        df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)],
                                   "id long, g string")
        write_version(df, tdir, "overwrite", partition_by=["g"])
        m = history(tdir)[-1]
        assert m["dir_stats"][m["data_dirs"][0]]["g"] == ["a", "b"]
        # bounds prove emptiness for a never-present value (the NULL
        # leaf cannot match a comparison predicate, so dropping the
        # dir is sound)
        assert read_version(spark, tdir,
                            skip=[("g", "=", "zz")]).count() == 0
        got = {r["id"] for r in read_version(
            spark, tdir, skip=[("g", "=", "a")]).collect()}
        assert got == {1}

    def test_mor_merge_dir_carries_partition_stats(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        df = _df(spark, 0, 20).withColumn(
            "day", (F.col("id") / 10).cast("int"))
        write_version(df, tdir, "overwrite", partition_by=["day"])
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 555, 0)],
                                            "id long, x long, day int"),
                      "id", strategy="mor")
        m = history(tdir)[-1]
        upd_dir = m["data_dirs"][-1]
        assert m["dir_stats"][upd_dir]["day"] == [0, 0]


class TestMorCasLossRename:
    def test_mor_cas_loss_renames_dirs_honestly(self, spark, tdir,
                                                monkeypatch):
        """A MoR merge losing the version CAS to an interleaved append
        retries under the bumped version AND renames its staged dirs
        to match (r10 verdict wart closed — dir names no longer keep
        the stale number; readers were always correct either way)."""
        from data_platform_copilot_spark.sources import versioned as V

        write_version(_df(spark, 0, 10), tdir)
        orig = V._publish_manifest
        state = {"stolen": False}

        def interpose(root, manifest):
            if not state["stolen"] and manifest.get("mode") == "merge-mor":
                state["stolen"] = True
                write_version(_df(spark, 100, 105), tdir, "append")
            return orig(root, manifest)

        monkeypatch.setattr(V, "_publish_manifest", interpose)
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)
        v = merge_version(spark, tdir,
                          spark.createDataFrame([(5, 555)],
                                                "id long, x long"),
                          "id", strategy="mor")
        assert v == 2
        m = history(tdir)[-1]
        assert m["data_dirs"][-1].startswith("data-2-")
        assert m["delete_vectors"][0]["dir"].startswith("delete-2-")
        got = {r["id"]: r["x"] for r in read_version(spark, tdir)
               .collect()}
        want = {i: 2 * i for i in list(range(10)) + list(range(100, 105))}
        want[5] = 555
        assert got == want


@pytest.mark.slow
class TestOperatingRecipeEndToEnd:
    def test_full_table_lifecycle_story(self, spark, tdir):
        """The whole r11 table-format feature set in ONE realistic
        sequence — a day-partitioned ingest log that takes CDC
        upserts, evolves its partition grain, answers time-travel
        SQL, auto-compacts, and survives retention cleanup — with
        value checks at every step."""
        from data_platform_copilot_spark.gateway import (
            register_versioned_table, sql_run, table_history)
        from data_platform_copilot_spark.sources.versioned import (
            evolve_partitioning, merge_version, vacuum)

        # 1. three daily partitioned appends
        for day in range(3):
            df = (spark.range(day * 100, (day + 1) * 100)
                  .select(F.col("id"), (F.col("id") % 5).alias("v"),
                          F.lit(day).alias("day")))
            write_version(df, tdir, "append" if day else "overwrite",
                          partition_by=["day"])
        # partition-value stats prune a day query to 1 of 3 dirs
        one_day = read_version(spark, tdir).where(F.col("day") == 1)
        assert len({f.split("/data-")[1].split("/")[0]
                    for f in one_day.inputFiles()}) == 1
        assert one_day.count() == 100

        # 2. CDC tail: MoR upserts, auto-compaction folds at 2
        for i in range(2):
            merge_version(
                spark, tdir,
                spark.createDataFrame([(i, 99, 0)],
                                      "id long, v long, day int"),
                "id", strategy="mor", auto_compact_vectors=2)
        m = history(tdir)[-1]
        assert "delete_vectors" not in m          # engine folded
        assert m["mode"] == "overwrite"
        got = {r["id"]: r["v"] for r in
               read_version(spark, tdir).collect()}
        assert got[0] == got[1] == 99 and len(got) == 300

        # 3. grain change: re-partition by v going forward, no rewrite
        evolve_partitioning(tdir, ["v"])
        new = (spark.range(300, 350)
               .select(F.col("id"), (F.col("id") % 5).alias("v"),
                       F.lit(9).alias("day")))
        write_version(new, tdir, "append", partition_by=["v"])
        assert read_version(spark, tdir).count() == 350

        # 4. time travel through SQL: state before the evolution
        register_versioned_table(spark, "recipe_log", tdir)
        hist = table_history("recipe_log")
        pre_evolve = [h["version"] for h in hist
                      if h["mode"] == "overwrite"][-1]
        run = sql_run(spark, f"SELECT count(*) AS n FROM recipe_log "
                             f"FOR VERSION AS OF {pre_evolve}")
        assert run.preview[0]["n"] == 300
        run = sql_run(spark, "SELECT count(*) AS n FROM recipe_log")
        assert run.preview[0]["n"] == 350

        # 5. retention: vacuum to the latest snapshot only; current
        # reads stay exact, old versions are gone
        deleted = vacuum(tdir, keep_last=1, min_age_s=0.0)
        assert deleted
        assert read_version(spark, tdir).count() == 350
        got = {r["id"]: r["v"] for r in
               read_version(spark, tdir).collect()}
        assert got[0] == 99 and got[320] == 320 % 5


class TestInListSkipping:
    """skip op "in" + auto-derivation from .isin(...) (r11): the
    bread-and-butter multi-partition read (day IN (...)) prunes at
    the manifest level."""

    def _appends(self, spark, tdir, n=4, width=10):
        for i in range(n):
            write_version(_df(spark, i * width, (i + 1) * width), tdir,
                          "append" if i else "overwrite")

    @staticmethod
    def _dirs(df):
        return {f.split("/data-")[1].split("/")[0]
                for f in df.inputFiles()}

    def test_manual_in_skip_prunes(self, spark, tdir):
        self._appends(spark, tdir)
        got = read_version(spark, tdir, skip=[("id", "in", [5, 35])])
        assert len(self._dirs(got)) == 2
        assert sorted(r["id"] for r in got.collect()) == [5, 35]
        none = read_version(spark, tdir,
                            skip=[("id", "in", [1000, 2000])])
        assert none.count() == 0

    def test_auto_isin_prunes_and_matches_plain(self, spark, tdir):
        self._appends(spark, tdir)
        auto = read_version(spark, tdir).where(
            F.col("id").isin(5, 6, 35))
        assert len(self._dirs(auto)) == 2
        assert sorted(r["id"] for r in auto.collect()) == [5, 6, 35]
        # composes with a comparison conjunct
        both = read_version(spark, tdir).where(
            F.col("id").isin(5, 35) & (F.col("id") >= 30))
        assert len(self._dirs(both)) == 1
        assert sorted(r["id"] for r in both.collect()) == [35]

    def test_nan_in_list_never_prunes(self, spark, tdir):
        df = spark.createDataFrame(
            [(1, 1.0), (2, float("nan"))], "id long, v double")
        write_version(df, tdir, "overwrite")
        got = read_version(spark, tdir,
                           skip=[("v", "in", [float("nan")])])
        # the NaN literal must not prove emptiness; residual decides
        assert got.count() == read_version(spark, tdir).where(
            F.col("v").isin(float("nan"))).count()

    def test_in_on_partition_values(self, spark, tdir):
        for i in range(4):
            df = _df(spark, i * 10, (i + 1) * 10).withColumn(
                "day", F.lit(i))
            write_version(df, tdir, "append" if i else "overwrite",
                          partition_by=["day"])
        got = read_version(spark, tdir).where(F.col("day").isin(1, 3))
        assert len(self._dirs(got)) == 2
        assert got.count() == 20


class TestRowCountMetadata:
    """Per-dir footer row counts recorded at commit: table_rows()
    answers COUNT(*) from metadata, and the masked-ratio auto-compact
    trigger reads its numerator/denominator there (r11)."""

    def test_table_rows_exact_across_commits(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version, table_rows)

        write_version(_df(spark, 0, 100), tdir)
        write_version(_df(spark, 100, 150), tdir, "append")
        assert table_rows(tdir) == 150
        assert table_rows(tdir, version=0) == 100
        # deletion vectors outstanding: metadata cannot answer
        merge_version(spark, tdir,
                      spark.createDataFrame([(5, 9)], "id long, x long"),
                      "id", strategy="mor", auto_compact_vectors=None)
        assert table_rows(tdir) is None
        compact(spark, tdir)
        assert table_rows(tdir) == 150
        assert table_rows(tdir) == read_version(spark, tdir).count()

    def test_table_rows_partitioned_and_cow_merge(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version, table_rows)

        df = _df(spark, 0, 40).withColumn(
            "part", (F.col("id") % 4).cast("string"))
        write_version(df, tdir, partition_by=["part"])
        assert table_rows(tdir) == 40
        merge_version(spark, tdir,
                      spark.createDataFrame([(1, 111, "1")],
                                            "id long, x long, part string"),
                      "id")
        # partition-scoped merge carries leaves without counts:
        # exact-or-absent contract returns None, never a wrong number
        assert table_rows(tdir) is None
        assert read_version(spark, tdir).count() == 40

    def test_masked_ratio_triggers_compaction(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 100), tdir)
        # one merge masking 30% of keys: count threshold (10) never
        # fires, the ratio trigger does
        upd = spark.createDataFrame([(i, 1000 + i) for i in range(30)],
                                    "id long, x long")
        merge_version(spark, tdir, upd, "id", strategy="mor",
                      auto_compact_masked_ratio=0.2)
        m = history(tdir)[-1]
        assert m["mode"] == "overwrite"         # folded immediately
        assert "delete_vectors" not in m
        got = {r["id"]: r["x"] for r in read_version(spark, tdir)
               .collect()}
        assert got[0] == 1000 and got[99] == 198 and len(got) == 100

    def test_small_ratio_does_not_fire(self, spark, tdir):
        from data_platform_copilot_spark.sources.versioned import (
            merge_version)

        write_version(_df(spark, 0, 100), tdir)
        merge_version(spark, tdir,
                      spark.createDataFrame([(1, 9)], "id long, x long"),
                      "id", strategy="mor",
                      auto_compact_masked_ratio=0.2)
        assert len(history(tdir)[-1]["delete_vectors"]) == 1


class TestLatestPointerFastPath:
    """O(1) latest resolution (r13 verdict #3): the `_latest` pointer
    is trusted after verification, with forward-walk over the
    contiguous manifest tail and a glob fallback. Both resolvers —
    sources.versioned.latest_version and the stream source's
    dependency-free twin — must agree on every degraded state."""

    @staticmethod
    def _both(tdir):
        from data_platform_copilot_spark.streaming.stream_source import (
            _latest_version)
        return latest_version(tdir), _latest_version(str(tdir))

    def test_pointer_tracks_latest_after_commits(self, spark, tdir):
        for i in range(3):
            write_version(_df(spark, i, i + 1), tdir, "append")
        assert (tdir / "_latest").read_text().strip() == "2"
        assert self._both(tdir) == (2, 2)

    def test_stale_pointer_walks_forward(self, spark, tdir):
        """A committer crashing between manifest publish and pointer
        advance leaves the pointer lagging; the forward walk must
        recover the true latest (and not miss newer manifests)."""
        for i in range(4):
            write_version(_df(spark, i, i + 1), tdir, "append")
        (tdir / "_latest").write_text("0")  # worst-case lag
        assert self._both(tdir) == (3, 3)

    def test_missing_pointer_falls_back_to_glob(self, spark, tdir):
        write_version(_df(spark, 0, 5), tdir)
        write_version(_df(spark, 5, 9), tdir, "append")
        (tdir / "_latest").unlink()
        assert self._both(tdir) == (1, 1)

    def test_corrupt_pointer_falls_back_to_glob(self, spark, tdir):
        write_version(_df(spark, 0, 5), tdir)
        (tdir / "_latest").write_text("not-a-version")
        assert self._both(tdir) == (0, 0)

    def test_pointer_past_existing_manifests_falls_back(self, spark,
                                                        tdir):
        """A pointer naming a manifest that does not exist (tampering,
        or a table whose tail was hand-deleted) must not be trusted."""
        write_version(_df(spark, 0, 5), tdir)
        (tdir / "_latest").write_text("999")
        assert self._both(tdir) == (0, 0)

    def test_negative_pointer_falls_back(self, spark, tdir):
        write_version(_df(spark, 0, 5), tdir)
        (tdir / "_latest").write_text("-3")
        assert self._both(tdir) == (0, 0)

    def test_fabricated_log_o1_vs_glob(self, tmp_path):
        """Resolution on a deep (1,000-version) log: the pointer path
        must touch O(1) files, not O(versions). Counted via a stat
        audit rather than wall-clock so the assertion is load-proof."""
        import json as _json

        root = tmp_path / "deep"
        root.mkdir()
        n = 1000
        for i in range(n):
            (root / f"manifest-{i}.json").write_text(
                _json.dumps({"version": i, "mode": "append",
                             "data_dirs": []}))
        (root / "_latest").write_text(str(n - 1))
        assert latest_version(root) == n - 1

        from unittest.mock import patch
        calls = {"n": 0}
        orig = type(root).glob

        def counting_glob(self, pattern):
            calls["n"] += 1
            return orig(self, pattern)

        with patch.object(type(root), "glob", counting_glob):
            assert latest_version(root) == n - 1
            from data_platform_copilot_spark.streaming import (
                stream_source as ss)
            assert ss._latest_version(str(root)) == n - 1
        assert calls["n"] == 0  # pointer path: zero directory listings
