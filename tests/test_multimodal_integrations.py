"""Multimodal plumbing, REST client logic (fake transport), ETL flow."""

from __future__ import annotations

import asyncio
import base64

from pyspark.sql import functions as F

from data_platform_copilot_spark.integrations import (
    GitHubClient,
    OrchestratorClient,
)
from data_platform_copilot_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)
from data_platform_copilot_spark.pipelines import daily_sales


def run(coro):
    return asyncio.get_event_loop().run_until_complete(coro)


class TestMultimodal:
    def test_feature_extraction_schema_and_determinism(self, spark):
        media = synthetic_media(spark, n=24)
        feats = extract_features(media)
        rows = {r["media_id"]: r for r in feats.collect()}
        assert len(rows) == 24
        assert all(len(r["feature"]) == 8 for r in rows.values())
        assert rows[0]["n_bytes"] == 256
        assert rows[0]["sha256"] is not None
        # images/videos get dimensions; audio gets duration
        img = next(r for r in rows.values() if r["kind"] == "image")
        aud = next(r for r in rows.values() if r["kind"] == "audio")
        assert img["width"] is not None and img["duration_s"] is None
        assert aud["duration_s"] is not None and aud["width"] is None
        # deterministic: re-run yields identical features
        again = {r["media_id"]: r for r in extract_features(media).collect()}
        assert again[5]["feature"] == rows[5]["feature"]

    def test_frame_sampling_fanout(self, spark):
        media = synthetic_media(spark, n=24)
        frames = sample_frames(media, every_s=5.0)
        pdf = frames.toPandas()
        assert (pdf.groupby("media_id").frame_idx.min() == 0).all()
        assert (pdf["frame_ts_s"] == pdf["frame_idx"] * 5.0).all()

    def test_payload_never_shuffled(self, spark):
        # The decode stage must map over source partitions as-is: no
        # Exchange may appear below the mapInPandas node (shuffling
        # binary payloads is the anti-pattern this module bans).
        feats = extract_features(synthetic_media(spark, n=24))
        plan = feats._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            feats._jdf.queryExecution(), "formatted")
        assert "MapInPandas" in plan
        assert "Exchange" not in plan

    def test_features_joinable_with_relational(self, spark):
        media = synthetic_media(spark, n=12)
        feats = extract_features(media)
        joined = feats.join(media.select("media_id", "mime"), "media_id")
        assert joined.count() == 12


class _FakeHttp:
    """Scripted (method, url) -> (status, body) transport."""

    def __init__(self, script):
        self.script = script
        self.calls = []

    async def __call__(self, method, url, json=None, headers=None):
        self.calls.append((method, url, json))
        for (m, frag), resp in self.script:
            if m == method and frag in url:
                return resp
        return 404, {}


class TestGitHubClient:
    def test_branch_upsert_pr_flow(self):
        fake = _FakeHttp([
            (("GET", "/git/ref/heads/main"),
             (200, {"object": {"sha": "abc123"}})),
            (("POST", "/git/refs"), (201, {})),
            (("GET", "/contents/models/x.sql"), (404, {})),
            (("PUT", "/contents/models/x.sql"), (201, {})),
            (("POST", "/pulls"), (201, {"number": 7, "html_url": "u"})),
        ])
        gh = GitHubClient(fake, "o/r", "tok")
        run(gh.create_branch("feat", "main"))
        run(gh.upsert_file("feat", "models/x.sql",
                           base64.b64encode(b"SELECT 1").decode(), "add"))
        pr = run(gh.open_pr("feat", "main", "title"))
        assert pr["number"] == 7
        put = next(c for c in fake.calls if c[0] == "PUT")
        assert "sha" not in put[2]  # create path: no sha probe hit

    def test_existing_branch_tolerated_and_update_sha(self):
        fake = _FakeHttp([
            (("GET", "/git/ref/heads/main"),
             (200, {"object": {"sha": "abc"}})),
            (("POST", "/git/refs"), (422, {})),  # exists
            (("GET", "/contents/f"), (200, {"sha": "oldsha"})),
            (("PUT", "/contents/f"), (200, {})),
        ])
        gh = GitHubClient(fake, "o/r", "tok")
        run(gh.create_branch("feat", "main"))  # no raise on 422
        run(gh.upsert_file("feat", "f", "QQ==", "update"))
        put = next(c for c in fake.calls if c[0] == "PUT")
        assert put[2]["sha"] == "oldsha"  # update path carries the sha


class TestOrchestrator:
    def test_run_flow_and_status(self):
        fake = _FakeHttp([
            (("POST", "/deployments/filter"),
             (200, {"deployments": [{"id": "dep-1"}]})),
            (("POST", "/deployments/dep-1/create_flow_run"),
             (201, {"id": "run-9"})),
            (("GET", "/flow_runs/run-9"),
             (200, {"state": {"type": "COMPLETED"}})),
        ])
        oc = OrchestratorClient(fake, "http://prefect/api")
        run_id = run(oc.run_flow("daily_sales", {"days_back": 1}))
        assert run_id == "run-9"
        assert run(oc.get_status(run_id)) == "COMPLETED"


class TestPipeline:
    def test_daily_sales_flow(self, spark, sf_dir, tmp_path):
        out = daily_sales(spark, sf_dir, str(tmp_path / "daily"),
                          "1997-01-01", "1997-02-01")
        pdf = out.toPandas()
        assert 0 < len(pdf) <= 31  # at most one row per January day
        assert (pdf["n_orders"] > 0).all()
        # half-open window respected
        assert str(pdf["day"].min()) >= "1997-01-01"
        assert str(pdf["day"].max()) <= "1997-01-31"


def test_resize_plumbing_no_shuffle(spark):
    from data_platform_copilot_spark.operators.multimodal import (
        resize_images,
        synthetic_media,
    )
    media = synthetic_media(spark, n=32)
    out = resize_images(media, target_w=64, target_h=64)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan  # payloads never shuffle
    rows = out.collect()
    assert rows and all(r["out_bytes"] == 64 * 64 // 64 for r in rows)
    assert all(len(bytes(r["payload"])) == r["out_bytes"] for r in rows)
    # deterministic: same input -> same resized bytes
    again = resize_images(media, target_w=64, target_h=64).collect()
    assert sorted(bytes(r["payload"]) for r in rows) == \
        sorted(bytes(r["payload"]) for r in again)
