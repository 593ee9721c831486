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


class TestPNGCodec:
    """Pure-stdlib PNG codec: the real image-decode path that works
    without Pillow."""

    def test_roundtrip_all_color_types(self):
        from data_platform_copilot_spark.operators import png
        for ch in (1, 2, 3, 4):
            w, h = 7, 5
            rows = [bytearray((x * 13 + y * 7 + c * 3) % 256
                              for x in range(w) for c in range(ch))
                    for y in range(h)]
            payload = png.encode(w, h, ch, rows)
            assert png.is_png(payload)
            gw, gh, gch, grows = png.decode(payload)
            assert (gw, gh, gch) == (w, h, ch)
            assert [bytes(r) for r in grows] == [bytes(r) for r in rows]

    def test_decode_every_filter_type(self):
        # our encoder only emits filter 0; hand-filter the raw stream
        # with each of the five PNG filters and assert the decoder
        # unfilters back to the same pixels
        import struct
        import zlib

        from data_platform_copilot_spark.operators import png
        w, h, ch = 6, 5, 3
        rows = [bytearray((x * 29 + y * 11 + c * 5) % 256
                          for x in range(w) for c in range(ch))
                for y in range(h)]
        stride = w * ch
        filtered = bytearray()
        prev = bytearray(stride)
        for y, row in enumerate(rows):
            ftype = y % 5  # exercise 0,1,2,3,4
            filtered.append(ftype)
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                up = prev[i]
                upleft = prev[i - ch] if i >= ch else 0
                if ftype == 0:
                    v = row[i]
                elif ftype == 1:
                    v = row[i] - left
                elif ftype == 2:
                    v = row[i] - up
                elif ftype == 3:
                    v = row[i] - ((left + up) >> 1)
                else:
                    v = row[i] - png._paeth(left, up, upleft)
                filtered.append(v & 0xFF)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (png.SIGNATURE + png._chunk(b"IHDR", ihdr)
                   + png._chunk(b"IDAT", zlib.compress(bytes(filtered)))
                   + png._chunk(b"IEND", b""))
        gw, gh, gch, grows = png.decode(payload)
        assert (gw, gh, gch) == (w, h, ch)
        assert [bytes(r) for r in grows] == [bytes(r) for r in rows]

    def test_unsupported_shapes_raise(self):
        import struct
        import zlib

        from data_platform_copilot_spark.operators import png
        with __import__("pytest").raises(png.UnsupportedPNG):
            png.decode(b"not a png at all")
        # 16-bit depth is out of scope
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        deep = (png.SIGNATURE + png._chunk(b"IHDR", ihdr)
                + png._chunk(b"IDAT", zlib.compress(b"\x00" * 26))
                + png._chunk(b"IEND", b""))
        with __import__("pytest").raises(png.UnsupportedPNG):
            png.decode(deep)

    def test_resize_nearest_reference(self):
        from data_platform_copilot_spark.operators import png
        w, h, ch = 4, 4, 3
        rows = [bytearray((x * 50 + y * 20 + c) % 256
                          for x in range(w) for c in range(ch))
                for y in range(h)]
        out = png.resize_nearest(w, h, ch, rows, 2, 2)
        assert len(out) == 2 and all(len(r) == 2 * ch for r in out)
        for ty in range(2):
            for tx in range(2):
                sy, sx = ty * h // 2, tx * w // 2
                assert bytes(out[ty][tx * ch:(tx + 1) * ch]) == \
                    bytes(rows[sy][sx * ch:(sx + 1) * ch])


class TestRealImageDecode:
    """Real pixels flow through the SAME Arrow plumbing the fake
    decode uses — no schema/partitioning difference."""

    def test_png_media_real_dimensions_and_feature(self, spark):
        from data_platform_copilot_spark.operators import png
        from data_platform_copilot_spark.operators.multimodal import (
            extract_features,
            synthetic_png_media,
        )
        media = synthetic_png_media(spark, n=12)
        truth = {r["media_id"]: bytes(r["payload"])
                 for r in media.collect()}
        feats = {r["media_id"]: r
                 for r in extract_features(media).collect()}
        assert len(feats) == 12
        for mid, payload in truth.items():
            w, h, ch, rows = png.decode(payload)
            got = feats[mid]
            assert (got["width"], got["height"]) == (w, h)
            assert got["duration_s"] is None
            want = png.luminance_bands(w, h, ch, rows)
            assert [round(v, 5) for v in got["feature"]] == \
                [round(v, 5) for v in want]

    def test_opaque_payloads_keep_fake_decode(self, spark):
        # synthetic ASCII payloads carry no image magic: the sha256
        # oracle contract (queries/extras2.py multimodal_features)
        # must keep holding with the real decoder wired in
        import hashlib

        from data_platform_copilot_spark.operators.multimodal import (
            extract_features,
            synthetic_media,
        )
        media = synthetic_media(spark, n=9)
        rows = {r["media_id"]: r
                for r in extract_features(media).collect()}
        for r in media.collect():
            h = hashlib.sha256(bytes(r["payload"])).digest()
            got = rows[r["media_id"]]
            if r["kind"] in ("image", "video"):
                assert got["width"] == 16 + h[0] % 1024
            assert got["sha256"] == hashlib.sha256(
                bytes(r["payload"])).hexdigest()

    def test_resize_real_png_pixels(self, spark):
        from data_platform_copilot_spark.operators import png
        from data_platform_copilot_spark.operators.multimodal import (
            resize_images,
            synthetic_png_media,
        )
        media = synthetic_png_media(spark, n=6)
        truth = {r["media_id"]: bytes(r["payload"])
                 for r in media.collect()}
        out = {r["media_id"]: r
               for r in resize_images(media, target_w=5,
                                      target_h=4).collect()}
        assert len(out) == 6
        for mid, payload in truth.items():
            w, h, ch, rows = png.decode(payload)
            got = out[mid]
            gw, gh, gch, grows = png.decode(bytes(got["payload"]))
            assert (gw, gh, gch) == (5, 4, ch)
            want = png.resize_nearest(w, h, ch, rows, 5, 4)
            assert [bytes(r) for r in grows] == [bytes(r) for r in want]
            assert got["out_bytes"] == len(bytes(got["payload"]))

    def test_non_png_real_image_needs_pillow(self):
        import pytest

        from data_platform_copilot_spark.operators.multimodal import (
            _image_decode,
        )
        jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 32
        try:
            import PIL  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError, match="Pillow"):
                _image_decode(jpeg_ish, "image")
        else:
            # Pillow present: a truncated JPEG should raise ITS error,
            # never NotImplementedError
            with pytest.raises(Exception) as exc:
                _image_decode(jpeg_ish, "image")
            assert not isinstance(exc.value, NotImplementedError)


class TestPerceptualHash:
    def test_reencoded_pairs_byte_distinct_pixel_identical(self, spark):
        import hashlib

        from data_platform_copilot_spark.operators.multimodal import (
            perceptual_hash, synthetic_png_media_dups)
        media = synthetic_png_media_dups(spark, n=4)
        payloads = {r["media_id"]: bytes(r["payload"])
                    for r in media.collect()}
        hashes = {r["media_id"]: r["phash"]
                  for r in perceptual_hash(media).collect()}
        for i in range(4):
            # different bytes => sha-based exact dedup misses the pair
            assert payloads[i] != payloads[i + 4]
            assert (hashlib.sha256(payloads[i]).hexdigest()
                    != hashlib.sha256(payloads[i + 4]).hexdigest())
            # same pixels => identical perceptual hash
            assert hashes[i] == hashes[i + 4]
            assert len(hashes[i]) == 64
            assert set(hashes[i]) <= {"0", "1"}

    def test_opaque_payload_hashes_null(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            perceptual_hash, synthetic_media)
        out = perceptual_hash(synthetic_media(spark, n=6)).collect()
        assert all(r["phash"] is None for r in out)

    def test_no_shuffle_plan(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            perceptual_hash, synthetic_png_media_dups)
        plan = perceptual_hash(synthetic_png_media_dups(spark, n=4)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestWavCodec:
    def test_roundtrip_16bit_stereo(self):
        from data_platform_copilot_spark.operators import wav
        frames = [((t % 100) - 50, ((t * 7) % 200) - 100)
                  for t in range(500)]
        payload = wav.encode(44100, 2, 16, frames)
        rate, ch, bits, back = wav.decode(payload)
        assert (rate, ch, bits) == (44100, 2, 16)
        assert back == frames

    def test_roundtrip_8bit_mono(self):
        from data_platform_copilot_spark.operators import wav
        frames = [((t % 256) - 128,) for t in range(257)]  # odd bytes
        payload = wav.encode(8000, 1, 8, frames)
        rate, ch, bits, back = wav.decode(payload)
        assert (rate, ch, bits) == (8000, 1, 8)
        assert back == frames

    def test_unsupported_raises(self):
        import struct

        import pytest

        from data_platform_copilot_spark.operators import wav
        with pytest.raises(wav.UnsupportedWAV):
            wav.decode(b"not a wav at all")
        # non-PCM format tag
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
        bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        with pytest.raises(wav.UnsupportedWAV):
            wav.decode(bad)

    def test_mean_abs_bands_match_numpy(self):
        import numpy as np

        from data_platform_copilot_spark.operators import wav
        n = 1234
        samples = [((t * 13 + 5) % 4096) - 2048 for t in range(n)]
        frames = [(s,) for s in samples]
        got = wav.mean_abs_bands(frames)
        arr = np.abs(np.array(samples, dtype=np.int64))
        bands = np.minimum(np.arange(n) * 8 // n, 7)
        want = [arr[bands == b].mean() / 32768.0 for b in range(8)]
        assert np.allclose(got, want, atol=0)

    def test_audio_decoder_real_path(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            extract_features,
            synthetic_wav_media,
        )
        feats = extract_features(synthetic_wav_media(spark, n=4)).collect()
        by = {r.media_id: r for r in feats}
        # duration = n_frames / rate from the REAL header, not a hash
        assert by[0].duration_s == 1000 / 8000
        assert by[1].duration_s == 1064 / 10000
        assert all(r.width is None and r.height is None for r in feats)


class TestAviCodec:
    def _frames(self, w, h, n, seed=0):
        return [[bytearray(((x * 31 + t + seed) % 256,
                            (y * 17 + t + seed) % 256,
                            (x * y + t + seed) % 256)[c]
                           for x in range(w) for c in range(3))
                 for y in range(h)]
                for t in range(n)]

    def test_roundtrip(self):
        from data_platform_copilot_spark.operators import avi
        frames = self._frames(6, 4, 10)
        payload = avi.encode(6, 4, 5, frames)
        w, h, fps, back = avi.decode(payload)
        assert (w, h, fps) == (6, 4, 5.0)
        assert [bytes(r) for f in back for r in f] == \
               [bytes(r) for f in frames for r in f]

    def test_odd_width_stride_padding(self):
        from data_platform_copilot_spark.operators import avi
        frames = self._frames(5, 3, 4)  # stride 16 != 15
        w, h, fps, back = avi.decode(avi.encode(5, 3, 4, frames))
        assert [bytes(r) for f in back for r in f] == \
               [bytes(r) for f in frames for r in f]

    def test_compressed_and_garbage_raise(self):
        import pytest

        from data_platform_copilot_spark.operators import avi
        with pytest.raises(avi.UnsupportedAVI):
            avi.decode(b"definitely not an avi")
        payload = avi.encode(4, 3, 5, self._frames(4, 3, 2))
        with pytest.raises(avi.UnsupportedAVI):
            avi.decode(payload.replace(b"00db", b"00dc"))

    def test_temporal_bands_match_numpy(self):
        import numpy as np

        from data_platform_copilot_spark.operators import avi
        w, h, n = 6, 4, 13
        frames = self._frames(w, h, n, seed=3)
        got = avi.temporal_luma_bands(w, h, frames)
        lum = np.array([[(int(r[3 * x]) + r[3 * x + 1] + r[3 * x + 2]) // 3
                         for row in f for x in range(w)
                         for r in [row]]
                        for f in frames], dtype=np.int64)
        bands = np.minimum(np.arange(n) * 8 // n, 7)
        want = [lum[bands == b].mean() / 127.5 - 1.0 for b in range(8)]
        assert np.allclose(got, want, atol=0)

    def test_video_decoder_real_path(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            extract_features,
            synthetic_avi_media,
        )
        feats = extract_features(synthetic_avi_media(spark, n=3)).collect()
        by = {r.media_id: r for r in feats}
        # id 0: w=4, h=3, fps=4, n=6 -> duration from the REAL header
        assert (by[0].width, by[0].height) == (4, 3)
        assert by[0].duration_s == 6 * (1_000_000 // 4) / 1_000_000


class TestVideoFrameExtraction:
    def test_frames_become_decodable_png_stills(self, spark):
        from data_platform_copilot_spark.operators import png
        from data_platform_copilot_spark.operators.multimodal import (
            extract_video_frames,
            synthetic_avi_media,
        )
        media = synthetic_avi_media(spark, n=3)
        # every_s=0 -> step clamps to 1: every frame extracted
        stills = extract_video_frames(media, every_s=0.0).collect()
        by_media = {}
        for r in stills:
            by_media.setdefault(r.media_id, []).append(r)
        # id 0: w=4, h=3, fps=4, n_frames=6
        assert len(by_media[0]) == 6
        r0 = sorted(by_media[0], key=lambda r: r.frame_idx)[2]
        assert (r0.width, r0.height) == (4, 3)
        assert r0.frame_ts_s == 2 / 4
        w, h, ch, rows = png.decode(bytes(r0.frame_png))
        assert (w, h, ch) == (4, 3, 3)
        # pixels equal the generator formula for frame t=2 of id 0
        t, i = 2, 0
        want = [bytes(((x * 31 + t + i) % 256, (y * 17 + t + i) % 256,
                       (x * y + t + i) % 256)[c]
                      for x in range(w) for c in range(3))
                for y in range(h)]
        assert [bytes(r) for r in rows] == want

    def test_sampling_step_respects_fps(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            extract_video_frames,
            synthetic_avi_media,
        )
        media = synthetic_avi_media(spark, n=1)  # id 0: fps=4, 6 frames
        stills = extract_video_frames(media, every_s=0.5).collect()
        # step = round(0.5 * 4) = 2 -> frames 0, 2, 4
        assert sorted(r.frame_idx for r in stills) == [0, 2, 4]

    def test_stills_feed_the_image_pipeline(self, spark):
        from pyspark.sql import functions as F

        from data_platform_copilot_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_video_frames,
            perceptual_hash,
            synthetic_avi_media,
        )
        stills = extract_video_frames(synthetic_avi_media(spark, n=2),
                                      every_s=0.0)
        as_media = stills.select(
            (F.col("media_id") * 1000 + F.col("frame_idx"))
            .alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("frame_png").alias("payload"),
            F.lit("image/png").alias("mime"),
            F.create_map().cast("map<string,string>").alias("meta"))
        hashed = perceptual_hash(
            spark.createDataFrame(as_media.collect(), MEDIA_SCHEMA))
        rows = hashed.collect()
        assert len(rows) == 13  # id 0: 6 frames, id 1: 7 frames
        assert all(len(r.phash) == 64 for r in rows)


class TestMediaDirIngest:
    def test_binaryfile_ingest_sniffs_and_decodes(self, spark, tmp_path):
        from data_platform_copilot_spark.operators import avi, png, wav
        from data_platform_copilot_spark.operators.multimodal import (
            extract_features,
            load_media_dir,
        )
        # write one real file of each kind plus an opaque blob
        pix = [bytearray((x * 9 % 256) for x in range(4 * 3))
               for _ in range(3)]
        (tmp_path / "a.png").write_bytes(png.encode(4, 3, 3, pix))
        (tmp_path / "b.wav").write_bytes(
            wav.encode(8000, 1, 16, [(t % 100 - 50,) for t in range(400)]))
        frames = [[bytearray((t * 7 % 256) for _ in range(5 * 3))
                   for _ in range(4)] for t in range(3)]
        (tmp_path / "c.avi").write_bytes(avi.encode(5, 4, 5, frames))
        (tmp_path / "d.bin").write_bytes(b"opaque payload bytes")

        media = load_media_dir(spark, str(tmp_path))
        kinds = {r.meta["src"].split("/")[-1]: r.kind
                 for r in media.collect()}
        assert kinds == {"a.png": "image", "b.wav": "audio",
                         "c.avi": "video", "d.bin": "opaque"}
        # the ingested rows decode through the real codecs
        feats = {r.kind: r for r in extract_features(
            media.where(F.col("kind") != "opaque")).collect()}
        assert (feats["image"].width, feats["image"].height) == (4, 3)
        assert feats["audio"].duration_s == 400 / 8000
        assert feats["video"].duration_s == 3 * (1_000_000 // 5) / 1_000_000

    def test_glob_filter_prunes_at_listing(self, spark, tmp_path):
        from data_platform_copilot_spark.operators import wav
        from data_platform_copilot_spark.operators.multimodal import (
            load_media_dir,
        )
        (tmp_path / "x.wav").write_bytes(
            wav.encode(8000, 1, 16, [(0,)] * 10))
        (tmp_path / "y.txt").write_bytes(b"not media")
        only_wav = load_media_dir(spark, str(tmp_path), glob="*.wav")
        assert only_wav.count() == 1
        assert only_wav.first().kind == "audio"


class TestMediaQcFunnel:
    """pipeline_media_curation's decode-once contract (r7 verdict
    item 8): the funnel's six stages all read ONE shared
    image_qc_profile frame."""

    def test_decode_runs_once(self, spark, sf_dir):
        from data_platform_copilot_spark.operators.multimodal import (
            image_qc_profile, synthetic_png_media_dups)
        from data_platform_copilot_spark.queries import QUERIES

        # the profile operator itself is one Arrow decode pass
        prof_plan = image_qc_profile(
            synthetic_png_media_dups(spark, n=4)
        )._jdf.queryExecution().executedPlan().toString()
        assert prof_plan.count("MapInPandas") == 1

        df = QUERIES["pipeline_media_curation"](spark, sf_dir)
        rows = {r["stage"]: r["n_items"] for r in df.collect()}
        # executed funnel plan: the decode was hoisted into the ONE
        # materialized (localCheckpoint) profile, so NO stage subtree
        # carries its own MapInPandas decode — dropping
        # materialize_auto would re-embed one per stage (>0).
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 0
        # per-stage QC semantics on the planted fixture (12 bases x2):
        # 8 of 12 bases fail min-dim>=12 or integer-variance>=2000
        assert rows[0] == rows[1] == rows[2] == 24  # byte-distinct, all decode
        assert rows[3] == 8                         # QC band survivors
        assert rows[4] == rows[5] == 4              # re-encodings paired


class TestImageQcProfile:
    """image_qc_profile must agree with its two independent
    references: perceptual_hash (same aHash recipe, separate code
    path until r8) and direct numpy moments over the decoded pixels."""

    def test_phash_and_moments_consistent(self, spark):
        import numpy as np

        from data_platform_copilot_spark.operators import png
        from data_platform_copilot_spark.operators.multimodal import (
            image_qc_profile, perceptual_hash, synthetic_png_media_dups)

        media = synthetic_png_media_dups(spark, n=6)
        prof = {r["media_id"]: r
                for r in image_qc_profile(media).collect()}
        ph = {r["media_id"]: r["phash"]
              for r in perceptual_hash(media).collect()}
        assert set(prof) == set(ph) and len(prof) == 12
        for mid, row in prof.items():
            assert row["phash"] == ph[mid]
        # moments: replay the generator's pixel math directly
        for mid in (0, 5, 7):  # base, small, re-encoded copies
            i = mid % 6
            w, h = 8 + (i * 5) % 24, 8 + (i * 3) % 24
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            lum = (((x * 31 + i) % 256) + ((y * 17 + i) % 256)
                   + ((x * y + i) % 256)) // 3
            row = prof[mid]
            assert (row["width"], row["height"]) == (w, h)
            assert row["n_px"] == w * h
            assert row["sum_lum"] == int(lum.sum())
            assert row["sum_sq_lum"] == int((lum.astype(np.int64) ** 2).sum())

    def test_null_and_opaque_payloads_profile_null(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            image_qc_profile, synthetic_media)

        # sha256-derived opaque payloads are not decodable PNGs
        rows = image_qc_profile(synthetic_media(spark, n=6)).collect()
        assert len(rows) == 6
        assert all(r["phash"] is None and r["n_px"] is None for r in rows)


class TestPhashHammingPairs:
    """Banded Hamming near-dup over perceptual hashes: zero false
    negatives within the radius (pigeonhole), exact popcount
    re-score, payload-free plan."""

    def _brute(self, hashes, radius):
        out = set()
        ids = sorted(hashes)
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                d = sum(c1 != c2 for c1, c2 in
                        zip(hashes[x], hashes[y]))
                if d <= radius:
                    out.add((x, y, d))
        return out

    def test_matches_bruteforce_on_synthetic_hashes(self, spark):
        import random

        from data_platform_copilot_spark.operators.multimodal import (
            phash_hamming_pairs)

        rng = random.Random(7)
        base = "".join(rng.choice("01") for _ in range(64))

        def flip(s, k):
            pos = rng.sample(range(64), k)
            return "".join(("1" if c == "0" else "0") if i in pos else c
                           for i, c in enumerate(s))

        hashes = {0: base, 1: flip(base, 2), 2: flip(base, 4),
                  3: flip(base, 9),  # outside radius 4 of base
                  4: "".join(rng.choice("01") for _ in range(64)),
                  5: base}           # exact dup
        rows = [(k, v) for k, v in hashes.items()] + [(6, None)]
        df = spark.createDataFrame(rows, "media_id long, phash string")
        got = {(r["media_id_a"], r["media_id_b"], r["hamming_dist"])
               for r in phash_hamming_pairs(df, radius=4).collect()}
        assert got == self._brute(hashes, 4)
        assert (0, 5, 0) in got          # exact pair surfaces at dist 0
        assert all(p[0] != 3 and p[1] != 3 or p[2] <= 4 for p in got)

    def test_end_to_end_on_png_reencodings(self, spark):
        from data_platform_copilot_spark.operators.multimodal import (
            perceptual_hash, phash_hamming_pairs,
            synthetic_png_media_dups)

        hashed = perceptual_hash(synthetic_png_media_dups(spark, n=6))
        pairs = phash_hamming_pairs(hashed, radius=4)
        rows = pairs.collect()
        # every planted re-encoding pair (j, j+6) must surface at 0
        got = {(r["media_id_a"], r["media_id_b"]): r["hamming_dist"]
               for r in rows}
        for j in range(6):
            assert got.get((j, j + 6)) == 0
        # payload bytes are read by the ONE hash stage but never
        # cross an exchange — only ~70-byte profile rows shuffle
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert not any("payload" in ln for ln in plan.splitlines()
                       if "Exchange" in ln)
        assert plan.count("MapInPandas") == 1  # the hash pass only
        # the distance math stayed JVM-side
        assert "BatchEvalPython" not in plan
