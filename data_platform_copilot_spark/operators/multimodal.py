"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schema, partition-
preserving mapInPandas plumbing, Arrow batch shapes — and IMAGE
decode is real for PNG payloads in any environment (pure-stdlib
codec, operators/png.py) and for every other raster format when
Pillow is importable (attempted at call time). Payloads that carry
no image magic (the synthetic ASCII fixtures) keep the deterministic
sha256-derived fake decode the DuckDB oracle replays; a real
non-PNG image without Pillow is the ONLY image case that still
raises ``NotImplementedError``. AUDIO decode is real for RIFF/WAVE
PCM payloads (pure-stdlib codec, operators/wav.py) and VIDEO decode
is real for uncompressed-DIB AVI payloads (operators/avi.py) in any
environment — the full real-decode trifecta with zero dependencies;
only compressed audio/video codecs remain stubbed behind
``DECODERS`` (no torchaudio/pyav in this container): swap in real
implementations in production and nothing else changes.

Design for 100 TB of media:
- Binary payloads stay columnar (parquet BINARY) and are NEVER
  shuffled: decode/feature steps are mapInPandas (per-partition,
  no exchange); only the small extracted-feature columns flow into
  joins/aggs.
- ``maxRecordsPerBatch`` bounds Arrow batch memory when payloads are
  large; real deployments also set
  spark.sql.parquet.columnarReaderBatchSize down for fat rows.
- Frame sampling / resizing emit one row per artifact via the
  iterator contract, so a 2-hour video never materializes fully.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, duration_s double, feature array<float>"
)


def _fake_decode(payload: bytes, kind: str) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: derives pseudo
    width/height/duration and an 8-dim feature vector from the
    sha256 of the bytes (sha256, not sha1: the DuckDB oracle can
    recompute it — see queries/extras2.py multimodal_features).
    Every derived value is exactly representable in both engines:
    (b-128)/128 is a dyadic rational and b/8.0 has exactly three
    decimal digits, so no rounding divergence is possible. Replace
    via DECODERS in production."""
    if payload is None:
        raise NotImplementedError("real decoder required for NULL payload")
    h = hashlib.sha256(payload).digest()
    feat = [(b - 128) / 128.0 for b in h[:8]]
    return {
        "width": 16 + h[0] % 1024 if kind in ("image", "video") else None,
        "height": 16 + h[1] % 1024 if kind in ("image", "video") else None,
        "duration_s": h[2] / 8.0 if kind in ("audio", "video") else None,
        "feature": feat,
    }


_IMAGE_MAGIC = (b"\xff\xd8\xff",          # JPEG
                b"GIF87a", b"GIF89a",     # GIF
                b"BM",                    # BMP
                b"RIFF")                  # WEBP (RIFF container)


def _pil_rows(payload: bytes):
    """Decode any Pillow-supported format to (w, h, 3, RGB rows) —
    import attempted at CALL time so environments without Pillow only
    fail on payloads that actually need it."""
    import io

    from PIL import Image  # noqa: PLC0415 — call-time optional dep
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    w, h = img.size
    raw = img.tobytes()
    rows = [bytearray(raw[y * w * 3:(y + 1) * w * 3]) for y in range(h)]
    return w, h, 3, rows


def _image_rows(payload: bytes):
    """Real pixel access for an image payload, or None when the bytes
    carry no image magic (synthetic fixtures -> fake decode)."""
    from . import png
    if png.is_png(payload):
        try:
            return png.decode(payload)
        except png.UnsupportedPNG:
            pass  # exotic PNG shape: fall through to Pillow
    elif not payload.startswith(_IMAGE_MAGIC):
        return None
    try:
        return _pil_rows(payload)
    except ImportError:
        raise NotImplementedError(
            "non-PNG image payload needs Pillow (pip install pillow); "
            "PNG decodes without it via operators/png.py") from None


def _image_decode(payload: bytes, kind: str) -> dict[str, Any]:
    """Image decode: real dimensions + 8-band luminance feature for
    real image payloads, sha256-derived fake for opaque fixtures."""
    if payload is None:
        raise NotImplementedError("real decoder required for NULL payload")
    shaped = _image_rows(payload)
    if shaped is None:
        return _fake_decode(payload, kind)
    from .png import luminance_bands
    w, h, ch, rows = shaped
    return {"width": w, "height": h, "duration_s": None,
            "feature": [float(v) for v in
                        luminance_bands(w, h, ch, rows)]}


def _audio_decode(payload: bytes, kind: str) -> dict[str, Any]:
    """Audio decode: real sample-rate/duration + 8-band mean-abs
    feature for RIFF/WAVE PCM payloads (pure-stdlib codec,
    operators/wav.py — the audio twin of the PNG path), sha256 fake
    for opaque fixtures, NotImplementedError only for genuinely
    undecodable compressed formats (no audio libs in container)."""
    from . import wav
    if payload is None:
        raise NotImplementedError("real decoder required for NULL payload")
    if not wav.is_wav(payload):
        return _fake_decode(payload, kind)
    rate, _ch, _bits, frames = wav.decode(payload)
    return {"width": None, "height": None,
            "duration_s": len(frames) / rate,
            "feature": [float(v) for v in wav.mean_abs_bands(frames)]}


def _video_decode(payload: bytes, kind: str) -> dict[str, Any]:
    """Video decode: real dimensions/duration + 8-temporal-band mean
    luminance for uncompressed-DIB AVI payloads (pure-stdlib codec,
    operators/avi.py — completes the PNG/WAV real-decode trifecta),
    sha256 fake for opaque fixtures. Compressed video raises inside
    the codec and also falls back to the fake (a compressed payload
    without pyav is indistinguishable from opaque bytes here)."""
    from . import avi
    if payload is None:
        raise NotImplementedError("real decoder required for NULL payload")
    if not avi.is_avi(payload):
        return _fake_decode(payload, kind)
    try:
        w, h, fps, frames = avi.decode(payload)
    except avi.UnsupportedAVI:
        return _fake_decode(payload, kind)
    return {"width": w, "height": h,
            "duration_s": len(frames) / fps,
            "feature": [float(v) for v in
                        avi.temporal_luma_bands(w, h, frames)]}


DECODERS: dict[str, Callable[[bytes, str], dict[str, Any]]] = {
    "image": _image_decode,
    "audio": _audio_decode,
    "video": _video_decode,
}


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media fixture: payload bytes derived from the id.

    The payload is the ASCII hexdigest repeated 4x (256 bytes) —
    opaque binary to the Spark side, but byte-identical to a VARCHAR
    DuckDB can rebuild, so the oracle can recompute the payload
    digest (DuckDB's sha256 only accepts VARCHAR, not BLOB)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.sha256(f"media-{i}".encode()).hexdigest() * 4
                   ).encode("ascii")
        rows.append((i, kind, bytearray(payload),
                     f"application/x-{kind}", {"src": f"synth://{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame,
                     batch_rows: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches,
    per-partition, zero shuffle). Output: FEATURE_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload) if rec.payload is not None else None
                decoded = DECODERS[rec.kind](payload, rec.kind)
                out.append({
                    "media_id": rec.media_id,
                    "kind": rec.kind,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "sha256": hashlib.sha256(payload).hexdigest()
                    if payload is not None else None,
                    **decoded,
                })
            yield pd.DataFrame(out)

    # No repartition here, ever: that would shuffle the binary
    # payloads (the exact anti-pattern this module's contract bans).
    # Parallelism comes from the SOURCE split: size
    # spark.sql.files.maxPartitionBytes at read time so the scan
    # yields enough partitions for the decode stage.
    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_s: float = 10.0) -> DataFrame:
    """Frame-sampling plumbing for video rows: explodes each video into
    frame rows (media_id, frame_idx, frame_ts_s). The frame *decode*
    is the stubbed step; the row fan-out contract is real."""
    videos = df.where(F.col("kind") == "video")
    feats = extract_features(videos)
    n_frames = F.greatest(
        (F.col("duration_s") / F.lit(every_s)).cast("int"), F.lit(1))
    return (
        feats
        .withColumn("frame_idx",
                    F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select("media_id",
                "frame_idx",
                (F.col("frame_idx") * F.lit(every_s)).alias("frame_ts_s"))
    )


def media_exact_duplicates(media: DataFrame) -> DataFrame:
    """Exact media dedup on the raw binary payload: (media_id, kind,
    payload_sha256, cluster_id, is_duplicate) — cluster = min id per
    digest. The binary-column analogue of text exact dedup: content
    hashing is a per-row expression over the BLOB (no decode), one
    digest-keyed window, no join-back. At 100 TB of media this is the
    first pass of every pipeline — re-crawled/re-encoded-identical
    assets collapse before any expensive decode runs.
    """
    from pyspark.sql import Window as W
    hashed = media.select(
        "media_id", "kind",
        F.sha2(F.col("payload"), 256).alias("payload_sha256"))
    w = W.partitionBy("payload_sha256")
    return (hashed
            .withColumn("cluster_id", F.min("media_id").over(w))
            .withColumn("is_duplicate",
                        F.col("media_id") != F.col("cluster_id")))


def synthetic_media_with_dupes(spark: SparkSession, n: int = 64,
                               n_unique: int = 48) -> DataFrame:
    """Media fixture with PLANTED exact duplicates: ids >= n_unique
    repeat the payload of id % n_unique (kind still follows the id),
    so payload-level dedup has real work."""
    import hashlib as _h
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (_h.sha256(f"media-{i % n_unique}".encode()).hexdigest()
                   * 4).encode("ascii")
        rows.append((i, kind, bytearray(payload),
                     f"application/x-{kind}", {"src": f"synth://{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_png_media(spark: SparkSession, n: int = 16) -> DataFrame:
    """Media fixture whose payloads are REAL PNG files (encoded by the
    pure-stdlib codec): deterministic RGB gradients with per-id
    dimensions, so decode tests have ground-truth width/height/pixels
    without any image library."""
    rows = []
    for i in range(n):
        w, h = 8 + (i * 5) % 24, 8 + (i * 3) % 24
        pix = [bytearray(((x * 31 + i) % 256, (y * 17 + i) % 256,
                          (x * y + i) % 256)[c]
                         for x in range(w) for c in range(3))
               for y in range(h)]
        from . import png
        rows.append((i, "image", bytearray(png.encode(w, h, 3, pix)),
                     "image/png", {"src": f"synth-png://{i}",
                                   "w": str(w), "h": str(h)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_png_media_dups(spark: SparkSession,
                             n: int = 12) -> DataFrame:
    """PNG fixture with planted BYTE-DISTINCT, PIXEL-IDENTICAL pairs:
    ids 0..n-1 are the gradient images of ``synthetic_png_media``
    (zlib level 6); ids n..2n-1 re-encode the SAME pixels as id-n at
    zlib level 1. sha256-based exact dedup sees 2n distinct files;
    perceptual hashing must pair them — the precise failure mode
    image near-dup exists for."""
    from . import png
    rows = []
    for j in range(2 * n):
        i = j % n
        w, h = 8 + (i * 5) % 24, 8 + (i * 3) % 24
        pix = [bytearray(((x * 31 + i) % 256, (y * 17 + i) % 256,
                          (x * y + i) % 256)[c]
                         for x in range(w) for c in range(3))
               for y in range(h)]
        level = 6 if j < n else 1
        rows.append((j, "image",
                     bytearray(png.encode(w, h, 3, pix, level=level)),
                     "image/png", {"src": f"synth-png://{j}",
                                   "base": str(i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_png_media_near_dups(spark: SparkSession,
                                  n: int = 12) -> DataFrame:
    """PNG fixture with planted NEAR-duplicate pairs: ids 0..n-1 are
    the gradient images of ``synthetic_png_media``; ids n..2n-1 carry
    the SAME pixels as id-n except one saturated grid cell (every
    pixel whose 8x8 mesh cell is (d, d), d = i % 4, goes white) — a
    lightly-edited variant whose aHash differs by a FEW bits, not
    zero. Exact phash equality cannot pair base with variant;
    Hamming-radius matching must. Every pixel is formula-determined,
    so a SQL oracle replays the hashes and the exact pair set."""
    from . import png
    rows = []
    for j in range(2 * n):
        i = j % n
        w, h = 8 + (i * 5) % 24, 8 + (i * 3) % 24
        d = i % 4
        pix = []
        for y in range(h):
            row = bytearray()
            for x in range(w):
                if j >= n and (x * 8) // w == d and (y * 8) // h == d:
                    row.extend((255, 255, 255))
                else:
                    row.extend(((x * 31 + i) % 256, (y * 17 + i) % 256,
                                (x * y + i) % 256))
            pix.append(row)
        rows.append((j, "image",
                     bytearray(png.encode(w, h, 3, pix)),
                     "image/png", {"src": f"synth-png-near://{j}",
                                   "base": str(i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PHASH_SCHEMA = "media_id long, width int, height int, phash string"


def perceptual_hash(df: DataFrame, grid: int = 8,
                    batch_rows: int = 256) -> DataFrame:
    """Average-hash perceptual fingerprint over image payloads.

    The classic aHash recipe (downsample -> threshold on the mean ->
    bit string), restated in INTEGER arithmetic so the DuckDB oracle
    replays it bit-for-bit with no float-order divergence: luminance
    lum = (r+g+b)//3 per pixel, the image is partitioned into a
    grid×grid mesh by ``cell_y = y*grid//h``, and
    bit(cy,cx) = cell_sum * total_count > total_sum * cell_count
    (cross-multiplied cell mean vs global pixel mean — exact, no
    division anywhere). Output phash is the row-major '0'/'1' string.

    Scale: mapInPandas, zero shuffle — payloads never move; only the
    64-char hash flows into the downstream group/join. A
    Hamming-radius (<= t bits) variant buckets the hash into
    (t+1)-way bands exactly like operators/dedup.py's SimHash path.
    Non-image payloads (no magic) hash to NULL rather than erroring,
    so mixed media tables pass through.
    """
    import numpy as np

    def _hash_one(payload: bytes | None):
        if payload is None:
            return None, None, None
        shaped = _image_rows(payload)
        if shaped is None:
            return None, None, None
        w, h, ch, rows = shaped
        arr = np.frombuffer(b"".join(bytes(r) for r in rows),
                            dtype=np.uint8).reshape(h, w, ch)
        if ch >= 3:
            lum = arr[:, :, :3].astype(np.int64).sum(axis=2) // 3
        else:  # gray / gray+alpha: luminance IS the first channel
            lum = arr[:, :, 0].astype(np.int64)
        cy = (np.arange(h) * grid) // h
        cx = (np.arange(w) * grid) // w
        cells = np.zeros((grid, grid), np.int64)
        counts = np.zeros((grid, grid), np.int64)
        mesh = (np.repeat(cy, w), np.tile(cx, h))
        np.add.at(cells, mesh, lum.ravel())
        np.add.at(counts, mesh, 1)
        total_sum, total_count = int(lum.sum()), h * w
        bits = (cells * total_count) > (total_sum * counts)
        phash = "".join("1" if b else "0" for b in bits.ravel())
        return w, h, phash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = (bytes(rec.payload)
                           if rec.payload is not None else None)
                w, h, phash = _hash_one(payload)
                out.append({"media_id": rec.media_id, "width": w,
                            "height": h, "phash": phash})
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=PHASH_SCHEMA)


QC_PROFILE_SCHEMA = ("media_id long, width int, height int, n_px long, "
                     "sum_lum long, sum_sq_lum long, phash string")


def image_qc_profile(df: DataFrame, grid: int = 8,
                     batch_rows: int = 256) -> DataFrame:
    """ONE decode pass emitting everything downstream media QC needs:
    dimensions, integer luminance moments (sum, sum of squares — so
    contrast/variance gates stay in exact integer arithmetic the
    DuckDB oracle replays with no float boundary), and the aHash
    perceptual fingerprint (identical integer recipe to
    ``perceptual_hash``). A curation funnel that needs decode-derived
    quality stats AND near-dup grouping must not decode twice: it
    materializes this frame once and every stage reads the profile.

    Scale: mapInPandas, zero shuffle — payloads never move; only the
    ~100-byte profile row flows downstream. Non-image payloads
    profile to NULLs (phash NULL marks 'not decodable')."""
    import numpy as np

    def _profile_one(payload: bytes | None):
        if payload is None:
            return (None,) * 6
        shaped = _image_rows(payload)
        if shaped is None:
            return (None,) * 6
        w, h, ch, rows = shaped
        arr = np.frombuffer(b"".join(bytes(r) for r in rows),
                            dtype=np.uint8).reshape(h, w, ch)
        if ch >= 3:
            lum = arr[:, :, :3].astype(np.int64).sum(axis=2) // 3
        else:
            lum = arr[:, :, 0].astype(np.int64)
        cy = (np.arange(h) * grid) // h
        cx = (np.arange(w) * grid) // w
        cells = np.zeros((grid, grid), np.int64)
        counts = np.zeros((grid, grid), np.int64)
        mesh = (np.repeat(cy, w), np.tile(cx, h))
        np.add.at(cells, mesh, lum.ravel())
        np.add.at(counts, mesh, 1)
        total_sum, total_count = int(lum.sum()), h * w
        bits = (cells * total_count) > (total_sum * counts)
        phash = "".join("1" if b else "0" for b in bits.ravel())
        return (w, h, total_count, total_sum,
                int((lum * lum).sum()), phash)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = (bytes(rec.payload)
                           if rec.payload is not None else None)
                w, h, n_px, s, ss, phash = _profile_one(payload)
                out.append({"media_id": rec.media_id, "width": w,
                            "height": h, "n_px": n_px, "sum_lum": s,
                            "sum_sq_lum": ss, "phash": phash})
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=QC_PROFILE_SCHEMA)


def phash_hamming_pairs(hashed: DataFrame, radius: int = 4,
                        grid: int = 8) -> DataFrame:
    """Near-duplicate image pairs within a Hamming radius of the
    perceptual hash — the step beyond ``media_phash_neardup``'s exact
    equality grouping (pixel-identical re-encodings collide exactly;
    resized / lightly-edited variants differ by a few aHash bits).

    Pigeonhole banding (the SimHash trick, operators/dedup.py): split
    the grid²-bit hash into ``radius + 1`` contiguous bands — any
    pair within ``radius`` bits agrees EXACTLY on at least one band —
    self-join per band, then re-score candidates with the exact
    popcount distance and keep dist <= radius. Zero false negatives
    by construction; the verify step kills band-collision false
    positives. Distance is computed JVM-side: each 32-bit half of the
    bit string -> conv(base 2) -> xor -> bit_count, no Python stage.

    Scale: payloads are NOT inputs — this takes the (media_id, phash)
    profile (from ``perceptual_hash`` / ``image_qc_profile``), so the
    join exchanges carry ~70-byte rows; candidate volume is
    O(Σ band-bucket²), the same sub-quadratic shape as the MinHash
    and SimHash text paths, never an all-pairs product.

    Input: DataFrame with ``media_id`` and ``phash`` ('0'/'1' string,
    grid² chars; NULL phash rows — undecodable media — are dropped).
    Output: (media_id_a, media_id_b, hamming_dist), a < b, one row
    per qualifying pair.
    """
    nbits = grid * grid
    bands = radius + 1
    # band boundaries cover all bits (last band absorbs the remainder)
    width = nbits // bands
    h = hashed.where(F.col("phash").isNotNull()).select(
        "media_id", "phash")
    band_cols = [
        F.substring("phash", i * width + 1,
                    (nbits - i * width) if i == bands - 1 else width)
        .alias(f"b{i}")
        for i in range(bands)
    ]
    banded = h.select(
        "media_id", "phash",
        F.posexplode(F.array(*band_cols)).alias("band", "val"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.val") == F.col("b.val"))
                   & (F.col("a.media_id") < F.col("b.media_id")))
            .select(F.col("a.media_id").alias("media_id_a"),
                    F.col("b.media_id").alias("media_id_b"),
                    F.col("a.phash").alias("pa"),
                    F.col("b.phash").alias("pb"))
            .distinct())  # a pair may co-bucket in several bands

    def _half(col: str, lo: int, ln: int):
        return F.conv(F.substring(col, lo, ln), 2, 10).cast("long")

    dist = sum(
        F.bit_count(_half("pa", i * 32 + 1, min(32, nbits - i * 32))
                    .bitwiseXOR(_half("pb", i * 32 + 1,
                                      min(32, nbits - i * 32))))
        for i in range((nbits + 31) // 32))
    return (cand.withColumn("hamming_dist", dist.cast("int"))
            .where(F.col("hamming_dist") <= radius)
            .select("media_id_a", "media_id_b", "hamming_dist"))


RESIZE_SCHEMA = ("media_id long, kind string, target_w int, target_h int,"
                 " out_bytes long, payload binary")


def resize_images(df: DataFrame, target_w: int = 224,
                  target_h: int = 224,
                  batch_rows: int = 256) -> DataFrame:
    """Image-resize plumbing (the preprocessing step every vision
    training pipeline runs): Arrow-batched mapInPandas over image
    rows, payload in -> resized payload out, NO shuffle of the
    binary column (same contract as extract_features — parallelism
    comes from the source split). REAL image payloads take the real
    pixel path: PNG decodes via the pure-stdlib codec (any
    environment), other raster formats via Pillow when importable;
    the output is a nearest-neighbor resample re-encoded as PNG.
    Payloads with no image magic (the synthetic fixtures) keep the
    deterministic repetition/truncation stand-in so the batch shape,
    output schema, size accounting, and bytes-in/bytes-out plumbing
    stay testable with opaque bytes."""

    def _resize_stub(payload: bytes) -> bytes:
        out_len = max(1, target_w * target_h // 64)
        if not payload:
            raise NotImplementedError(
                "real image codec required for empty payload")
        reps = out_len // len(payload) + 1
        return (payload * reps)[:out_len]

    def _resize(payload: bytes) -> bytes:
        from . import png
        if not payload:
            return _resize_stub(payload)
        shaped = _image_rows(payload)
        if shaped is None:
            return _resize_stub(payload)
        w, h, ch, rows = shaped
        return png.encode(target_w, target_h, ch,
                          png.resize_nearest(w, h, ch, rows,
                                             target_w, target_h))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload) if rec.payload is not None \
                    else None
                resized = _resize(payload)
                out.append({"media_id": rec.media_id, "kind": rec.kind,
                            "target_w": target_w, "target_h": target_h,
                            "out_bytes": len(resized),
                            "payload": resized})
            yield pd.DataFrame(out)

    return (df.where(F.col("kind") == "image")
            .mapInPandas(run, schema=RESIZE_SCHEMA))


def synthetic_wav_media(spark: SparkSession, n: int = 16) -> DataFrame:
    """Media fixture whose payloads are REAL PCM WAV files (encoded
    by the pure-stdlib codec): deterministic integer sawtooth
    waveforms with per-id rate/length/step, so decode tests have
    ground-truth frames without any audio library."""
    from . import wav
    rows = []
    for i in range(n):
        rate = 8000 + (i % 4) * 2000
        n_frames = 1000 + i * 64
        step = 3 + (i % 5)
        frames = [(((t * step + i * 7) % 4096) - 2048,)
                  for t in range(n_frames)]
        rows.append((i, "audio",
                     bytearray(wav.encode(rate, 1, 16, frames)),
                     "audio/wav", {"src": f"synth-wav://{i}",
                                   "rate": str(rate),
                                   "frames": str(n_frames)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_avi_media(spark: SparkSession, n: int = 12) -> DataFrame:
    """Media fixture whose payloads are REAL uncompressed-DIB AVI
    files (encoded by the pure-stdlib codec): deterministic gradient
    frames with per-id dimensions/fps/length, so video decode tests
    have ground-truth pixels without any video library."""
    from . import avi
    rows = []
    for i in range(n):
        w, h = 4 + (i % 4) * 2, 3 + (i % 3) * 2
        fps, n_frames = 4 + i % 3, 6 + i % 5
        frames = []
        for t in range(n_frames):
            frames.append([
                bytearray(((x * 31 + t + i) % 256,
                           (y * 17 + t + i) % 256,
                           (x * y + t + i) % 256)[c]
                          for x in range(w) for c in range(3))
                for y in range(h)])
        rows.append((i, "video",
                     bytearray(avi.encode(w, h, fps, frames)),
                     "video/x-msvideo", {"src": f"synth-avi://{i}",
                                         "fps": str(fps),
                                         "frames": str(n_frames)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAME_SCHEMA = ("media_id long, frame_idx int, frame_ts_s double, "
                "width int, height int, frame_png binary")


def extract_video_frames(df: DataFrame, every_s: float = 1.0,
                         batch_rows: int = 64) -> DataFrame:
    """Video -> image corpus: REAL frame extraction for decodable
    (uncompressed-DIB AVI) payloads — each sampled frame re-encoded
    as a standalone PNG still through the stdlib codecs, so the
    output rows feed directly into the image pipeline (aHash
    near-dup, resize, feature bands). Sampling keeps the frame whose
    timestamp floor-matches each ``every_s`` tick (first frame
    always kept). Non-AVI video payloads yield no rows here — they
    stay on the metadata-only `sample_frames` path until a real
    codec is swapped into DECODERS.

    Scale: mapInPandas over the video partition — payloads never
    shuffle; each task emits its own videos' stills via the iterator
    contract, so a long video streams out one Arrow batch at a time.
    """
    from . import avi, png

    videos = df.where(F.col("kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = (bytes(rec.payload)
                           if rec.payload is not None else None)
                if payload is None or not avi.is_avi(payload):
                    continue
                try:
                    w, h, fps, frames = avi.decode(payload)
                except avi.UnsupportedAVI:
                    continue
                step = max(int(round(every_s * fps)), 1)
                for idx in range(0, len(frames), step):
                    out.append({
                        "media_id": rec.media_id,
                        "frame_idx": idx,
                        "frame_ts_s": idx / fps,
                        "width": w,
                        "height": h,
                        "frame_png": bytearray(
                            png.encode(w, h, 3, frames[idx])),
                    })
                if len(out) >= batch_rows:
                    yield pd.DataFrame(out)
                    out = []
            if out:
                yield pd.DataFrame(out)

    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


def audio_silence_stats(df: DataFrame, threshold: int = 256,
                        ) -> DataFrame:
    """Audio QC: per decodable (WAV PCM) payload, how many frames sit
    below ``threshold`` absolute amplitude — the silence-trimming
    signal an audio-pretraining pipeline computes before chunking.
    Integer comparisons over integer samples: both engines and any
    replay agree exactly. mapInPandas, zero payload shuffle."""
    from . import wav

    audio = df.where(F.col("kind") == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = (bytes(rec.payload)
                           if rec.payload is not None else None)
                if payload is None or not wav.is_wav(payload):
                    continue
                try:
                    _rate, _ch, _bits, frames = wav.decode(payload)
                except wav.UnsupportedWAV:
                    continue
                n_silent = sum(
                    1 for fr in frames if abs(fr[0]) < threshold)
                out.append({"media_id": rec.media_id,
                            "n_frames": len(frames),
                            "n_silent": n_silent})
            yield pd.DataFrame(
                out, columns=["media_id", "n_frames", "n_silent"])

    return audio.mapInPandas(
        run, schema="media_id long, n_frames long, n_silent long")


def video_scene_stats(df: DataFrame, threshold: float = 10.0,
                      ) -> DataFrame:
    """Video QC: per decodable (uncompressed AVI) payload, count
    scene cuts — consecutive-frame pairs whose mean absolute
    luminance delta ((r+g+b) DIV 3 per pixel) exceeds ``threshold``
    — plus the widest intra-scene and narrowest cut delta, so a
    caller can verify the threshold separates the two populations.
    Integer pixel sums divide to exact rationals: engine-portable.
    mapInPandas, zero payload shuffle."""
    from . import avi

    videos = df.where(F.col("kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                payload = (bytes(rec.payload)
                           if rec.payload is not None else None)
                if payload is None or not avi.is_avi(payload):
                    continue
                try:
                    w, h, _fps, frames = avi.decode(payload)
                except avi.UnsupportedAVI:
                    continue
                lums = []
                for rows in frames:
                    lums.append([
                        (row[3 * x] + row[3 * x + 1] + row[3 * x + 2]) // 3
                        for row in rows for x in range(w)])
                n_cuts = 0
                max_intra = 0.0
                min_cut = None
                for t in range(1, len(frames)):
                    d = sum(abs(a - b) for a, b in
                            zip(lums[t], lums[t - 1])) / (w * h)
                    if d > threshold:
                        n_cuts += 1
                        min_cut = d if min_cut is None else min(min_cut, d)
                    else:
                        max_intra = max(max_intra, d)
                out.append({"media_id": rec.media_id,
                            "n_frames": len(frames),
                            "n_cuts": n_cuts,
                            "max_intra_delta": float(max_intra),
                            "min_cut_delta": min_cut})
            yield pd.DataFrame(out, columns=[
                "media_id", "n_frames", "n_cuts",
                "max_intra_delta", "min_cut_delta"])

    return videos.mapInPandas(
        run, schema="media_id long, n_frames long, n_cuts long, "
                    "max_intra_delta double, min_cut_delta double")


def synthetic_avi_scene_media(spark: SparkSession,
                              n: int = 10) -> DataFrame:
    """AVI fixture with PLANTED scene cuts: every third frame starts
    a new scene (pixel formulas shift by 97*scene), so within-scene
    deltas are ~1 luma level and cut deltas are ~90 — ground truth
    for scene-change detection: cuts at t in {3, 6, ...}."""
    from . import avi
    rows = []
    for i in range(n):
        w, h = 4 + (i % 4) * 2, 3 + (i % 3) * 2
        fps, n_frames = 4 + i % 3, 8 + i % 5
        frames = []
        for t in range(n_frames):
            scene = t // 3
            s = i + 97 * scene
            frames.append([
                bytearray(((x * 31 + t + s) % 256,
                           (y * 17 + t + s) % 256,
                           (x * y + t + s) % 256)[c]
                          for x in range(w) for c in range(3))
                for y in range(h)])
        rows.append((i, "video",
                     bytearray(avi.encode(w, h, fps, frames)),
                     "video/x-msvideo", {"src": f"synth-scene://{i}",
                                         "scene_len": "3"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def sniff_kind(payload_col):
    """Magic-byte media-kind classifier as a pure JVM expression:
    PNG/JPEG/GIF/BMP -> image, RIFF+WAVE -> audio, RIFF+AVI -> video,
    else NULL (opaque). Runs in the scan stage — no Python, no
    shuffle — so kind routing at ingest costs nothing."""
    head = F.substring(payload_col, 1, 12)
    riff_type = F.substring(payload_col, 9, 4)
    return (
        F.when(F.substring(payload_col, 1, 8)
               == F.lit(bytes(b"\x89PNG\r\n\x1a\n")), "image")
        .when(F.substring(payload_col, 1, 3) == F.lit(b"\xff\xd8\xff"),
              "image")
        .when(F.substring(payload_col, 1, 6).isin(
            F.lit(b"GIF87a"), F.lit(b"GIF89a")), "image")
        .when(F.substring(payload_col, 1, 2) == F.lit(b"BM"), "image")
        .when((F.substring(payload_col, 1, 4) == F.lit(b"RIFF"))
              & (riff_type == F.lit(b"WAVE")), "audio")
        .when((F.substring(payload_col, 1, 4) == F.lit(b"RIFF"))
              & (riff_type == F.lit(b"AVI ")), "video")
        .otherwise(F.lit(None).cast("string")).alias("kind")
    ) if head is not None else None


def load_media_dir(spark: SparkSession, path: str,
                   glob: str | None = None) -> DataFrame:
    """Raw media files -> MEDIA_SCHEMA frame via Spark's built-in
    ``binaryFile`` source: one scan reads (path, length, content),
    kind comes from magic-byte sniffing IN the scan stage, media_id
    from a stable hash of the file path (xxhash64 is fine here — no
    oracle crosses this id), and unrecognized payloads keep
    kind='image'-less NULL so callers can route or drop them. This is
    the ingest edge of the multimodal pipeline: at 100 TB the source
    lists object-store prefixes in parallel, payloads stay columnar
    from the first byte, and `pathGlobFilter` prunes at listing time.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.coalesce(sniff_kind(F.col("content")), F.lit("opaque"))
        .alias("kind"),
        F.col("content").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.create_map(F.lit("src"), F.col("path"),
                     F.lit("bytes"), F.col("length").cast("string"))
        .alias("meta"))
