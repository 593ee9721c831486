"""Multimodal feature-extraction query with a full value oracle.

The media fixture is deterministic (payload = sha256('media-i') * 4,
reference operators/multimodal.py), so DuckDB can regenerate the
corpus AND recompute every derived feature from hex-string math:
byte j of the digest is ('0x' || hex pair)::INT. The Spark side runs
the real decode plumbing (mapInPandas over Arrow batches); the oracle
proves the arithmetic contract end-to-end, not just row counts.

The 8-dim feature vector is covered by pytest (array-of-float
stringification differs across engines' pandas bridges, so it stays
out of the hash-compared projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import extract_features, synthetic_media
from .core import query, rnd

_N_MEDIA = 64

_ORACLE = f"""
WITH m AS (
    SELECT i AS media_id,
           CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS kind,
           repeat(sha256('media-' || i), 4) AS payload
    FROM range(0, {_N_MEDIA}) t(i)
), h AS (
    SELECT media_id, kind,
           CAST(length(payload) AS BIGINT) AS n_bytes,
           sha256(payload) AS digest
    FROM m
)
SELECT media_id, kind, n_bytes, digest AS sha256,
       CASE WHEN kind IN ('image', 'video')
            THEN 16 + ('0x' || substring(digest, 1, 2))::INT % 1024
       END AS width,
       CASE WHEN kind IN ('image', 'video')
            THEN 16 + ('0x' || substring(digest, 3, 2))::INT % 1024
       END AS height,
       CASE WHEN kind IN ('audio', 'video')
            THEN ('0x' || substring(digest, 5, 2))::INT / 8.0
       END AS duration_s
FROM h
"""


@query("multimodal_features", oracle=_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract the deterministic media corpus; every
    scalar feature is value-verified against DuckDB's recomputation
    of the same sha256-derived arithmetic."""
    feats = extract_features(synthetic_media(spark, n=_N_MEDIA))
    return feats.select("media_id", "kind", "n_bytes", "sha256",
                        "width", "height", "duration_s")


_N_PNG = 16

@query("multimodal_png_decode", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_PNG})) AS media_id)
SELECT media_id,
       CAST(8 + (media_id * 5) % 24 AS INT) AS width,
       CAST(8 + (media_id * 3) % 24 AS INT) AS height,
       TRUE AS bands_match
FROM ids
""")
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, value-gated: the fixture's payloads are
    actual PNG files (gradients with per-id dimensions and pixel
    formulas), Spark decodes the BYTES through the pure-stdlib codec
    inside the Arrow plumbing, and the result is checked two ways —
    width/height exactly against DuckDB replaying the generator's
    dimension arithmetic, and the 8-band luminance feature against a
    Spark-SQL replay of the generator's pixel formulas via the
    engine's epsilon-boolean pattern (same contract as the approx
    sketches: the oracle pins bands_match TRUE, so any codec bug
    flips the hash). float32 storage of the feature bounds the
    tolerance at 1e-5."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        extract_features,
        synthetic_png_media,
    )
    feats = extract_features(synthetic_png_media(spark, n=_N_PNG))
    # Spark-SQL replay of the generator: lum = (r+g+b) // 3 over the
    # gradient formulas, 8 horizontal bands, mean/127.5 - 1
    grid = spark.sql(f"""
        WITH ids AS (SELECT explode(sequence(0, {_N_PNG - 1})) AS i),
        dims AS (SELECT i, 8 + (i*5) % 24 AS w, 8 + (i*3) % 24 AS h
                 FROM ids),
        pix AS (
            SELECT i, w, h, y, x,
                   (((x*31 + i) % 256) + ((y*17 + i) % 256)
                    + ((x*y + i) % 256)) DIV 3 AS lum
            FROM dims
            LATERAL VIEW explode(sequence(0, h - 1)) AS y
            LATERAL VIEW explode(sequence(0, w - 1)) AS x
        )
        SELECT i AS media_id, least(y * 8 DIV h, 7) AS band,
               sum(lum) / count(*) / 127.5 - 1.0 AS want
        FROM pix GROUP BY 1, 2
    """)
    joined = (feats.select("media_id", "width", "height", "feature")
              .join(grid, "media_id"))
    diff = F.abs(F.element_at("feature", (F.col("band") + 1).cast("int"))
                 - F.col("want"))
    return (joined.groupBy("media_id", "width", "height")
            .agg((F.max(diff) < 1e-5).alias("bands_match")))


@query("media_exact_dedup", oracle=f"""
WITH m AS (
    SELECT i AS media_id,
           CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS kind,
           repeat(sha256('media-' || (i % 48)), 4) AS payload
    FROM range(0, {_N_MEDIA}) t(i)
), h AS (
    SELECT media_id, kind, sha256(payload) AS payload_sha256 FROM m
)
SELECT media_id, kind, payload_sha256,
       min(media_id) OVER (PARTITION BY payload_sha256) AS cluster_id,
       media_id <> min(media_id) OVER (PARTITION BY payload_sha256)
           AS is_duplicate
FROM h
""")
def media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact dedup over a media corpus with planted
    duplicate assets (ids >= 48 repeat earlier payloads): content
    digest, cluster representative and duplicate flag all
    value-verify against DuckDB rebuilding the identical bytes."""
    from ..operators.multimodal import (
        media_exact_duplicates,
        synthetic_media_with_dupes,
    )
    media = synthetic_media_with_dupes(spark, n=_N_MEDIA, n_unique=48)
    return media_exact_duplicates(media)


_N_PH = 12

@query("media_phash_neardup", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_PH})) AS i),
dims AS (SELECT i, 8 + (i*5) % 24 AS w, 8 + (i*3) % 24 AS h FROM ids),
pix AS (
    SELECT i, w, h, y, x,
           (((x*31 + i) % 256) + ((y*17 + i) % 256)
            + ((x*y + i) % 256)) // 3 AS lum
    FROM dims, unnest(range(0, h)) AS ty(y), unnest(range(0, w)) AS tx(x)
), cells AS (
    SELECT i, (y*8) // h AS cy, (x*8) // w AS cx,
           sum(lum) AS cs, count(*) AS cc
    FROM pix GROUP BY 1, 2, 3
), tot AS (
    SELECT i, sum(lum) AS ts, count(*) AS tc FROM pix GROUP BY 1
), hashes AS (
    SELECT c.i,
           string_agg(CASE WHEN c.cs * t.tc > t.ts * c.cc
                           THEN '1' ELSE '0' END, ''
                      ORDER BY c.cy, c.cx) AS phash
    FROM cells c JOIN tot t ON c.i = t.i GROUP BY c.i
), media AS (SELECT unnest(range(0, {2 * _N_PH})) AS media_id)
SELECT m.media_id, h.phash,
       CAST(min(m.media_id) OVER (PARTITION BY h.phash) AS BIGINT)
           AS group_id,
       CAST(count(*) OVER (PARTITION BY h.phash) AS BIGINT)
           AS group_size
FROM media m JOIN hashes h ON h.i = m.media_id % {_N_PH}
""")
def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup (aHash, integer-exact): the
    fixture plants byte-DISTINCT re-encodings of identical pixels
    (zlib level 6 vs 1) that sha256 exact dedup cannot pair; the
    pure-stdlib codec decodes both, the integer aHash matches them,
    and the oracle replays hash bits, groups and sizes from the
    generator's pixel formulas — the full decode→hash→group path is
    value-gated. Scale: hashing is a zero-shuffle mapInPandas
    (payloads never move); only (media_id, 64-char hash) reaches the
    grouping exchange. (Reference has no media ops — north-star
    brief addition.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        perceptual_hash,
        synthetic_png_media_dups,
    )
    ph = perceptual_hash(synthetic_png_media_dups(spark, n=_N_PH))
    w = Window.partitionBy("phash")
    return ph.select(
        "media_id", "phash",
        F.min("media_id").over(w).cast("long").alias("group_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"))


@query("phash_hamming_pairs", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {2 * _N_PH})) AS j),
geo AS (
    SELECT j, j % {_N_PH} AS i,
           8 + ((j % {_N_PH}) * 5) % 24 AS w,
           8 + ((j % {_N_PH}) * 3) % 24 AS h,
           (j % {_N_PH}) % 4 AS d
    FROM ids
), pix AS (
    SELECT j, w, h, y, x,
           CASE WHEN j >= {_N_PH} AND (x*8) // w = d AND (y*8) // h = d
                THEN 255
                ELSE (((x*31 + i) % 256) + ((y*17 + i) % 256)
                      + ((x*y + i) % 256)) // 3 END AS lum
    FROM geo, unnest(range(0, h)) AS ty(y), unnest(range(0, w)) AS tx(x)
), cells AS (
    SELECT j, (y*8) // h AS cy, (x*8) // w AS cx,
           sum(lum) AS cs, count(*) AS cc
    FROM pix GROUP BY 1, 2, 3
), tot AS (
    SELECT j, sum(lum) AS ts, count(*) AS tc FROM pix GROUP BY 1
), hashes AS (
    SELECT c.j AS media_id,
           string_agg(CASE WHEN c.cs * t.tc > t.ts * c.cc
                           THEN '1' ELSE '0' END, ''
                      ORDER BY c.cy, c.cx) AS phash
    FROM cells c JOIN tot t ON c.j = t.j GROUP BY c.j
)
SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
       CAST(list_sum(list_transform(range(1, 65),
            p -> CASE WHEN substring(a.phash, CAST(p AS INT), 1)
                      <> substring(b.phash, CAST(p AS INT), 1)
                 THEN 1 ELSE 0 END)) AS INT) AS hamming_dist
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE list_sum(list_transform(range(1, 65),
      p -> CASE WHEN substring(a.phash, CAST(p AS INT), 1)
                <> substring(b.phash, CAST(p AS INT), 1)
           THEN 1 ELSE 0 END)) <= 4
""")
def phash_hamming_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-radius perceptual near-dup pairs: the fixture plants
    lightly-EDITED variants (one saturated 8x8 mesh cell) whose aHash
    differs from the base by a few bits — exact phash equality
    (media_phash_neardup) cannot pair them; pigeonhole banding +
    exact popcount re-scoring must. The oracle replays the pixel
    formulas to the same hashes and takes the EXACT all-pairs
    Hamming-<=4 set; set equality with the Spark side proves the
    banding has zero false negatives (radius+1 bands) and the JVM
    bit_count re-score kills every band-collision false positive.
    Scale: payloads never shuffle (hashing is mapInPandas in place);
    the band self-join carries ~70-byte rows, O(sum band-bucket^2)
    candidates — the SimHash shape, never all-pairs."""
    from ..operators.multimodal import (
        perceptual_hash,
        phash_hamming_pairs,
        synthetic_png_media_near_dups,
    )
    ph = perceptual_hash(synthetic_png_media_near_dups(spark, n=_N_PH))
    return phash_hamming_pairs(ph, radius=4)


_N_WAV = 16


@query("multimodal_wav_decode", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_WAV})) AS media_id)
SELECT media_id,
       CAST(8000 + (media_id % 4) * 2000 AS INT) AS sample_rate,
       CAST(1000 + media_id * 64 AS BIGINT) AS n_frames,
       round(CAST(1000 + media_id * 64 AS DOUBLE)
             / (8000 + (media_id % 4) * 2000), 6) AS duration_s,
       TRUE AS bands_match
FROM ids
""")
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, value-gated: the fixture's payloads are
    actual RIFF/WAVE PCM files (integer sawtooth waveforms with
    per-id rate/length/step), Spark decodes the BYTES through the
    pure-stdlib codec inside the Arrow plumbing, and the result is
    checked two ways — sample_rate / frame count / duration exactly
    against DuckDB replaying the generator's arithmetic, and the
    8-band mean-abs feature against a Spark-SQL replay of the
    generator's waveform via the epsilon-boolean pattern (same
    contract as multimodal_png_decode; mean-abs instead of RMS so
    the expected value is an exact integer ratio). float32 storage
    of the feature bounds the tolerance at 1e-5."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        extract_features,
        synthetic_wav_media,
    )
    feats = extract_features(synthetic_wav_media(spark, n=_N_WAV))
    nf = F.lit(1000) + F.col("media_id") * 64
    rate = (F.lit(8000) + (F.col("media_id") % 4) * 2000).cast("int")
    # Spark-SQL replay of the generator waveform: per-band mean |s|
    grid = spark.sql(f"""
        WITH ids AS (SELECT explode(sequence(0, {_N_WAV - 1})) AS i),
        dims AS (SELECT i, 1000 + i * 64 AS n, 3 + (i % 5) AS step
                 FROM ids),
        samp AS (
            SELECT i, n, least(t * 8 DIV n, 7) AS band,
                   abs(((t * step + i * 7) % 4096) - 2048) AS a
            FROM dims
            LATERAL VIEW explode(sequence(0, n - 1)) AS t
        )
        SELECT i AS media_id, band,
               sum(a) / count(*) / 32768.0 AS want
        FROM samp GROUP BY 1, 2
    """)
    joined = (feats.select("media_id", "duration_s", "feature")
              .join(grid, "media_id"))
    diff = F.abs(F.element_at("feature", (F.col("band") + 1).cast("int"))
                 - F.col("want"))
    return (joined.groupBy("media_id", "duration_s")
            .agg(F.max(diff).alias("mx"))
            .select("media_id",
                    rate.alias("sample_rate"),
                    nf.cast("long").alias("n_frames"),
                    rnd(F.col("duration_s"), 6).alias("duration_s"),
                    (F.col("mx") < 1e-5).alias("bands_match")))


_N_AVI = 12


@query("multimodal_avi_decode", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_AVI})) AS media_id)
SELECT media_id,
       CAST(4 + (media_id % 4) * 2 AS INT) AS width,
       CAST(3 + (media_id % 3) * 2 AS INT) AS height,
       CAST(6 + media_id % 5 AS BIGINT) AS n_frames,
       round(CAST((6 + media_id % 5)
                  * (1000000 // (4 + media_id % 3)) AS DOUBLE)
             / 1000000, 6) AS duration_s,
       TRUE AS bands_match
FROM ids
""")
def multimodal_avi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, value-gated: the fixture's payloads are
    actual uncompressed-DIB AVI files (gradient frames with per-id
    dimensions/fps/length), Spark decodes the BYTES through the
    pure-stdlib codec inside the Arrow plumbing, and the result is
    checked two ways — width/height/frame-count/duration exactly
    against DuckDB replaying the container arithmetic (duration uses
    the INTEGER microseconds-per-frame the AVI header actually
    stores: n * (10^6 DIV fps) / 10^6, so both engines divide the
    identical integers), and the 8-temporal-band mean-luminance
    feature against a Spark-SQL replay of the generator's pixel
    formulas via the epsilon-boolean pattern (same contract as the
    PNG and WAV entries)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        extract_features,
        synthetic_avi_media,
    )
    feats = extract_features(synthetic_avi_media(spark, n=_N_AVI))
    nf = (F.lit(6) + F.col("media_id") % 5).cast("long")
    # Spark-SQL replay: per temporal band, mean of (r+g+b) DIV 3
    # over every pixel of every frame in the band
    grid = spark.sql(f"""
        WITH ids AS (SELECT explode(sequence(0, {_N_AVI - 1})) AS i),
        dims AS (SELECT i, 4 + (i % 4) * 2 AS w, 3 + (i % 3) * 2 AS h,
                        6 + i % 5 AS n
                 FROM ids),
        pix AS (
            SELECT i, n, least(t * 8 DIV n, 7) AS band,
                   (((x*31 + t + i) % 256) + ((y*17 + t + i) % 256)
                    + ((x*y + t + i) % 256)) DIV 3 AS lum
            FROM dims
            LATERAL VIEW explode(sequence(0, n - 1)) AS t
            LATERAL VIEW explode(sequence(0, h - 1)) AS y
            LATERAL VIEW explode(sequence(0, w - 1)) AS x
        )
        SELECT i AS media_id, band,
               sum(lum) / count(*) / 127.5 - 1.0 AS want
        FROM pix GROUP BY 1, 2
    """)
    joined = (feats.select("media_id", "width", "height", "duration_s",
                           "feature")
              .join(grid, "media_id"))
    diff = F.abs(F.element_at("feature", (F.col("band") + 1).cast("int"))
                 - F.col("want"))
    return (joined.groupBy("media_id", "width", "height", "duration_s")
            .agg(F.max(diff).alias("mx"))
            .select("media_id", "width", "height",
                    nf.alias("n_frames"),
                    rnd(F.col("duration_s"), 6).alias("duration_s"),
                    (F.col("mx") < 1e-5).alias("bands_match")))


_N_SIL = 12


@query("audio_silence_ratio", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_SIL})) AS i),
dims AS (SELECT i, 1000 + i * 64 AS n, 3 + (i % 5) AS step FROM ids),
samp AS (
    SELECT i, n,
           CASE WHEN abs(((t * step + i * 7) % 4096) - 2048) < 256
                THEN 1 ELSE 0 END AS silent
    FROM dims, unnest(range(0, n)) AS u(t)
)
SELECT i AS media_id,
       CAST(max(n) AS BIGINT) AS n_frames,
       CAST(sum(silent) AS BIGINT) AS n_silent,
       round(CAST(sum(silent) AS DOUBLE) / max(n), 6) AS silence_ratio
FROM samp GROUP BY i
""")
def audio_silence_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio QC, value-gated end-to-end: Spark decodes the REAL WAV
    payloads (stdlib codec) and counts sub-threshold frames; DuckDB
    recomputes the identical counts from the generator's integer
    waveform arithmetic — so a single mis-decoded sample anywhere in
    the PCM parse flips the hash. The silence-trim signal every
    audio-pretraining pipeline computes before chunking. Integer
    comparisons and an exact integer ratio: no float boundary."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        audio_silence_stats,
        synthetic_wav_media,
    )
    stats = audio_silence_stats(synthetic_wav_media(spark, n=_N_SIL),
                                threshold=256)
    return stats.select(
        "media_id", "n_frames", "n_silent",
        rnd(F.col("n_silent").cast("double") / F.col("n_frames"), 6)
        .alias("silence_ratio"))


_N_SCENE = 10


@query("video_scene_changes", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_SCENE})) AS i),
dims AS (SELECT i, 4 + (i % 4) * 2 AS w, 3 + (i % 3) * 2 AS h,
                8 + i % 5 AS n
         FROM ids),
lum AS (
    SELECT i, n, w, h, t, x, y,
           (((x*31 + t + i + 97 * (t // 3)) % 256)
            + ((y*17 + t + i + 97 * (t // 3)) % 256)
            + ((x*y + t + i + 97 * (t // 3)) % 256)) // 3 AS l
    FROM dims, unnest(range(0, n)) AS ut(t),
         unnest(range(0, h)) AS uy(y), unnest(range(0, w)) AS ux(x)
), delta AS (
    SELECT a.i, a.n,
           CAST(sum(abs(a.l - b.l)) AS DOUBLE)
               / (max(a.w) * max(a.h)) AS d
    FROM lum a JOIN lum b
      ON a.i = b.i AND a.x = b.x AND a.y = b.y AND b.t = a.t - 1
    WHERE a.t > 0
    GROUP BY a.i, a.n, a.t
)
SELECT i AS media_id,
       CAST(max(n) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN d > 10.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cuts
FROM delta GROUP BY i
""")
def video_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video QC, value-gated end-to-end: the fixture plants a scene
    cut every 3 frames (pixel formulas shift by 97*scene), Spark
    decodes the REAL AVI payloads and thresholds consecutive-frame
    mean luminance deltas, and DuckDB recomputes the identical cut
    counts from the generator's integer pixel arithmetic — including
    the occasional WRAP cut (a mod-256 rollover inside a scene can
    legitimately exceed the threshold; the replay counts exactly
    what the decode pipeline counts, not just the planted truth).
    The scene-segmentation signal video curation runs before
    clip-level dedup/captioning."""
    from ..operators.multimodal import (
        synthetic_avi_scene_media,
        video_scene_stats,
    )
    stats = video_scene_stats(synthetic_avi_scene_media(spark, n=_N_SCENE),
                              threshold=10.0)
    return stats.select("media_id", "n_frames", "n_cuts")


@query("pipeline_media_curation", oracle=f"""
WITH ids AS (SELECT unnest(range(0, {_N_PH})) AS i),
dims AS (SELECT i, 8 + (i*5) % 24 AS w, 8 + (i*3) % 24 AS h FROM ids),
pix AS (
    SELECT i, w, h, y, x,
           (((x*31 + i) % 256) + ((y*17 + i) % 256)
            + ((x*y + i) % 256)) // 3 AS lum
    FROM dims, unnest(range(0, h)) AS ty(y), unnest(range(0, w)) AS tx(x)
), mom AS (
    SELECT i, count(*) AS n_px, sum(lum) AS s, sum(lum * lum) AS ss
    FROM pix GROUP BY 1
), qc AS (
    SELECT d.i FROM dims d JOIN mom m ON m.i = d.i
    WHERE least(d.w, d.h) >= 12
      AND m.n_px * m.ss - m.s * m.s >= 2000 * m.n_px * m.n_px
), cells AS (
    SELECT i, (y*8) // h AS cy, (x*8) // w AS cx,
           sum(lum) AS cs, count(*) AS cc
    FROM pix GROUP BY 1, 2, 3
), tot AS (
    SELECT i, sum(lum) AS ts, count(*) AS tc FROM pix GROUP BY 1
), hashes AS (
    SELECT c.i,
           string_agg(CASE WHEN c.cs * t.tc > t.ts * c.cc
                           THEN '1' ELSE '0' END, ''
                      ORDER BY c.cy, c.cx) AS phash
    FROM cells c JOIN tot t ON c.i = t.i
    WHERE c.i IN (SELECT i FROM qc) GROUP BY c.i
)
SELECT stage, n_items FROM (
    SELECT 0 AS stage, 'ingested' AS _n, CAST({2 * _N_PH} AS BIGINT)
        AS n_items
    UNION ALL
    -- byte-distinct by construction (zlib level 6 vs 1 re-encodings)
    SELECT 1, 'exact_distinct', CAST({2 * _N_PH} AS BIGINT)
    UNION ALL
    -- every payload is a valid PNG: the decode gate removes nothing
    SELECT 2, 'decoded', CAST({2 * _N_PH} AS BIGINT)
    UNION ALL
    SELECT 3, 'qc_pass',
           (SELECT CAST(2 * count(*) AS BIGINT) FROM qc)
    UNION ALL
    SELECT 4, 'phash_groups',
           (SELECT CAST(count(DISTINCT phash) AS BIGINT) FROM hashes)
    UNION ALL
    SELECT 5, 'keepers',
           (SELECT CAST(count(DISTINCT phash) AS BIGINT) FROM hashes)
) t
""")
def pipeline_media_curation(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """End-to-end media curation funnel (the multimodal twin of
    pipeline_curation_funnel): ingest 2n byte-distinct PNG payloads
    (n pixel-identical pairs re-encoded at different zlib levels) →
    exact dedup on payload sha256 (removes nothing: every file is
    byte-unique, the fixture's designed property) → decode gate
    (REAL stdlib PNG decode; undecodable payloads profile to NULL) →
    quality band (min dimension >= 12 AND integer luminance variance
    n·Σlum² − (Σlum)² >= 2000·n² — exact integer arithmetic, no
    float boundary; both rules fire on this fixture: 8 of 12 bases
    fail one or the other) → perceptual-hash grouping of the QC
    survivors (integer aHash pairs the re-encodings sha256 cannot) →
    keeper selection (group min). Every decode-derived stage count
    is replayed by DuckDB from the generator's pixel formulas — a
    codec, moment, or hash bug anywhere breaks the funnel hashes.

    Decode-once design (mirror of pipeline_curation_funnel's shared
    survivor frames): ONE ``image_qc_profile`` pass computes
    dimensions + luminance moments + phash, is shared via
    ``materialize_auto``, and every downstream stage reads the
    ~100-byte profile rows — the payload bytes are decoded exactly
    once and never shuffled (plan-pinned in
    tests/test_multimodal_integrations.py)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        image_qc_profile,
        media_exact_duplicates,
        synthetic_png_media_dups,
    )
    from ..sources.registry import materialize_auto
    media = synthetic_png_media_dups(spark, n=_N_PH)
    prof = materialize_auto(image_qc_profile(media))
    decoded = prof.where(F.col("phash").isNotNull())
    qc = decoded.where(
        (F.least("width", "height") >= 12)
        & (F.col("n_px") * F.col("sum_sq_lum")
           - F.col("sum_lum") * F.col("sum_lum")
           >= 2000 * F.col("n_px") * F.col("n_px")))

    def stage(idx: int, df: DataFrame) -> DataFrame:
        # counts stay IN the plan (agg + union), no driver-side
        # .count() round-trips — same shape as the text funnel
        return df.agg(F.lit(idx).cast("int").alias("stage"),
                      F.count(F.lit(1)).cast("long").alias("n_items"))

    return (stage(0, media)
            .unionAll(stage(1, media_exact_duplicates(media)
                            .where(~F.col("is_duplicate"))))
            .unionAll(stage(2, decoded))
            .unionAll(stage(3, qc))
            .unionAll(stage(4, qc.select("phash").distinct()))
            .unionAll(stage(5, qc.groupBy("phash")
                            .agg(F.min("media_id")))))
