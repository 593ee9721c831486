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
from .core import query

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
