"""Additional coverage queries: range join, n-gram frequency."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles
from ..operators.rangejoin import range_join
from .core import _t, query, rnd

# Price bands as an inline interval dimension (deterministic).
PRICE_BANDS = [
    ("budget", 0.0, 20000.0),
    ("mid", 20000.0, 45000.0),
    ("premium", 45000.0, 80000.0),
    ("luxury", 80000.0, 1e9),
]

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS band, {lo} AS lo, {hi} AS hi"
    for n, lo, hi in PRICE_BANDS)


@query("range_join_price_bands", oracle=f"""
WITH bands AS ({_BANDS_SQL})
SELECT band,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band
""")
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join of lineitem prices to interval bands. The interval
    side is tiny -> broadcast strategy (no shuffle of lineitem);
    the bucketize strategy is equivalence-tested in tests."""
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join(li, "l_extendedprice", bands, "lo", "hi",
                        method="broadcast")
    return (joined.groupBy("band")
            .agg(F.count("*").alias("n_items"),
                 rnd(F.sum("l_extendedprice"), 2).alias("total_price")))


@query("text_ngram_frequency", oracle="""
WITH toks AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                        ' ') AS t
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id AS id,
           concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
    WHERE length(concat_ws(' ', t[i], t[i+1], t[i+2])) > 0
)
SELECT shingle AS ngram, CAST(count(*) AS BIGINT) AS doc_freq
FROM sh
GROUP BY shingle
ORDER BY doc_freq DESC, ngram
LIMIT 20
""")
def text_ngram_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-gram shingles by document frequency — the corpus-level
    boilerplate detector feeding the hot-shingle cut in
    ``jaccard_pairs``. One shuffle on the shingle."""
    sh = shingles(_t(spark, sf_dir, "documents"), "doc_id", "text", n=3)
    return (sh.groupBy(F.col("shingle").alias("ngram"))
            .agg(F.count("*").alias("doc_freq"))
            .orderBy(F.desc("doc_freq"), "ngram")
            .limit(20))
