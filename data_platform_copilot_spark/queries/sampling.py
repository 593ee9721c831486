"""Sampling queries: deterministic hash sample (oracle-verified) and
seeded stratified sample (statistical check in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import (
    deterministic_sample,
    deterministic_stratified_sample,
)
from .core import _t, query, rnd

# DuckDB: md5-hex-prefix -> integer via positional polynomial
_HEX_POLY = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(c_custkey AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (5 - i)}"
    for i in range(6))


@query("deterministic_hash_sample", oracle=f"""
SELECT c_custkey AS customer_id, c_mktsegment AS segment
FROM customer
WHERE ({_HEX_POLY}) % 1000000 < 100000
""")
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample selected purely by md5(key) — exactly re-derivable
    in any engine (the eval-holdout selection pattern); value-verified
    row-for-row against the oracle."""
    cust = _t(spark, sf_dir, "customer")
    return (deterministic_sample(cust, "c_custkey", 0.10)
            .select(F.col("c_custkey").alias("customer_id"),
                    F.col("c_mktsegment").alias("segment")))


_FRACTIONS = {"BUILDING": 0.5, "MACHINERY": 0.2, "AUTOMOBILE": 0.1,
              "FURNITURE": 0.1, "HOUSEHOLD": 0.05}

_CUTOFF_CASE = "CASE c_mktsegment " + " ".join(
    f"WHEN '{seg}' THEN {int(frac * 1_000_000)}"
    for seg, frac in _FRACTIONS.items()) + " END"


@query("stratified_sample_counts", oracle=f"""
SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_sampled
FROM customer
WHERE ({_HEX_POLY}) % 1000000 < {_CUTOFF_CASE}
GROUP BY 1
""")
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment sampling at different rates (class balancing) via
    the deterministic md5 rule — the sampled set is exactly
    re-derivable in any engine, so counts per stratum value-verify
    against DuckDB replaying the identical predicate."""
    cust = _t(spark, sf_dir, "customer")
    return (deterministic_stratified_sample(
                cust, "c_mktsegment", "c_custkey", _FRACTIONS)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_sampled")))


_MIX = {"BUILDING": 0.4, "MACHINERY": 0.3, "AUTOMOBILE": 0.2,
        "FURNITURE": 0.1}

_MIX_SHARES = " UNION ALL ".join(
    f"SELECT '{seg}' AS c_mktsegment, {share} AS share"
    for seg, share in _MIX.items())


@query("domain_mix_sample_counts", oracle=f"""
WITH shares AS ({_MIX_SHARES}),
counts AS (
    SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1
), joined AS (
    SELECT counts.c_mktsegment, n, share
    FROM counts JOIN shares USING (c_mktsegment)
), k AS (
    SELECT min(n / share) AS kk FROM joined
), rates AS (
    SELECT c_mktsegment, least(1.0, kk * share / n) AS rate
    FROM joined, k
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_sampled
FROM customer c
JOIN rates r USING (c_mktsegment)
WHERE ({_HEX_POLY}) % 1000000 < r.rate * 1000000
GROUP BY 1
""")
def domain_mix_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: sample the largest customer subset
    matching a 40/30/20/10 segment mix (HOUSEHOLD dropped — not in
    the mix) via the deterministic md5 rule; per-segment counts
    value-verify against DuckDB replaying the identical rate math and
    predicate."""
    from ..operators.sampling import domain_mix_sample
    cust = _t(spark, sf_dir, "customer")
    return (domain_mix_sample(cust, "c_mktsegment", "c_custkey", _MIX)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_sampled")))


_DOC_POLY = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (5 - i)}"
    for i in range(6))


@query("temperature_mix_counts", oracle=f"""
WITH c AS (
    SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1
), q AS (
    SELECT lang, n, pow(n, 0.5) AS qr FROM c
), s AS (
    SELECT lang, n, qr / (SELECT sum(qr) FROM q) AS share FROM q
), r AS (
    SELECT lang, n,
           round(least(1.0,
                       (SELECT min(n / share) FROM s) * share / n), 6)
               AS rate
    FROM s
), sel AS (
    SELECT d.lang FROM documents d JOIN r USING (lang)
    WHERE ({_DOC_POLY}) % 1000000
          < CAST(round(rate * 1000000, 0) AS BIGINT)
), g AS (
    SELECT lang, count(*) AS m FROM sel GROUP BY 1
)
SELECT r.lang AS lang, CAST(r.n AS BIGINT) AS n_total,
       CAST(coalesce(g.m, 0) AS BIGINT) AS n_sampled
FROM r LEFT JOIN g USING (lang)
""")
def temperature_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixture at T=2 (mT5/XLM-R
    rebalancing): dominant 'en' is down-sampled toward the flattened
    share, the scarcest language is kept whole. Counts per language
    value-verify that both engines derive the same rates from the
    same observed mix and select the identical md5-keyed rows."""
    from ..operators.sampling import temperature_mix_sample
    docs = _t(spark, sf_dir, "documents")
    sampled = (temperature_mix_sample(docs, "lang", "doc_id",
                                      temperature=2.0)
               .groupBy("lang").agg(F.count("*").alias("n_sampled")))
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    return (totals.join(sampled, "lang", "left")
            .select("lang", "n_total",
                    F.coalesce("n_sampled", F.lit(0)).alias("n_sampled")))


@query("per_group_reservoir_sample", oracle="""
WITH ranked AS (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
SELECT source, doc_id FROM ranked WHERE rk <= 5
""")
def per_group_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-domain reservoir: exactly 5 docs per source,
    chosen by md5(doc_id) rank — the auditable balanced-subsample
    primitive (inspection sets, per-domain eval slices). Both engines
    rank the identical hash strings, so the sampled set is
    value-verified row-for-row."""
    from ..operators.sampling import per_group_reservoir
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id")
    return per_group_reservoir(docs, "source", "doc_id", k=5)


@query("dataset_split_counts", oracle="""
WITH b AS (
    SELECT doc_id, lang,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
               % 1000000 AS bucket
    FROM documents
), s AS (
    SELECT lang,
           CASE WHEN bucket < 900000 THEN 'train'
                WHEN bucket < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n
FROM s GROUP BY lang, split
""")
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split of the documents
    corpus, counted per language — assignment is the md5-bucket rule
    (reproducible on any engine, stable under corpus growth,
    disjoint-exhaustive by construction), value-verified per
    (lang, split) cell."""
    from pyspark.sql import functions as F

    from ..operators.sampling import dataset_split
    out = dataset_split(_t(spark, sf_dir, "documents"), "doc_id",
                        {"train": 0.9, "val": 0.05, "test": 0.05})
    return out.groupBy("lang", "split").agg(F.count("*").alias("n"))


@query("weighted_sample_topk_docs", oracle="""
WITH w AS (
    SELECT doc_id, n_chars,
           (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
            + 0.5) / 16777216.0 AS u
    FROM documents
), keyed AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           ln(u) / n_chars AS es_key
    FROM w WHERE n_chars > 0
)
SELECT doc_id, n_chars, round(es_key, 8) AS es_key
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT 100
""")
def weighted_sample_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample of 100 documents
    (Efraimidis-Spirakis keys from md5-derived uniforms — longer docs
    proportionally likelier, zero RNG): membership, order and keys
    all value-verify against DuckDB replaying the identical
    arithmetic."""
    from pyspark.sql import functions as F

    from ..operators.sampling import weighted_sample_topk
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = weighted_sample_topk(d, "doc_id", F.col("n_chars"), k=100)
    return out.select("doc_id",
                      F.col("n_chars").cast("long").alias("n_chars"),
                      rnd("es_key", 8).alias("es_key"))


@query("token_budget_allocation", oracle=f"""
WITH per AS (
    SELECT source,
           sum(len(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' '))) AS toks
    FROM documents GROUP BY source
), w AS (
    SELECT source, toks,
           toks ^ 0.7 AS wt
    FROM per
), q AS (
    SELECT source, toks,
           100000 * wt / sum(wt) OVER () AS quota
    FROM w
), fl AS (
    SELECT source, toks, quota,
           CAST(floor(quota) AS BIGINT) AS base,
           quota - floor(quota) AS rem
    FROM q
), rk AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS r,
           100000 - sum(base) OVER () AS leftover
    FROM fl
)
SELECT source, CAST(toks AS BIGINT) AS toks_available,
       CAST(base + CASE WHEN r <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS allocated_tokens
FROM rk
""")
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planner: apportion a 100k-token budget across
    sources by temperature-weighted mass (w = toks^0.7, the
    mT5/XLM-R exponent) using LARGEST-REMAINDER apportionment — the
    floors plus one extra token-quota for the biggest remainders, so
    the allocations sum EXACTLY to the budget (naive rounding
    drifts). Deterministic tiebreak (remainder DESC, source). This
    is the plan a sampler executes; per-source token mass is one
    groupBy, apportionment is |sources|-row window arithmetic."""
    from pyspark.sql import Window as W

    from ..functions.text import tokens as toks_fn
    docs = _t(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
           .agg(F.sum(F.size(toks_fn(F.col("text")))).alias("toks")))
    wt = F.pow(F.col("toks").cast("double"), F.lit(0.7))
    q = per.select("source", "toks",
                   (F.lit(100000) * wt
                    / F.sum(wt).over(W.partitionBy())).alias("quota"))
    fl = q.select("source", "toks", "quota",
                  F.floor("quota").cast("long").alias("base"),
                  (F.col("quota") - F.floor("quota")).alias("rem"))
    rk = fl.select(
        "*",
        F.row_number().over(W.orderBy(F.desc("rem"), "source")).alias("r"),
        (F.lit(100000) - F.sum("base").over(W.partitionBy()))
        .alias("leftover"))
    return rk.select(
        "source", F.col("toks").cast("long").alias("toks_available"),
        (F.col("base") + F.when(F.col("r") <= F.col("leftover"), 1)
         .otherwise(0)).cast("long").alias("allocated_tokens"))


@query("split_leakage_check", oracle=f"""
WITH split AS (
    SELECT doc_id, text,
           CASE WHEN (('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                         1, 6))::BIGINT % 1000000)
                     < 900000 THEN 'train'
                WHEN (('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                         1, 6))::BIGINT % 1000000)
                     < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
), fp AS (
    SELECT doc_id, split,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
    FROM split
), grp AS (
    SELECT f,
           count(*) AS n_docs,
           count(DISTINCT split) AS n_splits
    FROM fp GROUP BY f
)
SELECT CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(count(*) FILTER (n_docs > 1) AS BIGINT) AS n_dup_groups,
       CAST(count(*) FILTER (n_splits > 1) AS BIGINT)
           AS n_leaking_groups,
       CAST(coalesce(sum(n_docs) FILTER (n_splits > 1), 0) AS BIGINT)
           AS n_leaking_docs
FROM grp
""")
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: after the deterministic 90/5/5
    split, how many exact-duplicate fingerprint groups SPAN more
    than one split — the classic evaluation-inflation pitfall
    (duplicates of training docs sitting in test). Key-hash splits
    cannot prevent it (duplicates have different keys), which is
    exactly why dedup must run BEFORE splitting; this entry is the
    check that proves whether it did. One fingerprint combine over
    the split-tagged corpus; scalar report."""
    from pyspark.sql import functions as F

    from ..functions.text import normalize_text
    from ..operators.sampling import dataset_split
    docs = _t(spark, sf_dir, "documents")
    tagged = dataset_split(docs, "doc_id",
                           {"train": 0.9, "val": 0.05, "test": 0.05})
    grp = (tagged.select(F.md5(normalize_text(F.col("text"))).alias("f"),
                         "split")
           .groupBy("f")
           .agg(F.count("*").alias("n_docs"),
                F.countDistinct("split").alias("n_splits")))
    leak = F.when(F.col("n_splits") > 1, F.col("n_docs"))
    return grp.agg(
        F.count("*").cast("long").alias("n_fingerprints"),
        F.sum((F.col("n_docs") > 1).cast("int")).cast("long")
        .alias("n_dup_groups"),
        F.sum((F.col("n_splits") > 1).cast("int")).cast("long")
        .alias("n_leaking_groups"),
        F.coalesce(F.sum(leak), F.lit(0)).cast("long")
        .alias("n_leaking_docs"))


@query("token_budget_epochs_plan", oracle=f"""
WITH per AS (
    SELECT source,
           CAST(count(*) AS DOUBLE) AS w,
           CAST(sum(len(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' '))) AS DOUBLE) AS toks
    FROM documents GROUP BY source
), tot AS (
    SELECT sum(toks) * 1.5 AS budget, sum(w) AS tot_w FROM per
), r AS (
    SELECT source, w, toks, 2.0 * toks AS cap,
           2.0 * toks / w AS ratio
    FROM per
), o AS (
    SELECT r.*, tot.budget, tot.tot_w,
           coalesce(sum(cap) OVER (ORDER BY ratio, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumcap,
           coalesce(sum(w) OVER (ORDER BY ratio, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumw
    FROM r, tot
), f AS (
    SELECT *, CASE WHEN tot_w - cumw > 0
                   AND ratio <= (budget - cumcap) / (tot_w - cumw)
              THEN 1 ELSE 0 END AS capped
    FROM o
), lam AS (
    SELECT CASE WHEN sum(1 - capped) = 0 THEN NULL
                ELSE (max(budget) - sum(capped * cap))
                     / sum((1 - capped) * w) END AS lambda
    FROM f
)
SELECT source,
       CAST(toks AS BIGINT) AS toks_available,
       CAST(capped AS BOOLEAN) AS capped,
       round(CASE WHEN capped = 1 OR lambda IS NULL THEN cap
                  ELSE least(cap, lambda * w) END, 2)
           AS allocated_tokens,
       round(CASE WHEN capped = 1 OR lambda IS NULL THEN 2.0
                  ELSE least(cap, lambda * w) / toks END, 4) AS epochs
FROM f, lam
""")
def token_budget_epochs_plan(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Data-constrained training-mix planner (Muennighoff et al.
    2023, arXiv:2305.16264 — repeating data beyond ~4 epochs stops
    paying): allocate a budget of 1.5x the corpus's total tokens
    across sources PROPORTIONALLY TO DOC COUNT but capped at 2
    epochs of each source's own tokens, via closed-form
    WATER-FILLING — sort sources by cap/weight, a prefix caps, the
    rest share the remainder at a common rate lambda. One groupBy
    builds the |sources|-row table; the watershed is window cumsums,
    no iteration (the naive fixpoint loop is O(n) driver rounds).
    Both engines replay the identical arithmetic; a pytest checks
    the allocation sums to the budget and respects every cap."""
    from pyspark.sql import Window as W

    from ..functions.text import tokens as toks_fn
    docs = _t(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
           .agg(F.count("*").cast("double").alias("w"),
                F.sum(F.size(toks_fn(F.col("text"))))
                .cast("double").alias("toks")))
    tot = W.partitionBy()
    r = per.select(
        "source", "w", "toks",
        (F.lit(2.0) * F.col("toks")).alias("cap"),
        (F.lit(2.0) * F.col("toks") / F.col("w")).alias("ratio"),
        (F.sum("toks").over(tot) * 1.5).alias("budget"),
        F.sum("w").over(tot).alias("tot_w"))
    prefix = (W.orderBy("ratio", "source")
              .rowsBetween(W.unboundedPreceding, -1))
    o = r.select(
        "*",
        F.coalesce(F.sum("cap").over(prefix), F.lit(0.0)).alias("cumcap"),
        F.coalesce(F.sum("w").over(prefix), F.lit(0.0)).alias("cumw"))
    f = o.withColumn(
        "capped",
        ((F.col("tot_w") - F.col("cumw") > 0)
         & (F.col("ratio") <= (F.col("budget") - F.col("cumcap"))
            / (F.col("tot_w") - F.col("cumw")))).cast("int"))
    lam = ((F.max("budget").over(tot)
            - F.sum(F.col("capped") * F.col("cap")).over(tot))
           / F.nullif(F.sum((1 - F.col("capped")) * F.col("w")).over(tot),
                      F.lit(0.0)))
    alloc = F.when((F.col("capped") == 1) | lam.isNull(), F.col("cap")) \
        .otherwise(F.least(F.col("cap"), lam * F.col("w")))
    return f.select(
        "source",
        F.col("toks").cast("long").alias("toks_available"),
        F.col("capped").cast("boolean").alias("capped"),
        rnd(alloc, 2).alias("allocated_tokens"),
        rnd(F.when((F.col("capped") == 1) | lam.isNull(), F.lit(2.0))
            .otherwise(alloc / F.col("toks")), 4).alias("epochs"))


@query("training_order_interleave", oracle="""
WITH per AS (
    SELECT source, count(*) AS n FROM documents GROUP BY 1
), w AS (
    SELECT source, n, n ^ 0.7 AS wt FROM per
), q AS (
    SELECT source, n, 1000000 * wt / sum(wt) OVER () AS quota FROM w
), fl AS (
    SELECT source, n, CAST(floor(quota) AS BIGINT) AS base,
           quota - floor(quota) AS rem
    FROM q
), rk AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS r,
           1000000 - sum(base) OVER () AS leftover
    FROM fl
), sh AS (
    SELECT source,
           greatest(base + CASE WHEN r <= leftover THEN 1 ELSE 0 END,
                    1) AS share
    FROM rk
), rn AS (
    SELECT d.source,
           row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
    FROM documents d
), keyed AS (
    SELECT rn.source, rn.rn, (rn.rn * 1000000) // sh.share AS k
    FROM rn JOIN sh USING (source)
), pos AS (
    SELECT source,
           row_number() OVER (ORDER BY k, source, rn) AS gpos,
           count(*) OVER () AS total
    FROM keyed
)
SELECT source, CAST((gpos - 1) * 10 // total AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(gpos) AS BIGINT) AS first_pos,
       CAST(max(gpos) AS BIGINT) AS last_pos
FROM pos GROUP BY 1, 2
""")
def training_order_interleave(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Deterministic training-order schedule: every document gets a
    global position interleaving sources at temperature-weighted
    rates (shares = largest-remainder apportionment of 10^6 over
    n_docs^0.7, the same mT5 exponent as token_budget_allocation),
    audited as per-source doc counts within each decile of the
    schedule — the uniformity check a trainer wants before an epoch
    starts (a source bunching into one decile means mixture drift
    mid-epoch). The interleave key is INTEGER stride arithmetic
    (rn * 10^6 DIV share), md5-ranked within source, so both engines
    produce the identical total order with no float boundary.

    Scale (r12, retiring the global-rank residue): the global
    position is a TWO-PHASE DISTRIBUTED RANK, the same shape as
    output_shard_plan — rows bucket by deterministic fixed-width
    ranges of the leading sort key k (one broadcast min/max row, no
    per-job boundary sampling), phase 1 counts each bucket (the
    exclusive-cumsum window runs over B=32 aggregated rows), phase 2
    ranks WITHIN each bucket (partitioned window, bounded by the
    bucket width) and adds the broadcast offset. Equal keys always
    share a bucket, so the result is EXACTLY the single global
    row_number the oracle keeps as the independent spec. The
    remaining unpartitioned windows run over the per-SOURCE
    apportionment frame (bounded by the source alphabet)."""
    from pyspark.sql import Window as W

    from ..operators.layout import add_range_bucket, bucket_offsets
    from ..operators.sampling import interleave_schedule_keys
    docs = _t(spark, sf_dir, "documents")
    keyed = interleave_schedule_keys(
        docs.select("source", "doc_id"), "source", "doc_id",
        temperature=0.7).select("source", "rn", "k")
    kb = add_range_bucket(
        keyed, "k", 32,
        extra_aggs=[F.count(F.lit(1)).alias("total")])
    offs = bucket_offsets(kb, F.lit(1))
    wloc = W.partitionBy("__rb").orderBy("k", "source", "rn")
    pos = (kb.join(F.broadcast(offs), "__rb")
           .select("source", "total",
                   (F.col("__rb_off") + F.row_number().over(wloc))
                   .alias("gpos")))
    return (pos.groupBy(
                "source",
                F.expr("CAST(((gpos - 1) * 10) DIV total AS BIGINT)")
                 .alias("decile"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("gpos").cast("long").alias("first_pos"),
                 F.max("gpos").cast("long").alias("last_pos")))


@query("pareto_frontier_users", oracle="""
WITH g AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(value) AS peak_value
    FROM events GROUP BY 1
    HAVING max(value) IS NOT NULL
)
SELECT user_id, n_events, round(peak_value, 2) AS peak_value
FROM g a
WHERE NOT EXISTS (
    SELECT 1 FROM g b
    WHERE (b.n_events > a.n_events AND b.peak_value >= a.peak_value)
       OR (b.n_events >= a.n_events AND b.peak_value > a.peak_value)
)
""")
def pareto_frontier_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal user set on (activity, peak value): users no
    other user beats on BOTH event count and largest single event —
    the multi-criteria selection shape curation pipelines use to
    pick candidates without collapsing metrics into one weighted
    score (operators/selection.pareto_frontier_2d). Count is
    integer and max() is arithmetic-free (it selects a stored
    parquet double), so cross-engine dominance comparisons are
    exact; the 2dp rounding touches only the OUTPUT column, never
    the dominance test. The oracle states the skyline DECLARATIVELY
    (NOT EXISTS a dominator — O(n^2), fine at oracle scale); the
    engine runs the bucketed sort-sweep, whose only global window is
    the n_buckets-row bucket summary."""
    from ..operators.selection import pareto_frontier_2d
    g = (_t(spark, sf_dir, "events")
         .groupBy("user_id")
         .agg(F.count("*").cast("long").alias("n_events"),
              F.max("value").alias("peak_value")))
    front = pareto_frontier_2d(g, "n_events", "peak_value")
    return front.select("user_id", "n_events",
                        rnd("peak_value", 2).alias("peak_value"))


@query("quantile_normalize_doclen", oracle="""
WITH d AS (
    SELECT doc_id, source, n_chars FROM documents
), ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS rs,
           count(*) OVER (PARTITION BY source) AS ns
    FROM d
), pooled AS (
    SELECT n_chars AS pooled_value,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rp
    FROM d
), total AS (SELECT count(*) AS n FROM d)
SELECT r.doc_id, r.source,
       CAST(r.n_chars AS BIGINT) AS n_chars,
       CAST(p.pooled_value AS BIGINT) AS normalized
FROM ranked r CROSS JOIN total t
JOIN pooled p
  ON p.rp = (r.rs * t.n + r.ns - 1) // r.ns
""")
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources —
    the feature-alignment step that maps every source's value
    distribution onto the POOLED distribution so per-source length
    filters compare like-for-like (the microarray/quantile-matching
    recipe applied to corpus features): a doc at within-source rank
    rs of ns maps to the pooled value at position
    ceil(rs * N / ns) — exact integer arithmetic, identical in both
    engines, no percentile interpolation to drift.

    Scale: BOTH rank passes are operators/layout.bucketed_global_rank
    (the pooled pass is the textbook global-sort whale — one
    ORDER BY over the entire corpus — and the per-source pass has
    the dominant-source whale), so no window partition exceeds one
    (partition, bucket) slice; the position lookup is an equi-join
    on the pooled rank. The oracle states the same map with plain
    windows (oracle scale is small)."""
    from ..operators.layout import bucketed_global_rank
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    ranked = bucketed_global_rank(
        d.withColumn("__ok", F.col("n_chars")),
        ["source"], "__ok", [F.col("n_chars"), F.col("doc_id")],
        rank_col="rs", size_col="ns").drop("__ok")
    pooled = bucketed_global_rank(
        d.withColumn("__ok", F.col("n_chars")),
        [], "__ok", [F.col("n_chars"), F.col("doc_id")],
        rank_col="rp", size_col="n_total")
    lookup = pooled.select(F.col("n_chars").alias("pooled_value"),
                           "rp", "n_total")
    pos = (ranked
           .join(F.broadcast(lookup.select("n_total").limit(1)))
           .withColumn(
               "__pos",
               # ceil(rs * N / ns) as exact LONG arithmetic (div, not
               # float division — rs * N exceeds double's 2^53 exact
               # range long before 100 TB row counts do a long's)
               F.expr("(rs * n_total + ns - 1) div ns")))
    return (pos.join(lookup.withColumnRenamed("rp", "__pos")
                     .drop("n_total"), ["__pos"])
            .select("doc_id", "source", "n_chars",
                    F.col("pooled_value").alias("normalized")))
