"""Sampling and skew-diagnosis operators.

- ``stratified_sample``: per-stratum Bernoulli sampling (sampleBy) —
  the standard class-balancing step for training-data curation.
  Seeded, so repeatable under a fixed partitioning; still not
  oracle-comparable across engines (rows-only / statistical tests).
- ``deterministic_sample``: hash-based row selection — EXACTLY
  reproducible everywhere (same md5 rule in any engine), the right
  tool when a sample must be re-derivable (eval holdouts).
- ``key_skew_report``: per-key frequency histogram + skew metrics;
  the diagnosis step that decides whether a join needs salting
  (operators/skew.py) or AQE suffices.

Scale notes: all three are single-shuffle-or-less; the skew report
aggregates to |distinct keys| and tops-k before any collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, stratum_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample: fractions = {stratum: fraction}."""
    return df.sampleBy(stratum_col, fractions, seed=seed)


def deterministic_sample(df: DataFrame, key_col: str,
                         fraction: float) -> DataFrame:
    """Keep rows where md5(key) mod 10^6 < fraction * 10^6 —
    engine-portable and exactly re-derivable from the key alone."""
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6),
                    16, 10).cast("long") % 1_000_000
    return df.where(bucket < int(fraction * 1_000_000))


def deterministic_stratified_sample(df: DataFrame, stratum_col: str,
                                    key_col: str,
                                    fractions: dict) -> DataFrame:
    """Per-stratum sampling by the md5 rule instead of RNG: a row is
    kept iff md5(key) mod 10^6 < fraction(stratum) * 10^6. Same class
    balancing as ``stratified_sample`` but EXACTLY re-derivable in any
    engine from (key, stratum) alone — the choice when the sampled set
    itself must be auditable (eval holdouts, compliance splits).
    Strata absent from ``fractions`` are dropped (sampleBy parity).
    """
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6),
                    16, 10).cast("long") % 1_000_000
    cutoff = F.lit(None).cast("long")
    for stratum, frac in fractions.items():
        cutoff = (F.when(F.col(stratum_col) == stratum,
                         F.lit(int(frac * 1_000_000)))
                  .otherwise(cutoff))
    return df.where(bucket < cutoff)


def domain_mix_sample(df: DataFrame, domain_col: str, key_col: str,
                      target_mix: dict) -> DataFrame:
    """Sample the LARGEST subset matching a target domain mixture.

    ``target_mix`` = {domain: share} (shares sum to 1). The feasible
    scale is K = min over domains of count_d / share_d (the scarcest
    domain caps the mixture); each domain then samples at rate
    K * share_d / count_d via the deterministic md5 rule — the
    domain-reweighting step of training-data curation (e.g. upweight
    code, downweight web), exactly re-derivable in any engine.
    Domains absent from ``target_mix`` are dropped. Fully lazy: the
    rate table is a broadcast DataFrame, never collected.
    """
    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(d, float(s)) for d, s in target_mix.items()],
        f"{domain_col} string, __share double")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    joined = counts.join(F.broadcast(shares), domain_col)
    # K from a whole-frame window over the |domains|-row table — one
    # lineage (an agg + crossJoin here would recompute the count agg).
    from pyspark.sql import Window as W
    k = F.min(F.col("__n") / F.col("__share")).over(W.partitionBy())
    rates = joined.select(
        domain_col,
        F.least(F.lit(1.0),
                k * F.col("__share") / F.col("__n")).alias("__rate"))
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6),
                    16, 10).cast("long") % 1_000_000
    return (df.join(F.broadcast(rates), domain_col)
            .where(bucket < F.col("__rate") * 1_000_000)
            .drop("__rate"))


def key_skew_report(df: DataFrame, key_col: str, top: int = 10) -> dict:
    """Skew diagnosis: {n_keys, total, max_share, p99_to_median, top}.

    max_share = heaviest key's fraction of all rows; a join key with
    max_share >> 1/shuffle_partitions will bottleneck one task.
    """
    hist = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    stats = hist.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
    ).collect()[0]
    top_rows = (hist.orderBy(F.desc("cnt"), F.col(key_col).cast("string"))
                .limit(top).collect())
    return {
        "n_keys": stats["n_keys"],
        "total": stats["total"],
        "max_share": stats["max_cnt"] / stats["total"] if stats["total"] else 0.0,
        "p99_to_median": (stats["p99"] / stats["p50"]) if stats["p50"] else 0.0,
        "top": [(r[key_col], r["cnt"]) for r in top_rows],
    }


def temperature_mix_sample(df: DataFrame, domain_col: str, key_col: str,
                           temperature: float = 2.0) -> DataFrame:
    """Temperature-flattened domain mixture — the multilingual-LM
    rebalancing rule (mT5 / XLM-R): target share of domain d is
    q_d ∝ p_d^(1/T) where p_d is its observed share. T=1 keeps the
    natural mix; T→∞ approaches uniform; between, dominant domains
    are down-sampled and tail domains kept whole.

    Unlike ``domain_mix_sample`` the target mix is DERIVED from the
    observed counts, so no configuration is needed: one tiny
    count-by-domain agg feeds q_d, the feasible scale K =
    min_d(n_d / q_d) caps the subset (the scarcest domain is kept
    in full), and each domain samples at rate K * q_d / n_d via the
    deterministic md5 rule. Rates are rounded to the 1e-6 grid and
    compared as INTEGER cutoffs, so any engine replaying the same
    arithmetic selects the identical rows.

    Scale: the count agg touches |domains| rows; every derived scalar
    (share normalizer, feasible scale K) comes from whole-frame
    windows over that always-tiny table — one lineage, ONE keyed
    exchange (the old crossJoin-a-scalar chain recomputed the count
    agg per layer: 6 exchanges for the same arithmetic). The rate
    table broadcasts; the filter is a scan-local predicate — no
    shuffle of the data being sampled.
    """
    from pyspark.sql import Window as W

    if temperature <= 0:
        raise ValueError("temperature must be positive")
    wall = W.partitionBy()
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    q = F.pow(F.col("__n").cast("double"), F.lit(1.0 / temperature))
    share = q / F.sum(q).over(wall)
    k = F.min(F.col("__n") / share).over(wall)
    rates = counts.select(
        domain_col,
        F.round(F.least(F.lit(1.0), k * share / F.col("__n")), 6)
        .alias("__rate"))
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6),
                    16, 10).cast("long") % 1_000_000
    cutoff = F.round(F.col("__rate") * 1_000_000, 0).cast("long")
    return (df.join(F.broadcast(rates), domain_col)
            .where(bucket < cutoff)
            .drop("__rate"))


def per_group_reservoir(df: DataFrame, group_col: str, key_col: str,
                        k: int) -> DataFrame:
    """Exactly ``k`` rows per group (fewer if the group is smaller),
    selected by md5(key) rank — the deterministic reservoir: the
    choice is uniform-ish, auditable, and stable under re-runs and
    engine changes (RNG reservoirs are neither). Ties on the hash
    break by key.

    Scale: one shuffle on the group key; WindowGroupLimit pushes the
    rank-k cut into the partial aggregation, so only ~k rows per
    group per map task survive to the exchange.
    """
    from pyspark.sql import Window as W
    h = F.md5(F.col(key_col).cast("string"))
    w = (W.partitionBy(group_col).orderBy(h, F.col(key_col)))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k).drop("__rk"))


def dataset_split(df: DataFrame, key_col: str,
                  fractions: dict[str, float]) -> DataFrame:
    """Deterministic, engine-portable train/val/test assignment: the
    md5 bucket of the key (mod 10^6) falls into contiguous ranges
    sized by ``fractions`` (must sum to 1). Appends a ``split``
    column. Properties every training pipeline needs and RNG splits
    don't give: reproducible across engines/runs/partitionings,
    stable under corpus growth (a doc's split never changes when new
    docs arrive), and disjoint-and-exhaustive by construction.
    Scan-local expression — zero shuffle.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                                1, 6), 16, 10).cast("long") % 1000000
    expr = None
    hi = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        hi += frac
        cond = bucket < int(hi * 1000000)
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def weighted_sample_topk(df: DataFrame, key_col: str, weight,
                         k: int = 100) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis, 2006): each row draws u from the md5 of its
    key (uniform in (0,1), engine-reproducible — no RNG) and the k
    rows with the largest u^(1/w), equivalently the largest
    ln(u)/w, win. Inclusion probability is proportional to weight,
    the sample is stable across runs/engines/partitionings, and
    re-running with a larger corpus never evicts a row in favor of a
    lower-keyed one.

    ``weight`` is a Column of positive weights. Appends ``es_key``;
    top-k via TakeOrdered (bounded per-partition heaps, no global
    sort). Zero-weight rows get key -inf and can never win.
    """
    u = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6),
                16, 10).cast("double") + 0.5) / 16777216.0
    es = F.when(weight > 0, F.log(u) / weight).otherwise(
        F.lit(float("-inf")))
    return (df.withColumn("es_key", es)
            .orderBy(F.desc("es_key"), F.col(key_col))
            .limit(k))


def interleave_schedule_keys(df: DataFrame, group_col: str,
                             id_col: str,
                             temperature: float = 0.7) -> DataFrame:
    """Deterministic temperature-weighted interleave keys: every row
    gains ``rn`` (its md5-ranked position within its group) and ``k``
    (the integer stride key ``rn * 10^6 DIV share``, where shares are
    the largest-remainder apportionment of 10^6 over
    ``n_group^temperature``). Sorting by (k, group, rn) yields the
    schedule that interleaves groups at temperature-weighted rates —
    the mixture order a trainer consumes (queries/sampling.py
    `training_order_interleave` audits it; sinks.export_interleaved_
    shards writes it). All-integer arithmetic after the one
    apportionment pow, so any engine reproduces the identical order.
    """
    from pyspark.sql import Window as W
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    wt = F.pow(F.col("n").cast("double"), F.lit(temperature))
    q = per.select(group_col, "n",
                   (F.lit(1000000) * wt
                    / F.sum(wt).over(W.partitionBy())).alias("quota"))
    fl = q.select(group_col, "n",
                  F.floor("quota").cast("long").alias("base"),
                  (F.col("quota") - F.floor("quota")).alias("rem"))
    rk = fl.select(
        "*",
        F.row_number().over(W.orderBy(F.desc("rem"), group_col))
        .alias("r"),
        (F.lit(1000000) - F.sum("base").over(W.partitionBy()))
        .alias("leftover"))
    sh = rk.select(
        group_col,
        F.greatest(
            F.col("base") + F.when(F.col("r") <= F.col("leftover"), 1)
                             .otherwise(0),
            F.lit(1)).alias("share"))
    rn = df.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy(group_col)
             .orderBy(F.md5(F.col(id_col).cast("string")), id_col)))
    return rn.join(sh, group_col).withColumn(
        "k", F.expr("(rn * 1000000L) div share")).drop("share")
