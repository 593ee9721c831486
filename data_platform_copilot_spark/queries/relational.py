"""Relational constructs beyond the reference's generated surface.

SURVEY.md §2.C: window functions, set ops, grouping sets / cube /
rollup, semi/anti joins, distinct aggregation, pivot, subqueries —
the reference's gateway would pass all of these through to DuckDB
unimplemented; on Spark they're first-class Catalyst constructs, so
our job is full test coverage with DuckDB oracles, plus TPC-H-style
aggregation shapes as the scale benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .core import _t, query, rnd


@query("tpch_q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate after a scan filter.

    Scale: partial aggregation (map-side combine) reduces the shuffle
    to |groups| x |partitions| rows; the filter pushes to parquet.
    All 8 aggregates compute in ONE pass — whole-stage codegen fuses
    the projections and the hash-agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
             rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
             rnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
             rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
             rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
             rnd(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count("*").alias("count_order"))
    )


_RANK_TOPK_ORACLE = """
SELECT segment, customer_id, balance, rnk
FROM (
    SELECT c_mktsegment AS segment,
           c_custkey AS customer_id,
           round(c_acctbal, 2) AS balance,
           CAST(row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
    FROM customer
)
WHERE rnk <= 3
"""


@query("window_rank_topk_per_group", oracle=_RANK_TOPK_ORACLE)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the canonical replacement for a driver-side
    loop. Since r15 the DECLARED entry runs the whale-proof salted
    two-phase plan (r14 verdict #1): the ranking-window form sorts
    each of the 5 market segments in ONE task (N/5 rows; AQE cannot
    split a window partition). Delegates to topk_per_group_two_phase
    — identical result, same oracle."""
    return topk_per_group_two_phase(spark, sf_dir)


@query("topk_per_group_two_phase", oracle=_RANK_TOPK_ORACLE)
def topk_per_group_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_rank_topk_per_group's whale-proof twin — salted
    two-phase top-k (operators.skew.salted_topk). The one-window plan
    sorts each of the 5 market segments in ONE task (N/5 rows; AQE
    cannot split a window partition); phase 1 here ranks inside
    (segment, salt-of-row) sub-partitions and keeps each bucket's
    top-3, phase 2 re-ranks the <= 3*32 survivors per segment — the
    final window is bounded by k*salts regardless of table size, and
    the ranks equal the global ranks because every better row also
    survived phase 1. Same oracle."""
    from ..operators.skew import salted_topk
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_acctbal"))
    top = salted_topk(cust, ["segment"],
                      [F.desc("c_acctbal"), F.col("customer_id")],
                      k=3, salts=32, rank_col="rnk")
    return top.select("segment", "customer_id",
                      rnd("c_acctbal", 2).alias("balance"), "rnk")


@query("window_running_sum", oracle="""
SELECT month,
       monthly_revenue,
       round(sum(monthly_revenue) OVER (
           ORDER BY month
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_revenue
FROM (
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           round(sum(o_totalprice), 2) AS monthly_revenue
    FROM orders
    GROUP BY 1
)
""")
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total over an aggregate — analytic frame
    ROWS UNBOUNDED PRECEDING. The unpartitioned window runs over
    |months| rows (tiny) AFTER the big agg, so the single-partition
    window stage is not a scale hazard."""
    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                               "yyyy-MM-dd").alias("month"))
        .agg(rnd(F.sum("o_totalprice"), 2).alias("monthly_revenue"))
    )
    w = W.orderBy("month").rowsBetween(W.unboundedPreceding, W.currentRow)
    return monthly.withColumn(
        "running_revenue", rnd(F.sum("monthly_revenue").over(w), 2))


@query("window_lag_delta", oracle="""
SELECT month, monthly_revenue,
       round(monthly_revenue - lag(monthly_revenue) OVER (ORDER BY month), 2)
           AS mom_delta
FROM (
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           round(sum(o_totalprice), 2) AS monthly_revenue
    FROM orders
    GROUP BY 1
)
""")
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month delta via lag() — offset window function."""
    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                               "yyyy-MM-dd").alias("month"))
        .agg(rnd(F.sum("o_totalprice"), 2).alias("monthly_revenue"))
    )
    w = W.orderBy("month")
    return monthly.withColumn(
        "mom_delta",
        rnd(F.col("monthly_revenue") - F.lag("monthly_revenue").over(w), 2))


@query("set_ops_union_intersect_except", oracle="""
SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
)
UNION ALL
SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
)
UNION ALL
SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
)
""")
def set_ops_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) / INTERSECT / EXCEPT via the DataFrame set ops.
    Spark plans INTERSECT/EXCEPT as left-semi/left-anti after dedup."""
    building = (_t(spark, sf_dir, "customer")
                .where(F.col("c_mktsegment") == "BUILDING")
                .select(F.col("c_custkey").alias("k")))
    big = (_t(spark, sf_dir, "orders")
           .where(F.col("o_totalprice") > 400000)
           .select(F.col("o_custkey").alias("k")))

    def count_as(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(op).alias("op"), "n")

    return (
        count_as(building.union(big).distinct(), "union")
        .unionAll(count_as(building.intersect(big), "intersect"))
        .unionAll(count_as(building.exceptAll(big).distinct(), "except"))
    )


@query("rollup_revenue_region_nation", oracle="""
SELECT r_name AS region, n_name AS nation,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(grouping(r_name) AS BIGINT) AS g_region,
       CAST(grouping(n_name) AS BIGINT) AS g_nation
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region->nation hierarchy with grouping() markers
    (distinguishes 'NULL because subtotal' from a NULL key). Spark
    expands rollup into a union of grouping sets before the agg —
    still one shuffle."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(rnd(F.sum("o_totalprice"), 2).alias("revenue"),
             F.grouping("r_name").cast("long").alias("g_region"),
             F.grouping("n_name").cast("long").alias("g_nation"))
        .select(F.col("r_name").alias("region"),
                F.col("n_name").alias("nation"),
                "revenue", "g_region", "g_nation")
    )


@query("cube_status_priority", oracle="""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.grouping("o_orderstatus").cast("long").alias("g_status"),
             F.grouping("o_orderpriority").cast("long").alias("g_priority"))
        .select(F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
                "n", "g_status", "g_priority")
    )


@query("grouping_sets_explicit", oracle="""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""")
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (DataFrame API exposes only
    rollup/cube; arbitrary sets go through the SQL parser)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


@query("semi_join_customers_with_orders", oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_customers_with_orders
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""")
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / IN-subquery as a left-semi join: no row multiplication,
    the build side is deduplicated implicitly."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey,
                      "left_semi")
        .agg(F.count("*").alias("n_customers_with_orders"))
    )


@query("anti_join_customers_without_orders", oracle="""
SELECT c_custkey AS customer_id, c_mktsegment AS segment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join. (o_custkey is never NULL here;
    with nullable keys NOT IN needs the null-aware anti-join Spark
    also provides.)"""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey,
                      "left_anti")
        .select(F.col("c_custkey").alias("customer_id"),
                F.col("c_mktsegment").alias("segment"))
    )


@query("distinct_agg_per_group", oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""")
def distinct_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one agg — Spark plans this with
    expand + two-phase aggregation. At 100 TB prefer
    approx_count_distinct (HLL, one pass, no expand); kept exact here
    for oracle parity, approx variant in ``approx_distinct_counts``."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.count("*").alias("n_rows"))
    )


@query("approx_distinct_counts", oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
       TRUE AS within_eps
FROM lineitem
GROUP BY l_returnflag
""")
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct counting: one pass, fixed memory, no expand.

    The sketch value itself is engine-specific, so the oracle gate is
    bounded-error: the query returns |approx - exact| / exact <= 5%
    (2.5x the configured rsd) as ``within_eps``, which the DuckDB
    side pins to TRUE — a hash mismatch means the sketch left its
    error envelope, not merely that two engines' sketches differ."""
    eps = 0.05
    # NOT spread: measured 1.38s unspread vs 1.77s spread at sf0.1 —
    # merging 32 partial HLL sketches (rsd 0.02 = wide registers)
    # costs more than the single-partition build saves
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02)
             .alias("n_parts_approx"),
             F.countDistinct("l_partkey").alias("n_parts_exact"))
        .select("l_returnflag", "n_parts_exact",
                (F.abs(F.col("n_parts_approx") - F.col("n_parts_exact"))
                 / F.col("n_parts_exact") <= eps).alias("within_eps"))
    )


@query("pivot_status_by_priority", oracle="""
SELECT o_orderpriority AS priority,
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS "F",
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS "O",
       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS "P"
FROM orders
GROUP BY o_orderpriority
""")
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (so Catalyst skips the extra
    distinct-values job — required practice at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@query("unpivot_stack", oracle="""
SELECT o_orderkey AS order_id, metric, round(val, 2) AS val
FROM (
    SELECT o_orderkey, 'price' AS metric, o_totalprice AS val FROM orders
    UNION ALL
    SELECT o_orderkey, 'key_mod' AS metric,
           CAST(o_orderkey % 100 AS DOUBLE) AS val FROM orders
)
WHERE o_orderkey <= 100
""")
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via the native unpivot/melt (wide->long), the inverse
    of pivot; stays in whole-stage codegen (an Expand node)."""
    df = (_t(spark, sf_dir, "orders")
          .where(F.col("o_orderkey") <= 100)
          .select(F.col("o_orderkey").alias("order_id"),
                  F.col("o_totalprice").alias("price"),
                  (F.col("o_orderkey") % 100).cast("double").alias("key_mod")))
    return (
        df.unpivot("order_id", ["price", "key_mod"], "metric", "val")
        .select("order_id", "metric", rnd("val", 2).alias("val"))
    )


@query("exists_correlated_subquery", oracle="""
SELECT s_suppkey AS supplier_id, s_name AS supplier
FROM supplier
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_suppkey = s_suppkey AND l_quantity > 49
)
""")
def exists_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL parser — Catalyst decorrelates
    it into a left-semi join."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT s_suppkey AS supplier_id, s_name AS supplier
        FROM supplier
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey AND l_quantity > 49
        )
    """)


@query("scalar_subquery_cte", oracle="""
WITH seg_avg AS (
    SELECT avg(c_acctbal) AS avg_bal FROM customer
)
SELECT c_custkey AS customer_id, round(c_acctbal, 2) AS balance
FROM customer, seg_avg
WHERE c_acctbal > 2 * avg_bal
""")
def scalar_subquery_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + scalar subquery (customers with balance > 2x global avg).
    Catalyst plans the scalar as a broadcast-able single-row subquery."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        WITH seg_avg AS (SELECT avg(c_acctbal) AS avg_bal FROM customer)
        SELECT c_custkey AS customer_id, round(c_acctbal, 2) AS balance
        FROM customer, seg_avg
        WHERE c_acctbal > 2 * avg_bal
    """)


@query("case_when_bucketing", oracle="""
SELECT CASE WHEN value < 10 THEN 'low'
            WHEN value < 100 THEN 'mid'
            ELSE 'high' END AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total
FROM events
WHERE value IS NOT NULL
GROUP BY 1
""")
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bucket = (F.when(F.col("value") < 10, "low")
               .when(F.col("value") < 100, "mid")
               .otherwise("high")).alias("bucket")
    return ev.groupBy(bucket).agg(
        F.count("*").alias("n"),
        rnd(F.sum("value"), 2).alias("total"))


@query("null_handling_coalesce", oracle="""
SELECT coalesce(nullif(event_type, 'error'), 'n/a') AS kind,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_props
FROM events
GROUP BY 1
""")
def null_handling_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / NULL-counting semantics."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.coalesce(F.nullif("event_type", F.lit("error")),
                              F.lit("n/a")).alias("kind"))
        .agg(F.count("*").alias("n"),
             F.sum(F.col("props").isNull().cast("long")).alias("null_props"))
    )


@query("string_functions", oracle="""
SELECT p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN p_type LIKE '%BRASS%' THEN 1 END) AS BIGINT)
           AS brass,
       CAST(count(CASE WHEN regexp_matches(p_name, '^[a-m]') THEN 1 END)
            AS BIGINT) AS first_half_alpha,
       min(upper(substr(p_name, 1, 5))) AS sample_prefix
FROM part
GROUP BY p_brand
""")
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / regexp / substr / upper — scalar string library parity."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"),
             F.count(F.when(F.col("p_type").like("%BRASS%"), 1)).alias("brass"),
             F.count(F.when(F.col("p_name").rlike("^[a-m]"), 1))
              .alias("first_half_alpha"),
             F.min(F.upper(F.substring("p_name", 1, 5))).alias("sample_prefix"))
    )


@query("date_functions", oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                         o_orderdate)) AS BIGINT) AS max_days_since_epoch0
FROM orders
GROUP BY 1, 2
""")
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year / quarter extraction + datediff."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"),
                  F.quarter("o_orderdate").alias("qtr"))
        .agg(F.count("*").alias("n"),
             F.max(F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")))
              .cast("long").alias("max_days_since_epoch0"))
    )


@query("having_filter", oracle="""
SELECT o_custkey AS customer_id, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 20
""")
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 20)
    )


@query("exact_percentiles", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem
GROUP BY l_returnflag
""")
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles, bit-identical to Spark
    ``percentile`` == DuckDB ``quantile_cont`` — computed two-phase
    (operators/layout.bucketed_exact_percentiles, r14 guide §2.3):
    the ``percentile`` aggregate shipped EVERY price into 3 per-group
    OpenHashMap buffers behind a full round-robin exchange (the
    registry's slowest plan, 0.71 s at sf0.1); the bucketed selection
    shuffles only (flag, bucket) counts, retrieves the <= 4 neighbor
    buckets per flag, and interpolates with Spark's own formula —
    same hash, and exact percentiles stop being memory-unbounded at
    100 TB (no swap-to-approx caveat needed)."""
    from ..operators.layout import bucketed_exact_percentiles
    pv = bucketed_exact_percentiles(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"],
        "l_extendedprice", [0.5, 0.95], out_prefix="__pv")
    return pv.select("l_returnflag",
                     rnd(F.col("__pv0"), 4).alias("p50"),
                     rnd(F.col("__pv1"), 4).alias("p95"))


@query("approx_percentiles", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
       TRUE AS within_eps
FROM lineitem
GROUP BY l_returnflag
""")
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx — bounded-memory quantile sketch (GK, rank
    error <= 1/accuracy).

    Sketch output is engine-specific, so the oracle gate is
    bounded-error: ``within_eps`` asserts the approx median lands
    within 1% relative of the exact interpolated median (generous
    vs the <=60-row rank error at accuracy 10000 on a smooth price
    distribution); DuckDB pins it to TRUE. The exact median itself
    still hash-matches quantile_cont — computed two-phase (r14, see
    ``exact_percentiles``) so the only value-shipping aggregate left
    in this plan is the bounded-memory sketch itself; the 3-row
    exact frame broadcast-joins back onto the sketch output."""
    from ..operators.layout import bucketed_exact_percentiles
    from ..sources.registry import spread
    eps = 0.01
    appx = (
        spread(_t(spark, sf_dir, "lineitem"))
        .groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", 0.5, 10000)
             .alias("p50_approx")))
    exact = bucketed_exact_percentiles(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"],
        "l_extendedprice", [0.5], out_prefix="__pv")
    return (appx.join(F.broadcast(exact), "l_returnflag")
            .select("l_returnflag",
                    rnd(F.col("__pv0"), 4).alias("p50_exact"),
                    (F.abs(F.col("p50_approx") - F.col("__pv0"))
                     / F.col("__pv0") <= eps).alias("within_eps")))


@query("full_outer_join_reconciliation", oracle="""
WITH o AS (
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_orders
    FROM orders GROUP BY 1
), e AS (
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_events
    FROM events GROUP BY 1
)
SELECT coalesce(o.day, e.day) AS day,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN o.day IS NOT NULL AND e.day IS NOT NULL THEN 'both'
            WHEN o.day IS NOT NULL THEN 'orders_only'
            ELSE 'events_only' END AS side
FROM o FULL OUTER JOIN e ON o.day = e.day
""")
def full_outer_join_reconciliation(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN — the one join type the rest of the pack
    never needed: reconcile daily order volume against daily event
    volume, keeping days present on either side only (the
    cross-system reconciliation report every warehouse runs).

    Spark-first: both fact tables collapse to |days| rows via
    partial-agg groupBys BEFORE the full outer join, so the
    unmatched-row preservation (the expensive part of full outer —
    no broadcast variant exists for it; Spark forces sort-merge)
    happens on day-cardinality inputs. Joining the RAW fact tables
    full-outer first would shuffle 100 TB to preserve nulls;
    aggregate-then-join is the scale-correct order of operations.
    """
    o = (_t(spark, sf_dir, "orders")
         .groupBy(F.date_format(F.col("o_orderdate").cast("date"),
                                "yyyy-MM-dd").alias("day"))
         .agg(F.count(F.lit(1)).cast("long").alias("n_orders")))
    e = (_t(spark, sf_dir, "events")
         .groupBy(F.date_format(F.col("ts").cast("date"),
                                "yyyy-MM-dd").alias("day"))
         .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    return (o.join(e, "day", "full_outer")
            .select(
                "day",
                F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                F.coalesce("n_events", F.lit(0)).alias("n_events"),
                F.when(F.col("n_orders").isNotNull()
                       & F.col("n_events").isNotNull(), "both")
                .when(F.col("n_orders").isNotNull(), "orders_only")
                .otherwise("events_only").alias("side")))


@query("bloom_runtime_filter_join", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= DATE '1995-01-01'
  AND o_orderdate <  DATE '1995-04-01'
GROUP BY 1, 2
""")
def bloom_runtime_filter_join(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — the fact-table side of a
    selective star join is screened by a Bloom filter built from the
    filtered dimension keys BEFORE the shuffle join (the pattern
    Spark's optimizer injects as runtime row-level filtering; built
    explicitly here with the engine's md5 Bloom layout so the plan
    is pinned, not config- or stats-dependent). The urgent-Q1-1995
    filter keeps ~0.7% of orders; the filter's k=3 probe runs as
    THREE chained BroadcastHashJoin LeftSemi against the set-bit
    table (each a map-side hash probe — no explode, no shuffle, no
    per-row blowup), so the join exchange carries only survivors +
    Bloom false positives and the exact join kills the false
    positives — output identical to the plain join, which is the
    oracle. At 100 TB this is THE difference between shuffling the
    whole fact table and shuffling the matching fraction; unlike a
    broadcast semi-join of the raw keys the broadcast stays O(m
    bits) however many keys the dimension filter passes."""
    m_bits, k = 1 << 16, 3
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    keys = (orders
            .where((F.col("o_orderpriority") == "1-URGENT")
                   & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
                   & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date")))
            .select("o_orderkey"))

    def pos(key, j: int):
        return (F.conv(F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f":{j}"))), 1, 7),
            16, 10).cast("long") % m_bits)

    from ..sources.registry import materialize_auto
    keys = materialize_auto(keys)  # feeds k bit-builds + the exact join
    bits = (keys.select(F.explode(F.array(
        *[pos(F.col("o_orderkey"), j) for j in range(k)])).alias("p"))
        .distinct())
    bits = materialize_auto(bits)
    pruned = li
    for j in range(k):
        pruned = pruned.join(
            F.broadcast(bits.withColumnRenamed("p", f"p{j}")),
            pos(F.col("l_orderkey"), j) == F.col(f"p{j}"), "left_semi")
    return (pruned.join(keys,
                        pruned.l_orderkey == keys.o_orderkey)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 rnd(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@query("range_partition_plan", oracle="""
WITH keyed AS (
    SELECT l_extendedprice AS k,
           ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || ':'
                                  || CAST(l_linenumber AS VARCHAR)),
                              1, 6))::BIGINT % 100 < 5 AS in_sample
    FROM lineitem
), hist AS (
    SELECT k, count(*) AS c FROM keyed WHERE in_sample GROUP BY k
), cum AS (
    SELECT k, sum(c) OVER (ORDER BY k) AS cum,
           sum(c) OVER () AS ns
    FROM hist
), b AS (
    SELECT min(CASE WHEN cum >= (1 * ns + 7) // 8 THEN k END) AS b1,
           min(CASE WHEN cum >= (2 * ns + 7) // 8 THEN k END) AS b2,
           min(CASE WHEN cum >= (3 * ns + 7) // 8 THEN k END) AS b3,
           min(CASE WHEN cum >= (4 * ns + 7) // 8 THEN k END) AS b4,
           min(CASE WHEN cum >= (5 * ns + 7) // 8 THEN k END) AS b5,
           min(CASE WHEN cum >= (6 * ns + 7) // 8 THEN k END) AS b6,
           min(CASE WHEN cum >= (7 * ns + 7) // 8 THEN k END) AS b7
    FROM cum
), assigned AS (
    SELECT (CASE WHEN k > b1 THEN 1 ELSE 0 END
          + CASE WHEN k > b2 THEN 1 ELSE 0 END
          + CASE WHEN k > b3 THEN 1 ELSE 0 END
          + CASE WHEN k > b4 THEN 1 ELSE 0 END
          + CASE WHEN k > b5 THEN 1 ELSE 0 END
          + CASE WHEN k > b6 THEN 1 ELSE 0 END
          + CASE WHEN k > b7 THEN 1 ELSE 0 END) AS pid
    FROM keyed, b
), total AS (SELECT count(*) AS n FROM keyed)
SELECT CAST(pid AS BIGINT) AS partition_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(10000.0 * count(*) / max(total.n)) / 10000.0 AS frac
FROM assigned, total GROUP BY pid
""")
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner boundary planning — what Spark's
    RangePartitioner (and every distributed sort) does internally,
    surfaced as an auditable plan: a deterministic ~5% md5 sample of
    the sort key, 7 nearest-rank cut points from the sample's
    (value, count) histogram (integer rank arithmetic — no float
    quantiles), then every row assigned by 7 UNROLLED boundary
    comparisons (plain codegen'd expressions, not an interpreted
    higher-order function) and counted per partition. The frac
    column is the skew report: balanced boundaries put ~1/8
    everywhere, and a hot range shows up before you pay for the
    actual sort. Scale: the sample is the only sorted thing
    (histogram-sized window); assignment is a map-side expression
    over the broadcast 7-value boundary row — the full-table sort
    this plans for never runs inside the planner."""
    li = _t(spark, sf_dir, "lineitem")
    in_sample = (F.conv(F.substring(
        F.md5(F.concat(F.col("l_orderkey").cast("string"), F.lit(":"),
                       F.col("l_linenumber").cast("string"))), 1, 6),
        16, 10).cast("long") % 100 < 5)
    keyed = li.select(F.col("l_extendedprice").alias("k"),
                      in_sample.alias("in_sample"))
    from pyspark.sql import Window as W
    hist = (keyed.where("in_sample").groupBy("k")
            .agg(F.count(F.lit(1)).alias("c")))
    cum = hist.select(
        "k",
        F.sum("c").over(W.orderBy("k")
                        .rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("c").over(W.partitionBy()).alias("ns"))
    b = cum.agg(*[
        F.min(F.when(F.col("cum") >= F.expr(f"({i} * ns + 7) DIV 8"),
                     F.col("k"))).alias(f"b{i}")
        for i in range(1, 8)])
    assigned = (keyed.crossJoin(F.broadcast(b))
                .select(sum(
                    [(F.col("k") > F.col(f"b{i}")).cast("int")
                     for i in range(1, 8)],
                    start=F.lit(0)).alias("pid")))
    total = keyed.agg(F.count(F.lit(1)).alias("n"))
    return (assigned.groupBy("pid")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .crossJoin(F.broadcast(total))
            .select(F.col("pid").cast("long").alias("partition_id"),
                    "n_rows",
                    rnd(F.col("n_rows") / F.col("n"), 4).alias("frac")))


@query("join_size_estimate_cms", oracle="""
WITH pos AS (SELECT unnest([0, 1, 2]) AS j),
ca AS (
    SELECT j, ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                 1 + 5 * j, 5))::BIGINT
               % 262144 AS p,
           count(*) AS cnt
    FROM orders, pos GROUP BY 1, 2
), cb AS (
    SELECT j, ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
                                 1 + 5 * j, 5))::BIGINT
               % 262144 AS p,
           count(*) AS cnt
    FROM lineitem, pos GROUP BY 1, 2
), dots AS (
    SELECT ca.j, sum(ca.cnt * cb.cnt) AS dot
    FROM ca JOIN cb ON cb.j = ca.j AND cb.p = ca.p
    GROUP BY 1
), exact AS (
    SELECT sum(a.c * b.c) AS n_join FROM
      (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1) a
      JOIN
      (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1) b
      USING (k)
)
SELECT CAST(min(dot) AS BIGINT) AS est_join_rows,
       CAST(min(exact.n_join) AS BIGINT) AS exact_join_rows,
       CAST(min(dot) - min(exact.n_join) AS BIGINT) AS overcount,
       min(dot) >= min(exact.n_join) AS never_undercounts
FROM dots, exact
""")
def join_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation WITHOUT running the join: the inner
    product of two Count-Min sketches (Cormode & Muthukrishnan 2005
    §4.2) — |A join B| = sum_k cA(k)*cB(k) is estimated by
    min_j sum_p CMS_A[j,p]*CMS_B[j,p], never an undercount (every
    true key pair collides in every row; hash collisions only add),
    and both the estimate and its overcount are EXACT integers under
    the engine's deterministic md5 cell layout, so the whole
    cost-model primitive is value-gated. This is the cardinality
    oracle a planner consults before choosing shuffle vs broadcast
    or sizing AQE partitions: each side collapses to a 3 x 2^18
    cell table (one map-combinable groupBy per side — no join
    executed), and the estimate is a cell-keyed join of the two
    sparse sketches. The expected per-row collision term is
    ||a||_1 ||b||_1 / m, so m = 2^18 keeps the overcount BELOW the
    true cardinality at every tested SF (34 vs 6k at sf0.001, ~3.4k
    vs 60k at sf0.01, ~0.34M vs 0.6M at sf0.1) — sized the way a
    planner would size it. At
    100 TB the exact column here (computed only to gate the sketch)
    would be dropped; the sketch cost stays constant in corpus
    size."""
    m, d = 262144, 3

    from ..sources.registry import materialize_auto

    # Per-key combines feed BOTH the exact gate and the sketches, so
    # build them once and share (materialize_auto): hashing then runs
    # per DISTINCT key, not per raw row — on lineitem (~4 rows/key)
    # that is 4x less md5 work and a 4x smaller explode into the cell
    # combine, and the sketch cells are value-identical (summing
    # per-key counts into a cell == counting raw rows in it). At
    # 100 TB, where the exact column is dropped, the standalone
    # sketch build from raw rows (one map-combinable pass, no key
    # shuffle) remains the right shape — this entry keeps the gate,
    # so the shared-combine plan is strictly cheaper.
    a = materialize_auto(
        _t(spark, sf_dir, "orders").groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c")))
    b = materialize_auto(
        _t(spark, sf_dir, "lineitem").groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cb")))

    def cms(df: DataFrame, key: str, cnt: str) -> DataFrame:
        # one digest -> three disjoint 20-bit slices (2^20 % m == 0:
        # zero modulo bias) = three independent cell rows per key for
        # a third of the hashing cost
        dig = F.md5(F.col(key).cast("string"))
        def pos(j: int):
            return (F.conv(F.substring(dig, 1 + 5 * j, 5), 16, 10)
                    .cast("long") % m)
        return (df.select(F.col(cnt),
                          F.posexplode(F.array(
                              *[pos(j) for j in range(d)]))
                          .alias("j", "p"))
                .groupBy("j", "p").agg(F.sum(cnt).alias("cnt")))

    ca = cms(a, "o_orderkey", "c")
    cb = cms(b, "l_orderkey", "cb")
    dots = (ca.join(cb.withColumnRenamed("cnt", "cnt_b"), ["j", "p"])
            .groupBy("j").agg(F.sum(F.col("cnt") * F.col("cnt_b"))
                              .alias("dot")))
    est = dots.agg(F.min("dot").cast("long").alias("est_join_rows"))
    exact = (a.join(b, a.o_orderkey == b.l_orderkey)
             .agg(F.sum(F.col("c") * F.col("cb")).cast("long")
                  .alias("exact_join_rows")))
    return (est.crossJoin(F.broadcast(exact)).select(
        "est_join_rows", "exact_join_rows",
        (F.col("est_join_rows") - F.col("exact_join_rows"))
        .alias("overcount"),
        (F.col("est_join_rows") >= F.col("exact_join_rows"))
        .alias("never_undercounts")))
