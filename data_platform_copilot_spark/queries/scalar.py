"""Scalar-function and semi-structured surface: JSON extraction over
events.props, math function library, SQL USING-join syntax, and the
A5 sampler semantics as a deterministic query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import _t, query, rnd


@query("json_extract_props", oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4)
           AS avg_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
           AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
           AS max_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
""")
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string payload column
    (get_json_object — JVM-side Jackson, no UDF)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.where(k.isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             rnd(F.avg(k.cast("double")), 4).alias("avg_k"),
             F.min(k.cast("int")).alias("min_k"),
             F.max(k.cast("int")).alias("max_k"))
    )


@query("json_schema_inference", oracle="""
WITH s AS (
    SELECT json_group_structure(props::JSON) AS j FROM events
)
SELECT u.k AS field,
       CASE
           WHEN json_extract_string(j, '$.' || u.k) IN
                ('UTINYINT', 'USMALLINT', 'UINTEGER', 'UBIGINT',
                 'TINYINT', 'SMALLINT', 'INTEGER', 'BIGINT')
               THEN 'integer'
           WHEN json_extract_string(j, '$.' || u.k) IN
                ('FLOAT', 'DOUBLE') THEN 'number'
           WHEN json_extract_string(j, '$.' || u.k) = 'VARCHAR'
               THEN 'string'
           WHEN json_extract_string(j, '$.' || u.k) = 'BOOLEAN'
               THEN 'boolean'
           ELSE lower(json_extract_string(j, '$.' || u.k))
       END AS json_type
FROM s, unnest(json_keys(j)) AS u(k)
""")
def json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed JSON schema inference: parse_json -> VARIANT, then
    ``schema_of_variant_agg`` merges every document's shape in one
    aggregation (map-side partial merge — no driver-side sampling).
    Output is one row per top-level field with a NORMALIZED type class
    (integer/number/string/boolean), which is what makes the result
    engine-comparable: DuckDB's json_group_structure infers the same
    shape under different native type names (UBIGINT vs BIGINT), and
    both map onto the shared vocabulary. Flat-object contract; nested
    fields would recurse the same normalization."""
    ev = _t(spark, sf_dir, "events")
    merged = (ev.select(F.parse_json("props").alias("v"))
              .agg(F.schema_of_variant_agg("v").alias("s")))
    pair = F.explode(
        F.expr(r"regexp_extract_all(s, '(\\w+): ([A-Z]+)', 0)")).alias("p")
    norm = (F.when(F.split("p", ": ").getItem(1).isin(
                "TINYINT", "SMALLINT", "INT", "BIGINT"), "integer")
            .when(F.split("p", ": ").getItem(1).isin(
                "FLOAT", "DOUBLE", "DECIMAL"), "number")
            .when(F.split("p", ": ").getItem(1) == "STRING", "string")
            .when(F.split("p", ": ").getItem(1) == "BOOLEAN", "boolean")
            .otherwise(F.lower(F.split("p", ": ").getItem(1))))
    return (merged.select(pair)
            .select(F.split("p", ": ").getItem(0).alias("field"),
                    norm.alias("json_type")))


@query("math_functions", oracle="""
SELECT l_returnflag,
       round(sum(abs(l_extendedprice - 30000)), 2) AS sum_absdev,
       round(sum(sqrt(l_quantity)), 4) AS sum_sqrt_qty,
       round(sum(ln(l_extendedprice)), 4) AS sum_ln_price,
       round(sum(pow(l_discount, 2)), 6) AS sum_disc_sq,
       round(sum(floor(l_quantity) % 7), 2) AS sum_qty_mod7,
       round(sum(ceil(l_tax * 100)), 2) AS sum_ceil_tax
FROM lineitem
GROUP BY l_returnflag
""")
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar library: abs/sqrt/ln/pow/floor/ceil/mod — all
    codegen'd, aggregated for a compact verifiable output."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(rnd(F.sum(F.abs(F.col("l_extendedprice") - 30000)), 2)
              .alias("sum_absdev"),
             rnd(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt_qty"),
             rnd(F.sum(F.log("l_extendedprice")), 4).alias("sum_ln_price"),
             rnd(F.sum(F.pow("l_discount", 2)), 6).alias("sum_disc_sq"),
             rnd(F.sum(F.floor("l_quantity") % 7).cast("double"), 2)
              .alias("sum_qty_mod7"),
             rnd(F.sum(F.ceil(F.col("l_tax") * 100)).cast("double"), 2)
              .alias("sum_ceil_tax"))
    )


@query("using_join_syntax", oracle="""
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_suppliers
FROM (SELECT s_suppkey, s_nationkey AS n_nationkey FROM supplier) s
JOIN nation USING (n_nationkey)
GROUP BY 1
""")
def using_join_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN ... USING(col) through the SQL parser — the literal syntax
    the reference's few-shot emits (reference src/chain.py:21)."""
    _t(spark, sf_dir, "supplier").withColumnRenamed(
        "s_nationkey", "n_nationkey").createOrReplaceTempView("supplier_u")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql("""
        SELECT n_name AS nation, count(*) AS n_suppliers
        FROM supplier_u
        JOIN nation USING (n_nationkey)
        GROUP BY 1
    """)


@query("sampler_where_limit", oracle="""
SELECT event_id, user_id, event_type, round(value, 2) AS value
FROM events
WHERE event_type = 'click' AND value > 400
LIMIT 10000
""")
def sampler_where_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 sampler semantics (SELECT * WHERE pred LIMIT n) as a
    deterministic query: the predicate matches fewer rows than the
    limit, so the row SET is stable across engines."""
    from ..dq.sampler import clamp_limit
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where((F.col("event_type") == "click") & (F.col("value") > 400))
        .select("event_id", "user_id", "event_type",
                rnd("value", 2).alias("value"))
        .limit(clamp_limit(10000))
    )
