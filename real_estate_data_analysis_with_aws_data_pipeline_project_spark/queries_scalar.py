"""Scalar-function queries (SURVEY.md §2.7 F1-F8 + dormant date fns,
§2.10 quality-gate control flow).

The reference computes these row-at-a-time in Python Lambdas; each is
re-expressed as a native Catalyst column expression (codegen'd, no
Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import null_safe_ratio, sentinel_to_null
from .registry import register
from .sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "f1_cast_string_numeric",
    """
    SELECT c_custkey, c_name,
           CAST(split_part(c_name, '#', 2) AS BIGINT) AS parsed_id,
           CAST(CAST(split_part(c_name, '#', 2) AS BIGINT) AS DOUBLE) / 100.0
               AS parsed_ratio
    FROM customer
    """,
)
def f1_cast_string_numeric(spark, sf_dir):
    """F1 string→numeric cast (the reference reads CSV schema-less and
    casts late — real_estate_etl_job.py:158-159); parse the numeric
    suffix of c_name."""
    parsed = F.substring_index("c_name", "#", -1).cast("bigint")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        parsed.alias("parsed_id"),
        (parsed.cast("double") / 100.0).alias("parsed_ratio"),
    )


@register(
    "f2_f3_arithmetic_round",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_extendedprice / l_quantity AS unit_price,
           round(l_extendedprice, 2) AS base_price
    FROM lineitem WHERE l_quantity > 0
    """,
)
def f2_f3_arithmetic_round(spark, sf_dir):
    """F2/F3 column arithmetic + round — the price_per_sqft formula
    shape (real_estate_etl_job.py:160-163).

    Per-row products/quotients are emitted unrounded: IEEE double math
    is bitwise identical across engines, whereas round() below the
    value's exact decimal precision diverges on .xx5 boundaries (Spark
    rounds the shortest decimal string HALF_UP, DuckDB rounds the
    binary value). round() is demonstrated on base_price, where the
    2-dp-exact input makes it lossless."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charged"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.round("l_extendedprice", 2).alias("base_price"),
    )


@register(
    "f6_f7_sentinel_null_safe",
    """
    SELECT c_custkey,
           CASE WHEN raw_metric <= -999999 THEN NULL ELSE raw_metric END
               AS clean_metric,
           coalesce(CASE WHEN raw_metric <= -999999 THEN NULL ELSE raw_metric END, 0)
               AS defaulted_metric,
           CASE WHEN c_acctbal IS NOT NULL AND c_acctbal <> 0
                THEN round(CAST(c_custkey AS DOUBLE) / c_acctbal, 4) + 0.0
                END AS safe_ratio
    FROM (
        SELECT *,
               CASE WHEN c_custkey % 7 = 0 THEN -666666666
                    ELSE c_nationkey END AS raw_metric
        FROM customer
    )
    """,
)
def f6_f7_sentinel_null_safe(spark, sf_dir):
    """F6/F7: census-style sentinel→null normalization (safe_int,
    CensusDataFetch.py:45-50), coalesce defaulting, and a zero-safe
    ratio (CensusDataFetch.py:59,63) — sentinels synthesized
    deterministically from the key."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "raw_metric",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(-666666666)).otherwise(
            F.col("c_nationkey")
        ),
    )
    clean = sentinel_to_null("raw_metric")
    return c.select(
        "c_custkey",
        clean.alias("clean_metric"),
        F.coalesce(clean, F.lit(0)).alias("defaulted_metric"),
        null_safe_ratio(
            F.col("c_custkey").cast("double"), F.col("c_acctbal"), 4
        ).alias("safe_ratio"),
    )


@register(
    "f5_string_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           p_brand || '/' || p_type AS brand_type,
           trim(p_name) AS name_trimmed,
           regexp_replace(p_name, ' ', '_', 'g') AS name_snake
    FROM part
    """,
)
def f5_string_functions(spark, sf_dir):
    """F5 string surface: case, length, substring, concat, trim,
    regexp_replace (global — DuckDB needs the 'g' flag for parity)."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trimmed"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@register(
    "f_date_functions",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_epoch_95,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
               AS due_date,
           strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_start
    FROM orders
    """,
)
def f_date_functions(spark, sf_dir):
    """Date functions the reference left dormant (prev_sold_date kept
    as string — Schema.json:57-60): to_date, year/month/day, datediff,
    date_add, date_trunc, exercised on o_orderdate (SURVEY §2.7)."""
    d = F.to_date("o_orderdate")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_95"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
    )


@register(
    "c3_quality_gate",
    """
    WITH m AS (
        SELECT 100.0 * sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
               / count(*) AS match_rate
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT round(match_rate, 2) AS match_rate_pct,
           CASE WHEN match_rate >= 95.0 THEN 'PASSED' ELSE 'WARNING' END AS status
    FROM m
    """,
)
def c3_quality_gate(spark, sf_dir):
    """C3 DataQualityCheck choice state: the ≥95 % match-rate gate as a
    query returning PASSED/WARNING (real_estate_etl_job.py:140-150,
    RealEstatePipeline.asl.json:108-119)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    rate = 100.0 * F.sum(F.col("c_custkey").isNotNull().cast("int")) / F.count("*")
    return joined.agg(
        F.round(rate, 2).alias("match_rate_pct"),
        F.when(rate >= 95.0, F.lit("PASSED")).otherwise(F.lit("WARNING")).alias(
            "status"
        ),
    )
