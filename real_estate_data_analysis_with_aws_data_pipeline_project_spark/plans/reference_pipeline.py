"""The reference's core ETL pipeline, transposed onto the testdata
star schema (SURVEY.md §3.1, §7 Phase 0).

Reference dataflow (``real_estate_etl_job.py``, steps 2-9):
    read fact CSV → IN-list state filter → 5-column NOT NULL filter →
    restrict to census-covered ZIPs → stratified 100/state sample →
    broadcast LEFT JOIN census → cast + derived price_per_sqft →
    18-column aliased select.

Transposition: ``orders`` plays the Zillow fact table, ``customer``
plays the census dimension, ``o_orderpriority`` plays ``state``,
``o_custkey``/``c_custkey`` plays ``zip_code``.

Spark-first deviations from the reference (deliberate, SURVEY.md §4.3):
- the collect()-to-driver ZIP list (``real_estate_etl_job.py:41``)
  becomes a distributed ``left_semi`` join;
- the partitioning-dependent ``rand(42)`` sample order becomes the
  engine-portable md5(key) order;
- no interleaved count() actions — the plan is one lazy dataflow;
- schema comes from parquet, not schema-less CSV + late casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.joins import broadcast_enrich, semi_join
from ..operators.sampling import stratified_sample_deterministic
from ..sources.catalog import load_table

# o_orderstatus ∈ {'O','F'} ≙ state IN (MA, CA, NY), real_estate_etl_job.py:64-65
STATUS_FILTER = ("O", "F")
NOT_NULL_COLS = ("o_totalprice", "o_custkey", "o_orderdate", "o_orderpriority")
SAMPLE_PER_GROUP = 100


def enriched_sample_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    # STEP 3: IN-list filter (P1) — real_estate_etl_job.py:64-65
    filtered = orders.filter(F.col("o_orderstatus").isin(*STATUS_FILTER))

    # STEP 4: multi-column NOT NULL (P2) — real_estate_etl_job.py:79-85
    for c in NOT_NULL_COLS:
        filtered = filtered.filter(F.col(c).isNotNull())

    # STEP 5: covered-keys semi-join (P3/J2) — replaces collect()+isin
    # (real_estate_etl_job.py:41,96); "covered" ≙ census ZIPs with data
    covered_keys = (
        customer.filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
    )
    covered = semi_join(filtered, covered_keys, "o_custkey")

    # STEP 6: stratified exactly-100-per-group sample (W1/W2) —
    # real_estate_etl_job.py:107-115, deterministic-order redesign
    sampled = stratified_sample_deterministic(
        covered, "o_orderpriority", "o_orderkey", SAMPLE_PER_GROUP
    )

    # STEP 7: broadcast LEFT JOIN enrichment (J1) —
    # real_estate_etl_job.py:130-134
    enriched = broadcast_enrich(
        sampled, customer, sampled.o_custkey == customer.c_custkey, "left"
    )

    # STEP 8: derived metric (F1-F3) ≙ price_per_sqft =
    # round(price/house_size, 2), real_estate_etl_job.py:158-163
    enriched = enriched.withColumn(
        "price_to_balance",
        F.when(
            F.col("c_acctbal").isNotNull() & (F.col("c_acctbal") != 0),
            F.round(F.col("o_totalprice") / F.col("c_acctbal"), 2),
        ),
    )

    # STEP 9: final aliased select (P4) — real_estate_etl_job.py:172-191
    return enriched.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_orderpriority").alias("order_priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round("o_totalprice", 2).alias("total_price"),
        F.col("o_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("cust_segment"),
        F.round("c_acctbal", 2).alias("cust_acctbal"),
        F.col("price_to_balance"),
    )


# Declared output contract — the analog of the reference's pinned
# 18-column Schema.json:1-92, enforced before write by
# sources.writers.validate_contract / write_with_contract.
OUTPUT_CONTRACT = T.StructType(
    [
        T.StructField("order_key", T.LongType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("order_priority", T.StringType()),
        T.StructField("order_date", T.StringType()),
        T.StructField("total_price", T.DoubleType()),
        T.StructField("cust_key", T.LongType()),
        T.StructField("cust_name", T.StringType()),
        T.StructField("cust_segment", T.StringType()),
        T.StructField("cust_acctbal", T.DoubleType()),
        T.StructField("price_to_balance", T.DoubleType()),
    ]
)


ENRICHED_SAMPLE_ORACLE = """
WITH filtered AS (
    SELECT * FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
      AND o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
), covered AS (
    SELECT f.* FROM filtered f
    WHERE EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = f.o_custkey AND c.c_acctbal > 0
    )
), sampled AS (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderpriority
        ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    ) AS rn
    FROM covered
)
SELECT
    s.o_orderkey AS order_key,
    s.o_orderstatus AS order_status,
    s.o_orderpriority AS order_priority,
    strftime(s.o_orderdate, '%Y-%m-%d') AS order_date,
    round(s.o_totalprice, 2) AS total_price,
    s.o_custkey AS cust_key,
    c.c_name AS cust_name,
    c.c_mktsegment AS cust_segment,
    round(c.c_acctbal, 2) AS cust_acctbal,
    CASE WHEN c.c_acctbal IS NOT NULL AND c.c_acctbal <> 0
         THEN round(s.o_totalprice / c.c_acctbal, 2) END AS price_to_balance
FROM sampled s
LEFT JOIN customer c ON s.o_custkey = c.c_custkey
WHERE s.rn <= 100
"""
