"""UDF / UDAF / UDTF surface queries (SURVEY.md §2.9).

The reference's Lambdas are row-at-a-time Python; the engine exposes
the full PySpark UDF ladder and demonstrates each rung on an
oracle-checkable query:

- ``F.udf`` row-at-a-time (correct but slowest — kept for parity with
  safe_int, CensusDataFetch.py:45-50),
- ``@pandas_udf`` Arrow-vectorized scalar,
- ``applyInPandas`` grouped-map (the UDAF/UDTF equivalent).

The native-expression twin of the row UDF lives in
queries_scalar.f6_f7_sentinel_null_safe — same semantics, ~10-100×
faster; docstrings say so because UDFs are the slow path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import register
from .sources.catalog import load_table

# --- row-at-a-time UDF (parity rung) --------------------------------------


def _safe_int(v) -> int | None:
    """The reference's safe_int (CensusDataFetch.py:45-50): tolerant
    parse, <= -999999 sentinel → None."""
    try:
        i = int(v)
    except (TypeError, ValueError):
        return None
    return None if i <= -999999 else i


safe_int_udf = F.udf(_safe_int, T.IntegerType())


@register(
    "udf_rowwise_safe_int",
    """
    SELECT c_custkey,
           CASE WHEN raw <= -999999 THEN NULL ELSE CAST(raw AS INT) END
               AS cleaned
    FROM (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN -666666666
                    ELSE c_nationkey END AS raw
        FROM customer
    )
    """,
)
def udf_rowwise_safe_int(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path — serde per row, breaks
    codegen; prefer the native when/cast twin in
    f6_f7_sentinel_null_safe)."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "raw",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(-666666666)).otherwise(
            F.col("c_nationkey")
        ),
    )
    return c.select("c_custkey", safe_int_udf("raw").alias("cleaned"))


# --- vectorized pandas UDF -------------------------------------------------


@F.pandas_udf(T.LongType())
def parse_id_suffix(name: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar UDF: parse the numeric suffix of
    'Customer#000000086'-style names."""
    return name.str.split("#").str[-1].astype("int64")


@register(
    "udf_pandas_parse_id",
    """
    SELECT c_custkey, CAST(split_part(c_name, '#', 2) AS BIGINT) AS parsed_id
    FROM customer
    """,
)
def udf_pandas_parse_id(spark, sf_dir):
    """Pandas UDF rung: same parse as f1_cast_string_numeric but
    through the Arrow-batched Python path — integer output, so the
    oracle match is exact."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", parse_id_suffix("c_name").alias("parsed_id")
    )


# --- grouped-map applyInPandas (UDAF/UDTF equivalent) ---------------------

_RANK_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("bal_rank", T.LongType()),
    ]
)


def _group_rank(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_mktsegment": pdf["c_mktsegment"],
            "bal_rank": pdf["c_acctbal"]
            .rank(method="dense", ascending=False)
            .astype("int64"),
        }
    )


@register(
    "udaf_group_rank",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(dense_rank() OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC
           ) AS BIGINT) AS bal_rank
    FROM customer
    """,
)
def udaf_group_rank(spark, sf_dir):
    """applyInPandas grouped-map (the UDAF/UDTF surface): per-segment
    dense rank of balances — each group arrives as one pandas
    DataFrame; the oracle expresses the same as a window function
    (integer output → exact cross-engine match). Scale note: a group
    must fit in one executor's memory; for unbounded groups use the
    window-function form instead."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(_group_rank, schema=_RANK_SCHEMA)
    )
