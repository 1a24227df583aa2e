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

from .operators import text as X
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


# --- Python UDTF (round 2) --------------------------------------------------

_UDTF_CAP = 50
_UDTF_WIN = 5


_UDTF_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {X.tokens_sql()} AS toks FROM documents
        WHERE doc_id < {_UDTF_CAP}
          AND {X.norm_text_sql()} <> ''
    )
    SELECT doc_id, CAST(w AS BIGINT) AS win_idx,
           array_to_string(toks[w * {_UDTF_WIN} + 1 : w * {_UDTF_WIN} + {_UDTF_WIN}],
                           ' ') AS win_text
    FROM t, unnest(generate_series(0,
        CAST(ceil(len(toks) / {_UDTF_WIN}.0) AS BIGINT) - 1)) AS g(w)
    WHERE len(toks) > 0
"""


@register("udtf_token_windows", _UDTF_ORACLE)
def udtf_token_windows(spark, sf_dir):
    """Python UDTF (Spark 4 table function): one input row → many
    output rows from arbitrary Python — here non-overlapping 5-token
    windows per document. Deliberately the BOTTOM rung of the UDF
    ladder (corpus_chunk_documents does the same job as pure Catalyst
    expressions ~100× cheaper); registered to prove the UDTF surface
    with a full oracle, capped to 50 docs so the Python path stays off
    any hot loop."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, win_idx bigint, win_text string")
    class TokenWindows:
        def eval(self, doc_id: int, text: str):
            import re

            toks = [
                t
                for t in re.sub(r"[^a-z0-9]+", " ", (text or "").lower())
                .strip()
                .split(" ")
                if t
            ]
            for w in range(0, (len(toks) + _UDTF_WIN - 1) // _UDTF_WIN):
                yield (
                    doc_id,
                    w,
                    " ".join(toks[w * _UDTF_WIN : (w + 1) * _UDTF_WIN]),
                )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _UDTF_CAP
    )
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("token_windows", TokenWindows)
    return spark.sql(
        "SELECT tw.* FROM udtf_docs_in d, "
        "LATERAL token_windows(d.doc_id, d.text) tw"
    )


# --- cogrouped applyInPandas (round 2) --------------------------------------

_COGROUP_SCHEMA = "c_custkey long, n_orders long, raw_spend double, raw_bal double"


def _cogroup_spend(key, orders_pdf, customer_pdf):
    """Per-BUCKET cogrouped merge (r17): the cogroup key is a hash
    bucket of the customer key, so each Python call receives ~64
    customers' paired frames and merges them vectorized — one pandas
    groupby + one merge — instead of one call (and one 1-row
    DataFrame construction + one Arrow batch) per customer. The
    per-customer arithmetic is unchanged: n = that customer's order
    count, total = numpy sum of its o_totalprice (the same Series.sum
    the per-key version ran), bal = its acctbal; rounding still
    happens OUTSIDE the UDF (F.round below — Python round() is
    banker's on the binary value and diverged from both engines on an
    exact decimal half: …/1936 = 1506.03875 → .0387 vs .0388).
    Output is anchored on the customer frame: a key present only in
    orders emits nothing, exactly like the oracle's customer-anchored
    left join (none exist under the FK — asserted by the row-count
    match)."""
    import pandas as pd

    if len(customer_pdf) == 0:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "raw_spend": pd.Series([], dtype="float64"),
                "raw_bal": pd.Series([], dtype="float64"),
            }
        )
    g = orders_pdf.groupby("c_custkey")["o_totalprice"].agg(
        n_orders="count", raw_spend="sum"
    )
    out = customer_pdf[["c_custkey", "c_acctbal"]].merge(
        g, left_on="c_custkey", right_index=True, how="left"
    )
    return pd.DataFrame(
        {
            "c_custkey": out["c_custkey"].astype("int64"),
            "n_orders": out["n_orders"].fillna(0).astype("int64"),
            "raw_spend": out["raw_spend"].fillna(0.0).astype("float64"),
            "raw_bal": out["c_acctbal"].astype("float64"),
        }
    )


@register(
    "udf_cogroup_spend_ratio",
    """
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend,
           round(c.c_acctbal, 2) AS acctbal,
           CASE WHEN round(c.c_acctbal, 2) <> 0 THEN
               round(round(coalesce(sum(o.o_totalprice), 0), 2)
                     / round(c.c_acctbal, 2), 4) + 0.0
           END AS spend_to_balance
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def udf_cogroup_spend_ratio(spark, sf_dir):
    """Cogrouped applyInPandas: orders and customer grouped on the
    same key arrive as PAIRED pandas frames per key — the two-table
    custom-merge surface (fuzzy reconciliation, interleaved event
    alignment) that single-group applyInPandas can't express. The
    oracle is the equivalent relational join+agg; at scale each
    cogroup must fit one executor, so this rung is for genuinely
    non-relational merge logic only.

    r17 (guide §4 — fewer, larger batches across the Python
    boundary): cogrouping on the raw customer key shipped ONE tiny
    Arrow batch pair and ONE Python call per customer — 15 K calls /
    1-row result frames at sf0.1, 21.9 s of pure per-group overhead
    for a sub-second computation. The cogroup key is now a
    deterministic hash BUCKET of the customer key (pmod, sized from
    catalog row stats to ~64 customers per bucket), and the merge
    inside each call is vectorized pandas — the same two-table
    custom-merge surface, three orders of magnitude fewer boundary
    crossings. Output rows are identical (bucketing a cogroup key is
    exactly how a production cogroup bounds its per-group state)."""
    from .sources.catalog import table_rows

    n_cust = table_rows(sf_dir, "customer")
    n_buckets = max(16, n_cust // 64)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    ).withColumn("bk", F.pmod("c_custkey", F.lit(n_buckets)))
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).withColumn("bk", F.pmod("c_custkey", F.lit(n_buckets)))
    raw = (
        orders.groupBy("bk")
        .cogroup(customer.groupBy("bk"))
        .applyInPandas(_cogroup_spend, schema=_COGROUP_SCHEMA)
        # customers with zero orders still merge (left join inside the
        # bucket); keys present only in orders would emit acctbal=None
        # rows the oracle's customer-anchored join never sees — none
        # exist in this schema (FK), asserted by the row-count match
    )
    spend = F.round("raw_spend", 2)
    bal = F.round("raw_bal", 2)
    return raw.select(
        "c_custkey",
        "n_orders",
        spend.alias("total_spend"),
        bal.alias("acctbal"),
        F.when(bal != 0, F.round(spend / bal, 4)).alias("spend_to_balance"),
    )
