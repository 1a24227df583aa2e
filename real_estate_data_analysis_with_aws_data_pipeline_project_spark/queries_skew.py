"""Skew-mitigation queries: salted two-level aggregation and the
replicate-small-side salted join. Oracles are the plain (unsalted)
forms — the whole point is bit-identical results with bounded
per-reducer fan-in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.skew import salted_aggregate, salted_join
from .registry import register
from .sources.catalog import load_table


@register(
    "skew_salted_agg",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Two-level salted aggregation over a low-cardinality (hence
    hot-group) key: partial agg on (key, salt-of-orderkey) bounds any
    single reducer's input; final merge is over n_groups × n_salts
    tiny rows. Result identical to the direct groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li, keys=["l_returnflag"], sum_cols=["l_quantity"], spread_col="l_orderkey"
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        "n_rows",
    )


@register(
    "skew_salted_join",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted skew join: orders salt by hash(o_orderkey); customer
    replicates once per salt; join on (custkey, salt). Same rows as
    the plain join — checked via the grouped aggregate."""
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        orders, customer, key="c_custkey", spread_col="o_orderkey", n_salts=8
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
