"""Standard-surface completion queries (SURVEY.md §7 Phase 2).

Categories the reference lacks but a complete engine must expose
(SURVEY.md §2.4-§2.6 'absent' rows): analytic window functions, frame
specs, top-k per group, set operations, distinct/approx aggregates,
cube/rollup/grouping sets, pivot, and the SQL entry point (the Athena
role — README.md:15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .sources.catalog import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.5 completion — analytic window functions
# ---------------------------------------------------------------------------


@register(
    "w3_rank_dense_rank",
    """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER w AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w3_rank_dense_rank(spark, sf_dir):
    """rank/dense_rank/row_number with deterministic tie-break
    (§2.5 'absent' completion)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "w4_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 2) AS total_price,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w4_lag_lead(spark, sf_dir):
    """lag/lead over an event sequence per key (§2.5 completion)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round("o_totalprice", 2).alias("total_price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@register(
    "w5_running_sum_frame",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def w5_running_sum_frame(spark, sf_dir):
    """Explicit rowsBetween frame: running per-customer spend
    (§2.5 frame-spec completion)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "w6_topk_per_group",
    """
    SELECT order_priority, o_orderkey, round(o_totalprice, 2) AS total_price
    FROM (
        SELECT o_orderpriority AS order_priority, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def w6_topk_per_group(spark, sf_dir):
    """Top-K per group — the canonical window pattern (§2.5 completion)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("order_priority"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 Set operations (absent in reference; engine completion)
# ---------------------------------------------------------------------------


@register(
    "set_union_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_distinct(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


# ---------------------------------------------------------------------------
# §2.4 completion — distinct/approx aggregates, cube/rollup/grouping sets
# ---------------------------------------------------------------------------


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Exact multi-column distinct aggregation (§2.4 completion)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "agg_approx_count_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_nd,
           abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
               <= 0.10 * count(DISTINCT l_orderkey) AS approx_within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark, sf_dir):
    """HyperLogLog distinct: sketches differ across engines, so the
    oracle-checkable claim is the accuracy envelope (|approx-exact| ≤
    10 %, Spark sketch at rsd=0.02) — plus the exact count.

    r17 (guide §2.3): mixing approx_count_distinct with
    count(DISTINCT) in ONE aggregate makes Spark's distinct-rewrite
    carry the full 411-word HLL++ buffer through the
    (flag, orderkey)-grain expand exchange — one ~3 KB sketch PER
    DISTINCT KEY (~500 MB of shuffle state at sf0.1, 3.3 s for a
    0.4 s query). Computing the two aggregates in separate branches
    (each with proper map-side partials: one sketch per flag per
    task; a bare two-level distinct) and broadcast-joining the
    3-row results is the same arithmetic without the per-key
    sketch."""
    li = _t(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_nd")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_nd")
    )
    return exact.join(F.broadcast(approx), "l_returnflag").select(
        "l_returnflag",
        "exact_nd",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            <= 0.10 * F.col("exact_nd")
        ).alias("approx_within_10pct"),
    )


@register(
    "agg_cube",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
           coalesce(l_linestatus, 'ALL') AS line_status,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE multidimensional aggregate (§2.4 completion); null
    subtotal markers coalesced to 'ALL' for engine-portable output."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_rollup",
    """
    SELECT coalesce(r.r_name, 'ALL') AS region,
           coalesce(n.n_name, 'ALL') AS nation,
           round(sum(c.c_acctbal), 2) AS total_bal,
           CAST(count(*) AS BIGINT) AS n
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchical subtotals over the dim hierarchy."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("total_bal"), F.count("*").alias("n"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_bal",
            "n",
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS order_status,
           coalesce(o_orderpriority, 'ALL') AS order_priority,
           round(sum(o_totalprice), 2) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS via the SQL surface (Catalyst plans it as a single
    expand+aggregate, same as cube/rollup)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS order_status,
               coalesce(o_orderpriority, 'ALL') AS order_priority,
               round(sum(o_totalprice), 2) AS total,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_pivot",
    """
    SELECT o_orderpriority AS order_priority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot (wide conditional aggregation) with a bounded pivot-value
    list — unbounded pivot would need a driver-side distinct pass."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "order_priority",
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


# ---------------------------------------------------------------------------
# SQL entry point (the Athena role — SURVEY §1.4, README.md:15)
# ---------------------------------------------------------------------------

_REVENUE_BY_NATION_SQL = """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC
"""


@register("sql_surface_revenue_by_nation", _REVENUE_BY_NATION_SQL, headline=True)
def sql_surface_revenue_by_nation(spark, sf_dir):
    """The engine's Athena-equivalent: plain SQL over catalog views;
    a 4-way join + agg (TPC-H Q5 shape). Catalyst broadcasts the dims
    and shuffles only on the join keys of the two fact tables."""
    register_views(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return spark.sql(_REVENUE_BY_NATION_SQL)


_PIPE_SQL = """
    FROM orders
    |> WHERE o_orderstatus = 'F'
    |> AGGREGATE round(sum(o_totalprice), 2) AS total_spend,
                 CAST(count(*) AS BIGINT) AS n_orders
       GROUP BY o_orderpriority
    |> WHERE n_orders > 0
    |> SELECT o_orderpriority, total_spend, n_orders
    |> ORDER BY o_orderpriority
"""


@register(
    "sql_pipe_syntax_rollup",
    """
    SELECT o_orderpriority, round(sum(o_totalprice), 2) AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 0
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_syntax_rollup(spark, sf_dir):
    """Spark 4 SQL pipe syntax (|> operators): the filter → aggregate →
    having → project chain written as a linear pipeline. Parses to the
    identical logical plan as the nested-SELECT form the oracle runs —
    surface syntax only, Catalyst sees one Aggregate over one filtered
    scan."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_PIPE_SQL)


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
    headline=True,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: highly selective scan-agg — the pushdown
    benchmark (filters reach the parquet reader; no shuffle at all)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    headline=True,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: the 6-table join with the customer-supplier
    same-nation condition. The two fact tables shuffle on orderkey;
    customer/supplier/nation/region all broadcast; the region IN-list
    prunes through nation to supplier before the fact join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority AS ship_priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    headline=True,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    customer is broadcast; lineitem⋈orders shuffles on orderkey."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderpriority").alias("ship_priority"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "heavy_shuffle_part_spend",
    """
    SELECT p.p_brand,
           CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS spend,
           round(max(part_spend.part_total), 2) AS top_part_spend
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN (
        SELECT l_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS part_total
        FROM lineitem GROUP BY l_partkey
    ) part_spend ON part_spend.l_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
    headline=True,
)
def heavy_shuffle_part_spend(spark, sf_dir):
    """Deliberately shuffle-bound benchmark: a high-cardinality
    per-partkey aggregation re-joined to the fact table (shuffle on
    l_partkey both times — AQE coalesces the post-shuffle partitions),
    then brand rollup. Exercises the exchange/sort/merge path that
    dominates at 100 TB, unlike the broadcast-friendly dim joins."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_spend = li.groupBy("l_partkey").agg(F.sum(disc).alias("part_total"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_spend, "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.round(F.sum(disc), 2).alias("spend"),
            F.round(F.max("part_total"), 2).alias("top_part_spend"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    """
    SELECT p.p_partkey, p.p_brand, s.s_name,
           round(s.s_acctbal, 2) AS supp_acctbal
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size = 10
      AND s.s_acctbal = (
          SELECT min(s2.s_acctbal)
          FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          WHERE l2.l_partkey = p.p_partkey
      )
    GROUP BY p.p_partkey, p.p_brand, s.s_name, s.s_acctbal
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum-cost supplier via a correlated
    scalar subquery — planned explicitly as its decorrelated form (a
    window min over the part's suppliers), one shuffle on partkey."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    s = _t(spark, sf_dir, "supplier")
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        pairs.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("s_acctbal", 2).alias("supp_acctbal"),
        )
        .distinct()
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue-from-returns report — selective
    fact filters, customer/nation broadcast, top-20."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "nation")
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus ORDER BY l.l_linestatus
    """,
)
def tpch_q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional (CASE) aggregation split by
    priority class."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("int")).cast("bigint").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional
    ratio-of-sums over a month of shipments, part dim broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_pct"))
    )


@register(
    "tpch_q18_large_volume_customers",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS total_price,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def tpch_q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered IN-subquery (orders whose
    total quantity exceeds a threshold) → semi-join → detail
    aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    o = _t(spark, sf_dir, "orders").join(big_orders, "o_orderkey", "left_semi")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


@register(
    "tpch_q19_disjunctive_predicates",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_size BETWEEN 11 AND 20 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_size BETWEEN 21 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicates spanning both join
    sides — Catalyst extracts the common single-side conjuncts
    (p_size ≤ 50, quantity ≤ 40) and pushes them below the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20))
        | (F.col("p_size").between(11, 20) & F.col("l_quantity").between(10, 30))
        | (F.col("p_size").between(21, 50) & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# --- correlated LATERAL top-k per key (round 11) -------------------------------
#
# The SQL-surface spelling of "top 3 orders per high-balance
# customer": a correlated LATERAL subquery with ORDER BY + LIMIT —
# the form analysts write when they think per-row, and historically a
# nested-loop trap. The point of registering it is the PLAN, not the
# semantics: Catalyst DECORRELATES the lateral into a
# WindowGroupLimit pipeline (partial top-k before the shuffle, final
# after — bounded reducer state, the same shape the plan-audit gate
# requires of the rank-filter idiom) joined BROADCAST to the filtered
# customer keys; there is no per-customer re-execution anywhere in
# the physical plan. DuckDB runs the identical SQL text natively, so
# the oracle is the query string itself. Ties on o_totalprice break
# on o_orderkey; customers with no orders drop (inner lateral),
# both stated in the ORDER BY/JOIN.

_LATERAL_TOPK_SQL = """
    SELECT c.c_custkey, t.o_orderkey,
           round(t.o_totalprice, 2) AS o_totalprice
    FROM customer c
    JOIN LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3
    ) t ON true
    WHERE c.c_acctbal > 9000
"""


@register("join_lateral_topk_per_key", _LATERAL_TOPK_SQL)
def join_lateral_topk_per_key(spark, sf_dir):
    """Correlated LATERAL subquery with per-key ORDER BY + LIMIT (top
    3 orders per customer with balance > 9000) — registered for the
    plan shape: Catalyst decorrelates it to partial+final
    WindowGroupLimit (bounded reducer state) plus one broadcast join,
    never a nested loop; see the section comment. The oracle is the
    same SQL text run natively by DuckDB.

    Scale: one shuffle of orders on o_custkey with map-side top-k
    pre-pruning (the Partial WindowGroupLimit caps each mapper's
    output at k rows per key), one broadcast of the filtered customer
    keys; output is ≤ 3 rows per qualifying customer."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_TOPK_SQL)


# --- correlated LATERAL aggregate over LIMIT (round 12) ------------------------
#
# The second LATERAL shape: an AGGREGATE of a correlated ORDER
# BY + LIMIT subquery — "each high-balance customer's average over
# their 3 most recent orders", the recency-feature spelling analysts
# write per-row. Unlike the bare top-k (join_lateral_topk_per_key,
# which Catalyst decorrelates into the ideal WindowGroupLimit
# pipeline), Spark 4.1's decorrelation of THIS shape inserts a GLOBAL
# range sort of orders on (o_orderdate, o_orderkey) before the
# per-key row_number — measured on the executed plan: an extra
# rangepartitioning exchange + full sort that contributes nothing
# (the ORDER BY only ever matters within one customer) and at 100 TB
# is a cluster-wide sort of the fact table. So the Spark side runs
# the rank-filter formulation, which DOES plan as partial+final
# WindowGroupLimit (map-side top-3 pre-pruning, bounded reducer
# state, ONE hash shuffle), left-joined from the filtered customers
# so zero-order customers keep the LATERAL's aggregate-over-empty row
# (n_recent = 0, NULL average). DuckDB runs the LATERAL text natively
# as the oracle, and the equivalence test drives Spark's own
# decorrelated spark.sql() through both — the registered query is
# the semantics; the formulation is the scale fix.
#
# Determinism: cents are exact BIGINTs, the top-3 multiset is fully
# ordered by (o_orderdate, o_orderkey), and the average is one
# half-up-quantized division of two integers — identical in both
# engines. round() here is exact: cents are whole numbers.

_LATERAL_RECENT_SQL = """
    SELECT c.c_custkey, t.n_recent, t.recent_avg_cents
    FROM customer c
    JOIN LATERAL (
        SELECT CAST(count(*) AS BIGINT) AS n_recent,
               CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) + 0.5e0)
                    AS BIGINT) AS recent_avg_cents
        FROM (
            SELECT CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT)
                       AS cents
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
            LIMIT 3
        )
    ) t ON true
    WHERE c.c_acctbal > 9000
"""


@register("join_lateral_recent_avg", _LATERAL_RECENT_SQL, headline=True)
def join_lateral_recent_avg(spark, sf_dir):
    """Average order value over each high-balance customer's 3 most
    recent orders — the correlated-LATERAL-aggregate-over-LIMIT SQL
    surface, run as the rank-filter formulation because Spark's own
    decorrelation of this shape plans a needless GLOBAL sort of
    orders (see the section comment; the equivalence test pins both
    the row equality against spark.sql's decorrelation and the
    WindowGroupLimit-no-rangepartitioning plan shape).

    Scale: orders semi-pruned to qualifying customers BEFORE the
    window shuffle, one hash shuffle with map-side top-3 pre-pruning
    (partial WindowGroupLimit), a per-key 2-sum aggregate, and one
    join back to the filtered customer keys; ≤ 1 row per qualifying
    customer."""
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.expr(
            "CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT)"
        ).alias("cents"),
    )
    # prune the fact side first: orders of non-qualifying customers
    # can never reach the output, so drop them before the shuffle
    o = o.join(c, o["o_custkey"] == c["c_custkey"], "left_semi")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    agg = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_recent"),
            F.expr(
                "CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*)"
                " + 0.5e0) AS BIGINT)"
            ).alias("recent_avg_cents"),
        )
    )
    return c.join(agg, c["c_custkey"] == agg["o_custkey"], "left").select(
        "c_custkey",
        F.coalesce(F.col("n_recent"), F.lit(0))
        .cast("bigint")
        .alias("n_recent"),
        "recent_avg_cents",
    )
