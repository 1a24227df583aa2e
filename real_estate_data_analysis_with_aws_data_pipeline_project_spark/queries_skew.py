"""Skew-mitigation queries: salted two-level aggregation and the
replicate-small-side salted join. Oracles are the plain (unsalted)
forms — the whole point is bit-identical results with bounded
per-reducer fan-in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.skew import (
    join_skew_profile,
    salted_aggregate,
    salted_join,
    shuffle_skew_profile,
)
from .registry import register
from .sources.catalog import load_table

# Reducer-input bound the profiler recommends salts against: with the
# guide's ~target-task sizing, a key above this row count would
# overwhelm one reducer and gets split across ⌈n/target⌉ salts.
_SKEW_TARGET_ROWS = 4096
_SKEW_TOP_N = 20


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


@register(
    "skew_shuffle_profile",
    f"""
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM c
    )
    SELECT c.event_type, c.n_rows,
           round(CAST(c.n_rows AS DOUBLE) / t.total, 6) AS share,
           round(CAST(c.n_rows AS DOUBLE) * t.n_keys / t.total, 4)
               AS skew_ratio,
           CAST(CASE WHEN c.n_rows > {_SKEW_TARGET_ROWS}
                     THEN (c.n_rows + {_SKEW_TARGET_ROWS} - 1)
                          // {_SKEW_TARGET_ROWS}
                     ELSE 1 END AS INT) AS recommended_salt
    FROM c, t
    ORDER BY c.n_rows DESC, c.event_type
    LIMIT {_SKEW_TOP_N}
    """,
)
def skew_shuffle_profile(spark, sf_dir):
    """Shuffle-skew profiler (VERDICT r7 #5): per-key histogram of the
    events aggregation key (event_type — 5 values carrying ~20 k rows
    each at sf0.1, the classic hot-group shuffle) with the salt factor
    that bounds each key's reducer input at _SKEW_TARGET_ROWS rows —
    exactly the ``n_salts`` the salted_aggregate/salted_join
    mitigations consume, closing the profile→mitigate loop as planner
    hygiene on top of AQE's runtime skew split.

    Scale: the profiler never amplifies the skew it measures — count
    partial-aggregates map-side (one partial row per key per map
    partition), totals ride a one-row broadcast crossJoin, and top-N
    is TakeOrderedAndProject, not a global window."""
    ev = load_table(spark, sf_dir, "events")
    return shuffle_skew_profile(
        ev, ["event_type"], target_rows=_SKEW_TARGET_ROWS, top_n=_SKEW_TOP_N
    )


# The join profile's reducer-input bound: small enough that the sf0.01
# fixture (≈ 13×13 rows per hot user for click ⋈ purchase) actually
# exercises the > 1 salt branch.
_JOIN_SKEW_TARGET_ROWS = 8


@register(
    "skew_join_key_profile",
    f"""
    WITH lc AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_left
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    rc AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_right
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    pk AS (
        SELECT lc.user_id, lc.n_left, rc.n_right,
               CAST(lc.n_left * rc.n_right AS BIGINT) AS out_rows
        FROM lc JOIN rc USING (user_id)
    ),
    t AS (SELECT CAST(sum(out_rows) AS BIGINT) AS total FROM pk)
    SELECT pk.user_id, pk.n_left, pk.n_right, pk.out_rows,
           round(CAST(floor(CAST(pk.out_rows AS DOUBLE) / t.total * 1e6
                            + 0.5e0) AS BIGINT) / 1e6, 6) AS out_share,
           CAST(CASE WHEN pk.n_left > {_JOIN_SKEW_TARGET_ROWS}
                     THEN (pk.n_left + {_JOIN_SKEW_TARGET_ROWS} - 1)
                          // {_JOIN_SKEW_TARGET_ROWS}
                     ELSE 1 END AS INT) AS recommended_salt
    FROM pk, t
    ORDER BY pk.out_rows DESC, pk.user_id
    LIMIT {_SKEW_TOP_N}
    """,
)
def skew_join_key_profile(spark, sf_dir):
    """Join-key skew profile (ROADMAP r9 #4): the click ⋈ purchase
    stream-join key (user_id — the streaming_click_purchase_join
    shape) profiled on BOTH sides, because with two non-unique sides
    the reducer hazard is the PRODUCT n_left·n_right, which neither
    single-side histogram shows. recommended_salt is the n_salts a
    salted_join (clicks = big side) needs to bound per-(key, salt)
    input at {_JOIN_SKEW_TARGET_ROWS} rows.

    Scale: see operators.skew.join_skew_profile — key-grain
    everywhere, map-side partials, broadcast total, top-N via
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    return join_skew_profile(
        clicks,
        purchases,
        key="user_id",
        target_rows=_JOIN_SKEW_TARGET_ROWS,
        top_n=_SKEW_TOP_N,
    )
