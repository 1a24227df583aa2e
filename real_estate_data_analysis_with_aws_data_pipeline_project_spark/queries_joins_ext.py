"""As-of / range join queries ([ext] — SURVEY.md §2.3 completions).

DuckDB has a native ASOF JOIN, which makes these fully
oracle-checkable: the Spark union-and-carry / bucketed implementations
must reproduce the textbook semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.asof import asof_join, range_join_bucketed
from .registry import register
from .sources.catalog import load_table

_ASOF_ORACLE = """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS last_purchase_us,
           p.value AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register("join_asof_last_purchase", _ASOF_ORACLE)
def join_asof_last_purchase(spark, sf_dir):
    """As-of join: for every click, the user's most recent purchase at
    or before the click. Spark side runs the union-and-carry pattern
    (one shuffle on user_id); oracle is DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(clicks, purchases, key="user_id", carry_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("asof_ts").alias("last_purchase_us"),
        F.col("asof_value").alias("last_purchase_value"),
    )


_ASOF_FWD_ORACLE = """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS next_purchase_us,
           p.value AS next_purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts <= p.ts
"""


@register("join_asof_next_event", _ASOF_FWD_ORACLE)
def join_asof_next_event(spark, sf_dir):
    """FORWARD as-of join (r4): for every click, the user's first
    purchase at or after the click — the conversion-attribution shape.
    Same union-and-carry plan as the backward as-of with the running
    window flipped to first() over the FOLLOWING frame; oracle is
    DuckDB's native ASOF with the inequality reversed."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, key="user_id", carry_cols=["value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("asof_ts").alias("next_purchase_us"),
        F.col("asof_value").alias("next_purchase_value"),
    )


_RANGE_ORACLE = """
    SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped_in_week
    FROM orders o
    JOIN lineitem l
      ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
     AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE) + 7
    WHERE o.o_orderkey < 200
    GROUP BY o.o_orderkey
"""


@register("join_range_bucketed", _RANGE_ORACLE)
def join_range_bucketed(spark, sf_dir):
    """Pure range join (no equi key): lineitems shipped within a week
    of each order's date, for a capped order set. Spark side buckets
    the date axis (7-day buckets) so the non-equi predicate becomes an
    equi-join on bucket + exact filter — the plan that scales instead
    of the O(n·m) nested loop; oracle is the direct range join."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 200)
        .select("o_orderkey", "o_orderdate")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_shipdate")
    joined = range_join_bucketed(
        lineitem,
        F.to_date("l_shipdate"),
        orders,
        F.to_date("o_orderdate"),
        F.date_add(F.to_date("o_orderdate"), 7),
        bucket_width_days=7,
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_shipped_in_week")
    )
