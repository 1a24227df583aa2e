"""Property-based tests (hypothesis) for the scalar kernels and the
partitioning-invariance claims the engine makes."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# --- scalar kernel properties (driver-side evaluation via Spark) -----------


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=20
    )
)
def test_sentinel_to_null_property(spark, values):
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.functions.scalar import (
        SENTINEL_FLOOR,
        sentinel_to_null,
    )

    df = spark.createDataFrame([(v,) for v in values], "v long")
    out = [r.c for r in df.select(sentinel_to_null("v").alias("c")).collect()]
    for v, c in zip(values, out):
        if v <= SENTINEL_FLOOR:
            assert c is None
        else:
            assert c == v


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
            st.floats(
                min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_null_safe_ratio_never_divides_by_zero(spark, pairs):
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.functions.scalar import (
        null_safe_ratio,
    )

    df = spark.createDataFrame(pairs, "num double, den double")
    out = df.select(
        null_safe_ratio(F.col("num"), F.col("den"), 6).alias("r"), "den"
    ).collect()
    for r in out:
        if r.den == 0:
            assert r.r is None
        elif r.r is not None:
            assert math.isfinite(r.r)


# --- partitioning invariance ----------------------------------------------


def test_stratified_sample_invariant_to_partitioning(spark):
    """The deterministic sample must be IDENTICAL whatever the input
    partitioning — the property rand(seed) lacks (SURVEY §2.5) and the
    reason md5-ordering is the canonical form."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.sampling import (
        stratified_sample_deterministic,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    picks = []
    for n_parts in (1, 7, 32):
        sampled = stratified_sample_deterministic(
            orders.repartition(n_parts), "o_orderpriority", "o_orderkey", 37
        )
        picks.append({(r.o_orderpriority, r.o_orderkey) for r in sampled.collect()})
    assert picks[0] == picks[1] == picks[2]
    # exactly min(N, group size) per stratum
    from collections import Counter

    per_group = Counter(k for k, _ in picks[0])
    sizes = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    for g, n in per_group.items():
        assert n == min(37, sizes[g])


def test_salted_agg_equals_plain_agg_any_salt_count(spark):
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.skew import (
        salted_aggregate,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    for n_salts in (2, 16, 64):
        salted = {
            r.l_returnflag: (r.n_rows, round(r.sum_l_quantity, 2))
            for r in salted_aggregate(
                li, ["l_returnflag"], ["l_quantity"], "l_orderkey", n_salts
            ).collect()
        }
        assert salted == plain
