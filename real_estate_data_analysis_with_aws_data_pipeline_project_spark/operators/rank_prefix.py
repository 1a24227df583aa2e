"""Two-pass value-range rank machinery — ONE home (r14 review).

The r13 review unified the bucketing rule into a single
``_rng_bucketed``; the r14 review moved it here together with the
generalized prefix-CELL kernel when a second copy of the rank-cut
placement walk appeared (queries_extra's spend prefix vs the Qini
cell prefix). ``queries_events`` re-exports ``_rng_bucketed`` and
``_SPEND_RANGES`` so historical import sites keep working, but the
definitions live only here.

Pattern (the features_global_equidepth_bins lineage): pass 1
aggregates per value-range bucket (count + any cell sums —
≤ ``_SPEND_RANGES`` rows, a metadata-scale collect), the driver walks
the bucket prefix once to place every ascending rank cut in its
bucket with a residual and the exact cell totals of all FULL buckets
below it, and pass 2 windows ONLY inside the boundary buckets
(fan-in = one bucket's density) to add the residual-many smallest
rows' cells. No global sort or window at any size; heavy ties
concentrate their bucket (documented caveat shared by every rank
kernel here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SPEND_RANGES = 4096  # value-range buckets for the two-pass rank


def _rng_bucketed(df: DataFrame, col: str = "m") -> DataFrame:
    """ONE definition of the two-pass value-range bucketing rule
    (r13 review: the order-statistic and rank-prefix paths must never
    desynchronize on width/handling): rng = col div width, width
    sized off max(col) so there are ≤ _SPEND_RANGES buckets; assumes
    col ≥ 0 (div on negatives floors differently). One Spark action
    for the max."""
    mx = df.agg(F.max(col)).first()[0]
    width = max(1, (int(mx) if mx is not None else 0) // _SPEND_RANGES + 1)
    return df.withColumn("rng", F.expr(f"{col} div {width}").cast("bigint"))


def bucket_prefix_cells(spark, g, cell_aggs, ranks_for, order=("m", "key")):
    """Exact ascending-prefix CELL sums at rank cuts, without a global
    sort — ONE definition of the cut-placement walk (r14 review: the
    spend-prefix and Qini copies desynchronize otherwise).

    ``g``: DataFrame already carrying ``rng`` (apply ``_rng_bucketed``
    first) plus the ``order`` columns and every column the cell
    aggregators read. ``cell_aggs``: list of (name, aggregate Column)
    evaluated identically in pass 1 (per bucket) and pass 2 (residual
    rows of boundary buckets). ``ranks_for``: callable n -> {tag: m}
    mapping each tag to its ascending prefix length m ∈ [0, n].

    Returns ``(part, base, n, totals)``: ``part`` is a DataFrame
    (tag, p_<name>… ) holding the boundary-bucket partial cells —
    a cut landing exactly on a bucket boundary emits a part row
    summing that ENTIRE bucket (residual = bucket count); only
    m = 0 tags have no part row, so callers coalesce to 0; ``base``
    maps tag -> full-bucket
    cell prefix list (cell order = ``cell_aggs`` order); ``totals``
    is the whole-relation cell list, so callers can read top-k cells
    as totals − base − part."""
    names = [n for n, _ in cell_aggs]
    pass1 = g.groupBy("rng").agg(
        F.count("*").alias("cnt"),
        *[a.alias(n) for n, a in cell_aggs],
    )
    pairs = sorted(
        (int(r["rng"]), int(r["cnt"]), *(int(r[n]) for n in names))
        for r in pass1.collect()
    )
    n = sum(p[1] for p in pairs)
    totals = [sum(p[i + 2] for p in pairs) for i in range(len(names))]
    targets, base = [], {}
    for tag, m in ranks_for(n).items():
        acc = [0] * len(names)
        if m > 0:
            prefix_c = 0
            for rng, cnt, *cells in pairs:
                if m <= prefix_c + cnt:
                    targets.append((rng, tag, m - prefix_c))
                    break
                prefix_c += cnt
                acc = [a + c for a, c in zip(acc, cells)]
        base[tag] = acc
    tdf = spark.createDataFrame(
        targets, "rng bigint, tag string, residual bigint"
    )
    w = Window.partitionBy("rng", "tag").orderBy(*order)
    part = (
        g.join(F.broadcast(tdf), "rng")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("residual"))
        .groupBy("tag")
        .agg(*[a.alias(f"p_{n}") for n, a in cell_aggs])
    )
    return part, base, n, totals
