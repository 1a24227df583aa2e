"""As-of and range joins (SURVEY.md §2.3 — absent in both Spark and
the reference; [ext] completions the guide's OLAP pattern list names).

As-of join (``most recent right row at or before the left row's
time``): Spark has no native operator, and a naive approach is a
per-row subquery. The scalable form used here is the union-and-carry
pattern: tag both sides, union, sort within key by (ts, side), carry
the last right-side values forward with a running ``last(ignorenulls)``
window, keep left rows. One shuffle on the key, no point lookups —
O(n log n) per key partition, independent of time-gap distribution.

Range join (``left.ts ∈ [right.start, right.end)`` with no equi key):
the scalable form buckets the range dimension — each right interval
explodes into the fixed-width buckets it overlaps, each left row maps
to its bucket, the join becomes an equi-join on bucket plus an exact
range filter. Bucket width trades replication (intervals spanning
many buckets) against candidate fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    carry_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row: the nearest right row for the same key —
    ``backward`` (default) takes the greatest right_ts <= left_ts,
    ``forward`` the smallest right_ts >= left_ts; ties at equal ts
    match in both directions. Carried right columns come back prefixed
    ``asof_``. Both directions are the same union-and-carry plan (one
    shuffle on the key); forward just flips the running window to
    first(ignorenulls) over the FOLLOWING frame."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof direction {direction!r}: backward|forward")
    carry_cols = carry_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        # deterministic tiebreak among right rows sharing (key, ts):
        # without it, which row's values are carried depends on the
        # partitioning (ADVICE r1).  Each column contributes an isnull
        # marker bit followed by its value — NULL hashes as "1" and any
        # real string as "0"+value, so NULL is distinguishable from
        # EVERY value, including ones equal to a would-be sentinel
        # (ADVICE r2/r3; concat_ws alone silently skips NULL elements)
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.concat(
                        F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0")),
                        F.coalesce(F.col(c).cast("string"), F.lit("")),
                    )
                    for c in carry_cols
                ],
            )
        ).alias("_tiebreak"),
        # ONE struct per right row, not one column per carry col: the
        # running first/last(ignorenulls) must pick the whole matched
        # row atomically.  With per-column carries, a NULL in one carry
        # column of the nearest row was filled from a farther row, so
        # asof_ts and asof_<col> could come from DIFFERENT right rows —
        # diverging from a native ASOF join, which returns the matched
        # row's NULL (ADVICE r4).  Fields are positional (t, c0, c1, …)
        # so a carry column named "ts" can't collide.
        F.struct(
            F.col(right_ts).alias("t"),
            *[F.col(c).alias(f"c{i}") for i, c in enumerate(carry_cols)],
        ).alias("_r_row"),
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    if direction == "backward":
        # right (_side 0) sorts before left at equal ts → the PRECEDING
        # frame's last() sees the same-ts right row
        w = (
            Window.partitionBy(key)
            .orderBy("_ats", "_side", "_tiebreak")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda col: F.last(col, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left (_side 1) sorts before right at equal ts → the FOLLOWING
        # frame's first() sees the same-ts right row
        w = (
            Window.partitionBy(key)
            .orderBy("_ats", F.desc("_side"), "_tiebreak")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda col: F.first(col, ignorenulls=True).over(w)  # noqa: E731
    carried = unioned.select("*", pick("_r_row").alias("_m"))
    out = carried.filter(F.col("_side") == 1).select(
        "*",
        F.col("_m.t").alias("asof_ts"),
        *[
            F.col(f"_m.c{i}").alias(f"asof_{c}")
            for i, c in enumerate(carry_cols)
        ],
    )
    drop = ["_side", "_ats", "_tiebreak", "_r_row", "_m"]
    return out.drop(*drop)


def range_join_bucketed(
    left: DataFrame,
    left_point: Column,
    right: DataFrame,
    right_start: Column,
    right_end: Column,
    bucket_width_days: int = 7,
) -> DataFrame:
    """point-in-interval join via day-bucket equi-join + exact filter.
    left gains nothing but the matched right rows (inner join).

    Expects ``left_point``/``right_start``/``right_end`` as date-typed
    Columns over `left`/`right`. The equi-join key is
    floor(epoch_day / width); right intervals are exploded into every
    bucket they overlap."""
    epoch = F.lit("1970-01-01").cast("date")
    l_bucket = F.floor(F.datediff(left_point, epoch) / bucket_width_days)
    r_first = F.floor(F.datediff(right_start, epoch) / bucket_width_days)
    r_last = F.floor(F.datediff(right_end, epoch) / bucket_width_days)
    lb = left.withColumn("_bucket", l_bucket).withColumn("_point", left_point)
    rb = (
        right.withColumn("_start", right_start)
        .withColumn("_end", right_end)
        .withColumn("_bucket", F.explode(F.sequence(r_first, r_last)))
    )
    joined = lb.join(rb, "_bucket").filter(
        (F.col("_point") >= F.col("_start")) & (F.col("_point") < F.col("_end"))
    )
    return joined.drop("_bucket", "_point", "_start", "_end")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_interval: tuple[str, str],
    right_interval: tuple[str, str],
    bucket_width: int,
) -> DataFrame:
    """INTERVAL OVERLAP join (interval × interval, the third member of
    the as-of / point-in-range family): inner-join every left interval
    to every right interval it overlaps ([ls, le] ∩ [rs, re] ≠ ∅,
    closed ends), at scale.

    Both axes are integer units (e.g. epoch µs), named by column so a
    self-join just renames one side. Each interval explodes into the
    ``bucket_width``-sized buckets it touches and the join runs as a
    bucket equi-join + exact overlap filter — O(Σ per-bucket n·m)
    instead of the O(n·m) nested loop. A pair overlapping several
    shared buckets is emitted EXACTLY ONCE without any distinct: the
    join keeps only the bucket containing max(ls, rs) — the first
    bucket of the intersection, which exists iff the pair overlaps —
    so downstream counts need no dedup shuffle.

    Scale: candidate fan-in per bucket is (active left) × (active
    right) in that window — the intrinsic cost of overlap joins; pick
    ``bucket_width`` near the typical interval length so most
    intervals touch O(1) buckets, and let AQE split residual hot
    buckets."""
    ls, le = left_interval
    rs, re_ = right_interval
    lb = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{ls} div {int(bucket_width)}"),
                F.expr(f"{le} div {int(bucket_width)}"),
            )
        ),
    )
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{rs} div {int(bucket_width)}"),
                F.expr(f"{re_} div {int(bucket_width)}"),
            )
        ),
    )
    joined = lb.join(rb, "_b").filter(
        (F.col(ls) <= F.col(re_))
        & (F.col(rs) <= F.col(le))
        & (
            F.col("_b")
            == F.expr(f"greatest({ls}, {rs}) div {int(bucket_width)}")
        )
    )
    return joined.drop("_b")
