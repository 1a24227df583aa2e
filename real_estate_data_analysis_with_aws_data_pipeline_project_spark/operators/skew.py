"""Skew mitigation patterns (SURVEY.md §2 scale mandate; guide
'Partitioning & shuffle').

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these operators are the explicit forms for when the skew is
known up front or the operation is an aggregation (AQE skew handling
only covers joins):

- ``salted_aggregate``: two-level aggregation — partial aggregate on
  (keys + salt) spreads a hot group over `n_salts` reducers, then the
  tiny salted partials merge. Identical results to a direct groupBy
  for decomposable aggregates (sum/count/min/max).
- ``salted_join``: replicate-right skew join — the big side salts by a
  hash of its own row identity, the small side is exploded once per
  salt, and the join key becomes (key, salt), so one hot key's rows
  spread over n_salts tasks. Identical results to the plain join.
- ``shuffle_skew_profile``: the PLANNER-HYGIENE step the two above
  consume — per-key shuffle histogram with a recommended salt factor
  per hot key (VERDICT r7 #5 / ROADMAP second-draft #3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _salt_col(spread_col: str, n_salts: int) -> Column:
    return F.pmod(F.hash(F.col(spread_col)), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    spread_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum(c), count(*)) in two shuffles of bounded
    fan-in: hot groups are first reduced per (key, salt). Returns
    columns ``sum_<c>`` and ``n_rows``."""
    partial = (
        df.withColumn(_SALT, _salt_col(spread_col, n_salts))
        .groupBy(*keys, _SALT)
        .agg(
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
            F.count("*").alias("n_rows"),
        )
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    spread_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over n_salts
    tasks; the small side is replicated n_salts× (explode), which is
    the explicit version of what a broadcast join does implicitly —
    use when the small side is too big to broadcast but hot keys
    overwhelm single reducers.

    Only inner/left are valid: under right/full joins an unmatched
    small-side row would surface once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — "
            f"right/full would duplicate unmatched replicated rows"
        )
    big_salted = big.withColumn(_SALT, _salt_col(spread_col, n_salts))
    small_rep = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_rep, [key, _SALT], how).drop(_SALT)


def shuffle_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    target_rows: int,
    top_n: int = 20,
) -> DataFrame:
    """Per-key shuffle-size histogram for a planned groupBy/join key,
    with the salt factor that would bound each hot key's reducer input
    at ``target_rows`` — the number ``salted_aggregate``/``salted_join``
    take as ``n_salts``.

    Columns: the key, ``n_rows``, ``share`` (of total rows, 6 dp),
    ``skew_ratio`` (n_rows ÷ mean rows/key, 4 dp; > 1 ⇒ hotter than
    uniform), ``recommended_salt`` (⌈n_rows / target_rows⌉, floor 1).
    Top ``top_n`` keys by count, ties broken by key.

    Scale: the profiler is itself SKEW-IMMUNE — count partial-
    aggregates map-side, so even the hottest key contributes one
    partial row per map partition to the shuffle; the totals row is a
    broadcast crossJoin; top-N is orderBy+limit (TakeOrderedAndProject
    — per-partition heaps + driver merge of top_n rows), never a
    single-partition window."""
    counts = df.groupBy(*key_cols).agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    tot = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_total"),
        F.count("*").cast("bigint").alias("_n_keys"),
    )
    prof = counts.crossJoin(F.broadcast(tot)).select(
        *key_cols,
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("_total"), 6).alias(
            "share"
        ),
        F.round(
            F.col("n_rows").cast("double")
            * F.col("_n_keys")
            / F.col("_total"),
            4,
        ).alias("skew_ratio"),
        F.when(
            F.col("n_rows") > target_rows,
            F.expr(
                f"CAST((n_rows + {int(target_rows)} - 1) "
                f"div {int(target_rows)} AS INT)"
            ),
        )
        .otherwise(F.lit(1))
        .alias("recommended_salt"),
    )
    return prof.orderBy(F.desc("n_rows"), *key_cols).limit(top_n)


def join_skew_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
    target_rows: int,
    top_n: int = 20,
) -> DataFrame:
    """Two-sided join-key skew profile (ROADMAP r9 #4): for a planned
    ``left ⋈ right ON key``, the per-key row counts of BOTH inputs and
    their product — the key's JOIN OUTPUT size, the quantity that
    actually blows up a reducer when both sides are non-unique. Emits
    the ``n_salts`` a ``salted_join`` (left = big side) would need to
    bound the left side's per-(key, salt) input at ``target_rows``.

    Columns: the key, ``n_left``, ``n_right``, ``out_rows`` (=
    n_left·n_right), ``out_share`` (of total join output, 6 dp),
    ``recommended_salt`` (⌈n_left / target_rows⌉, floor 1). Top
    ``top_n`` keys by output size, ties by key. Inner-join semantics:
    keys absent from either side produce no output and no profile row.

    Scale: both per-key counts partial-aggregate map-side; the profile
    join runs on the KEY-grain relations (one row per key per side),
    never the input rows; the total is a one-row broadcast; top-N is
    TakeOrderedAndProject."""
    lc = left.groupBy(key).agg(F.count("*").cast("bigint").alias("n_left"))
    rc = right.groupBy(key).agg(F.count("*").cast("bigint").alias("n_right"))
    per_key = lc.join(rc, key).withColumn(
        "out_rows", (F.col("n_left") * F.col("n_right")).cast("bigint")
    )
    tot = per_key.agg(F.sum("out_rows").cast("bigint").alias("_total"))
    prof = per_key.crossJoin(F.broadcast(tot)).select(
        key,
        "n_left",
        "n_right",
        "out_rows",
        # Micro-unit quantization (ADVICE r9): round()-at-6dp on a raw
        # double is the Spark-HALF_UP-vs-DuckDB-binary half-boundary
        # channel; floor(x·1e6 + 0.5) uses exactly-rounded IEEE ops
        # only, so both engines integerize identically.
        F.round(
            F.floor(
                F.col("out_rows").cast("double") / F.col("_total") * 1e6
                + 0.5
            ).cast("bigint")
            / 1e6,
            6,
        ).alias("out_share"),
        F.when(
            F.col("n_left") > target_rows,
            F.expr(
                f"CAST((n_left + {int(target_rows)} - 1) "
                f"div {int(target_rows)} AS INT)"
            ),
        )
        .otherwise(F.lit(1))
        .alias("recommended_salt"),
    )
    return prof.orderBy(F.desc("out_rows"), key).limit(top_n)
