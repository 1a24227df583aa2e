"""Sinks (SURVEY.md §2.1 S6/S7).

Reference parity, fixed for scale:
- S6 ``coalesce(1)`` single-CSV write (real_estate_etl_job.py:202,
  anti-pattern §4.3.4) → ``write_csv`` keeps the single-file option
  for small outputs but defaults to parallel multi-file writes;
  parquet is the engine's canonical at-rest format.
- S7 single-object JSON PUT (CensusDataFetch.py:156-163) →
  ``write_json``.
- ``write_parquet`` adds partitionBy (time/tenant pruning at scale)
  and ``write_bucketed`` persists bucketed tables so later equi-joins
  on the bucket key co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """single_file=True reproduces the reference's coalesce(1) CSV —
    only for tiny result sets (the reference's output is 300 rows);
    large outputs write one file per task."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Persist hash-bucketed by the join key: subsequent equi-joins /
    aggs on bucket_col skip the shuffle (requires a warehouse-backed
    saveAsTable)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
