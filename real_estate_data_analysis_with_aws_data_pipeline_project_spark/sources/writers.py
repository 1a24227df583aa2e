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
from pyspark.sql import types as T


class SchemaContractError(ValueError):
    """The DataFrame does not satisfy the declared output contract."""


def validate_contract(
    df: DataFrame, contract: T.StructType, strict_nullability: bool = False
) -> None:
    """Validate ``df`` against a declared output StructType: exact
    column names in order, exact types, and (optionally) nullability —
    the reference's pinned 18-column output contract (Schema.json:1-92)
    enforced at the final select (real_estate_etl_job.py:172-191),
    turned into a hard gate instead of a convention.

    Nullability is advisory by default: Spark's inferred nullability is
    unreliable through joins/aggregates, so only contract-nullable=False
    vs actual-nullable=True is rejected, and only when
    ``strict_nullability`` is set."""
    actual = df.schema
    a_names = [f.name for f in actual.fields]
    c_names = [f.name for f in contract.fields]
    if a_names != c_names:
        missing = [n for n in c_names if n not in a_names]
        extra = [n for n in a_names if n not in c_names]
        raise SchemaContractError(
            f"column mismatch: missing={missing} extra={extra} "
            f"(order matters: actual={a_names})"
        )
    for a_f, c_f in zip(actual.fields, contract.fields):
        if a_f.dataType != c_f.dataType:
            raise SchemaContractError(
                f"type mismatch on {c_f.name!r}: "
                f"actual={a_f.dataType.simpleString()} "
                f"contract={c_f.dataType.simpleString()}"
            )
        if strict_nullability and a_f.nullable and not c_f.nullable:
            raise SchemaContractError(
                f"nullability violation on {c_f.name!r}: contract forbids "
                "nulls but the column is nullable"
            )


def write_with_contract(
    df: DataFrame,
    contract: T.StructType,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    strict_nullability: bool = False,
) -> None:
    """Contract-enforced sink: validates names/types/nullability BEFORE
    any write work starts, then delegates to the format writer. A
    violation costs an exception, not a corrupted output table."""
    validate_contract(df, contract, strict_nullability=strict_nullability)
    if fmt == "parquet":
        write_parquet(df, path, mode=mode, partition_by=partition_by)
    elif fmt == "csv":
        write_csv(df, path, mode=mode)
    elif fmt == "json":
        write_json(df, path, mode=mode)
    else:
        raise ValueError(f"unknown format {fmt!r}")


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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


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
