"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the ANSI-SQL oracle on the same parquet tables, then
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
    TABLES,
    table_path,
)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # STRICT exact-value rule (VERDICT r8): the replica must be at
        # least as strict as the driver's value hash. No rounding here
        # (queries round at source per convention) and NO -0.0 -> 0.0
        # fold — the old fold hid a driver-red negative-zero channel in
        # embedding_covariance_whitening for two rounds.
        return repr(float(v))
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    sdf = spark_df.toPandas()
    odf = run_oracle(sql, sf_dir)
    s_cols = sorted(c.lower() for c in sdf.columns)
    o_cols = sorted(c.lower() for c in odf.columns)
    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"
    assert len(sdf) == len(odf), f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    s_rows = _norm_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _norm_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
