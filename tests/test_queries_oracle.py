"""Every registered query with an oracle must match DuckDB on the
same parquet tables (the driver's correctness gate, replicated at
sf0.001 for speed)."""

from __future__ import annotations

import pytest

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES

from .oracle import assert_matches_oracle

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
