"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine package's query registry
(`real_estate_data_analysis_with_aws_data_pipeline_project_spark.api`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.plans import (
    enriched_sample_pipeline,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.registry import (
    ensure_session_confs,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's whole ETL pipeline
    (filter → semi-join → stratified sample → broadcast join → derive →
    select) transposed onto the testdata star schema."""
    ensure_session_confs(spark)
    return enriched_sample_pipeline(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
