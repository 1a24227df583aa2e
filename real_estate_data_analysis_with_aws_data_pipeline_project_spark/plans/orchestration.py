"""Pipeline orchestration (SURVEY.md §2.10 C1-C4).

The reference drives its ETL through Step Functions: input-validation
Pass states, a Glue Task with retry/backoff, a data-quality Choice,
and terminal states (RealEstatePipeline.asl.json). Here that control
flow is plain Python around the Spark pipeline — with two engine-side
upgrades over the reference (SURVEY.md §4.3.1):

- pipeline metrics come from ONE ``df.observe`` pass attached to the
  dataflow, not 8 separate count() actions re-running plan prefixes;
- the quality gate consumes those observed metrics instead of its own
  second join.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import TABLES, table_path
from ..sources.writers import validate_contract
from .reference_pipeline import OUTPUT_CONTRACT, enriched_sample_pipeline

MATCH_RATE_THRESHOLD = 95.0  # real_estate_etl_job.py:147


@dataclass
class PipelineResult:
    status: str  # SUCCEEDED | DATA_QUALITY_ISSUE | PROCESSING_FAILED
    attempts: int
    metrics: dict = field(default_factory=dict)
    error: str | None = None


def validate_inputs(sf_dir: str, tables=("orders", "customer")) -> None:
    """C1 ValidatePipelineInputs / Check*DataExists
    (RealEstatePipeline.asl.json:5-52): inputs must exist before any
    cluster time is spent."""
    for t in tables:
        path = table_path(sf_dir, t)
        if not os.path.exists(path):
            raise FileNotFoundError(f"required input missing: {path}")
        if t not in TABLES:
            raise KeyError(f"unknown table {t}")


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    max_attempts: int = 3,
    backoff_s: float = 0.0,
) -> PipelineResult:
    """C2 StartGlueETLJob with retry ×2 + backoff
    (RealEstatePipeline.asl.json:53-82) → C3 DataQualityCheck Choice →
    C4 terminal states. One action executes the whole dataflow; the
    observation rides along for free."""
    validate_inputs(sf_dir)
    last_err: str | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            obs = Observation("pipeline_metrics")
            result = enriched_sample_pipeline(spark, sf_dir)
            # declared-schema gate (Schema.json analog) BEFORE any
            # write/action — a drifted pipeline fails here, not in the
            # output table
            validate_contract(result, OUTPUT_CONTRACT)
            observed = result.observe(
                obs,
                F.count(F.lit(1)).alias("n_out"),
                F.sum(F.col("cust_name").isNotNull().cast("int")).alias("n_matched"),
                # observe() disallows distinct aggregates (metrics must
                # merge incrementally) — the HLL sketch is the fit
                F.approx_count_distinct("order_priority").alias("n_groups"),
            )
            observed.write.mode("overwrite").format("noop").save()
            m = obs.get
            match_rate = 100.0 * m["n_matched"] / m["n_out"] if m["n_out"] else 0.0
            metrics = {**m, "match_rate_pct": round(match_rate, 2)}
            if match_rate >= MATCH_RATE_THRESHOLD:
                return PipelineResult("SUCCEEDED", attempt, metrics)
            return PipelineResult("DATA_QUALITY_ISSUE", attempt, metrics)
        except Exception as e:  # C2 Catch → retry, then ProcessingFailed
            last_err = f"{type(e).__name__}: {e}"
            if attempt < max_attempts and backoff_s:
                time.sleep(backoff_s * (2 ** (attempt - 1)))
    return PipelineResult("PROCESSING_FAILED", max_attempts, error=last_err)
