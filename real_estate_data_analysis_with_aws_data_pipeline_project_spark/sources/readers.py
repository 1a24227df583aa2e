"""File-format readers (SURVEY.md §2.1 S1/S2/S4/S5).

Reference parity, fixed for scale:
- S1 multi-line JSON read (real_estate_etl_job.py:34) →
  ``read_json`` with an explicit schema (inference costs a full extra
  pass at 100 TB; multiLine only when the file is a single JSON array).
- S2 schema-less CSV via DynamicFrame → all-string columns, cast late
  (real_estate_etl_job.py:49-54,158-159 — anti-pattern §4.3.3) →
  ``read_csv`` takes an explicit StructType so types are right at the
  scan and predicate pushdown works.
- S4/S5 the Zillow validation Lambda's header/sample probe
  (Zillow_ingestion.py:22-49) → ``validate_csv``: schema + first rows
  + size via one limited read, no byte-range hacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with a declared schema (never inferSchema in
    production — it triggers a full pre-pass over the data)."""
    return (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .schema(schema)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """JSON scan; multi_line=True for a single top-level JSON array
    (the reference's census file shape)."""
    reader = spark.read.option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the second columnar at-rest format (JVM-native,
    predicate pushdown + column pruning like parquet)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-blob ingestion via the binaryFile source: one row per
    file with (path, modificationTime, length, content) — the ingest
    path for multimodal payloads (images/audio) that arrive as object
    storage files rather than table columns. Spark parallelizes over
    files; pair with operators/multimodal.DECODERS downstream."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def validate_csv(
    spark: SparkSession, path: str, n_sample_rows: int = 3
) -> dict:
    """Input validation probe (Zillow_ingestion.py:35-49): column
    names/count + first rows, via a header-only scan plus a limited
    read — the validation never touches more than one partition."""
    probe = spark.read.option("header", "true").csv(path)
    sample = [row.asDict() for row in probe.head(n_sample_rows)]
    return {
        "columns": probe.columns,
        "column_count": len(probe.columns),
        "sample_rows": sample,
        "status": "valid" if probe.columns else "empty",
    }
