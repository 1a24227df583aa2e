"""Pipeline-metric, source-roundtrip and REST-ingestion queries
(SURVEY.md §2.1, §4.3.1).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .registry import register
from .sources.catalog import load_table
from .sources.readers import read_binary_files, read_csv, read_json, read_orc
from .sources.rest import fetch_rest_source, normalize_census_records
from .sources.writers import write_csv, write_json, write_orc


@register(
    "pipeline_single_pass_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN o_orderstatus IN ('O','F') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_status_kept,
           CAST(sum(CASE WHEN o_orderstatus IN ('O','F')
                          AND o_totalprice IS NOT NULL
                          AND o_custkey IS NOT NULL
                          AND o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_notnull_kept,
           CAST(sum(CASE WHEN o_orderstatus IN ('O','F')
                          AND o_totalprice IS NOT NULL
                          AND o_custkey IS NOT NULL
                          AND o_orderdate IS NOT NULL
                          AND c.c_custkey IS NOT NULL
                          AND c.c_acctbal > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           round(100.0 * sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*), 2) AS match_rate_pct
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def pipeline_single_pass_metrics(spark, sf_dir):
    """The reference's 8 interleaved count() actions
    (real_estate_etl_job.py:36-140, anti-pattern §4.3.1) as ONE
    conditional aggregation over a single scan + one broadcast join:
    every stage's cardinality in a single pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    status_ok = F.col("o_orderstatus").isin("O", "F")
    notnull_ok = (
        status_ok
        & F.col("o_totalprice").isNotNull()
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderdate").isNotNull()
    )
    covered_ok = notnull_ok & F.col("c_custkey").isNotNull() & (F.col("c_acctbal") > 0)
    return j.agg(
        F.count("*").alias("n_raw"),
        F.sum(status_ok.cast("int")).cast("bigint").alias("n_status_kept"),
        F.sum(notnull_ok.cast("int")).cast("bigint").alias("n_notnull_kept"),
        F.sum(covered_ok.cast("int")).cast("bigint").alias("n_covered"),
        F.round(
            100.0 * F.sum(F.col("c_custkey").isNotNull().cast("int")) / F.count("*"),
            2,
        ).alias("match_rate_pct"),
    )


@register(
    "source_csv_roundtrip",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    """S2/S6 CSV source+sink: write customer to headered CSV, read it
    back with an explicit schema (no inference), aggregate — the
    result must equal the same aggregate over the parquet original,
    proving the CSV path is lossless for this schema."""
    customer = load_table(spark, sf_dir, "customer")
    out = os.path.join(
        tempfile.gettempdir(), f"engine_csv_roundtrip_{os.path.basename(sf_dir)}"
    )
    write_csv(customer, out, header=True)
    back = read_csv(spark, out, schema=customer.schema, header=True)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "source_json_roundtrip",
    """
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def source_json_roundtrip(spark, sf_dir):
    """S1/S7 JSON source+sink roundtrip on the nation dim."""
    nation = load_table(spark, sf_dir, "nation")
    out = os.path.join(
        tempfile.gettempdir(), f"engine_json_roundtrip_{os.path.basename(sf_dir)}"
    )
    write_json(nation, out)
    back = read_json(spark, out, schema=nation.schema)
    return back.groupBy("n_regionkey").agg(F.count("*").alias("n_nations"))


@register(
    "source_orc_roundtrip",
    """
    SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """ORC source+sink roundtrip on the supplier dim: write ORC, read
    it back, aggregate — must equal the same aggregate over the parquet
    original (lossless columnar alternative; same pushdown/pruning
    behavior class as parquet)."""
    supplier = load_table(spark, sf_dir, "supplier")
    out = os.path.join(
        tempfile.gettempdir(), f"engine_orc_roundtrip_{os.path.basename(sf_dir)}"
    )
    write_orc(supplier, out)
    back = read_orc(spark, out)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "source_binaryfile_ingest",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(length(n_name)) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT n_name) AS BIGINT) AS n_distinct_contents
    FROM nation
    """,
)
def source_binaryfile_ingest(spark, sf_dir):
    """Opaque-blob ingestion: the nation names written as one small
    file each (the object-store layout multimodal payloads arrive in),
    read back through the binaryFile source, and summarized. The file
    fan-out is dimension-scale (25 files) — at 100 TB the same source
    lists millions of objects and parallelizes per file."""
    nation = load_table(spark, sf_dir, "nation")
    out = os.path.join(
        tempfile.gettempdir(),
        f"engine_binfiles_{os.path.basename(sf_dir)}",
    )
    os.makedirs(out, exist_ok=True)
    for row in nation.select("n_nationkey", "n_name").collect():  # 25 dim rows
        with open(os.path.join(out, f"n_{row['n_nationkey']:03d}.txt"), "wb") as f:
            f.write(str(row["n_name"]).encode())
    blobs = read_binary_files(spark, out, glob="*.txt")
    return blobs.agg(
        F.count("*").alias("n_files"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes"),
        F.countDistinct(F.col("content").cast("string")).alias(
            "n_distinct_contents"
        ),
    )


# The offline fake endpoint derives every field from the md5 of the key
# (sources/rest.fake_census_fetch), so the whole REST path — mapInPandas
# fan-out included — is ORACLE-CHECKABLE: this SQL recomputes the same
# 48-bit hash integer from the md5 hex and applies the same field
# derivations and normalization.
_REST_HEXSUM = " + ".join(
    f"(instr('0123456789abcdef', substr(hx, {i}, 1)) - 1) * {16 ** (12 - i)}"
    for i in range(1, 13)
)

_REST_ORACLE = f"""
    WITH k AS (SELECT n_name AS key, md5(n_name) AS hx FROM nation),
    h AS (SELECT key, CAST({_REST_HEXSUM} AS BIGINT) AS h FROM k),
    rec AS (
        SELECT key,
               CASE WHEN h % 11 = 0 THEN -666666666
                    ELSE 30000 + h % 90000 END AS median_income,
               1000 + (h // 256) % 50000 AS population,
               (h // 65536) % 5000 AS college_educated,
               5000 + (h // 16777216) % 20000 AS edu_total,
               (h // 4294967296) % 2000 AS unemployed,
               2000 + (h // 1099511627776) % 30000 AS labor_force
        FROM h
    )
    SELECT key,
           CAST(CASE WHEN median_income <= -999999 THEN NULL
                     ELSE median_income END AS BIGINT) AS median_income,
           CAST(population AS BIGINT) AS population,
           round(100.0 * college_educated / edu_total, 1)
               AS college_educated_pct,
           round(100.0 * unemployed / labor_force, 1) AS unemployment_rate,
           'fake_census_v1' AS data_source
    FROM rec
"""


@register("rest_census_ingest", _REST_ORACLE)
def rest_census_ingest(spark, sf_dir):
    """S3 REST-API source: keys fan out over executor partitions
    (mapInPandas fetch loops), responses normalized sentinel→null with
    derived percentage metrics (CensusDataFetch.py semantics). Uses
    the deterministic offline fake endpoint — whose md5-derived fields
    the oracle recomputes in SQL, making the whole distributed-fetch
    path value-checked, not just rows-only; the fetch_fn is injectable
    for a real API (make_http_census_fetch)."""
    keys = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_name").alias("key"))
        .repartition(4)
    )
    raw = fetch_rest_source(keys)
    return normalize_census_records(raw)


@register(
    "source_schema_evolution",
    """
    SELECT CAST(2 * count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_with_abbrev,
           CAST(count(DISTINCT substr(r_name, 1, 3)) AS BIGINT)
               AS n_distinct_abbrev
    FROM region
    """,
)
def source_schema_evolution(spark, sf_dir):
    """Schema evolution on read: an old parquet batch (2 columns) and
    a new batch with an added column land in one dataset;
    mergeSchema=true reconciles them, old rows surfacing NULL for the
    added column — the append-only schema-drift regime a long-lived
    100 TB table lives in. The aggregate proves both batches are read
    and the evolved column is populated exactly for the new batch."""
    region = load_table(spark, sf_dir, "region")
    base = os.path.join(
        tempfile.gettempdir(), f"engine_schema_evo_{os.path.basename(sf_dir)}"
    )
    region.select("r_regionkey", "r_name").write.mode("overwrite").parquet(
        os.path.join(base, "batch=1")
    )
    region.select(
        "r_regionkey",
        "r_name",
        F.substring("r_name", 1, 3).alias("r_abbrev"),
    ).write.mode("overwrite").parquet(os.path.join(base, "batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(base)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.count("r_abbrev").alias("n_with_abbrev"),
        F.countDistinct("r_abbrev").alias("n_distinct_abbrev"),
    )
