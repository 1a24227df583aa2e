"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference repo
``akashg94/Real-Estate-Data-analysis-with-AWS-Data-Pipeline-Project``.

The reference is an AWS-managed pipeline (Glue Spark ETL + Lambda +
Step Functions + Athena); this engine re-expresses every capability it
has — scans, filters, joins, aggregation, stratified sampling, quality
gates, SQL surface — as idiomatic PySpark (DataFrame API + Spark SQL +
Catalyst), designed for a multi-executor cluster at 100 TB scale while
being testable on ``local[N]``.

Layout:
    sources/    parquet/csv/json readers + table catalog + sinks
    operators/  relational + [ext] operators (filters, joins, aggs,
                windows, sampling, set ops, dedup, similarity, text)
    functions/  scalar column-expression helpers
    plans/      composed pipelines (the reference ETL job transposed)
    streaming/  structured-streaming layer over the events table
"""

__version__ = "0.1.0"
