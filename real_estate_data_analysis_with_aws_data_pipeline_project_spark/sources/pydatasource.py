"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests external records through a driver-side Lambda
loop (CensusDataFetch.py:17-78). sources/rest.py re-expresses that as
a mapInPandas fan-out over a keys DataFrame; this module goes one step
further and packages the same ingestion as a first-class *source*: a
``spark.read.format("census_synth")`` implementation with explicit
input partitions, so the fetch parallelism is owned by the source
(DataSourceReader.partitions) instead of a prior repartition, and the
result participates in Catalyst like any other relation.

The record derivation is byte-identical to ``rest.fake_census_fetch``
(md5-keyed fields, reference sentinel regime), so the source is fully
oracle-checkable by the same SQL that checks the REST path.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class CensusSynthDataSource(DataSource):
    """``census_synth`` format: one record per key read from the
    ``nation`` dimension of ``sf_dir`` (stand-in for the reference's
    ZIP list), fields derived via the deterministic fake endpoint.

    Options:
      - ``sf_dir``      (required) testdata directory with nation.parquet
      - ``npartitions`` (default 4) explicit input partitions
    """

    @classmethod
    def name(cls) -> str:
        return "census_synth"

    def schema(self) -> str:
        return (
            "key STRING, median_income BIGINT, population BIGINT, "
            "college_educated BIGINT, edu_total BIGINT, "
            "unemployed BIGINT, labor_force BIGINT"
        )

    def reader(self, schema) -> "CensusSynthReader":
        return CensusSynthReader(self.options)


class CensusSynthReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        if "sf_dir" not in options:
            raise ValueError("census_synth requires option 'sf_dir'")
        self._sf_dir = options["sf_dir"]
        self._nparts = int(options.get("npartitions", 4))

    def partitions(self) -> list[InputPartition]:
        # fixed modulo ranges — partition i owns keys with row_idx % n == i,
        # so planning needs no data scan (the key list is read per
        # partition on the executors)
        return [InputPartition(i) for i in range(self._nparts)]

    def read(self, partition: InputPartition):
        import os

        import pyarrow.parquet as pq

        from .rest import fake_census_fetch

        names = (
            pq.read_table(
                os.path.join(self._sf_dir, "nation.parquet"), columns=["n_name"]
            )
            .column("n_name")
            .to_pylist()
        )
        for idx, name in enumerate(names):
            if idx % self._nparts != partition.value:
                continue
            r = fake_census_fetch(str(name))
            yield (
                r["key"],
                r["median_income"],
                r["population"],
                r["college_educated"],
                r["edu_total"],
                r["unemployed"],
                r["labor_force"],
            )


def register_census_synth(spark) -> None:
    """Idempotent format registration for this session."""
    spark.dataSource.register(CensusSynthDataSource)
