"""Runnable demo: ``python -m real_estate_data_analysis_with_aws_data_pipeline_project_spark
[sf_dir] [query ...]``

Runs the flagship pipeline (or the named queries) against the given
scale-factor directory (default $SPARK_GRAFT_SF_DIR or sf0.001) and
prints row counts plus a sample of each result — the human-facing
equivalent of the driver contract in __spark_entry__.py.
"""

from __future__ import annotations

import os
import sys

from .api import QUERIES
from .session import get_spark
from .sources.catalog import DEFAULT_SF_DIR


_USAGE = (
    "usage: python -m real_estate_data_analysis_with_aws_data_pipeline"
    "_project_spark [sf_dir] [query ...]\n"
    "  sf_dir  scale-factor directory of parquet tables "
    "(default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.001)\n"
    "  query   registered query names (default "
    "flagship_enriched_sample); --list prints them"
)


def main(argv: list[str]) -> int:
    if argv and argv[0] in ("-h", "--help"):
        print(_USAGE)
        return 0
    if argv and argv[0] == "--list":
        print("\n".join(sorted(QUERIES)))
        return 0
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    ) or DEFAULT_SF_DIR
    if not os.path.isdir(sf_dir):
        print(f"sf_dir is not a directory: {sf_dir!r}\n{_USAGE}")
        return 2
    names = argv[1:] or ["flagship_enriched_sample"]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(QUERIES)}")
        return 2
    spark = get_spark(app_name="engine-demo")
    try:
        for name in names:
            df = QUERIES[name].fn(spark, sf_dir)
            print(f"== {name} ({df.count()} rows)")
            df.show(10, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
