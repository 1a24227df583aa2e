#!/usr/bin/env python
"""Determinism sweep: run every oracle-checked query under two very
different parallelism configurations and assert bit-identical results.

Catches hidden partitioning nondeterminism (under-specified window
orderings, tie-dependent top-k, rand-based sampling) anywhere in the
query surface — the class of bug that passes single-config tests and
then flakes on a different cluster size.

Usage: python tools/determinism_sweep.py [sf_dir] [name ...]
(with names given, only those queries are swept — for targeted runs
on a new batch; no names = the full registry)
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (  # noqa: E402
    QUERIES,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.session import (  # noqa: E402
    get_spark,
)


def sweep(
    master: str, parts: int, sf_dir: str, names: list[str] | None = None
) -> dict[str, str]:
    spark = get_spark(
        app_name=f"determinism-{parts}", master=master, shuffle_partitions=parts
    )
    out = {}
    for name, spec in QUERIES.items():
        if spec.oracle is None:  # streaming/UDF rows-only excluded
            continue
        if names and name not in names:
            continue
        df = spec.fn(spark, sf_dir).toPandas()
        cols = sorted(df.columns)
        rows = sorted(map(str, df[cols].itertuples(index=False, name=None)))
        out[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    if names:
        # a typo'd name silently matching nothing would report a false
        # PASS over zero queries (r9 review) — fail fast instead
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            print("unknown query names:", unknown)
            return 2
    a = sweep("local[2]", 3, sf_dir, names)
    b = sweep("local[16]", 24, sf_dir, names)
    diff = sorted(n for n in a if a[n] != b[n])
    print(f"{len(a)} oracle queries compared at {sf_dir}")
    if diff:
        print("NONDETERMINISTIC under repartitioning:", diff)
        return 1
    print("all results bit-identical across local[2]/3p and local[16]/24p")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
