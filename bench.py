#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion via the no-op sink (full plan
runs, nothing materializes on the driver), which measures engine
throughput rather than collect/serialization cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (  # noqa: E402
    HEADLINE_QUERIES,
    QUERIES,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn = QUERIES[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
