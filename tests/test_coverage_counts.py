"""Keep COVERAGE.md / README.md registry counts honest (VERDICT r4 #6):
the documented totals must match the live registry, and the documented
totals must appear verbatim in both docs."""

import pathlib
import re

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES

REPO = pathlib.Path(__file__).resolve().parents[1]


def registry_counts() -> tuple[int, int]:
    total = len(QUERIES)
    oracle_backed = sum(1 for s in QUERIES.values() if s.oracle is not None)
    return total, oracle_backed


def test_coverage_md_counts_match_registry():
    total, oracle_backed = registry_counts()
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"\*\*(\d+) registered queries, (\d+) oracle-backed\*\*", text
    )
    assert m, "COVERAGE.md totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (total, oracle_backed)


def test_readme_counts_match_registry():
    total, oracle_backed = registry_counts()
    text = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) queries,\s*\n?(\d+) oracle-checked", text)
    assert m, "README.md counts line missing"
    assert (int(m.group(1)), int(m.group(2))) == (total, oracle_backed)
