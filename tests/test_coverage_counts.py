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


def test_registry_rejects_duplicate_names():
    """r6: a silent overwrite re-binds a historically driver-green name
    to different semantics (caught live when a new query collided with
    the round-2 corpus_length_histogram) — duplicates must raise."""
    import pytest

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.registry import (
        QUERIES,
        register,
    )

    name = next(iter(QUERIES))
    before = QUERIES[name]
    with pytest.raises(ValueError, match="duplicate query registration"):
        @register(name)
        def dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError

    assert QUERIES[name] is before  # original binding untouched
