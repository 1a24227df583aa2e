"""REST-API ingestion source (SURVEY.md §2.1 S3).

Reference: CensusDataFetch.py:17-78 — a Lambda loops over ~275 ZIP
codes, HTTP-GETs the Census ACS5 endpoint per key, normalizes
sentinels, derives ratio metrics, and writes one JSON document.

Spark-first redesign: the fetch fans out over the *executors* via
mapInPandas on a keys DataFrame — N keys / P partitions run P
concurrent fetch loops instead of one sequential driver loop (the
reference's 0.1 s/request × 275 keys serial wall becomes parallel).
The HTTP call is injected (``fetch_fn``) so tests/offline runs use a
deterministic fake; the response-record normalization (sentinel→null,
derived percentages) is shared with functions/scalar.py semantics.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalar import SENTINEL_FLOOR

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("median_income", T.LongType()),
        T.StructField("population", T.LongType()),
        T.StructField("college_educated", T.LongType()),
        T.StructField("edu_total", T.LongType()),
        T.StructField("unemployed", T.LongType()),
        T.StructField("labor_force", T.LongType()),
    ]
)

FetchFn = Callable[[str], dict | None]

# ACS5 variable order (CensusDataFetch.py:23-28): NAME, median income,
# population, bachelor/master/professional/doctorate, edu total,
# unemployed, labor force, median age
CENSUS_BASE_URL = "https://api.census.gov/data/2021/acs/acs5"
CENSUS_VARIABLES = (
    "NAME", "B19013_001E", "B01003_001E", "B15003_022E",
    "B15003_023E", "B15003_024E", "B15003_025E", "B15003_001E",
    "B23025_005E", "B23025_002E", "B01002_001E",
)


def make_http_census_fetch(
    api_key: str,
    base_url: str = CENSUS_BASE_URL,
    timeout_s: float = 10.0,
    retries: int = 2,
    rate_limit_s: float = 0.1,
    opener=None,
) -> FetchFn:
    """Production ``fetch_fn``: urllib GET with URL-encoded params, 10 s
    timeout, retry×2 with linear backoff, and a polite per-request
    sleep — the reference Lambda's semantics (CensusDataFetch.py:17-44
    request/parse, :148 rate limit) plus the orchestrator's retry
    policy (RealEstatePipeline.asl.json C2). Returns None for a key
    whose fetch or parse fails, exactly like the reference; the
    mapInPandas loop skips those.

    ``opener`` is injectable for tests (default urllib.request.urlopen);
    neither tests nor the driver ever perform a real network call."""
    import json as _json
    import time as _time
    import urllib.parse as _uparse
    import urllib.request as _urequest

    get = ",".join(CENSUS_VARIABLES)
    _open = opener or _urequest.urlopen

    def _safe_int(val):
        try:
            return int(val)
        except (TypeError, ValueError):
            return None

    def fetch(key: str) -> dict | None:
        params = {
            "get": get,
            "for": f"zip code tabulation area:{key}",
            "key": api_key,
        }
        url = f"{base_url}?{_uparse.urlencode(params)}"
        data = None
        for attempt in range(retries + 1):
            try:
                with _open(url, timeout=timeout_s) as response:
                    data = _json.loads(response.read().decode())
                break
            except Exception:
                if attempt == retries:
                    return None
                _time.sleep(rate_limit_s * (attempt + 1))
        if not data or len(data) < 2:  # header row only → no record
            return None
        values = data[1]
        college = sum(_safe_int(values[i]) or 0 for i in (3, 4, 5, 6))
        record = {
            "key": key,
            "median_income": _safe_int(values[1]),
            "population": _safe_int(values[2]),
            "college_educated": college,
            "edu_total": _safe_int(values[7]),
            "unemployed": _safe_int(values[8]),
            "labor_force": _safe_int(values[9]),
        }
        if rate_limit_s:
            _time.sleep(rate_limit_s)
        return record

    return fetch


def fake_census_fetch(key: str) -> dict:
    """Deterministic offline stand-in for the ACS5 endpoint: field
    values derived from the md5 of the key, including the reference's
    -666666666-style sentinels on a slice of keys
    (CensusDataFetch.py:45-50)."""
    h = int.from_bytes(bytes.fromhex(__import__("hashlib").md5(key.encode()).hexdigest()[:12]), "big")
    sentinel = h % 11 == 0
    return {
        "key": key,
        "median_income": -666666666 if sentinel else 30000 + h % 90000,
        "population": 1000 + (h >> 8) % 50000,
        "college_educated": (h >> 16) % 5000,
        "edu_total": 5000 + (h >> 24) % 20000,
        "unemployed": (h >> 32) % 2000,
        "labor_force": 2000 + (h >> 40) % 30000,
    }


def fetch_rest_source(
    keys: DataFrame, fetch_fn: FetchFn = fake_census_fetch, key_col: str = "key"
) -> DataFrame:
    """Distributed REST ingestion: one fetch loop per partition of the
    keys DataFrame (mapInPandas). Repartition the keys to set fetch
    concurrency; per-partition the loop is sequential, which is the
    polite per-endpoint rate-limiting the reference implements with
    sleep (CensusDataFetch.py:148)."""

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = [fetch_fn(str(k)) for k in pdf[key_col]]
            records = [r for r in records if r is not None]  # failed keys skip
            yield pd.DataFrame.from_records(records, columns=RECORD_SCHEMA.names)

    return keys.mapInPandas(fetch_partition, schema=RECORD_SCHEMA)


def normalize_census_records(raw: DataFrame) -> DataFrame:
    """Sentinel→null + derived ratio metrics — the reference's
    per-record Python (CensusDataFetch.py:45-75) as column
    expressions."""
    clean_income = F.when(
        F.col("median_income") <= SENTINEL_FLOOR, F.lit(None)
    ).otherwise(F.col("median_income"))
    college_pct = F.when(
        F.col("edu_total") > 0,
        F.round(100.0 * F.col("college_educated") / F.col("edu_total"), 1),
    )
    unemployment = F.when(
        F.col("labor_force") > 0,
        F.round(100.0 * F.col("unemployed") / F.col("labor_force"), 1),
    )
    return raw.select(
        "key",
        clean_income.alias("median_income"),
        "population",
        college_pct.alias("college_educated_pct"),
        unemployment.alias("unemployment_rate"),
        F.lit("fake_census_v1").alias("data_source"),
    )
