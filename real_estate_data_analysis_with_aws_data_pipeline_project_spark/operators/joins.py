"""Join operators (SURVEY.md §2.3 J1/J2 + completions).

Reference parity:
- J1 broadcast left-outer equi-join (``real_estate_etl_job.py:130-134``)
  → ``broadcast_enrich``. The dim side is hinted broadcast; at scale
  AQE also auto-converts below ``autoBroadcastJoinThreshold``.
- J2 the reference's collect-ZIPs-then-``isin`` manual semi-join
  (``real_estate_etl_job.py:41,96``) → ``semi_join``: a true
  ``left_semi`` that never moves keys to the driver, so it works when
  the key set has a billion entries, not 300.
- ``anti_join`` is the natural dual (the "rows without census data"
  diagnostic at ``real_estate_etl_job.py:141``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Broadcast-hash join: fact stays in place, dim ships to every
    executor — zero shuffle of the big side."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """EXISTS: keep df rows whose key appears in `keys`. Distributed
    replacement for collect()+isin (anti-pattern, SURVEY.md §4.3.2)."""
    return df.join(keys, on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """NOT EXISTS: df rows with no match in `keys`."""
    return df.join(keys, on, "left_anti")
