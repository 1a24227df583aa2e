"""Arrow-batched nearest-seed argmax UDF (no ``from __future__ import
annotations`` here: pandas_udf infers its eval type from REAL type
hints, and the future-import would stringify them).

Replaces the O(n×k) crossJoin→row_number argmax assignment with one
vectorized kernel per Arrow batch. EXACT parity with the Catalyst
fold / DuckDB list_sum pipeline is engineered, not hoped for:

- float32 vectors widen to float64 exactly as elementwise
  ``cast("double")`` does;
- the dot products accumulate dimension-by-dimension across the whole
  batch — the identical left-to-right float64 addition chain as
  ``F.aggregate(zip_with(...))`` and DuckDB's generate_series
  list_sum;
- cosine = acc / (nrm * s_nrm) with the product formed first, the
  zero-norm guard mapping to 0.0 — the shared ``cosine``/
  ``cosine_sql`` definition;
- round(·, 6) half-away-from-zero on the scaled value, then argmax
  over seed columns sorted ascending by seed_id — numpy's first-max
  semantics reproduce the ``ORDER BY cos DESC, seed_id`` tiebreak.
"""

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


def make_nearest_seed_udf(seed_ids, seed_vecs, seed_nrms) -> "Column":
    ids = np.asarray(seed_ids, dtype=np.int64)  # sorted ascending
    w = np.asarray(
        [np.asarray(s, dtype=np.float32) for s in seed_vecs], dtype=np.float32
    ).astype(np.float64)  # (k, dim)
    sn = np.asarray(seed_nrms, dtype=np.float64)  # (k,)

    @pandas_udf("long")
    def _nearest(vecs: pd.Series, nrms: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        v = np.asarray(
            [np.asarray(x, dtype=np.float32) for x in vecs], dtype=np.float32
        ).astype(np.float64)  # (rows, dim)
        acc = np.zeros((v.shape[0], w.shape[0]), dtype=np.float64)
        for d in range(w.shape[1]):  # dim-order accumulation = fold order
            acc += v[:, d : d + 1] * w[None, :, d]
        n = np.asarray(nrms, dtype=np.float64)[:, None]
        denom = n * sn[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where((n > 0) & (sn[None, :] > 0), acc / denom, 0.0)
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        return pd.Series(ids[np.argmax(cos, axis=1)])

    return _nearest
