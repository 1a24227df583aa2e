"""Arrow-batched sign-projection UDF (no ``from __future__ import
annotations`` here: pandas_udf infers its eval type from REAL type
hints, and the future-import would stringify them)."""

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


def make_signs_udf(planes) -> "Column":
    w = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)

    @pandas_udf("string")
    def _signs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.asarray(
            [np.asarray(x, dtype=np.float32) for x in vecs], dtype=np.float32
        ).astype(np.float64)  # (rows, dim) — same float→double widening
        acc = np.zeros((v.shape[0], w.shape[0]), dtype=np.float64)
        for d in range(w.shape[1]):  # dim-order accumulation = fold order
            acc += v[:, d : d + 1] * w[None, :, d]
        bits = np.where(acc >= 0, "1", "0")
        return pd.Series(["".join(row) for row in bits])

    return _signs
