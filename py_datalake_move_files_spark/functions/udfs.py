"""User-defined function surface (SURVEY.md §2.10): the three shapes beyond
scalar pandas_udf (which operators/predicates provides):

- :func:`path_segments_udtf` — a Python UDTF (Spark 3.5+ ``@udtf``): one
  input path → one row per segment. Table function semantics the reference
  approximated with per-record Python loops.
- :func:`make_weighted_avg_udaf` — a GROUPED_AGG pandas_udf (vectorized
  UDAF): exact weighted average per group in one Arrow batch per group.
- ``mapInPandas`` UDTF-shaped operators live in operators/multimodal.py.

All callables are self-contained closures (worker-pickling rule).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="segment: string, idx: int, is_last: boolean")
class path_segments_udtf:
    """Explode a path into ``(segment, idx, is_last)`` rows."""

    def eval(self, path: str):  # noqa: D102
        if path is None:
            return
        parts = [p for p in path.split("/") if p]
        for i, seg in enumerate(parts):
            yield seg, i, i == len(parts) - 1


def make_weighted_avg_udaf():
    """GROUPED_AGG pandas UDAF: Σ(v·w)/Σw per group (double)."""

    @F.pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        denom = float(w.sum())
        if denom == 0:
            return float("nan")
        return float((v * w).sum() / denom)

    return weighted_avg
