"""SquashingScaler — parity with skrub/_squashing_scaler.py.

Robust center/scale then soft clip:
    a = 1/(q_hi - q_lo)   (fallback 2/(max - min), else 0)
    z = a * (x - median)
    out = z / sqrt(1 + (z/B)^2)
Infinities map to ±B, NaN/null preserved. Fit computes the three
quantiles with one distributed percentile aggregation per column."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkTransformer


class SquashingScaler(SparkTransformer):
    def __init__(
        self,
        cols=None,
        max_absolute_value: float = 3.0,
        quantile_range: tuple[float, float] = (0.25, 0.75),
    ):
        self.cols = [cols] if isinstance(cols, str) else cols
        self.max_absolute_value = max_absolute_value
        self.quantile_range = quantile_range

    def _fit(self, df: DataFrame, y=None):
        numeric = {"double", "float", "int", "bigint", "smallint", "tinyint"}
        self._cols = self.cols or [c for c, t in df.dtypes if t in numeric]
        lo_q, hi_q = self.quantile_range
        aggs = []
        for c in self._cols:
            finite = F.when(
                ~F.isnan(F.col(c).cast("double")) & F.col(c).isNotNull(),
                F.col(c).cast("double"),
            )
            aggs += [
                F.percentile(finite, F.lit(lo_q)).alias(f"{c}__lo"),
                F.percentile(finite, F.lit(0.5)).alias(f"{c}__med"),
                F.percentile(finite, F.lit(hi_q)).alias(f"{c}__hi"),
                F.min(finite).alias(f"{c}__min"),
                F.max(finite).alias(f"{c}__max"),
            ]
        row = df.agg(*aggs).first()
        self._params = {}
        for c in self._cols:
            lo, med, hi = row[f"{c}__lo"], row[f"{c}__med"], row[f"{c}__hi"]
            mn, mx = row[f"{c}__min"], row[f"{c}__max"]
            if lo is None:
                a, med = 0.0, 0.0
            elif hi != lo:
                a = 1.0 / (hi - lo)
            elif mx is not None and mx != mn and not math.isinf(mx - mn):
                a = 2.0 / (mx - mn)
            else:
                a = 0.0
            self._params[c] = (float(a), float(med or 0.0))

    def _transform(self, df: DataFrame) -> DataFrame:
        B = self.max_absolute_value
        out_cols = []
        for c in df.columns:
            if c not in self._params:
                out_cols.append(F.col(c))
                continue
            a, med = self._params[c]
            x = F.col(c).cast("double")
            z = F.lit(a) * (x - F.lit(med))
            squashed = z / F.sqrt(F.lit(1.0) + (z / F.lit(B)) * (z / F.lit(B)))
            expr = (
                F.when(x == float("inf"), F.lit(B))
                .when(x == float("-inf"), F.lit(-B))
                .otherwise(squashed)
            )
            out_cols.append(expr.alias(c))
        return df.select(*out_cols)
