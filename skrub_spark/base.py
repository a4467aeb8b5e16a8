"""Estimator base for skrub_spark.

Mirrors the reference's sklearn-style fit/transform contract
(skrub/_single_column_transformer.py, sklearn TransformerMixin) but
over PySpark DataFrames. Invariants:

- ``fit`` gathers ONLY small, broadcastable state (vocabularies,
  medians, projection matrices) via distributed aggregations.
- ``transform`` is a pure DataFrame -> DataFrame expression; it
  never collects data-scale results, so Catalyst fuses it with the
  surrounding plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SparkTransformer:
    _fitted = False

    def fit(self, df: DataFrame, y: DataFrame | None = None):
        self._fit(df, y)
        self._fitted = True
        return self

    def _fit(self, df: DataFrame, y: DataFrame | None = None):  # pragma: no cover
        pass

    def transform(self, df: DataFrame) -> DataFrame:
        if not self._fitted:
            raise RuntimeError(f"{type(self).__name__} is not fitted")
        return self._transform(df)

    def _transform(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def fit_transform(self, df: DataFrame, y: DataFrame | None = None) -> DataFrame:
        return self.fit(df, y).transform(df)

    def get_params(self) -> dict:
        return {k: v for k, v in vars(self).items() if not k.startswith("_")}

    def __repr__(self):
        params = ", ".join(f"{k}={v!r}" for k, v in self.get_params().items())
        return f"{type(self).__name__}({params})"
