"""Core building blocks — parity with skrub/core.py
(SingleColumnTransformer, RejectColumn) re-expressed for the Spark
estimator base in skrub_spark/base.py."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .base import SparkTransformer


class RejectColumn(ValueError):
    """Raised by a single-column transformer to signal that the
    column is not of a type it can handle (skrub.core.RejectColumn);
    TableVectorizer treats it as "route to another encoder"."""


class SingleColumnTransformer(SparkTransformer):
    """Base for transformers operating on one named column. Subclasses
    implement ``_fit``/``_transform`` and may raise
    :class:`RejectColumn` from ``_fit`` for unsupported dtypes."""

    def __init__(self, col: str):
        self.col = col

    def _check_column(self, df: DataFrame, allowed_types: tuple[str, ...]):
        dtype = dict(df.dtypes).get(self.col)
        if dtype is None:
            raise RejectColumn(f"column {self.col!r} not found")
        if allowed_types and not any(
            dtype == t or dtype.startswith(t) for t in allowed_types
        ):
            raise RejectColumn(
                f"column {self.col!r} has dtype {dtype}, expected one of "
                f"{allowed_types}"
            )
        return dtype
