"""DatetimeEncoder — parity with skrub/_datetime_encoder.py.

Expands a timestamp column into year/…/second, optional weekday /
day_of_year / total_seconds, and circular periodic features. Pure
Catalyst expressions (functions/datetime.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..base import SparkTransformer
from ..functions.datetime import datetime_feature_columns


class DatetimeEncoder(SparkTransformer):
    def __init__(
        self,
        cols=None,
        resolution: str = "hour",
        add_weekday: bool = False,
        add_day_of_year: bool = False,
        add_total_seconds: bool = True,
        periodic_encoding: str | None = None,
        drop_original: bool = True,
    ):
        self.cols = [cols] if isinstance(cols, str) else cols
        self.resolution = resolution
        self.add_weekday = add_weekday
        self.add_day_of_year = add_day_of_year
        self.add_total_seconds = add_total_seconds
        self.periodic_encoding = periodic_encoding
        self.drop_original = drop_original

    def _fit(self, df: DataFrame, y=None):
        self._cols = self.cols or [
            c for c, t in df.dtypes if t.startswith("timestamp") or t == "date"
        ]
        self._features = {}
        for c in self._cols:
            self._features[c] = datetime_feature_columns(
                c,
                c,
                resolution=self.resolution,
                add_weekday=self.add_weekday,
                add_day_of_year=self.add_day_of_year,
                add_total_seconds=self.add_total_seconds,
                periodic=self.periodic_encoding,
            )

    def get_feature_names_out(self):
        return [name for feats in self._features.values() for name in feats]

    def _transform(self, df: DataFrame) -> DataFrame:
        keep = [
            c
            for c in df.columns
            if not (self.drop_original and c in self._cols)
        ]
        new = [
            expr.alias(name)
            for feats in self._features.values()
            for name, expr in feats.items()
        ]
        return df.select(*keep, *new)
