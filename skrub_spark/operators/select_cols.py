"""SelectCols / DropCols / Drop / ApplyToCols — parity with
skrub/_select_cols.py and _apply_to_cols.py."""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame

from .. import selectors as s
from ..base import SparkTransformer


class SelectCols(SparkTransformer):
    def __init__(self, cols):
        self.cols = cols

    def _fit(self, df, y=None):
        self._selected = s._as_selector(self.cols).expand(df)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select(*self._selected)


class DropCols(SparkTransformer):
    def __init__(self, cols):
        self.cols = cols

    def _fit(self, df, y=None):
        self._dropped = s._as_selector(self.cols).expand(df)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.drop(*self._dropped)


class Drop(DropCols):
    """Drop the column(s) this transformer is applied to
    (skrub.Drop)."""


class ApplyToSubFrame(SparkTransformer):
    """Apply a whole-frame transformer to the selected sub-frame,
    passing other columns through (skrub.ApplyToSubFrame)."""

    def __init__(self, transformer, cols):
        self.transformer = transformer
        self.cols = cols

    def _fit(self, df: DataFrame, y=None):
        import copy

        self._selected = s._as_selector(self.cols).expand(df)
        self._t = copy.deepcopy(self.transformer)
        self._t.fit(df.select(*self._selected))

    def _transform(self, df: DataFrame) -> DataFrame:
        rest = [c for c in df.columns if c not in self._selected]
        sub = self._t.transform(df.select(*self._selected))
        if not rest:
            return sub
        # positional re-join via zip of ids (sub preserved row order is
        # not guaranteed in general; require key-free transformers to
        # keep all original columns instead)
        missing = [c for c in rest if c not in sub.columns]
        if not missing:
            return sub
        raise ValueError(
            "ApplyToSubFrame requires the inner transformer to keep "
            f"non-selected columns; missing {missing}. Use ApplyToCols "
            "for column-wise transformers."
        )


class ApplyToCols(SparkTransformer):
    """Apply a single-column transformer independently to each
    selected column (skrub.ApplyToCols / ApplyToEachCol). The inner
    transformer must accept a ``col`` constructor argument."""

    def __init__(self, transformer, cols):
        self.transformer = transformer
        self.cols = cols

    def _fit(self, df: DataFrame, y=None):
        selected = s._as_selector(self.cols).expand(df)
        self._fitted_transformers = {}
        for c in selected:
            t = copy.deepcopy(self.transformer)
            if hasattr(t, "col"):
                t.col = c
            elif hasattr(t, "cols"):
                t.cols = [c]
            t.fit(df)
            self._fitted_transformers[c] = t

    def _transform(self, df: DataFrame) -> DataFrame:
        for t in self._fitted_transformers.values():
            df = t.transform(df)
        return df


# name-parity alias (skrub.ApplyToEachCol)
ApplyToEachCol = ApplyToCols
