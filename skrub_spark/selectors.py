"""Column-selector DSL — parity with skrub/selectors/.

Selectors compose with ``&``, ``|``, ``~``, ``-`` and expand against
a DataFrame's schema (plus cheap metadata queries for the few
data-dependent ones like cardinality_below / has_nulls).

>>> import skrub_spark.selectors as s
>>> (s.numeric() & ~s.cols("id")).expand(df)
"""

from __future__ import annotations

import fnmatch
import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"double", "float", "int", "bigint", "smallint", "tinyint"}


class Selector:
    def __init__(self, fn, name="selector"):
        self._fn = fn
        self._name = name

    def expand(self, df: DataFrame) -> list[str]:
        sel = self._fn(df)
        return [c for c in df.columns if c in sel]

    def __and__(self, other):
        return Selector(
            lambda df: set(self._fn(df)) & set(_as_selector(other)._fn(df)),
            f"({self._name} & {_as_selector(other)._name})",
        )

    def __or__(self, other):
        return Selector(
            lambda df: set(self._fn(df)) | set(_as_selector(other)._fn(df)),
            f"({self._name} | {_as_selector(other)._name})",
        )

    def __sub__(self, other):
        return Selector(
            lambda df: set(self._fn(df)) - set(_as_selector(other)._fn(df)),
            f"({self._name} - {_as_selector(other)._name})",
        )

    def __invert__(self):
        return Selector(
            lambda df: set(df.columns) - set(self._fn(df)), f"~{self._name}"
        )

    def __repr__(self):
        return self._name


def _as_selector(x) -> Selector:
    if isinstance(x, Selector):
        return x
    if isinstance(x, str):
        return cols(x)
    if isinstance(x, (list, tuple, set)):
        return cols(*x)
    raise TypeError(f"cannot make a selector from {type(x)}")


def all() -> Selector:  # noqa: A001 - mirrors skrub.selectors.all
    return Selector(lambda df: set(df.columns), "all()")


def cols(*names: str) -> Selector:
    return Selector(lambda df: set(names) & set(df.columns), f"cols{names}")


def glob(pattern: str) -> Selector:
    return Selector(
        lambda df: {c for c in df.columns if fnmatch.fnmatch(c, pattern)},
        f"glob({pattern!r})",
    )


def regex(pattern: str) -> Selector:
    rx = _re.compile(pattern)
    return Selector(
        lambda df: {c for c in df.columns if rx.search(c)}, f"regex({pattern!r})"
    )


def numeric() -> Selector:
    return Selector(
        lambda df: {c for c, t in df.dtypes if t in _NUMERIC or t.startswith("decimal")},
        "numeric()",
    )


def integer() -> Selector:
    return Selector(
        lambda df: {c for c, t in df.dtypes if t in ("int", "bigint", "smallint", "tinyint")},
        "integer()",
    )


def float_() -> Selector:
    return Selector(
        lambda df: {c for c, t in df.dtypes if t in ("double", "float")}, "float()"
    )


def string() -> Selector:
    return Selector(lambda df: {c for c, t in df.dtypes if t == "string"}, "string()")


def boolean() -> Selector:
    return Selector(lambda df: {c for c, t in df.dtypes if t == "boolean"}, "boolean()")


def any_date() -> Selector:
    return Selector(
        lambda df: {
            c for c, t in df.dtypes if t.startswith("timestamp") or t == "date"
        },
        "any_date()",
    )


def categorical(max_cardinality: int = 40) -> Selector:
    """String columns with few distinct values (data-dependent)."""

    def fn(df: DataFrame):
        strs = [c for c, t in df.dtypes if t == "string"]
        if not strs:
            return set()
        row = df.agg(
            *[F.approx_count_distinct(c).alias(c) for c in strs]
        ).first()
        return {c for c in strs if row[c] <= max_cardinality}

    return Selector(fn, f"categorical({max_cardinality})")


def cardinality_below(threshold: int) -> Selector:
    def fn(df: DataFrame):
        row = df.agg(
            *[F.approx_count_distinct(c).alias(c) for c in df.columns]
        ).first()
        return {c for c in df.columns if row[c] < threshold}

    return Selector(fn, f"cardinality_below({threshold})")


def has_nulls() -> Selector:
    def fn(df: DataFrame):
        row = df.agg(
            *[
                F.sum(F.col(c).isNull().cast("long")).alias(c)
                for c in df.columns
            ]
        ).first()
        return {c for c in df.columns if (row[c] or 0) > 0}

    return Selector(fn, "has_nulls()")


def filter(pred) -> Selector:  # noqa: A001 - mirrors skrub.selectors.filter
    """Select columns whose (name, dtype) satisfies ``pred``."""
    return Selector(
        lambda df: {c for c, t in df.dtypes if pred(c, t)}, "filter(<pred>)"
    )


def select(df: DataFrame, selector) -> DataFrame:
    """Apply a selector (or column list / name) to a DataFrame."""
    return df.select(*_as_selector(selector).expand(df))
