"""Dtype coercion transformers.

Behavior parity: skrub/_to_datetime.py, _to_float.py, _to_str.py,
_to_categorical.py, _duration_to_float.py, _clean_null_strings.py.
All are pure column expressions (try_* casts return null on failure,
matching skrub's errors='coerce' semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..base import SparkTransformer

# strings skrub treats as missing (skrub/_clean_null_strings.py)
NULL_STRINGS = ("", "nan", "null", "none", "n/a", "na", "nat", "#n/a", "-", "?")


def clean_null_string_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.lower(F.trim(c)).isin(*NULL_STRINGS), F.lit(None)).otherwise(c)


# common datetime formats tried in order (skrub/_to_datetime.py guesses
# a format from a sample; here each format is one try_to_timestamp and
# coalesce picks the first that parses — still a single projection)
_DT_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "MM/dd/yyyy",
    "yyyyMMdd",
)


def to_datetime_col(col: Column | str, fmt: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if fmt is not None:
        return F.try_to_timestamp(c, F.lit(fmt))
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in _DT_FORMATS])


class _SingleColumnCast(SparkTransformer):
    def __init__(self, cols=None):
        self.cols = [cols] if isinstance(cols, str) else cols

    def _fit(self, df: DataFrame, y=None):
        self._cols = self.cols or self._default_cols(df)

    def _default_cols(self, df: DataFrame):
        return df.columns

    def _expr(self, col: str) -> Column:  # pragma: no cover
        raise NotImplementedError

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select(
            *[
                self._expr(c).alias(c) if c in self._cols else F.col(c)
                for c in df.columns
            ]
        )


class ToFloat(_SingleColumnCast):
    """Parse to double; unparseable -> null (skrub ToFloat)."""

    def _expr(self, col):
        return F.col(col).try_cast("double")


class ToStr(_SingleColumnCast):
    def _expr(self, col):
        return F.col(col).cast("string")


class ToDatetime(_SingleColumnCast):
    def __init__(self, cols=None, format: str | None = None):
        super().__init__(cols)
        self.format = format

    def _expr(self, col):
        return to_datetime_col(col, self.format)


def to_datetime(df: DataFrame, cols=None, format: str | None = None) -> DataFrame:
    """Functional form (skrub.to_datetime)."""
    return ToDatetime(cols, format).fit_transform(df)


class ToCategorical(SparkTransformer):
    """Map a string column to dense integer codes.

    Fit collects the distinct category list to the driver, so it is
    guarded by ``max_categories``: the cardinality is counted FIRST
    (one distributed agg, nothing collected) and fit raises above the
    cap instead of OOM-ing the driver on an accidentally
    high-cardinality column. Route such columns through
    ``TableVectorizer`` (which hash-encodes past its cardinality
    threshold) or raise the cap explicitly.
    """

    def __init__(
        self,
        col: str,
        out_col: str | None = None,
        max_categories: int = 100_000,
    ):
        self.col = col
        self.out_col = out_col or f"{col}_cat"
        self.max_categories = max_categories

    def _fit(self, df: DataFrame, y=None):
        # ONE distinct pass: collect at most max_categories+1 values;
        # an overflow row proves the cap is exceeded without counting
        # (or collecting) the full distinct set (ADVICE r4: the
        # count-then-collect version scanned twice).
        rows = (
            df.select(self.col)
            .distinct()
            .limit(self.max_categories + 1)
            .collect()
        )
        if len(rows) > self.max_categories:
            raise ValueError(
                f"ToCategorical: column {self.col!r} has more than "
                f"max_categories={self.max_categories} distinct values; "
                "collecting them would not be driver-safe. Use "
                "TableVectorizer (hash-encodes high-cardinality "
                "columns) or raise max_categories."
            )
        vals = sorted(r[0] for r in rows if r[0] is not None)
        self._categories = vals
        self._mapping = {v: i for i, v in enumerate(vals)}

    def _transform(self, df: DataFrame) -> DataFrame:
        expr = F.lit(None).cast("int")
        # build a chained CASE; for big vocabularies use a broadcast join
        if len(self._categories) > 100:
            spark = df.sparkSession
            mapping = spark.createDataFrame(
                [(v, i) for v, i in self._mapping.items()],
                f"{self.col} string, {self.out_col} int",
            )
            # re-select to the small-vocab branch's exact schema order
            # (join(on=key) would move the key column first)
            return df.join(F.broadcast(mapping), on=self.col, how="left").select(
                *df.columns, self.out_col
            )
        for v, i in self._mapping.items():
            expr = F.when(F.col(self.col) == v, F.lit(i)).otherwise(expr)
        return df.withColumn(self.out_col, expr)


class DurationToFloat(_SingleColumnCast):
    """Day-time interval -> float seconds (skrub DurationToFloat uses
    seconds for polars/pandas durations)."""

    def _expr(self, col):
        # component-wise extraction: EXTRACT(SECOND FROM interval)
        # carries the fractional part (decimal seconds), which a cast
        # to bigint would truncate — skrub's _duration_to_float returns
        # fractional seconds (timedelta / 1s).
        i = F.col(col).cast("interval day to second")
        return (
            F.extract(F.lit("DAY"), i).cast("double") * 86400.0
            + F.extract(F.lit("HOUR"), i).cast("double") * 3600.0
            + F.extract(F.lit("MINUTE"), i).cast("double") * 60.0
            + F.extract(F.lit("SECOND"), i).cast("double")
        )


class CleanNullStrings(_SingleColumnCast):
    """Replace null-meaning strings with real nulls."""

    def _default_cols(self, df: DataFrame):
        return [c for c, t in df.dtypes if t == "string"]

    def _expr(self, col):
        return clean_null_string_col(col)
