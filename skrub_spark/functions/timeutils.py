"""Timestamp-type-agnostic epoch arithmetic.

Spark has three wall-clock column types — TIMESTAMP, TIMESTAMP_NTZ
and DATE — and parquet in the wild carries any of them (pyarrow's
``timestamp[us]`` without a timezone reads as TIMESTAMP_NTZ). Epoch
arithmetic is only defined on TIMESTAMP: ``unix_micros(ntz)`` and
``cast(ntz as double)`` both raise ``DATATYPE_MISMATCH``. Every
operator in this engine that does timestamp math routes through these
helpers so callers can hand it any of the three types (or a numeric
epoch-seconds column) without pre-normalizing.

The NTZ→TIMESTAMP cast interprets the naive wall-clock in the session
timezone; queries pin ``spark.sql.session.timeZone=UTC`` so this
matches DuckDB's naive-timestamp reading of the same parquet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_timestamp(c: Column | str) -> Column:
    """Normalize TIMESTAMP / TIMESTAMP_NTZ / DATE / parseable string
    to a plain (session-tz) TIMESTAMP. No-op on TIMESTAMP input."""
    return _col(c).cast("timestamp")


def epoch_us(c: Column | str) -> Column:
    """Integer microseconds since the epoch — exact, for durations
    and bucket indexes (``unix_micros`` after type normalization)."""
    return F.unix_micros(to_timestamp(c))


def epoch_s(c: Column | str) -> Column:
    """Float seconds since the epoch, keeping sub-second precision
    (``unix_timestamp`` truncates to whole seconds; a double cast of
    a TIMESTAMP does not)."""
    return to_timestamp(c).cast("double")
