"""Sessionization + per-session/per-entity event features.

Behavior parity: skrub/_session_encoder.py (SessionEncoder) — turn
an event log into per-entity feature rows. Spark plan: one shuffle
on the entity key; session boundaries via lag() + cumulative sum in
a single Window pass (classic gap-based sessionization), then one
groupBy for features — both reuse the same hash partitioning so AQE
leaves them co-located. The streaming variant lives in
``skrub_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..base import SparkTransformer
from ..functions.timeutils import epoch_s


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = F.lit(gap_minutes * 60.0)
    prev_ts = F.lag(ts_col).over(w)
    # epoch_s keeps sub-second precision (unix_timestamp truncates)
    # and is TIMESTAMP_NTZ/DATE-safe (a bare double cast is not).
    new_session = (
        prev_ts.isNull() | ((epoch_s(ts_col) - epoch_s(prev_ts)) > gap_s)
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_features(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-(user, session) features: event count, duration seconds,
    value sum/mean, start/end timestamps."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (epoch_s(F.max(ts_col)) - epoch_s(F.min(ts_col))).alias("duration_s"),
    ]
    if value_col:
        aggs += [
            F.sum(value_col).alias("value_sum"),
            F.avg(value_col).alias("value_mean"),
        ]
    return s.groupBy(user_col, "session_id").agg(*aggs)


class SessionEncoder(SparkTransformer):
    """Per-entity features derived from its sessions."""

    def __init__(
        self,
        user_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str | None = "value",
        gap_minutes: float = 30.0,
    ):
        self.user_col = user_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.gap_minutes = gap_minutes

    def _fit(self, df, y=None):
        pass

    def _transform(self, df: DataFrame) -> DataFrame:
        per_session = session_features(
            df, self.user_col, self.ts_col, self.value_col, self.gap_minutes
        )
        aggs = [
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.avg("n_events").alias("events_per_session"),
            F.avg("duration_s").alias("mean_session_duration_s"),
            F.max("duration_s").alias("max_session_duration_s"),
        ]
        if self.value_col:
            aggs.append(F.sum("value_sum").alias("value_sum"))
        return per_session.groupBy(self.user_col).agg(*aggs)
