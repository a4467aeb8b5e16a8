"""Datetime feature expressions.

Behavior parity: skrub/_datetime_encoder.py (DatetimeEncoder) —
year/month/day/hour/minute/second resolution ladder, optional
weekday / day_of_year / total_seconds, and circular (sin/cos)
periodic encodings. All pure Catalyst expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# resolution ladder (skrub: _TIME_LEVELS)
RESOLUTIONS = ["year", "month", "day", "hour", "minute", "second"]

_EXTRACTORS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
}

# (period, max count) for circular encodings — same granularities the
# reference hardcodes (month 12, day 30, hour 24, weekday 7).
_PERIODS = {"month": 12.0, "day": 30.4375, "hour": 24.0, "weekday": 7.0}
# spline counts per level (reference hardcodes comparable numbers)
_SPLINES = {"month": 6, "day": 6, "hour": 6, "weekday": 4}


def datetime_feature_columns(
    col: Column | str,
    prefix: str,
    resolution: str = "hour",
    add_weekday: bool = False,
    add_day_of_year: bool = False,
    add_total_seconds: bool = True,
    periodic: str | None = None,  # None | "circular"
) -> dict[str, Column]:
    """Ordered {output_name: Column} of datetime features."""
    c = F.col(col) if isinstance(col, str) else col
    if resolution not in RESOLUTIONS:
        raise ValueError(f"resolution must be one of {RESOLUTIONS}")
    out: dict[str, Column] = {}
    for level in RESOLUTIONS[: RESOLUTIONS.index(resolution) + 1]:
        out[f"{prefix}_{level}"] = _EXTRACTORS[level](c).cast("int")
    if add_weekday:
        # ISO weekday 1=Monday..7=Sunday (matches pandas dayofweek+1)
        out[f"{prefix}_weekday"] = F.dayofweek(F.date_add(c.cast("date"), -1)).cast(
            "int"
        )
    if add_day_of_year:
        out[f"{prefix}_day_of_year"] = F.dayofyear(c).cast("int")
    if add_total_seconds:
        # cast-to-timestamp first: unix_timestamp rejects TIMESTAMP_NTZ
        out[f"{prefix}_total_seconds"] = F.unix_timestamp(
            c.cast("timestamp")
        ).cast("double")
    if periodic in ("circular", "spline"):
        two_pi = 2.0 * math.pi
        for level, period in _PERIODS.items():
            if level == "weekday":
                if not add_weekday:
                    continue
                base = out[f"{prefix}_weekday"].cast("double")
            elif f"{prefix}_{level}" in out:
                base = out[f"{prefix}_{level}"].cast("double")
            else:
                continue
            if periodic == "circular":
                angle = base * (two_pi / period)
                out[f"{prefix}_{level}_circular_0"] = F.sin(angle)
                out[f"{prefix}_{level}_circular_1"] = F.cos(angle)
            else:
                # periodic degree-1 B-splines (triangular basis with
                # wraparound) — the reference uses sklearn's
                # SplineTransformer with hardcoded knots; linear
                # splines keep this a closed-form expression.
                n_splines = _SPLINES.get(level, 4)
                spacing = period / n_splines
                for j in range(n_splines):
                    knot = j * spacing
                    # circular distance to the knot
                    delta = base - F.lit(knot)
                    dist = F.least(
                        F.abs(delta),
                        F.abs(delta - F.lit(period)),
                        F.abs(delta + F.lit(period)),
                    )
                    out[f"{prefix}_{level}_spline_{j:02d}"] = F.greatest(
                        F.lit(0.0), F.lit(1.0) - dist / F.lit(spacing)
                    )
    return out


def calendar_dim(df, date_col):
    """Generated calendar dimension spanning [min, max] of
    ``date_col`` (a date/timestamp column): one row per day —
    ``(day, dow, year, month, dom, quarter, week, is_month_start,
    is_month_end)`` with ``day`` the epoch-day index, ``dow`` 0 =
    Monday from pure integer arithmetic, and the civil fields from
    proleptic-Gregorian date functions over the UTC-pinned
    session. The standard star-schema date dimension, generated
    lazily (min/max agg + sequence explode — no driver collect)
    so it always spans exactly the observed data. Battery oracle
    ``calendar_dim`` replays it with DuckDB's matching calendar.
    """
    from pyspark.sql import functions as F

    d = F.expr(f"unix_date(cast({date_col} as date))")
    mm = df.agg(
        F.min(d).alias("__lo"), F.max(d).alias("__hi")
    )
    days = mm.select(
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"))
        ).alias("day")
    )
    dt = F.expr("date_add('1970-01-01', cast(day as int))")
    nxt = F.expr("date_add('1970-01-01', cast(day as int) + 1)")
    return days.select(
        F.col("day").cast("long").alias("day"),
        ((F.col("day") + 3) % 7).cast("int").alias("dow"),
        F.year(dt).cast("int").alias("year"),
        F.month(dt).cast("int").alias("month"),
        F.dayofmonth(dt).cast("int").alias("dom"),
        F.quarter(dt).cast("int").alias("quarter"),
        F.call_function("div", F.col("day") + 3, F.lit(7))
        .cast("long")
        .alias("week"),
        (F.dayofmonth(dt) == 1).alias("is_month_start"),
        (F.month(nxt) != F.month(dt)).alias("is_month_end"),
    )
