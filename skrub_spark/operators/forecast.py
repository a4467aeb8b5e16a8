"""Holt-Winters additive forecasting (r10 — beyond-reference
analytics operator, SURVEY.md §2, the next rung after the
seasonal-naive backtest in operators/sequence.py).

Triple exponential smoothing with additive trend and seasonality
(period m), the classic operational-forecast workhorse:

    l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
    s_t = γ(y_t − l_t)    + (1−γ) s_{t−m}
    ŷ_{T+h} = l_T + h·b_T + s_{T−m+1+((h−1) mod m)}

Exactness discipline (the gap_encoder_frozen requantize rule): the
smoothing constants are 6dp literals and EVERY state update is
requantized to 6dp via HALF_UP integer division in MICRO space —
the whole recurrence is integer arithmetic, so the per-group state
trajectory is bit-identical under any partitioning and in the
DuckDB oracle's recursive-CTE replay (state carried as m+2 integer
columns, the unigram-DP precedent for SQL dynamic programming).

Scale shape: ONE (group, day) aggregation collapses the corpus to
a bounded grid (``max_days`` per group, zero-filled from the
global max day); the recurrence runs per group in one Arrow batch
(state is m+2 ints — never corpus-sized), groups in parallel.
Standard NIST/Hyndman initialization: l₀ = mean of the first
period, b₀ = (mean of second period − mean of first)/m,
s_i = y_i − l₀.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _div6(x: int) -> int:
    """HALF_UP (away-from-zero) division by 1e6 on integers — the
    engine-portable requantization both the pandas loop and the
    SQL oracle apply after every smoothing update."""
    return (x + 500000) // 1000000 if x >= 0 else -((-x + 500000) // 1000000)


def _divn(x: int, n: int) -> int:
    """HALF_UP integer division by a positive n (means in micro
    space)."""
    return (x + n // 2) // n if x >= 0 else -((-x + n // 2) // n)


def hw_recurrence(
    y6: list[int],
    *,
    alpha6: int,
    beta6: int,
    gamma6: int,
    period: int,
    horizon: int,
) -> tuple[list[int | None], list[int]]:
    """The shared integer recurrence: given the micro-quantized
    series, return (fitted6 per observed index — None before the
    first full period — and horizon forecasts6). Pure ints; used by
    the Spark operator, the tests and (re-expressed in SQL) the
    oracle."""
    m, t_total = int(period), len(y6)
    if t_total < 2 * m:
        raise ValueError(
            f"holt_winters: need >= {2 * m} points, got {t_total}"
        )
    one = 1_000_000
    mean1 = _divn(sum(y6[:m]), m)
    mean2 = _divn(sum(y6[m : 2 * m]), m)
    l = mean1
    b = _divn(mean2 - mean1, m)
    s = [y6[i] - mean1 for i in range(m)]
    fitted: list[int | None] = [None] * m
    for t in range(m, t_total):
        sm = s[0]
        yhat = l + b + sm
        l_new = _div6(alpha6 * (y6[t] - sm) + (one - alpha6) * (l + b))
        b_new = _div6(beta6 * (l_new - l) + (one - beta6) * b)
        s_new = _div6(gamma6 * (y6[t] - l_new) + (one - gamma6) * sm)
        s = s[1:] + [s_new]
        l, b = l_new, b_new
        fitted.append(yhat)
    # after the loop s holds s_{T−m+1..T}; ŷ_{T+h} (h = 1..horizon)
    # takes s[(h−1) mod m] — the matching day of the last season
    fc = [l + (h + 1) * b + s[h % m] for h in range(int(horizon))]
    return fitted, fc


def holt_winters_forecast(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
    *,
    alpha6: int = 300000,
    beta6: int = 100000,
    gamma6: int = 300000,
    period: int = 7,
    horizon: int = 14,
    max_days: int = 112,
) -> DataFrame:
    """Per-group Holt-Winters fit + forecast over the dense daily
    grid of the last ``max_days`` days (ending at the GLOBAL max
    day; missing days are zero-filled — both rules replay in SQL).

    Output: ``(group_col, day, y, yhat)`` — one row per grid day
    from the first full period on (``y`` the observed value,
    ``yhat`` the one-step-ahead fit) plus ``horizon`` forecast rows
    per group with NULL ``y``. Values are plain
    integer-micro / 1e6 divisions — the same IEEE quotient in both
    engines, no rounding needed."""
    import datetime as _dt

    m = int(period)
    day = F.col(day_col).cast("date")
    max_day = df.agg(F.max(day)).first()[0]
    if max_day is None:
        raise ValueError("holt_winters_forecast: empty input")
    start = max_day - _dt.timedelta(days=int(max_days) - 1)
    daily = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            day.alias("d"),
            F.col(value_col).cast("decimal(12,2)").alias("v"),
        )
        .where((F.col("d") >= F.lit(start)) & (F.col("d") <= F.lit(max_day)))
        .groupBy("g", "d")
        .agg((F.sum("v") * 1000000).cast("long").alias("y6"))
    )
    a6, b6, g6 = int(alpha6), int(beta6), int(gamma6)
    hz, md = int(horizon), int(max_days)

    def fit(pdf):
        import pandas as pd

        g = pdf["g"].iloc[0]
        by_day = dict(zip(pdf["d"], pdf["y6"]))
        days = [start + _dt.timedelta(days=i) for i in range(md)]
        y6 = [int(by_day.get(d, 0)) for d in days]
        fitted, fc = hw_recurrence(
            y6, alpha6=a6, beta6=b6, gamma6=g6, period=m, horizon=hz
        )
        rows = []
        for i in range(m, md):
            rows.append(
                (g, days[i], y6[i] / 1e6, fitted[i] / 1e6)
            )
        for h in range(hz):
            rows.append(
                (
                    g,
                    max_day + _dt.timedelta(days=h + 1),
                    None,
                    fc[h] / 1e6,
                )
            )
        return pd.DataFrame(rows, columns=["g", "day", "y", "yhat"])

    out = daily.groupBy("g").applyInPandas(
        fit, "g string, day date, y double, yhat double"
    )
    return out.select(
        F.col("g").alias(group_col), "day", "y", "yhat"
    )


def cusum_monitor(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
    *,
    baseline_days: int = 28,
    max_days: int = 112,
    k_div: int = 20,
    h_div: int = 2,
) -> DataFrame:
    """Two-sided CUSUM change monitor (r10 — the Page 1954 control
    chart, the sequential drift detector next to the batch PSI/KS
    reports in report/drift.py): per group over the dense daily
    grid (same zero-filled last-``max_days`` construction as
    :func:`holt_winters_forecast`),

        Sp_t = max(0, Sp_{t-1} + (y_t − μ0 − k))
        Sn_t = max(0, Sn_{t-1} + (μ0 − y_t − k))

    with alarm when either sum exceeds h, then RESET to 0 (the
    standard restart rule). μ0 is the exact micro mean of the first
    ``baseline_days`` grid days; the slack and threshold derive
    from it as integer divisions k = μ0/k_div, h = μ0/h_div — every
    quantity is an exact integer, so the trajectory replays
    bit-identically in the oracle's recursive CTE (the
    holt_winters precedent).

    Output: ``(group_col, day, y, s_pos, s_neg, alarm)`` for every
    grid day after the baseline window."""
    import datetime as _dt

    m = int(baseline_days)
    md = int(max_days)
    if not (0 < m < md):
        raise ValueError("cusum_monitor: need 0 < baseline_days < max_days")
    day = F.col(day_col).cast("date")
    max_day = df.agg(F.max(day)).first()[0]
    if max_day is None:
        raise ValueError("cusum_monitor: empty input")
    start = max_day - _dt.timedelta(days=md - 1)
    daily = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            day.alias("d"),
            F.col(value_col).cast("decimal(12,2)").alias("v"),
        )
        .where((F.col("d") >= F.lit(start)) & (F.col("d") <= F.lit(max_day)))
        .groupBy("g", "d")
        .agg((F.sum("v") * 1000000).cast("long").alias("y6"))
    )
    kd, hd = int(k_div), int(h_div)

    def run(pdf):
        import pandas as pd

        g = pdf["g"].iloc[0]
        by_day = dict(zip(pdf["d"], pdf["y6"]))
        days = [start + _dt.timedelta(days=i) for i in range(md)]
        y6 = [int(by_day.get(d, 0)) for d in days]
        mu = _divn(sum(y6[:m]), m)
        k6 = _divn(mu, kd)
        h6 = _divn(mu, hd)
        sp = sn = 0
        rows = []
        for i in range(m, md):
            sp = max(0, sp + (y6[i] - mu - k6))
            sn = max(0, sn + (mu - y6[i] - k6))
            alarm = sp > h6 or sn > h6
            rows.append(
                (g, days[i], y6[i] / 1e6, sp / 1e6, sn / 1e6, alarm)
            )
            if alarm:
                sp = sn = 0
        return pd.DataFrame(
            rows, columns=["g", "day", "y", "s_pos", "s_neg", "alarm"]
        )

    out = daily.groupBy("g").applyInPandas(
        run,
        "g string, day date, y double, s_pos double, s_neg double, "
        "alarm boolean",
    )
    return out.select(
        F.col("g").alias(group_col), "day", "y", "s_pos", "s_neg", "alarm"
    )
