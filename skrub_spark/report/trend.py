"""Per-group OLS trend fitting — beyond-reference analytics
operator (SURVEY.md §2).

``zipf_fit`` fits ONE regression over one derived series; production
monitoring fits THOUSANDS at once — a revenue/volume/quality trend
per region, per source, per tenant — and alerts on the slopes. The
scale shape is what matters: each group's fit reduces to five moment
sums (n, Σx, Σy, Σxy, Σx², Σy²) that combine map-side, so the whole
family of regressions is ONE group-key map-side-combined groupBy —
no per-group iteration, no windows, no driver loop. This is the
textbook "model fitting as aggregation" pattern that survives 100 TB
(sufficient statistics are tiny and associative; only the closed
form touches them).

Exactness (zipf_fit's proven recipe, per group): x and y enter as
exact values cast to (correctly-rounded) doubles, per-row product
terms are 6dp-rounded and summed as DECIMAL(38,6) (order-free), and
slope / intercept / R² are fixed-order IEEE arithmetic on the sums
cast back to double — bit-identical on both engines, so the DuckDB
oracle replays every group's fit (battery query ``grouped_trend``).
Degenerate groups (single point / zero x-variance) yield NULLs, not
0/0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_trend(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS of ``y ~ x``: ``(group, n_points, slope,
    intercept, r2)``. ``x_col`` should be an exact integer series
    (e.g. an epoch-day index), ``y_col`` an exact numeric
    (DECIMAL/integer); both are cast to double once. ``intercept``
    uses the 6dp-rounded slope so every output replays exactly."""
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    xy = df.select(
        F.col(group_col),
        xd.alias("x"),
        yd.alias("y"),
    )
    sums = xy.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(F.col("x").cast("decimal(38,6)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,6)")).alias("sy"),
        F.sum(
            F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)")
        ).alias("sxy"),
        F.sum(
            F.round(F.col("x") * F.col("x"), 6).cast("decimal(38,6)")
        ).alias("sxx"),
        F.sum(
            F.round(F.col("y") * F.col("y"), 6).cast("decimal(38,6)")
        ).alias("syy"),
    )
    n = F.col("n_points").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = F.when(varx != F.lit(0.0), F.round(cov / varx, 6))
    return sums.select(
        group_col,
        "n_points",
        slope.alias("slope"),
        F.when(
            varx != F.lit(0.0),
            F.round((sy - slope * sx) / n, 6),
        ).alias("intercept"),
        F.when(
            (varx != F.lit(0.0)) & (vary != F.lit(0.0)),
            F.round((cov * cov) / (varx * vary), 6),
        ).alias("r2"),
    )
