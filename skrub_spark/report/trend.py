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


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Theil-Sen robust slope: the MEDIAN of all pairwise
    slopes ``(y_j - y_i)/(x_j - x_i)`` over point pairs with
    ``x_i < x_j`` — ``(group, n_points, n_pairs, slope)``. OLS
    slopes (``grouped_trend``) have a 0% breakdown point: one
    glitched day drags the fit; Theil-Sen tolerates ~29% gross
    corruption, which is why monitoring alerts prefer it.

    Exactness: each pairwise slope is ONE IEEE division of exact
    operands (y as DECIMAL cast to double, x integer), 6dp-rounded
    and re-quantized to DECIMAL(28,6) so median selection runs in
    exact decimal space; the median is RANK SELECTION (the
    ``mad_outliers`` discipline — lower+upper middle summed, halved
    by an exact power-of-two double division), ties in the rank
    order broken by the (x_i, x_j) pair key. Battery oracle
    ``theil_sen_trend`` replays pairs, rounding and selection
    verbatim.

    Scale shape: ``df`` must already be a PERIOD frame (one row per
    (group, x) — e.g. daily aggregates), so the O(n²) pair
    self-join is over bounded per-group series, not the corpus; the
    corpus-scale work happened in the upstream groupBy. The pair
    join and the rank window are both partitioned by GROUP. For
    multi-year series, pre-filter to a bounded trailing window
    before calling (the battery query fits the trailing 400 days).
    """
    # base feeds counts + the pair join, slopes feeds the median
    # selection + the pair count — persist both branch points (the
    # period frames are bounded; recompute would re-run the
    # upstream corpus groupBy per branch).
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).alias("y"),
    ).persist()
    right = base.select(
        F.col("grp"),
        F.col("x").alias("xj"),
        F.col("y").alias("yj"),
    )
    pairs = base.join(right, "grp").filter(F.col("xj") > F.col("x"))
    slopes = pairs.select(
        "grp",
        F.round(
            (F.col("yj") - F.col("y")).cast("double")
            / (F.col("xj") - F.col("x")).cast("double"),
            6,
        )
        .cast("decimal(28,6)")
        .alias("slope"),
        (F.col("x") * F.lit(1_000_000) + F.col("xj")).alias("pair_id"),
    ).persist()
    from .outliers import _group_median2

    med2 = _group_median2(
        slopes, "grp", F.col("slope"), "pair_id", "slope2"
    )
    counts = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    n_pairs = slopes.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return (
        counts.join(n_pairs, "grp", "left")
        .join(med2, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_points",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.round(
                F.col("slope2").cast("double") / F.lit(2.0), 6
            ).alias("slope"),
        )
    )


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
