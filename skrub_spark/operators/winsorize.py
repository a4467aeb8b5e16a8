"""Quantile winsorization — robust clipping at exact empirical
quantiles (the hard-clip companion to the reference's soft
``SquashingScaler``, reference ``skrub/_squashing_scaler.py:1``;
outlier capping before scaling/aggregation is the standard
preprocessing rung sklearn spells ``RobustScaler``/winsorize).

Exactness discipline: the cut points are DISCRETE lower quantiles —
the smallest value whose cumulative count reaches ``ceil(p·n)`` —
computed entirely in INTEGER arithmetic (p carried as basis points:
``k = (p_bp·n + 9999) div 10000``; a float ``ceil(p*n)`` is an
off-by-one trap — 0.01·500 is 5.000000000000001 in IEEE). So the
cut points, and therefore every clipped value, are
partitioning-invariant and replay bit-identically in SQL (battery
oracle ``quantile_clip``).

Scale shape: one (value, count) reduce, a cumulative window over
DISTINCT values (bounded by value cardinality — quantize first for
unbounded continuous data, as with ``ks_statistic``), two scalar
cut points broadcast back, then a map-only clip of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_clip(
    df: DataFrame,
    col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Adds ``out_col`` (default ``<col>_clipped``): values clipped
    to the [p_low, p_high] discrete empirical quantiles of ``col``
    (NULLs pass through). Quantile probabilities are carried at
    basis-point resolution (p rounds to 1/10000)."""
    lo_bp = int(round(float(p_low) * 10000))
    hi_bp = int(round(float(p_high) * 10000))
    if not 0 <= lo_bp <= hi_bp <= 10000:
        raise ValueError("need 0 <= p_low <= p_high <= 1")
    out_col = out_col or f"{col}_clipped"
    v = F.col(col)
    counts = (
        df.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v", F.sum("c").over(w).alias("cum")
    )
    n = df.filter(v.isNotNull()).agg(F.count(F.lit(1)).alias("n"))
    cuts = (
        cum.join(F.broadcast(n))
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({lo_bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias("__qlo"),
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({hi_bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias("__qhi"),
        )
    )
    clipped = F.when(
        v.isNotNull(),
        F.least(F.greatest(v, F.col("__qlo")), F.col("__qhi")),
    )
    return (
        df.join(F.broadcast(cuts))
        .withColumn(out_col, clipped)
        .drop("__qlo", "__qhi")
    )


def quantile_discretize(
    df: DataFrame,
    col: str,
    n_bins: int = 4,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency binning (sklearn ``KBinsDiscretizer
    strategy='quantile'`` shape): adds ``out_col`` (default
    ``<col>_bin``) in ``[0, n_bins)`` — the bin index is the number
    of quantile edges ≤ the value, edges at p = i/n_bins computed
    with the same integer basis-point rule as ``quantile_clip``.
    NULLs get a NULL bin. Degenerate distributions collapse bins
    (identical edges) rather than failing.

    One (value, count) reduce + distinct-value cumsum produce all
    ``n_bins − 1`` edges in a single aggregation row (broadcast
    back); the binning itself is map-only. Exact oracle:
    ``quantile_bins``."""
    n_bins = int(n_bins)
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    out_col = out_col or f"{col}_bin"
    v = F.col(col)
    counts = (
        df.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("c").over(w).alias("cum"))
    n = df.filter(v.isNotNull()).agg(F.count(F.lit(1)).alias("n"))
    edge_aggs = []
    for i in range(1, n_bins):
        bp = round(10000 * i / n_bins)
        edge_aggs.append(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias(f"__e{i}")
        )
    edges = cum.join(F.broadcast(n)).agg(*edge_aggs)
    bin_ix = F.lit(0)
    for i in range(1, n_bins):
        bin_ix = bin_ix + (v >= F.col(f"__e{i}")).cast("int")
    return (
        df.join(F.broadcast(edges))
        .withColumn(
            out_col, F.when(v.isNotNull(), bin_ix.cast("int"))
        )
        .drop(*[f"__e{i}" for i in range(1, n_bins)])
    )
