"""Robust per-group outlier detection (median / MAD) —
beyond-reference data-quality operator (SURVEY.md §2).

The reference's cleaning stages (``Cleaner``, reference
skrub/_cleaner.py) drop constant/null columns but leave value-level
anomaly detection to the user; production curation pipelines gate on
it (price glitches, sensor spikes, token-count blowups). Mean/stddev
z-scores break down exactly when needed most — the outliers inflate
the stddev that is supposed to flag them — so the robust standard is
the median absolute deviation (Hampel filter): flag x where
``|x − median| > k·MAD``, both statistics 50%-breakdown-point robust.

Exactness discipline (what makes this oracle-able where a naive
``percentile_approx`` or a float ``median()`` is not):

- Medians are computed by RANK SELECTION, not interpolation, and
  carried DOUBLED: rows ranked per group by (value, id); the lower-
  and upper-middle ranks ``(n+1) div 2`` / ``(n+2) div 2`` are
  summed with weight (1 per matching mid position — the single
  middle row of an odd group weighs 2), so ``med2 = 2·median`` is
  an EXACT DECIMAL on any engine and any partitioning (DuckDB's
  ``avg``/``median`` would go through DOUBLE).
- The MAD repeats the same selection over ``dev2 = |2·x − med2|``
  (still exact decimals); ``mad4 = 2·median(dev2) = 4·MAD``.
- The flag is decided entirely in decimal space:
  ``|x−med| > k·MAD  ⟺  2·dev2 > k·mad4`` with ``k`` quantized to
  1dp — exact integer-scaled decimal arithmetic, no float.
- Reported ``med``/``mad`` are the exact decimals cast to DOUBLE
  and divided by 2 / 4 — power-of-two divisions are EXACT in IEEE
  binary, so even the convenience columns replay bit-identically.

Scale shape: two windowed rank passes partitioned by the GROUP key
(never a corpus-wide ``Window.orderBy``) — the same single group-key
shuffle a groupBy would take — then |groups|-sized broadcast joins
back. At 100 TB with millions of groups every frame except the input
is |groups|-sized.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_median2(
    df: DataFrame, group: str, val, order_id: str, out: str
) -> DataFrame:
    """Per-group DOUBLED median of a decimal column, exact: sum of
    the lower-/upper-middle values by rank selection (the single
    middle row of an odd-sized group is counted twice)."""
    w = Window.partitionBy(group).orderBy(val.asc(), F.col(order_id).asc())
    ranked = df.select(
        F.col(group),
        val.alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group)).alias("__n"),
    )
    lo = F.floor((F.col("__n") + 1) / 2)
    hi = F.floor((F.col("__n") + 2) / 2)
    weight = (F.col("__rn") == lo).cast("int") + (
        F.col("__rn") == hi
    ).cast("int")
    return (
        ranked.filter(weight > 0)
        .groupBy(group)
        .agg(F.sum(F.col("__v") * weight).alias(out))
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    k: str | float = "3.0",
) -> DataFrame:
    """Hampel-filter outlier flags per group:
    ``(id, group, value, med, mad, is_outlier)`` with
    ``is_outlier = |value − med| > k · mad`` decided in exact
    decimal space (see module docstring).

    ``value_col`` should be DECIMAL (or integer) for exact replay;
    ``k`` is quantized to 1dp. Groups where MAD = 0 (over half the
    values identical) flag every value different from the median —
    the textbook Hampel degenerate case. Battery oracle
    ``mad_outliers`` replays the rank selection, weighted mid sums,
    and the decimal comparison verbatim.
    """
    kq = Decimal(str(k)).quantize(Decimal("0.1"))
    val = F.col(value_col)
    med2 = _group_median2(df, group_col, val, id_col, "med2")
    base = df.select(
        F.col(id_col), F.col(group_col), val.alias("value")
    ).join(F.broadcast(med2), group_col)
    dev = base.withColumn(
        "dev2", F.abs(F.lit(2) * F.col("value") - F.col("med2"))
    )
    mad4 = _group_median2(dev, group_col, F.col("dev2"), id_col, "mad4")
    return dev.join(F.broadcast(mad4), group_col).select(
        id_col,
        group_col,
        "value",
        F.round(F.col("med2").cast("double") / F.lit(2.0), 6).alias("med"),
        F.round(F.col("mad4").cast("double") / F.lit(4.0), 6).alias("mad"),
        (
            F.lit(2) * F.col("dev2")
            > F.lit(kq).cast("decimal(3,1)") * F.col("mad4")
        ).alias("is_outlier"),
    )


def iqr_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    k10: int = 15,
) -> DataFrame:
    """Tukey-fence outlier flags per group — the other textbook
    robust rule next to ``mad_outliers`` (boxplot semantics:
    flag x outside [p25 − k·IQR, p75 + k·IQR], k = ``k10``/10):
    ``(id, group, value, p25, p75, is_outlier)``. Quartiles are
    discrete rank SELECTION via the integer basis-point cut rule
    (``ceil(p·n)`` over the per-group distinct-value cumsum —
    the ``quantile_clip`` discipline, partitioned by group), so
    they are actual data values; the fence comparison is decided
    in ×10-scaled exact decimal space (no float fence). Battery
    oracle ``iqr_outliers`` replays selection and fences."""
    from ..operators.winsorize import group_quantiles

    q = group_quantiles(
        df.select(F.col(group_col), F.col(value_col)),
        group_col,
        value_col,
        [0.25, 0.75],
        names=["p25", "p75"],
    ).drop("n")
    j = df.select(
        F.col(id_col), F.col(group_col), F.col(value_col).alias("value")
    ).join(F.broadcast(q), group_col)
    v10 = F.lit(10) * F.col("value")
    lo10 = F.lit(10) * F.col("p25") - F.lit(int(k10)) * (
        F.col("p75") - F.col("p25")
    )
    hi10 = F.lit(10) * F.col("p75") + F.lit(int(k10)) * (
        F.col("p75") - F.col("p25")
    )
    return j.select(
        id_col,
        group_col,
        "value",
        "p25",
        "p75",
        ((v10 < lo10) | (v10 > hi10)).alias("is_outlier"),
    )
