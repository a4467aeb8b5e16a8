"""Gini concentration / Lorenz curve per group — beyond-reference
inequality analytics (SURVEY.md §2).

"Is revenue concentrated in a few whales?" is the portfolio-risk /
marketplace-health question, and in a training-data pipeline the
same statistic measures source concentration (is 90% of the corpus
from 3 domains?). The Gini coefficient over the sorted-value rank
identity:

    G = (2 * sum(i * x_i) - (n + 1) * sum(x_i)) / (n * sum(x_i))

with x_1 <= ... <= x_n (rank i by value, ties broken by id — the
deterministic convention), is exact integer/decimal arithmetic end
to end: values are carried as DECIMAL cents, ranks are integers,
both numerator and denominator are exact DECIMAL(38,2) sums, and
the final division is ONE IEEE double op rounded 6dp (battery
oracle ``gini_concentration`` replays the ranked identity
verbatim).

Scale shape: ONE window rank pass partitioned by the GROUP key
(the same single group-key shuffle a groupBy takes — never a
corpus-wide ``Window.orderBy``), then a |groups|-sized aggregate.
Lorenz points (cumulative population/value shares at each decile
boundary) come from the same ranked frame with integer
basis-point cut ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Gini coefficient: ``(group, n, total, gini)``.
    ``value_col`` should be a non-negative DECIMAL (or integer)
    column for exact replay; ``total`` is the exact decimal sum
    cast to double; ``gini`` is 6dp, NULL when the group total is
    zero."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).alias("__v"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__i") * F.col("__v")).alias("__is"),
    )
    num = F.lit(2) * F.col("__is") - (F.col("n") + 1) * F.col("__s")
    den = F.col("n") * F.col("__s")
    return agg.select(
        group_col,
        "n",
        F.col("__s").cast("double").alias("total"),
        F.when(
            F.col("__s") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("gini"),
    )
