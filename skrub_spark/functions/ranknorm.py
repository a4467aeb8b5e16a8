"""Rank/percentile normalization — threshold-free score calibration.

Quality scores from different scorers (LM perplexity, the learned
classifier, Gopher heuristics) live on incomparable scales; the
standard fix before mixing or weighted sampling is to replace each
score with its PERCENTILE in the corpus: pct = (rank−1)/(n−1) with
min-rank (ties share a percentile). "Keep the top 30%" then means
``pct >= 0.7`` for every scorer, and ``sample_weighted(pct)`` gives
rank-proportional retention with no per-scorer tuning.

Distributed shape (the Spearman-rank lesson): a per-row global rank
window would single-task the corpus — instead the column reduces to
its DISTINCT value counts (map-side-combined groupBy), rank-below
comes from a cumulative sum over the ≤D distinct rows, and the
value→(rank, pct) map joins back (broadcast for low-cardinality
scores, AQE otherwise). rank arithmetic is exact integers; pct is
ONE IEEE division — bit-identical cross-engine, replayed by the
battery oracle (``quality_percentiles``) against an independent
PERCENT_RANK() derivation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def percentile_normalize(
    df: DataFrame,
    value_col: str,
    *,
    out_col: str = "pct",
    rank_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = (min_rank − 1)/(n − 1) ∈ [0, 1] for the
    named value column (NULL values get NULL pct). ``rank_col``
    optionally also emits the integer min-rank."""
    v = F.col(value_col)
    name = value_col
    cnts = (
        df.filter(v.isNotNull())
        .groupBy(v.alias(name))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = Window.orderBy(F.col(name)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = df.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).alias("__n")
    )
    ranks = (
        cnts.select(
            F.col(name),
            (F.coalesce(F.sum("__cnt").over(w), F.lit(0)) + 1)
            .cast("long")
            .alias("__rank"),
        )
        .join(F.broadcast(total))
        .select(
            name,
            "__rank",
            (
                (F.col("__rank") - 1).cast("double")
                / F.greatest(F.col("__n") - 1, F.lit(1)).cast("double")
            ).alias("__pct"),
        )
    )
    out = df.join(ranks, [name], "left")
    sel = [F.col("__pct").alias(out_col)]
    if rank_col:
        sel.insert(0, F.col("__rank").alias(rank_col))
    return out.select(*df.columns, *sel)
