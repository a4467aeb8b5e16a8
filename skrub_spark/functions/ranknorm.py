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


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    out_col: str = "qnorm",
) -> DataFrame:
    """Cross-group quantile normalization (r9c) — map every group's
    values onto the POOLED distribution so groups become
    rank-comparable (the bioinformatics array-normalization recipe,
    Bolstad 2003, generalized to unequal group sizes by percentile
    mapping): a row at within-group rank r of n_g takes the pooled
    order statistic at rank ⌈r·N/n_g⌉.

    Scale + exactness: the within-group rank is a per-group window
    (row-scale but partitioned); the pooled side NEVER builds a
    global row_number — pooled order statistics come from the
    distinct-value frame with cumulative counts (the Spearman
    distributed-rank shape, report/associations.py: an ordered pass
    over D distinct values, D ≪ N), and each row's target rank is
    resolved by a range join cum_prev < idx ≤ cum against that
    bounded frame. Target ranks are exact integers
    (⌈r·N/n_g⌉ = (r·N + n_g − 1) div n_g in DECIMAL(38,0)); the
    mapped value is an input value verbatim — no arithmetic on
    values at all, so the result replays bit-identically in SQL.

    Returns ``(id, group, value, out_col)``.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
    ).where(F.col(value_col).isNotNull())
    base = base.persist()
    n_tot = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    wg = Window.partitionBy("grp").orderBy(F.col("v").asc(), F.col("id").asc())
    ranked = (
        base.withColumn("r", F.row_number().over(wg).cast("long"))
        .withColumn(
            "n_g",
            F.count(F.lit(1))
            .over(Window.partitionBy("grp"))
            .cast("long"),
        )
        .crossJoin(F.broadcast(n_tot))
        .withColumn(
            "idx",
            F.expr(
                "CAST((CAST(r AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"
                " + CAST(n_g AS DECIMAL(38,0)) - 1)"
                " div CAST(n_g AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
    )
    # pooled distinct values with cumulative counts: ordered pass
    # over the D-distinct frame only.
    dist = base.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dist.select(
        F.col("v").alias("pv"),
        F.sum("c").over(wv).cast("long").alias("cum"),
    ).withColumn(
        "cum_prev",
        F.coalesce(
            F.lag("cum", 1).over(Window.orderBy(F.col("pv").asc())),
            F.lit(0).cast("long"),
        ),
    )
    out = ranked.join(
        F.broadcast(cum),
        (F.col("idx") > F.col("cum_prev")) & (F.col("idx") <= F.col("cum")),
        "inner",
    ).select(
        F.col("id").alias(id_col),
        F.col("grp").alias(group_col),
        F.col("v").alias(value_col),
        F.col("pv").alias(out_col),
    )
    return out
