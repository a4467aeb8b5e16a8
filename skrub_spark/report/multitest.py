"""Multiple-testing control (r9c): group-wise permutation p-values
and Benjamini–Hochberg step-up FDR.

The missing piece after the repo's two-sample tests (abtest.py,
drift.py, permutation.py): screening MANY groups at once ("which of
these 500 segments moved?") without the guaranteed false positives
of per-test α. BH (Benjamini & Hochberg 1995) controls the false
discovery rate: sort the m p-values, find the largest k with
p_(k) ≤ k·α/m, reject ranks 1..k; q-values are the step-up running
minima of p_(i)·m/i.

Determinism: p-values from ``permutation_group_deviation`` are
EXACT COUNT RATIOS (the md5-relabeling construction of
permutation.py applied per group), so the BH comparisons and
q-values replay bit-identically in SQL. All BH work happens on the
bounded per-group frame (m rows), never row-scale data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .permutation import _u60


def permutation_group_deviation(
    df: DataFrame,
    value: Column | str,
    group: Column | str,
    key: Column | str,
    *,
    n_perm: int = 40,
    salt: str = "pg",
) -> DataFrame:
    """For every group g: a permutation p-value for "does g's mean
    differ from the rest?" — diff = mean(x | g) − mean(x | not g),
    replicates relabel each row into a pseudo-group of expected
    size n_g via independent md5 draws (P = n_g/n, the map-only
    binomial variant — see permutation.py).

    Returns ``(group, n_g, diff_obs, n_perm_valid, n_ge, p_value)``
    with p an exact count ratio. One pass shaped rows × B × m (m =
    number of groups): fine for report-sized m; for thousands of
    groups run per-shard.
    """
    v = F.col(value) if isinstance(value, str) else value
    g = F.col(group) if isinstance(group, str) else group
    k = F.col(key) if isinstance(key, str) else key
    base = df.select(
        g.cast("string").alias("__g"),
        v.cast("decimal(18,6)").alias("__x"),
        k.alias("__k"),
    ).filter(F.col("__x").isNotNull() & F.col("__g").isNotNull())
    base = base.persist()
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("s"),
    )
    per_g = (
        base.groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("__x").alias("s_g"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "__g",
            "n_g",
            "n",
            F.round(
                F.col("s_g").cast("double") / F.col("n_g").cast("double"), 6
            ).alias("m_in"),
            F.round(
                (F.col("s") - F.col("s_g")).cast("double")
                / (F.col("n") - F.col("n_g")).cast("double"),
                6,
            ).alias("m_out"),
        )
        .withColumn("diff_obs", F.col("m_in") - F.col("m_out"))
        .select("__g", "n_g", "n", "diff_obs")
    )
    # rows × B × m relabeled pass; the draw is per (group, b, key)
    # so each group's test is an independent replay.
    repl = (
        base.crossJoin(
            F.broadcast(per_g.select("__g", "n_g", "n").toDF("g2", "n_g", "n"))
        )
        .select(
            "__x",
            "__k",
            "g2",
            "n_g",
            "n",
            F.explode(F.expr(f"sequence(1, {int(n_perm)})")).alias("b"),
        )
        .withColumn(
            "u",
            _u60(
                F.col("__k"),
                F.concat(F.col("g2"), F.lit("\x1e"), F.col("b")),
                salt,
            ),
        )
        .withColumn(
            "is_in",
            (
                F.col("u").cast("decimal(38,0)")
                * F.col("n").cast("decimal(38,0)")
                < F.lit(1 << 60).cast("decimal(38,0)")
                * F.col("n_g").cast("decimal(38,0)")
            ),
        )
    )
    diffs = (
        repl.groupBy("g2", "b")
        .agg(
            F.sum(F.when(F.col("is_in"), F.col("__x"))).alias("si"),
            F.count(F.when(F.col("is_in"), F.lit(1))).cast("long").alias("ci"),
            F.sum(F.when(~F.col("is_in"), F.col("__x"))).alias("so"),
            F.count(F.when(~F.col("is_in"), F.lit(1))).cast("long").alias("co"),
        )
        .filter((F.col("ci") > 0) & (F.col("co") > 0))
        .select(
            "g2",
            "b",
            (
                F.round(F.col("si").cast("double") / F.col("ci").cast("double"), 6)
                - F.round(F.col("so").cast("double") / F.col("co").cast("double"), 6)
            ).alias("d"),
        )
    )
    out = (
        diffs.join(per_g.select(F.col("__g").alias("g2"), "diff_obs"), "g2")
        .groupBy("g2", "diff_obs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_perm_valid"),
            F.sum((F.abs(F.col("d")) >= F.abs(F.col("diff_obs"))).cast("int"))
            .cast("long")
            .alias("n_ge"),
        )
        .join(per_g.select(F.col("__g").alias("g2"), "n_g"), "g2")
        .select(
            F.col("g2").alias("group"),
            "n_g",
            "diff_obs",
            "n_perm_valid",
            "n_ge",
            F.round(
                (F.lit(1) + F.col("n_ge")).cast("double")
                / (F.lit(1) + F.col("n_perm_valid")).cast("double"),
                6,
            ).alias("p_value"),
        )
    )
    return out


def bh_fdr(
    df: DataFrame,
    p_col: str,
    *,
    alpha: float = 0.1,
    group_col: str | None = None,
) -> DataFrame:
    """Benjamini–Hochberg step-up over a bounded p-value frame.

    Adds ``(p_rank, m_tests, q_value, reject)``. q-values are the
    step-up running minima of p·m/rank (capped at 1); ``reject`` is
    the classic step-up rule (all ranks ≤ the largest k with
    p_(k) ≤ k·α/m). Ties order by ``group_col`` (or p alone) so the
    ranking is total. The frame is per-test (m rows), already
    bounded — the windows here never see row-scale data.
    """
    tie = [F.col(group_col).asc()] if group_col else []
    w = Window.orderBy(F.col(p_col).asc(), *tie)
    wall = Window.partitionBy()
    ranked = (
        df.withColumn("p_rank", F.row_number().over(w).cast("long"))
        .withColumn("m_tests", F.count(F.lit(1)).over(wall).cast("long"))
    )
    raw_q = (
        F.col(p_col)
        * F.col("m_tests").cast("double")
        / F.col("p_rank").cast("double")
    )
    w_up = Window.orderBy(F.col("p_rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sat = F.when(
        F.col(p_col)
        <= F.col("p_rank").cast("double")
        * F.lit(float(alpha))
        / F.col("m_tests").cast("double"),
        F.col("p_rank"),
    )
    return (
        ranked.withColumn(
            "q_value", F.round(F.least(F.min(raw_q).over(w_up), F.lit(1.0)), 6)
        )
        .withColumn("__k_max", F.max(sat).over(wall))
        .withColumn(
            "reject",
            F.col("__k_max").isNotNull()
            & (F.col("p_rank") <= F.col("__k_max")),
        )
        .drop("__k_max")
    )
