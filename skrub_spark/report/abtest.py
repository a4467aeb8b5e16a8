"""A/B experiment readout: two-proportion z-test + chi-square —
beyond-reference decision analytics (SURVEY.md §2).

The question every experiment dashboard answers: variant B
converted p2 vs control's p1 — is the lift real? The pooled
two-proportion z statistic

    z = (p1 - p2) / sqrt(p_pool (1 - p_pool) (1/n1 + 1/n2))

and the 2x2 chi-square statistic (= z² for this table) are pure
arithmetic over four exact counts, so the whole readout is
SQL-replayable: counts are integers, every ratio/sqrt/product is
fixed-order IEEE arithmetic on exact operands, outputs rounded 6dp
(battery oracle ``ab_test_report``).

Scale shape: ONE entity-level conditional agg (map-side combined)
collapses the corpus to per-entity conversion flags, ONE 2-key
groupBy collapses those to four counts; the stats touch one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ab_proportion_test(
    df: DataFrame,
    entity_col: str,
    variant_col: str,
    converted_col: str,
) -> DataFrame:
    """One-row experiment readout from an entity-level frame
    (``variant_col`` ∈ two values, ``converted_col`` 0/1 per
    entity): ``(variant_a, variant_b, n_a, n_b, conv_a, conv_b,
    rate_a, rate_b, lift, z, chi2)``. Variant A is the
    lexicographically smaller label (deterministic); z > 0 means A
    converts better. NULL z/chi2 when a variant is empty or the
    pooled rate is degenerate (0 or 1)."""
    per_variant = (
        df.groupBy(F.col(variant_col).alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(converted_col).cast("long"))
            .cast("long")
            .alias("c"),
        )
    )
    per_variant = per_variant.persist()  # feeds both single-row picks
    a = per_variant.orderBy("v").limit(1).select(
        F.col("v").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("c").alias("conv_a"),
    )
    b = per_variant.orderBy(F.col("v").desc()).limit(1).select(
        F.col("v").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("c").alias("conv_b"),
    )
    row = a.crossJoin(b)
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    p1 = F.col("conv_a").cast("double") / n1
    p2 = F.col("conv_b").cast("double") / n2
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (n1 + n2)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    valid = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (pp > F.lit(0.0))
        & (pp < F.lit(1.0))
        & (F.col("variant_a") != F.col("variant_b"))
    )
    z = F.when(valid, F.round((p1 - p2) / se, 6))
    return row.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        F.when(p2 > 0, F.round((p1 - p2) / p2, 6)).alias("lift"),
        z.alias("z"),
        F.when(valid, F.round(((p1 - p2) / se) * ((p1 - p2) / se), 6))
        .alias("chi2"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U test (r9 — the NONPARAMETRIC two-sample test
    next to the z-test: compares whole distributions, immune to the
    heavy tails that break mean-based tests on revenue-like
    metrics). One row: ``(n_a, n_b, u_a, u_b, z)``.

    Distributed midranks via the spearman recipe — distinct-value
    counts + a cumulative sum over the bounded distinct-value frame
    + a value→rank join-back; NO corpus-wide row window. All rank
    arithmetic stays in 2× integer space (double-midrank =
    2·cum_before + cnt + 1 is always integral), so U is EXACT; the
    normal approximation z applies the standard tie correction and
    rounds to 6dp (single sqrt/divisions on integer-derived
    doubles — the proven cross-engine bridge)."""
    two = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        (F.col(group_col) == group_a).alias("is_a"),
        F.col(value_col).alias("v"),
    )
    counts = two.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.col("is_a").cast("long")).alias("ta"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = counts.withColumn(
        "cum", F.sum("t").over(w)
    ).select(
        "v",
        "t",
        "ta",
        # 2x the midrank of every row tied at v: integral, exact
        (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("dr"),
    )
    agg = ranked.agg(
        F.sum("ta").cast("long").alias("n_a"),
        F.sum(F.col("t") - F.col("ta")).cast("long").alias("n_b"),
        F.sum(F.col("ta") * F.col("dr")).cast("long").alias("r2a"),
        # tie correction term: sum t^3 - t over distinct values
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("ties"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    # U_a = R_a - n_a(n_a+1)/2, with R_a = r2a / 2 (exact halves)
    ua = (
        F.col("r2a").cast("double") / F.lit(2.0)
        - na * (na + F.lit(1.0)) / F.lit(2.0)
    )
    n = na + nb
    mu = na * nb / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * (
            (n + F.lit(1.0))
            - F.col("ties").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(ua, 6).alias("u_a"),
        F.round(na * nb - ua, 6).alias("u_b"),
        F.when(
            var > 0, F.round((ua - mu) / F.sqrt(var), 6)
        ).alias("z"),
    )
