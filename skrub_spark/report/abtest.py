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

from pyspark.sql import DataFrame
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
