"""Skew-mitigation helpers (SURVEY.md §4).

AQE's skew-join splitting handles most cases at runtime; explicit
salting remains necessary when a *groupBy* key is hot (AQE cannot
split a single aggregation key) or when the skew is known up front.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    reaggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot keys: stage 1 groups by
    (key, random salt) — spreading a hot key over ``n_salts``
    reducers — stage 2 merges the partials per key.

    ``aggs``: output_name -> first-stage aggregate expression.
    ``reaggs``: output_name -> merge expression over the partials
    (default: sum, correct for count/sum-style partials)."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    merge = reaggs or {name: F.sum(name) for name in aggs}
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: the (large, skewed) left side gets a random
    salt; the (smaller) right side is replicated ``n_salts`` times so
    every salted key still finds its match. Use when AQE's runtime
    skew split is unavailable (e.g. non-shuffle-join constraints)."""
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")
