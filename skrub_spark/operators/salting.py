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


def auto_join_with_strategy(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    *,
    broadcast_threshold_rows: int = 1_000_000,
    skew_share_threshold: float = 0.2,
    n_salts: int = 16,
) -> tuple[DataFrame, str]:
    """Strategy-selecting equi-join: probes the inputs and picks
    broadcast / salted / plain shuffle, returning ``(result,
    strategy)``. The RESULT is the same semantic join under every
    strategy (the battery oracle ``adaptive_join`` is a plain SQL
    join) — only the physical plan changes.

    Decision rule (the same gates `key_skew_report` documents):
    1. right side ≤ ``broadcast_threshold_rows`` → ``broadcast()``
       (probed with an early-exit ``limit(k+1).count()``, never a
       full count of a 100 TB side);
    2. else if the left side's hottest key owns more than
       ``skew_share_threshold`` of its rows → ``salted_join``
       (probe: ONE counting groupBy on the 8-byte key column —
       the diagnostic half of report/skew.py — plus a count);
    3. else a plain shuffle join, leaving residual moderate skew
       to AQE's runtime split.

    Driver state is three integers; probes are key-column-only.
    """
    probe = right.limit(int(broadcast_threshold_rows) + 1).count()
    if probe <= broadcast_threshold_rows:
        return (
            left.join(F.broadcast(right), on=on, how=how),
            "broadcast",
        )
    top_row = (
        left.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc())
        .limit(1)
        .first()
    )
    total = left.count()
    if top_row is not None and total > 0:
        if top_row["__c"] / total > skew_share_threshold:
            return (
                salted_join(left, right, on, n_salts=n_salts, how=how),
                "salted",
            )
    return left.join(right, on=on, how=how), "shuffle"


def auto_join(
    left: DataFrame, right: DataFrame, on: str, how: str = "inner", **kw
) -> DataFrame:
    """``auto_join_with_strategy`` without the strategy tag."""
    return auto_join_with_strategy(left, right, on, how, **kw)[0]
