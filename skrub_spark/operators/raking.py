"""Iterative proportional fitting / raking (r9c).

The survey-statistics workhorse (Deming & Stephan 1940): adjust a
cross-tabulated weight matrix so its row and column margins match
known population totals — e.g. calibrate metrics computed from a
BIASED subsample (customers who ordered) back to full-population
nation × segment margins. The same machinery is matrix scaling /
Sinkhorn balancing.

Determinism + oracle design (the attribution_markov recipe,
operators/intervals.py): cell weights live in integer fixed point
(×``scale``); each half-iteration multiplies a cell by
``target_margin_fp`` and integer-divides by the current margin sum
— exact integer arithmetic, so K iterations replay as chained SQL
CTEs (battery oracle ``ipf_raking``). The cross-tab is BOUNDED
(|rows|×|cols| cells): the row-scale work is the two counting
groupBys; the iterations run driver-side on the collected cell list
(codebook discipline) and the result returns through a Spark frame.

Convergence: IPF converges geometrically for strictly positive
tables; K=10 reaches sub-1e-4 relative margin error on typical
tables. Zero cells stay zero (structural zeros preserved); a target
margin whose entire row/column is zero raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ipf_rake(
    cells: DataFrame,
    row_col: str,
    col_col: str,
    weight_col: str,
    row_targets: DataFrame,
    col_targets: DataFrame,
    *,
    n_iter: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Rake ``cells`` (one row per (row_key, col_key) with a
    positive count/weight) to match ``row_targets`` (row_key,
    target) and ``col_targets`` (col_key, target).

    Returns ``(row_key, col_key, weight_raw, weight_raked)`` with
    ``weight_raked = fp/scale`` rounded 6dp (one IEEE division per
    cell, HALF_UP through Spark expressions).
    """
    cell_rows = [
        (r[0], r[1], int(r[2]))
        for r in cells.select(row_col, col_col, weight_col).collect()
    ]
    rt = {r[0]: int(r[1]) for r in row_targets.collect()}
    ct = {r[0]: int(r[1]) for r in col_targets.collect()}
    w = {(a, b): v * int(scale) for a, b, v in cell_rows}
    for a in rt:
        if not any(k[0] == a and v > 0 for k, v in w.items()):
            if rt[a] > 0:
                raise ValueError(f"row target {a!r} has no mass to rake")
    for b in ct:
        if not any(k[1] == b and v > 0 for k, v in w.items()):
            if ct[b] > 0:
                raise ValueError(f"col target {b!r} has no mass to rake")
    for _ in range(int(n_iter)):
        rs: dict = {}
        for (a, b), v in w.items():
            rs[a] = rs.get(a, 0) + v
        w = {
            (a, b): (v * rt.get(a, 0) * int(scale)) // rs[a]
            if rs[a] > 0
            else 0
            for (a, b), v in w.items()
        }
        cs: dict = {}
        for (a, b), v in w.items():
            cs[b] = cs.get(b, 0) + v
        w = {
            (a, b): (v * ct.get(b, 0) * int(scale)) // cs[b]
            if cs[b] > 0
            else 0
            for (a, b), v in w.items()
        }
    spark = cells.sparkSession
    raw = spark.createDataFrame(
        [(a, b, v, w[(a, b)]) for a, b, v in cell_rows],
        [row_col, col_col, "weight_raw", "fp"],
    )
    return raw.select(
        row_col,
        col_col,
        "weight_raw",
        F.round(
            F.col("fp").cast("double") / F.lit(float(scale)), 6
        ).alias("weight_raked"),
    )
