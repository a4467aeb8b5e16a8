"""Grid-bucketed spatial distance join — beyond-reference
geospatial operator (SURVEY.md §2).

"Every supplier within r of each customer" is a distance join; the
naive plan is a cross join (|L|·|R| at 100 TB = never). The
standard distributed answer is GRID BUCKETING (the equi-join
reduction every spatial engine — Sedona, PostGIS ST_DWithin
planning — uses): snap points to cells of side r, then any pair
within r lies in the same or an adjacent cell, so candidates =
equi-join on cell id with the LEFT side exploded to its 3×3 cell
neighborhood, and the exact predicate filters candidates only.

Exactness discipline: coordinates are INTEGER fixed-point
(microdegrees), cells are integer floor-divisions, and the
predicate is the exact integer comparison
``dx² + dy² <= r²`` — zero float ops anywhere, so the DuckDB
oracle can run the QUADRATIC definition and match bit-for-bit
(battery query ``spatial_join_grid``), proving the grid plan IS
the definition. (Planar fixed-point distance; for geodesic work
project first — the operator is the join shape, not the datum.)

Scale shape: candidates = ONE equi-join on (cell_x, cell_y) after
a 9× explode of the smaller/left side; each pair is generated
EXACTLY once (a right point lives in one cell; the left explode
hits 9 distinct cells). Shuffle keys are two integers; skew =
densest cell (shrink r or salt hot cells).

Cells use integer ``div`` (truncation toward zero), so the cell at
the origin is 2r−1 wide: every cell still covers ≥ r consecutive
integers, which is all the 3×3 adjacency cover needs (an interval
of length r spans ≤ 2 such cells) — no float division anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_distance_join(
    left: DataFrame,
    right: DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    radius: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs with integer squared distance
    ``(xl−xr)² + (yl−yr)² <= radius²``. Both inputs need integer
    ``x_col``/``y_col`` (fixed-point coordinates); all other
    columns are carried with ``suffixes``. Adds ``dist2`` (exact
    integer squared distance)."""
    r = int(radius)
    if r <= 0:
        raise ValueError("radius must be a positive integer")
    sl, sr = suffixes
    lcols = [
        F.col(c).alias(c + sl) for c in left.columns
    ]
    rcols = [
        F.col(c).alias(c + sr) for c in right.columns
    ]
    offs = F.expr(
        "array(-1,0,1)"
    )
    lx, ly = F.col(x_col + sl), F.col(y_col + sl)
    rx, ry = F.col(x_col + sr), F.col(y_col + sr)
    le = (
        left.select(*lcols)
        .withColumn("__ox", F.explode(offs))
        .withColumn("__oy", F.explode(offs))
        .select(
            "*",
            (
                F.call_function("div", lx, F.lit(r)) + F.col("__ox")
            ).alias("__cx"),
            (
                F.call_function("div", ly, F.lit(r)) + F.col("__oy")
            ).alias("__cy"),
        )
        .drop("__ox", "__oy")
    )
    re = right.select(*rcols).select(
        "*",
        F.call_function("div", rx, F.lit(r)).alias("__cx"),
        F.call_function("div", ry, F.lit(r)).alias("__cy"),
    )
    dx = lx - rx
    dy = ly - ry
    return (
        le.join(re, ["__cx", "__cy"])
        .withColumn("dist2", dx * dx + dy * dy)
        .filter(F.col("dist2") <= F.lit(r * r).cast("long"))
        .drop("__cx", "__cy")
    )
