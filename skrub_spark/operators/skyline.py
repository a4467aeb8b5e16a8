"""Skyline (Pareto-frontier) query — beyond-reference relational
operator (SURVEY.md §2).

"Show me the offers no other offer beats on every axis" — cheapest
AND biggest, freshest AND highest-quality — is the skyline query
(Borzsony/Kossmann/Stocker, ICDE 2001). A row p is dominated when
some q is at least as good on EVERY dimension and strictly better
on at least one; the skyline is the non-dominated set.

2-D sweep shape (this module): sort one dimension, running-extreme
the other. With dims (minimize a, maximize b), p is dominated iff

    max(b over rows with a <  p.a) >= p.b   (strictly better a)
 or max(b over rows with a <= p.a) >  p.b   (>= a, strictly better b)

— two RANGE-framed window cummaxes over integer-scaled a, both
partitioned by the GROUP key, zero joins. Exact set semantics
(duplicate (a, b) rows are mutually non-dominated and all kept),
and exactly replayable: the oracle (battery ``skyline_parts``)
runs the quadratic NOT-EXISTS dominance definition, proving the
sweep IS the definition.

Scale: the windows shuffle once on the group key; frames range
over the group, so skew = the largest group (salt upstream if one
group is the corpus). For N-dim skylines compose: run the 2-D
sweep per partition (local skylines are exact prefilters — a
globally dominated row is dominated within any subset containing
its dominator... note the converse prune ONLY holds per-partition:
local-skyline-then-global is exact because global skyline ⊆ every
local skyline of a partitioning), then sweep the (small) union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    group_col: str,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Per-group 2-D skyline: rows not dominated under (minimize
    ``min_col``, maximize ``max_col``). ``min_col`` MUST be
    INTEGER-valued (scale decimals to cents first): the
    strictly-less frame is ``RANGE .. 1 PRECEDING``, and a range
    offset of 1 equals one unit of the order column — on an
    unscaled decimal that frame would wrongly drop same-unit
    neighbours. NULL dimensions must be filtered upstream. Returns
    the input rows (all columns) that survive."""
    a = F.col(min_col)
    b = F.col(max_col)
    w_strict = (
        Window.partitionBy(group_col)
        .orderBy(a.asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy(group_col)
        .orderBy(a.asc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "__dom",
        (F.coalesce(F.max(b).over(w_strict) >= b, F.lit(False)))
        | (F.max(b).over(w_le) > b),
    )
    return flagged.filter(~F.col("__dom")).drop("__dom")
