"""As-of join — the time-series enrichment join Spark lacks natively
(pandas.merge_asof / DuckDB ASOF JOIN semantics): each left row picks
the single right row with the greatest ``right_ts <= left_ts``
("backward"; "forward" = smallest ``right_ts >= left_ts``) within the
same ``by`` key, optionally within ``tolerance`` seconds.

Physical plan — the UNION-TAG construction, not a range join:

1. union left rows (side=1) and right rows (side=0) into one frame
   with aligned columns;
2. one window sorted by (ts, side) per key: ``last(col,
   ignorenulls=True)`` carries the most recent right payload forward
   onto each left row — a single sort-shuffle on the key, O(n log n)
   per partition;
3. filter back to left rows, apply the tolerance.

A naive ``l.ts >= r.ts`` range join explodes to O(|L|·|R|) per key
before the argmax; this plan never materializes candidate pairs at
all, so a hot key costs one sort instead of a quadratic blowup —
the property that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutils import epoch_s


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join; right payload columns arrive suffixed, plus
    ``{right_ts}{suffix}`` holding the matched timestamp (null when
    no match)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else list(by)
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in by and c != right_ts]
    out_names = {c: c + suffix if c in left.columns else c for c in payload}
    matched_ts = right_ts + suffix if right_ts in left.columns else right_ts

    l_part = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p{i}")
            for i, c in enumerate(payload)
        ],
    )
    r_part = right.filter(F.col(right_ts).isNotNull()).select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in by
            else F.col(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__p{i}") for i, c in enumerate(payload)],
    )
    both = l_part.unionByName(r_part)

    # ordering: right rows must sort BEFORE the left rows they may
    # match. backward+exact: (ts asc, side asc) puts an equal-ts right
    # row first. backward without exact: right must be strictly
    # earlier -> (ts asc, side desc... ) — flip the side order so an
    # equal-ts right row lands AFTER the left row and is not seen.
    # NULL handling: null-ts right rows are dropped above (no valid
    # ordering); null-ts LEFT rows must match nothing, so they sort
    # FIRST in both directions (frame contains only themselves).
    # The trailing __p* keys make last() deterministic when several
    # right rows share (key, ts): the greatest payload tuple wins.
    ts_ord = (
        F.col("__ts").asc_nulls_first()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    side_first = allow_exact_matches
    side_ord = F.col("__side").asc() if side_first else F.col("__side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(
            ts_ord,
            side_ord,
            F.col("__rts").asc_nulls_first(),
            *[F.col(f"__p{i}").asc_nulls_first() for i in range(len(payload))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the matched right row is carried as ONE struct so its fields
    # arrive verbatim: carrying each payload column independently
    # with last(ignorenulls) would backfill a NULL field of the
    # matched row from an OLDER right row — a mixed-row result no
    # real right row ever had (and with tolerance, the stale field
    # could come from outside the window the __m_ts check passes).
    rowstruct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rts").alias("t"),
            *[F.col(f"__p{i}").alias(f"p{i}") for i in range(len(payload))],
        ),
    )
    carried = both.select(
        "*", F.last(rowstruct, ignorenulls=True).over(w).alias("__m")
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        # epoch_s: NTZ-safe and works for numeric ts columns too
        gap = F.abs(epoch_s("__ts") - epoch_s(F.col("__m.t")))
        ok = F.col("__m").isNotNull() & (gap <= float(tolerance_s))
        out = out.withColumn("__m", F.when(ok, F.col("__m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("__m.t").alias(matched_ts),
        *[
            F.col(f"__m.p{i}").alias(out_names[c])
            for i, c in enumerate(payload)
        ],
    )
