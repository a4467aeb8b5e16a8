"""Interval-overlap (range) join — natively missing from open-source
Spark: a join on ``l.start <= r.end AND r.start <= l.end`` with no
equality key plans as BroadcastNestedLoopJoin, O(|L|·|R|) compute
that only works while one side is broadcastable.

Physical plan here — the TIME-BUCKET construction:

1. explode each interval into the epoch-aligned fixed-width bucket
   INDEXES it covers (``unix_micros(t) div width``);
2. equi-join on (by-keys, bucket) — a plain shuffle join Catalyst
   handles like any other, AQE-skew-splittable;
3. filter to true overlap AND to the pair's first shared bucket
   (one row per match, no dropDuplicates pass).

Candidate volume is sum(interval_len / bucket_width) per side, not
|L|·|R|: pick ``bucket`` near the typical interval length. Very long
intervals fan out into many buckets — cap them upstream or widen the
bucket (the same discipline as LSH bucket caps, docs/SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_US = {
    "week": 7 * 86_400_000_000,
    "day": 86_400_000_000,
    "hour": 3_600_000_000,
    "minute": 60_000_000,
    "second": 1_000_000,
}


def _bucket_width_us(bucket: str) -> int:
    """'2 hours' -> microseconds. Widths must be epoch-aligned
    multiples — truncating each row's own start and stepping from
    there would phase-shift multi-unit buckets per row, silently
    dropping overlaps whose intervals never share a bucket."""
    parts = bucket.strip().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    else:
        n, unit = int(parts[0]), parts[1]
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_US or n < 1:
        raise ValueError(
            f"bucket must be 'N {list(_UNIT_US)}', got {bucket!r}"
        )
    return n * _UNIT_US[unit]


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str | list[str] | None = None,
    bucket: str = "1 hour",
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of rows whose CLOSED intervals
    ``[left_start, left_end]`` and ``[right_start, right_end]``
    overlap, optionally also matching on ``by`` key column(s).
    Right-side columns that clash with left names arrive suffixed.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    rename = {
        c: c + suffix
        for c in right.columns
        if c in left.columns and c not in by
    }
    for old, new in rename.items():
        right = right.withColumnRenamed(old, new)
    r_start = rename.get(right_start, right_start)
    r_end = rename.get(right_end, right_end)

    width = _bucket_width_us(bucket)

    def aligned(col: str):
        # epoch-aligned bucket index: identical phase on both sides
        # for any width, unlike per-row date_trunc + stepping.
        # cast-to-timestamp first: unix_micros rejects TIMESTAMP_NTZ.
        return F.expr(f"unix_micros(cast({col} as timestamp)) div {width}")

    def banded(df: DataFrame, start: str, end: str) -> DataFrame:
        seq = F.sequence(aligned(start), aligned(end))
        return df.withColumn("__rj_bucket", F.explode(seq))

    lb = banded(left, left_start, left_end)
    rb = banded(right, r_start, r_end)
    overlap = (F.col(left_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(left_end)
    )
    # A pair overlapping k shared buckets appears k times; keep only
    # the overlap's FIRST bucket — exactly one row per matching pair
    # without a dropDuplicates() (which would both collapse genuinely
    # duplicate input rows and force a full-width shuffle).
    first_shared = F.greatest(aligned(left_start), aligned(r_start))
    return (
        lb.join(rb, on=by + ["__rj_bucket"])
        .filter(overlap & (F.col("__rj_bucket") == first_shared))
        .drop("__rj_bucket")
    )
