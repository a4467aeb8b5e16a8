"""Interval-overlap (range) join — natively missing from open-source
Spark: a join on ``l.start <= r.end AND r.start <= l.end`` with no
equality key plans as BroadcastNestedLoopJoin, O(|L|·|R|) compute
that only works while one side is broadcastable.

Physical plan here — the TIME-BUCKET construction:

1. explode each interval into the fixed-width buckets it covers
   (``sequence(date_trunc(bucket, start), ..., step)``);
2. equi-join on (by-keys, bucket) — a plain shuffle join Catalyst
   handles like any other, AQE-skew-splittable;
3. filter to true overlap, dedupe pairs that shared several buckets.

Candidate volume is sum(interval_len / bucket_width) per side, not
|L|·|R|: pick ``bucket`` near the typical interval length. Very long
intervals fan out into many buckets — cap them upstream or widen the
bucket (the same discipline as LSH bucket caps, docs/SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = ("week", "day", "hour", "minute", "second")


def _trunc_unit(bucket: str) -> str:
    unit = bucket.strip().split()[-1].rstrip("s").lower()
    if unit not in _UNITS:
        raise ValueError(f"bucket unit must be one of {_UNITS}, got {bucket!r}")
    return unit


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

    unit = _trunc_unit(bucket)

    def banded(df: DataFrame, start: str, end: str) -> DataFrame:
        seq = F.expr(
            f"sequence(date_trunc('{unit}', {start}),"
            f" date_trunc('{unit}', {end}), interval {bucket})"
        )
        return df.withColumn("__rj_bucket", F.explode(seq))

    lb = banded(left, left_start, left_end)
    rb = banded(right, r_start, r_end)
    overlap = (F.col(left_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(left_end)
    )
    return (
        lb.join(rb, on=by + ["__rj_bucket"])
        .filter(overlap)
        .drop("__rj_bucket")
        .dropDuplicates()
    )
