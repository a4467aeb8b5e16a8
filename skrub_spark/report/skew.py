"""Key-skew diagnostic: the "does this join need salting?" report.

The repo HAS the skew remedies (`operators/salting.py`, AQE
skew-join, broadcast); this is the observability side that tells you
WHEN to reach for them: the per-key weight distribution of a
prospective join/groupBy key. On a 1000-executor cluster one
hot key = one straggler task holding the stage; the standard gate is
"top key share > 1/shuffle_partitions ⇒ salt it".

Shape: ONE map-side-combined groupBy on the key (the same shuffle
the join itself would do, but counting 8-byte keys, not payloads),
then top-k via TakeOrdered (no global sort) with totals riding on a
broadcast scalar. Shares and cumulative shares are single IEEE
divisions of exact counts — engine-replayable (battery oracle
``key_skew_report``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame, key: Column | str, top_k: int = 20
) -> DataFrame:
    """Top-``top_k`` keys by row count with share and cumulative
    share: (key, cnt, rank, share, cum_share). Ties break by key
    value, so the report is deterministic. ``cum_share`` answers
    "how much of the shuffle do the top-N keys own"; compare
    ``share`` of rank 1 against 1/shuffle_partitions to decide on
    salting."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(int(top_k))
        .join(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return top.select(
        "key",
        F.col("cnt").cast("long").alias("cnt"),
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("key").asc()))
        .cast("int")
        .alias("rank"),
        (F.col("cnt").cast("double") / F.col("__total").cast("double"))
        .alias("share"),
        (
            F.sum("cnt").over(w).cast("double")
            / F.col("__total").cast("double")
        ).alias("cum_share"),
    )
