"""time_bucket_gapfill — hypertable-style downsampling with a dense
bucket spine (TimescaleDB's time_bucket_gapfill / InfluxDB fill()):
aggregate into fixed-width time buckets, then materialize EVERY
bucket in each key's [min, max] range, filling empty buckets per
column with ``zero``, ``locf`` (last observation carried forward) or
``null``.

Physical plan: one groupBy for the aggregate; the spine is a
per-key ``sequence()`` explode of (min, max) bucket bounds — rows
generated JVM-side in O(buckets), never a driver loop; one left
join spine←agg on (key, bucket); locf is a single
``last(ignorenulls)`` running window per key. Spine row count is
keys × range/width — independent of the fact-table size, so the
whole construction adds two narrow shuffles regardless of input
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    *,
    bucket: str = "1 hour",
    by: str | list[str] | None = None,
    fill: dict[str, str] | str = "null",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Bucketed aggregation over ``ts_col`` with gap filling.

    ``aggs``: output name -> aggregate expression.
    ``fill``: 'null' | 'zero' | 'locf', or a per-output-name dict.
    Buckets align to Spark's tumbling windows (epoch-aligned).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    agg = df.groupBy(
        *by, F.window(ts_col, bucket).getField("start").alias(bucket_col)
    ).agg(*[e.alias(n) for n, e in aggs.items()])
    bounds = agg.groupBy(*by).agg(
        F.min(bucket_col).alias("__s"), F.max(bucket_col).alias("__e")
    )
    spine = bounds.select(
        *by,
        F.explode(
            F.expr(f"sequence(__s, __e, interval {bucket})")
        ).alias(bucket_col),
    )
    out = spine.join(agg, on=by + [bucket_col], how="left")

    fills = (
        {n: fill for n in aggs} if isinstance(fill, str) else dict(fill)
    )
    unknown = set(fills) - set(aggs)
    if unknown:
        raise ValueError(f"fill refers to unknown outputs: {sorted(unknown)}")
    w = (
        Window.partitionBy(*by)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name in aggs:
        mode = fills.get(name, "null")
        if mode == "zero":
            zero = F.lit(0).cast(out.schema[name].dataType)
            out = out.withColumn(name, F.coalesce(F.col(name), zero))
        elif mode == "locf":
            out = out.withColumn(
                name, F.last(name, ignorenulls=True).over(w)
            )
        elif mode != "null":
            raise ValueError(f"unknown fill mode {mode!r} for {name}")
    return out
