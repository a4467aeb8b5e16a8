"""Bucketed-table helpers (SURVEY.md §4: co-located joins).

Bucketing pre-shuffles a table by key at WRITE time: two tables
bucketed the same way join with ZERO exchange — at 100 TB this is
the difference between re-shuffling the fact table on every join
and never shuffling it at all. These helpers wrap the saveAsTable
bucketed-write path and verify co-location."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    ``mode='overwrite'`` really overwrites: saveAsTable refuses a
    managed-table location left on disk by a PREVIOUS session (the
    catalog forgot the table but the directory survived), so drop
    the catalog entry and clear the stale location first."""
    if mode == "overwrite":
        import os
        import shutil
        from urllib.parse import urlparse

        spark = df.sparkSession
        parts = table_name.split(".")
        if len(parts) == 2:
            db, tbl = parts
            quoted = f"`{db}`.`{tbl}`"
            rel = os.path.join(f"{db.lower()}.db", tbl.lower())
        elif len(parts) == 1:
            quoted = f"`{table_name}`"
            rel = table_name.lower()
        else:
            raise ValueError(f"unsupported table name {table_name!r}")
        spark.sql(f"DROP TABLE IF EXISTS {quoted}")
        wh = spark.conf.get("spark.sql.warehouse.dir")
        wh_path = urlparse(wh).path or wh
        shutil.rmtree(os.path.join(wh_path, rel), ignore_errors=True)
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    force_sortmerge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucketing Spark
    plans a shuffle-free sort-merge join.

    ``force_sortmerge`` adds a merge-join hint so a broadcast-sized
    right table still exercises the co-located path (the point of
    bucketing is the 100 TB case where nothing is broadcastable) —
    a hint, unlike flipping autoBroadcastJoinThreshold on the shared
    session, can't leak into later queries."""
    on = [on] if isinstance(on, str) else on
    right = spark.table(right_table)
    if force_sortmerge:
        right = right.hint("merge")
    return spark.table(left_table).join(right, on=on)


def join_is_shuffle_free(df: DataFrame) -> bool:
    """True if the plan contains no shuffle exchange (co-located
    bucketed join). A BroadcastExchange doesn't count — it moves the
    small side only, not the bucketed data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
