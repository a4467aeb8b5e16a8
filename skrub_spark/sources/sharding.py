"""Training-shard writer — the sink end of the packing pipeline
(SURVEY.md §2, beyond-reference).

``pack_training_chunks`` assigns every document an exact
(start_chunk, end_chunk, chunk_offset) inside its shard; this module
writes that corpus read-optimized for a sequential training loader:

- ``partitionBy(shard)``: each shard is its own directory, so a
  data-parallel trainer maps shard -> worker with partition pruning
  (no full-corpus listing per worker).
- one ``repartition`` on the shard key co-locates each shard in one
  task; ``sortWithinPartitions(order)`` makes every parquet file
  internally ordered by packing position, so the loader streams
  chunks in order without a sort.
- ``maxRecordsPerFile`` bounds file sizes for object-store-friendly
  reads at 100 TB (many mid-size files beat one giant file per
  shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    shard_cols: str | list[str] = "shard",
    order_col: str = "start_chunk",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a packed corpus as per-shard parquet directories whose
    files are internally sorted by ``order_col``."""
    shard_cols = [shard_cols] if isinstance(shard_cols, str) else list(shard_cols)
    out = df.repartition(*[F.col(c) for c in shard_cols]).sortWithinPartitions(
        *shard_cols, order_col
    )
    writer = out.write.mode(mode).partitionBy(*shard_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)


def read_training_shards(
    spark: SparkSession, path: str, shard=None, shard_col: str = "shard"
) -> DataFrame:
    """Read shards back; ``shard=`` prunes to one shard's directory
    (PartitionFilters at the scan, no full-corpus read)."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.filter(F.col(shard_col) == shard)
    return df
