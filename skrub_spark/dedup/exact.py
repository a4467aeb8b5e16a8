"""Exact deduplication (LLM-pipeline operator, SURVEY.md §2).

One hash-groupBy over the content column: canonical row = min id per
distinct content. Map-side partial aggregation makes this one
shuffle of (hash, id) pairs, never the payloads — at 100 TB dedup
we aggregate on ``xxhash64(content)`` so the shuffle carries 8-byte
keys instead of document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    keep_content: bool = False,
) -> DataFrame:
    """One row per distinct content: canonical (min) id + duplicate
    count. Group key is the 64-bit content hash, not the content."""
    h = F.xxhash64(F.col(content_col)).alias("content_hash")
    aggs = [
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_duplicates"),
    ]
    if keep_content:
        aggs.append(F.first(content_col).alias(content_col))
    return df.select(h, id_col, *( [content_col] if keep_content else [] )).groupBy(
        "content_hash"
    ).agg(*aggs)


def drop_exact_duplicates(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep only canonical rows (min id per distinct content)."""
    canon = dedup_exact(df, content_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(canon, on=id_col, how="left_semi")
