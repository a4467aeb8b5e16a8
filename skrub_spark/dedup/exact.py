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


def dedup_incremental(
    new_df: DataFrame,
    seen_df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ingest dedup: rows of ``new_df`` that survive
    against an already-ingested corpus.

    Two conditions: the content must not appear in ``seen_df`` (hash
    anti-join — both sides reduced to 8-byte ``xxhash64`` keys and
    the seen side pre-deduplicated, so the shuffle carries one row
    per DISTINCT seen content, not the corpus), and within the new
    batch itself only the canonical (min id) row per content
    survives. This is the per-snapshot shape of CommonCrawl-style
    pipelines: each crawl dedups against all previous crawls without
    re-reading their payloads — at 100 TB ``seen_df`` is just the
    persisted hash column of prior snapshots."""
    seen_hashes = seen_df.select(
        F.xxhash64(F.col(content_col)).alias("content_hash")
    ).distinct()
    new_h = new_df.withColumn("content_hash", F.xxhash64(F.col(content_col)))
    fresh = new_h.join(seen_hashes, "content_hash", "left_anti")
    canon = fresh.groupBy("content_hash").agg(
        F.min(id_col).alias(id_col)
    )
    return (
        # dropDuplicates first: identical (id, content) rows repeated
        # within the batch would otherwise BOTH match the canonical
        # (hash, id) pair and both survive
        fresh.dropDuplicates(["content_hash", id_col])
        .join(canon, ["content_hash", id_col], "left_semi")
        .drop("content_hash")
    )


def drop_exact_duplicates(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep only canonical rows (min id per distinct content)."""
    canon = dedup_exact(df, content_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(canon, on=id_col, how="left_semi")
