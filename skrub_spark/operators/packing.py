"""Training-chunk packing — GPT-style sequence packing: the corpus
is (logically) concatenated in a deterministic order and cut into
fixed-size token chunks; documents straddle cut points. Each doc's
chunk assignment is pure arithmetic on the running token count:

    start_chunk = floor(cumsum_before / chunk_tokens)
    end_chunk   = floor((cumsum_after - 1) / chunk_tokens)

One running-sum window per shard — no sequential driver loop, no
Python. Sharding (``by``) bounds the window's sort: at 100 TB you
pack per shard (the standard practice — each shard feeds one data-
loader stream) so no global sort ever happens; within a shard the
order column makes the packing bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_training_chunks(
    df: DataFrame,
    token_col: str,
    chunk_tokens: int,
    order_col: str,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Adds ``start_chunk`` / ``end_chunk`` (0-based, inclusive) and
    ``chunk_offset`` (token offset of the doc inside its first
    chunk). Zero-token docs get start_chunk = end_chunk = the chunk
    they fall at, offset included, spanning no tokens.

    ``order_col`` must be unique within each shard — ties make the
    running sum (and thus the packing) order-ambiguous."""
    by = [by] if isinstance(by, str) else list(by or [])
    w = (
        Window.partitionBy(*by)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ct = int(chunk_tokens)
    # `div` keeps the arithmetic in exact 64-bit integers — float
    # division would silently lose token-offset precision once the
    # per-shard cumulative count passes 2^53.
    tmp = df.select(
        "*", F.sum(F.col(token_col).cast("long")).over(w).alias("__cum")
    )
    before = f"(__cum - CAST({token_col} AS BIGINT))"
    return tmp.select(
        "*",
        F.expr(f"{before} div {ct}").alias("start_chunk"),
        F.expr(f"greatest(__cum - 1, {before}) div {ct}").alias("end_chunk"),
        F.expr(f"pmod({before}, {ct})").alias("chunk_offset"),
    ).drop("__cum")
