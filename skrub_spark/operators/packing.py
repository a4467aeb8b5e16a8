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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (r8 late — the RAG /
    long-document splitting primitive ``pack_training_chunks``'s
    concatenate-and-cut shape doesn't cover): each document splits
    into windows of ``chunk_tokens`` whitespace tokens advancing by
    ``chunk_tokens − overlap``, the last window flush to the end.

    Pure map-only Columns: token array → chunk count by integer
    ceil-div → one explode over ``sequence`` → ``slice`` +
    ``array_join``. No shuffle, no Python, whole-stage codegen —
    and integer arithmetic only, so the SQL oracle replays every
    chunk boundary exactly (battery query ``document_chunks``).
    Returns (id_col, chunk_id, n_chunk_tokens, chunk_text)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    from ..functions.text import tokens

    stride = int(chunk_tokens) - int(overlap)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    k = F.when(n <= int(chunk_tokens), F.lit(1)).otherwise(
        (
            (n - F.lit(int(chunk_tokens)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("long")
        + F.lit(1)
    ).cast("long")
    rows = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), k - 1)).alias(
            "chunk_id"
        ),
    )
    piece = F.slice(
        F.col("__toks"),
        (F.col("chunk_id") * stride + 1).cast("int"),
        int(chunk_tokens),
    )
    return rows.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
