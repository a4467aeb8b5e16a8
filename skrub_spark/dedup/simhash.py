"""SimHash near-duplicate detection (SURVEY.md §2).

64-bit simhash per document (pure JVM expression), then candidate
generation by banding the fingerprint into b chunks — two documents
within hamming distance (b-1) share at least one identical chunk
(pigeonhole), so an equi-join on (chunk_idx, chunk_value) finds all
such pairs without an O(n²) comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hamming64, simhash64


def dedup_simhash_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    n_chunks: int = 4,
    shingle_k: int = 2,
) -> DataFrame:
    """Pairs (id_a < id_b) with simhash hamming distance <= max_hamming.
    Exact for max_hamming <= n_chunks - 1."""
    bits_per_chunk = 64 // n_chunks
    sim = simhash64(F.col(content_col), unit="word", shingle_k=shingle_k)
    base = df.select(F.col(id_col).alias("id"), sim.alias("simhash"))
    chunks = base.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.shiftleft("simhash", 64 - (i + 1) * bits_per_chunk),
                        64 - bits_per_chunk,
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, on=["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
