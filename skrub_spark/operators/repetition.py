"""Gopher-style repetition quality filters (beyond-reference
LLM-pipeline operator, SURVEY.md §2).

Rae et al., "Scaling Language Models: ... Gopher" (arXiv:2112.11446,
Appendix A1) filter pre-training documents by REPETITION: fraction
of duplicate lines, fraction of characters inside duplicate lines,
and the share of the most frequent word. Those signals are pure
relational algebra — explode lines/words, count per (doc, item),
aggregate per doc — so this runs as two groupBy pipelines joined on
the doc id (map-side partial aggregation, no UDFs, no per-row O(n²)
higher-order funcs) and scales like any other aggregation.

Thresholds follow the paper's defaults loosely: a document is kept
when dup_line_frac <= 0.30, dup_line_char_frac <= 0.20 and
top_word_frac <= 0.20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lines, words_az09


def repetition_stats(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals:

    - ``n_lines``, ``dup_line_frac``: 1 - distinct/total over
      non-empty trimmed lines,
    - ``dup_line_char_frac``: characters inside lines occurring more
      than once / all line characters,
    - ``n_words``, ``top_word_frac``: share of the most frequent
      [a-z0-9]+ word.

    Documents with no lines/words get 0.0 fractions.
    """
    ids = df.select(F.col(id_col).alias("id"))

    line_rows = df.select(
        F.col(id_col).alias("id"), F.explode(lines(content_col)).alias("line")
    )
    line_counts = line_rows.groupBy("id", "line").agg(
        F.count(F.lit(1)).alias("c")
    )
    line_agg = line_counts.groupBy("id").agg(
        F.sum("c").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(0)
        ).alias("dup_chars"),
        F.sum(F.col("c") * F.length("line")).alias("tot_chars"),
    )

    word_rows = df.select(
        F.col(id_col).alias("id"), F.explode(words_az09(content_col)).alias("w")
    )
    word_counts = word_rows.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    word_agg = word_counts.groupBy("id").agg(
        F.sum("c").alias("n_words"), F.max("c").alias("top_c")
    )

    out = (
        ids.join(line_agg, on="id", how="left")
        .join(word_agg, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce(
                (F.lit(1.0) - F.col("n_distinct") / F.col("n_lines")).cast(
                    "double"
                ),
                F.lit(0.0),
            ).alias("dup_line_frac"),
            F.coalesce(
                (F.col("dup_chars") / F.col("tot_chars")).cast("double"),
                F.lit(0.0),
            ).alias("dup_line_char_frac"),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce(
                (F.col("top_c") / F.col("n_words")).cast("double"), F.lit(0.0)
            ).alias("top_word_frac"),
        )
    )
    return out


def repetition_filter(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_word_frac: float = 0.20,
) -> DataFrame:
    """``repetition_stats`` plus a boolean ``keep`` column applying
    the Gopher-style thresholds."""
    stats = repetition_stats(df, content_col, id_col)
    keep = (
        (F.col("dup_line_frac") <= F.lit(float(max_dup_line_frac)))
        & (F.col("dup_line_char_frac") <= F.lit(float(max_dup_line_char_frac)))
        & (F.col("top_word_frac") <= F.lit(float(max_top_word_frac)))
    )
    return stats.withColumn("keep", keep)
