"""TF-IDF keyword extraction — the per-document salient-terms
operator (search indexing, topic labeling, near-dup triage).

Builds on the same whitespace tokenizer the dedup/BM25 family uses
(``functions/text.py::tokens``; reference n-gram machinery parity:
``skrub/_string_distances.py:1``). Shape at 100 TB:

- term frequencies: ONE map-side-combined groupBy on
  ``(doc_id, term)`` — the only corpus-sized shuffle;
- document frequencies reduce the tf frame by term (vocab-sized);
- the vocab-sized idf frame BROADCASTS back onto tf (no second
  corpus shuffle);
- top-k per doc is a window partitioned BY DOCUMENT (bounded
  frame, never a global sort).

``idf = round(ln(n_docs/df), 6)`` and ``score = round(tf·idf, 6)``
follow the proven cross-engine float bridge (ln at 6dp, fixed
operand order), so ranking and scores replay bit-identically in SQL
(battery oracle ``keywords_tfidf``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` terms per document by TF-IDF:
    ``(id_col, term, tf, df, score, kw_rank)``. Ties break by term
    (ascending), so the ranking is deterministic; documents with no
    tokens yield no rows."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    # tf is a branch point (both the scores and the df/idf reduce
    # consume it) — persist, or the corpus explode + groupBy runs
    # twice (the q_pretraining_pipeline lesson)
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).persist()
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("__nd"))
    idf = df_.join(F.broadcast(n)).select(
        "term",
        "df",
        F.round(
            F.log(F.col("__nd").cast("double") / F.col("df").cast("double")),
            6,
        ).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(F.col("tf").cast("double") * F.col("idf"), 6).alias(
            "score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn(
            "kw_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("kw_rank") <= F.lit(int(top_k)))
    )
