"""BM25 lexical ranked retrieval over a document table.

The similarity stack (``skrub_spark/similarity/``) covers the DENSE
half of retrieval; this is the SPARSE half — Robertson/Spärck-Jones
BM25 with the Lucene idf, the scoring function every
hybrid-retrieval training-data pipeline runs next to its embedding
index (and the standard way to mine hard negatives at corpus scale).
Complements the reference's string-similarity encoders
(reference: ``skrub/_string_distances.py`` stops at n-gram
similarity; it has no corpus-level ranking function).

Scale design:
- Tokenization is one JVM regexp split (map-only). Postings are
  FILTERED TO THE QUERY TERMS *before* the (doc, term) groupBy, so
  the shuffle carries only matching postings — at 100 TB a 5-term
  query shuffles ~5 terms' postings, not the corpus vocabulary.
- Corpus stats (N, avgdl) are one scalar aggregate broadcast back;
  per-term df is a groupBy over the already-filtered postings
  (≤ |query| rows) joined broadcast.
- Per-(doc, term) contributions are rounded to 6dp and summed as
  DECIMAL(28,6) — exact integer arithmetic underneath, so the score
  (and therefore the top-k ORDER) is partitioning-invariant and
  replays bit-identically in any engine. Every other operation is a
  single IEEE op on identical inputs; `ln` at 6dp is the same
  cross-engine contract the LM-perplexity oracle already pins.
- ``bm25_topk``'s ordering key is (exact decimal score DESC, doc_id)
  → deterministic top-k via TakeOrdered, no global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bm25_tokens(col: Column) -> Column:
    """Lowercased alphanumeric terms (empty strings removed)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing ≥1 query term.

    Returns (id_col, n_hit, score) where score =
    Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) · tf(k1+1) /
    (tf + k1(1 − b + b·dl/avgdl)), each term contribution rounded
    to 6dp and summed exactly."""
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("empty query")

    toks = docs.select(
        F.col(id_col), bm25_tokens(F.col(text_col)).alias("__toks")
    )
    lens = toks.select(id_col, F.size("__toks").alias("dl"))
    # scalar corpus stats: one aggregate pass, broadcast back
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    # postings restricted to the query terms BEFORE the shuffle
    post = (
        toks.select(id_col, F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = post.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    j = (
        post.join(F.broadcast(df_t), "term")
        .join(lens, id_col)
        .join(F.broadcast(stats))
    )
    n = F.col("n_docs").cast("double")
    dfc = F.col("df").cast("double")
    idf = F.log(
        F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
    )
    avgdl = F.col("total_dl").cast("double") / n
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - float(b))
        + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * tf * F.lit(float(k1) + 1.0) / denom
    per_term = j.select(
        id_col,
        F.round(contrib, 6).cast("decimal(28,6)").alias("c_q"),
    )
    return per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.sum("c_q").cast("double").alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by (score DESC, id ASC) — planned as TakeOrdered."""
    terms = [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]
    scored = bm25_scores(
        docs, terms, text_col=text_col, id_col=id_col, k1=k1, b=b
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(int(k))
