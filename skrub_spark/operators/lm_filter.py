"""N-gram language-model perplexity filtering (CCNet-style,
beyond-reference LLM-pipeline operator, SURVEY.md §2).

CCNet (Wenzek et al., arXiv:1911.00359) ranks Common-Crawl documents
by the perplexity of a language model trained on a trusted corpus and
keeps the low-perplexity head. The same shape works with an add-alpha
smoothed n-gram LM, and — crucially for 100 TB — both phases are pure
relational algebra:

- **train**: explode documents into n-grams, ``groupBy`` counts. The
  model IS a pair of DataFrames (n-gram counts + context counts); it
  is never collected to the driver, so vocabulary size is unbounded.
- **score**: explode the target documents into n-grams, left-join the
  model counts (Spark auto-broadcasts a small model; a huge model
  degrades gracefully to a shuffle join on the n-gram key), then one
  ``groupBy(doc)`` for the mean negative log-likelihood.

Smoothing: ``p(w | ctx) = (c(ctx·w) + a) / (c(ctx) + a·V)`` with
``V`` = training vocabulary size — unseen n-grams/contexts degrade to
``a / (c(ctx) + a·V)`` / ``1/V`` instead of zeroing out.

Float determinism (for the exact DuckDB oracle
``lm_perplexity_filter``): each occurrence's negative log-prob is
rounded to 6 decimals and summed as DECIMAL(28,6) — exact,
associative, order-independent — then divided by the occurrence
count; ``ln`` of an identical IEEE quotient agrees across engines at
6 decimals. Tokenization is the RE2-replayable ``words_az09``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_az09


@dataclass
class NgramLM:
    """A distributed n-gram LM: counts stay in DataFrames."""

    n: int
    ngram_counts: DataFrame  # columns: gram, c
    ctx_counts: DataFrame  # columns: ctx, ctx_c
    vocab_size: int


def _gram_cols(text_col: str, n: int) -> tuple[Column, Column]:
    """(grams, ctxs) arrays for a document: ``grams[i]`` is the
    space-joined window of n words starting at i, ``ctxs[i]`` its
    n-1-word prefix ('' for unigrams). Reuses the shared
    shifted-slice shingle builder (functions/text.py) — linear per
    row, JVM-side."""
    from ..functions.text import _shifted_shingles

    words = words_az09(text_col)
    n_words = F.size(words)
    width = n_words - (n - 1)
    gram = _shifted_shingles(words, n, " ")
    if n == 1:
        ctx = F.transform(gram, lambda _: F.lit(""))
    else:
        # n-1-gram prefixes, truncated to align index-for-index with
        # the n-grams (one fewer window exists at the tail)
        ctx = F.slice(_shifted_shingles(words, n - 1, " "), 1, width)
    empty = F.array().cast("array<string>")
    has = n_words >= n
    return (
        F.when(has, gram).otherwise(empty),
        F.when(has, ctx).otherwise(empty),
    )


def train_ngram_lm(df: DataFrame, text_col: str = "text", n: int = 2) -> NgramLM:
    """Count n-grams and contexts over ``df`` (the trusted corpus).

    Two aggregations, map-side partially combined; the only driver
    action is the scalar vocabulary size."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams, ctxs = _gram_cols(text_col, n)
    pairs = df.select(
        F.explode(F.arrays_zip(grams.alias("gram"), ctxs.alias("ctx"))).alias("p")
    ).select(F.col("p.gram").alias("gram"), F.col("p.ctx").alias("ctx"))
    # persist the model: scoring left-joins BOTH count frames, and
    # without this each join re-executes the training explode+groupBy
    # lineage from the source scan
    ngram_counts = pairs.groupBy("gram").agg(
        F.count(F.lit(1)).alias("c")
    ).persist()
    ctx_counts = pairs.groupBy("ctx").agg(
        F.count(F.lit(1)).alias("ctx_c")
    ).persist()
    vocab = (
        df.select(F.explode(words_az09(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    return NgramLM(n=n, ngram_counts=ngram_counts, ctx_counts=ctx_counts,
                   vocab_size=int(vocab))


def score_ngram_perplexity(
    df: DataFrame,
    lm: NgramLM,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-likelihood under ``lm``.

    Returns ``id_col``, ``n_ngrams`` (n-gram occurrences scored) and
    ``avg_nll`` (lower = more in-domain; documents with fewer than n
    words score NULL). ``exp(avg_nll)`` is the perplexity — left to
    the caller, the monotone score joins/filters identically.
    """
    grams, ctxs = _gram_cols(text_col, lm.n)
    occ = df.select(
        F.col(id_col),
        F.explode(F.arrays_zip(grams.alias("gram"), ctxs.alias("ctx"))).alias("p"),
    ).select(id_col, F.col("p.gram").alias("gram"), F.col("p.ctx").alias("ctx"))
    joined = (
        occ.join(lm.ngram_counts, "gram", "left")
        .join(lm.ctx_counts, "ctx", "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .withColumn("ctx_c", F.coalesce(F.col("ctx_c"), F.lit(0)))
    )
    av = F.lit(float(alpha) * lm.vocab_size)
    nll = -F.log(
        (F.col("c") + F.lit(float(alpha))) / (F.col("ctx_c") + av)
    )
    scored = joined.withColumn(
        "nll_q", F.round(nll, 6).cast("decimal(28,6)")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        (F.sum("nll_q").cast("double") / F.count(F.lit(1)))
        .alias("avg_nll"),
    )
    ids = df.select(id_col).distinct()
    return (
        ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.col("avg_nll").cast("double").alias("avg_nll"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    lm: NgramLM,
    max_avg_nll: float,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head selection: adds ``avg_nll`` and a ``keep``
    flag (``avg_nll <= max_avg_nll``; unscoreable docs are dropped)."""
    scores = score_ngram_perplexity(
        df, lm, alpha=alpha, text_col=text_col, id_col=id_col
    )
    return df.join(scores, id_col).withColumn(
        "keep",
        F.col("avg_nll").isNotNull() & (F.col("avg_nll") <= F.lit(max_avg_nll)),
    )
