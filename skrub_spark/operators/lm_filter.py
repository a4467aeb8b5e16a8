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
    flag (``avg_nll <= max_avg_nll``; unscoreable docs are dropped).
    Pass a :class:`KNTrigramLM` (r10) for Kneser-Ney smoothing; an
    :class:`NgramLM` scores add-alpha as before."""
    if isinstance(lm, KNTrigramLM):
        scores = score_kn_perplexity(
            df, lm, text_col=text_col, id_col=id_col
        )
    else:
        scores = score_ngram_perplexity(
            df, lm, alpha=alpha, text_col=text_col, id_col=id_col
        )
    return df.join(scores, id_col).withColumn(
        "keep",
        F.col("avg_nll").isNotNull() & (F.col("avg_nll") <= F.lit(max_avg_nll)),
    )


# ---------------------------------------------------------------------
# Kneser-Ney interpolated trigram (r10, VERDICT r9 #2): the real
# CCNet stack scores with a KenLM 5-gram; this is the same
# interpolated-KN construction at order 3, kept fully relational:
# every count table (trigram counts, context stats, continuation
# counts) is a DataFrame — vocabulary stays unbounded — and the
# absolute discounts D_k = n1/(n1 + 2 n2) come from one extra
# count-of-counts groupBy per order, rounded to 6dp so both engines
# share exact literals. Scoring is the proven discipline: exact
# integer counts -> one fixed-parenthesization double expression ->
# -ln rounded 6dp -> DECIMAL(28,6) sum (order-independent).


@dataclass
class KNTrigramLM:
    """Interpolated Kneser-Ney trigram LM as DataFrames + scalars.

    Frames (all persisted, all keyed by space-joined word strings):
    - tri_counts:  (kn_ctx2, kn_w3, c3)        trigram counts
    - ctx2_stats:  (kn_ctx2, c2ctx, n1p_ctx)   Σc3 / distinct w3
    - bi_cont:     (kn_w2, kn_w3, nc)          N1+(• w2 w3)
    - w2_stats:    (kn_w2, ncs, n_after)       N1+(• w2 •) / N1+(w2 •)
    - uni_cont:    (kn_w, n1p)                 N1+(• w)
    Scalars: t_types = N1+(• •) (total bigram types), u_types = rows
    of uni_cont, vocab_size (+1 slot for unseen), discounts d1/d2/d3.
    """

    tri_counts: DataFrame
    ctx2_stats: DataFrame
    bi_cont: DataFrame
    w2_stats: DataFrame
    uni_cont: DataFrame
    vocab_size: float
    t_types: float
    u_types: float
    d1: float
    d2: float
    d3: float


def _tri_occurrences(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """(.., kn_ctx2, kn_w2, kn_w3) trigram occurrence rows."""
    from ..functions.text import _shifted_shingles
    from ..session import fan_out

    words = words_az09(text_col)
    nw = F.size(words)
    width = nw - 2
    ctx2 = F.slice(_shifted_shingles(words, 2, " "), 1, width)
    w2 = F.slice(words, 2, width)
    w3 = F.slice(words, 3, width)
    empty = F.array().cast("array<string>")
    has = nw >= 3
    return (
        fan_out(df.select(*id_cols, F.col(text_col)))
        .select(
            *id_cols,
            F.explode(
                F.arrays_zip(
                    F.when(has, ctx2).otherwise(empty).alias("c"),
                    F.when(has, w2).otherwise(empty).alias("m"),
                    F.when(has, w3).otherwise(empty).alias("w"),
                )
            ).alias("p"),
        )
        .select(
            *id_cols,
            F.col("p.c").alias("kn_ctx2"),
            F.col("p.m").alias("kn_w2"),
            F.col("p.w").alias("kn_w3"),
        )
    )


def _discount(counts: DataFrame, col: str) -> float:
    """Absolute discount n1/(n1 + 2 n2) from one count-of-counts
    aggregate, clamped into [0.05, 0.95] then 6dp-rounded (0.5
    fallback for degenerate corpora). The clamp is load-bearing: a
    corpus where no type has count 1 gives n1 = 0 -> D = 0, which
    zeroes the unseen-word interpolation floor and makes -ln blow
    up (observed at sf0.1); KenLM bounds its discounts the same
    way."""
    r = counts.agg(
        F.count(F.when(F.col(col) == 1, 1)).alias("n1"),
        F.count(F.when(F.col(col) == 2, 1)).alias("n2"),
    ).first()
    n1, n2 = int(r["n1"]), int(r["n2"])
    if n1 + 2 * n2 == 0:
        return 0.5
    return round(min(max(n1 / (n1 + 2.0 * n2), 0.05), 0.95), 6)


def train_kn_trigram(df: DataFrame, text_col: str = "text") -> KNTrigramLM:
    """Train the interpolated-KN trigram model on the trusted corpus.

    Driver state: six scalars. Everything else stays distributed —
    two explode+groupBy passes (trigrams, bigram types) plus
    codebook-free derived aggregations of the count frames."""
    occ = _tri_occurrences(df, text_col, [])
    tri_counts = (
        occ.groupBy("kn_ctx2", "kn_w2", "kn_w3")
        .agg(F.count(F.lit(1)).alias("c3"))
        .persist()
    )
    ctx2_stats = (
        tri_counts.groupBy("kn_ctx2")
        .agg(
            F.sum("c3").alias("c2ctx"),
            F.count(F.lit(1)).alias("n1p_ctx"),
        )
        .persist()
    )
    bi_cont = (
        tri_counts.groupBy("kn_w2", "kn_w3")
        .agg(F.count(F.lit(1)).alias("nc"))
        .persist()
    )
    w2_stats = (
        bi_cont.groupBy("kn_w2")
        .agg(F.sum("nc").alias("ncs"), F.count(F.lit(1)).alias("n_after"))
        .persist()
    )
    # unigram continuation counts from DISTINCT bigram types
    from ..session import fan_out

    words = words_az09(text_col)
    nw = F.size(words)
    empty = F.array().cast("array<string>")
    has = nw >= 2
    bt = (
        fan_out(df.select(F.col(text_col)))
        .select(
            F.explode(
                F.arrays_zip(
                    F.when(has, F.slice(words, 1, nw - 1))
                    .otherwise(empty)
                    .alias("a"),
                    F.when(has, F.slice(words, 2, nw - 1))
                    .otherwise(empty)
                    .alias("b"),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("w1"), F.col("p.b").alias("wb"))
        .distinct()
    )
    uni_cont = (
        bt.groupBy(F.col("wb").alias("kn_w"))
        .agg(F.count(F.lit(1)).alias("n1p"))
        .persist()
    )
    sc = uni_cont.agg(
        F.sum("n1p").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("u"),
    ).first()
    t_types, u_types = float(sc["t"] or 0), float(sc["u"] or 0)
    if t_types <= 0:
        raise ValueError(
            "train_kn_trigram: corpus has no bigrams — cannot build "
            "continuation counts"
        )
    vocab = (
        df.select(F.explode(words_az09(text_col)).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )
    return KNTrigramLM(
        tri_counts=tri_counts,
        ctx2_stats=ctx2_stats,
        bi_cont=bi_cont,
        w2_stats=w2_stats,
        uni_cont=uni_cont,
        vocab_size=float(int(vocab) + 1),
        t_types=t_types,
        u_types=u_types,
        d1=_discount(uni_cont, "n1p"),
        d2=_discount(bi_cont, "nc"),
        d3=_discount(tri_counts, "c3"),
    )


def score_kn_perplexity(
    df: DataFrame,
    lm: KNTrigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the KN
    trigram model: ``(id_col, n_ngrams, avg_nll)``; docs with fewer
    than 3 words score NULL.

    The probability expression is a FIXED parenthesization over
    exact integer counts (the DuckDB oracle mirrors it verbatim):
      p1 = greatest(n1p − D1, 0)/T + ((D1·U)/T)·(1/V)
      p2 = ncs>0 ? greatest(nc − D2, 0)/ncs + ((D2·n_after)/ncs)·p1
                 : p1
      p3 = c2ctx>0 ? greatest(c3 − D3, 0)/c2ctx
                     + ((D3·n1p_ctx)/c2ctx)·p2
                   : p2
    Unseen words/contexts fall through the interpolation floor
    (never zero), so -ln is always finite."""
    occ = _tri_occurrences(df, text_col, [id_col])
    j = (
        occ.join(
            lm.tri_counts.select("kn_ctx2", "kn_w3", "c3"),
            ["kn_ctx2", "kn_w3"],
            "left",
        )
        .join(lm.ctx2_stats, "kn_ctx2", "left")
        .join(lm.bi_cont, ["kn_w2", "kn_w3"], "left")
        .join(lm.w2_stats, "kn_w2", "left")
        .join(
            lm.uni_cont.withColumnRenamed("kn_w", "kn_w3"), "kn_w3", "left"
        )
    )
    d1, d2, d3 = F.lit(lm.d1), F.lit(lm.d2), F.lit(lm.d3)
    t, u, v = F.lit(lm.t_types), F.lit(lm.u_types), F.lit(lm.vocab_size)
    n1p = F.coalesce(F.col("n1p"), F.lit(0)).cast("double")
    nc = F.coalesce(F.col("nc"), F.lit(0)).cast("double")
    ncs = F.coalesce(F.col("ncs"), F.lit(0)).cast("double")
    n_after = F.coalesce(F.col("n_after"), F.lit(0)).cast("double")
    c3 = F.coalesce(F.col("c3"), F.lit(0)).cast("double")
    c2ctx = F.coalesce(F.col("c2ctx"), F.lit(0)).cast("double")
    n1p_ctx = F.coalesce(F.col("n1p_ctx"), F.lit(0)).cast("double")
    p1 = F.greatest(n1p - d1, F.lit(0.0)) / t + ((d1 * u) / t) * (
        F.lit(1.0) / v
    )
    p2 = F.when(
        ncs > 0,
        F.greatest(nc - d2, F.lit(0.0)) / ncs
        + ((d2 * n_after) / ncs) * p1,
    ).otherwise(p1)
    p3 = F.when(
        c2ctx > 0,
        F.greatest(c3 - d3, F.lit(0.0)) / c2ctx
        + ((d3 * n1p_ctx) / c2ctx) * p2,
    ).otherwise(p2)
    scored = j.withColumn("nll_q", F.round(-F.log(p3), 6).cast("decimal(28,6)"))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        (F.sum("nll_q").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
    )
    ids = df.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
        F.col("avg_nll").cast("double").alias("avg_nll"),
    )
