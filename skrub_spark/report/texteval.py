"""N-gram overlap text-generation metrics (r12 — the eval half of
the SFT/preference pipeline: once `preference_pairs` builds the
training data and a model produces candidates, ROUGE-N and BLEU are
the standard reference-overlap scores; reference
`skrub/_text_encoder.py` is the only text-scoring surface skrub has,
so these are beyond-reference LLM-pipeline operators, SURVEY.md §2).

Both metrics reduce to CLIPPED n-gram counts — per (pair, gram),
``min(count_in_candidate, count_in_reference)`` — which is pure
relational algebra: shingle both sides, one groupBy per side to
per-(pair, gram) counts, one equi-join, one sum. Exact integers
until the final ratio; every division is a single IEEE op on
6dp-rounded inputs, so the DuckDB oracle replays the scores
bit-for-bit (battery queries ``rouge_eval``, ``bleu_corpus``).

Tokenization is the RE2-replayable ``words_az09``.

100 TB shape: everything is explode → map-side-combined groupBy →
equi-join on (pair_id, gram) — no windows, no driver state, no
Python. BLEU runs one count/join subtree per gram order — kept as
independent plan branches the scheduler overlaps — and folds every
order's total k-gram count into the single corpus-length scan
(``Σ max(n_words − k + 1, 0)``), so no subtree executes twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_az09


def _gram_counts(
    df: DataFrame, text_col: str, id_col: str, n: int, side: str
) -> DataFrame:
    """Per-(id, gram) occurrence counts of ``n``-grams.

    r13 (guide §1.2 per-task work): the words array is materialized
    as a BOUND COLUMN in its own projection before the per-gram
    lambda — interpreted HOF lambdas re-evaluate their subexpression
    tree per element, so referencing the ``words_az09`` expression
    inside the slice re-ran the full regex split once PER GRAM
    (O(n_words²) regex work per row; same trap the span-dedup window
    keys had). ``__w`` is referenced three times, which keeps
    CollapseProject from inlining it back. Gram strings are
    bit-identical (same slices, same join)."""
    base = df.select(
        F.col(id_col).alias("pid"), words_az09(text_col).alias("__w")
    )
    nw = F.size("__w")
    has = nw >= n
    gram = F.transform(
        F.sequence(F.lit(1), nw - (n - 1)),
        lambda i: F.array_join(F.slice(F.col("__w"), i, n), " "),
    )
    empty = F.array().cast("array<string>")
    return (
        base.select(
            "pid",
            F.explode(F.when(has, gram).otherwise(empty)).alias("g"),
        )
        .groupBy("pid", "g")
        .agg(F.count(F.lit(1)).cast("long").alias(side))
    )


def rouge_n(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    *,
    n: int = 2,
) -> DataFrame:
    """Per-pair ROUGE-N (Lin 2004): clipped n-gram overlap between a
    candidate and its reference. Returns ``(id_col, n_cand, n_ref,
    overlap, precision, recall, f1)`` — counts exact integers;
    precision = overlap/n_cand, recall = overlap/n_ref,
    f1 = 2·overlap/(n_cand+n_ref) (the algebraic 2PR/(P+R) — one
    IEEE division each, rounded 6dp). Pairs where either side has
    fewer than n words score NULL ratios with zero counts."""
    if n < 1:
        raise ValueError("rouge_n: n must be >= 1")
    cc = _gram_counts(pairs, cand_col, id_col, n, "nc")
    rc = _gram_counts(pairs, ref_col, id_col, n, "nr")
    ov = (
        cc.join(rc, ["pid", "g"])
        .groupBy("pid")
        .agg(F.sum(F.least("nc", "nr")).cast("long").alias("overlap"))
    )
    tot_c = cc.groupBy("pid").agg(F.sum("nc").cast("long").alias("n_cand"))
    tot_r = rc.groupBy("pid").agg(F.sum("nr").cast("long").alias("n_ref"))
    base = pairs.select(F.col(id_col).alias("pid")).distinct()
    j = (
        base.join(tot_c, "pid", "left")
        .join(tot_r, "pid", "left")
        .join(ov, "pid", "left")
        .select(
            "pid",
            F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
        )
    )
    nc = F.col("n_cand").cast("double")
    nr = F.col("n_ref").cast("double")
    o = F.col("overlap").cast("double")
    return j.select(
        F.col("pid").alias(id_col),
        "n_cand",
        "n_ref",
        "overlap",
        F.when(F.col("n_cand") > 0, F.round(o / nc, 6)).alias("precision"),
        F.when(F.col("n_ref") > 0, F.round(o / nr, 6)).alias("recall"),
        F.when(
            F.col("n_cand") + F.col("n_ref") > 0,
            F.round(F.lit(2.0) * o / (nc + nr), 6),
        ).alias("f1"),
    )


def bleu_corpus(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    *,
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (Papineni 2002): geometric mean of the
    modified (clipped) n-gram precisions p_1..p_max_n over the
    WHOLE corpus, times the brevity penalty
    ``BP = min(1, exp(1 − ref_len/cand_len))``. One row:
    ``(n_pairs, cand_len, ref_len, p1..p{max_n}, bp, bleu)`` — all
    counts exact integers summed corpus-wide; each p_k one IEEE
    division rounded 6dp; bleu = BP · exp(Σ ln p_k / max_n) on the
    ROUNDED p_k (so the oracle replays it), rounded 6dp, NULL when
    any p_k is zero (the standard smoothing-free convention)."""
    if max_n < 1:
        raise ValueError("bleu_corpus: max_n must be >= 1")
    ks = list(range(1, max_n + 1))
    # r12-opt: each order used to re-execute its candidate-count
    # subtree a SECOND time just for the total k-gram count — the
    # totals now come for free from the single `lens` scan as exact
    # ``Σ max(n_words − k + 1, 0)`` (identical to summing the
    # per-(pid, gram) counts: every k-gram of a doc with ≥ k words
    # is counted once), removing max_n of the 3·max_n corpus
    # subtree executions. The per-order count/join subtrees stay
    # SEPARATE deliberately: they are independent plan branches the
    # scheduler overlaps across cores, and an interleaved A/B of
    # the fully-fused single-pass variant (one tagged explode +
    # one groupBy for all orders) measured ~30% SLOWER at sf0.1
    # (serial stage chain vs 2·max_n concurrent subtrees). Values
    # are bit-identical.
    ov_row = None
    for k in ks:
        cc = _gram_counts(pairs, cand_col, id_col, k, "nc")
        rc = _gram_counts(pairs, ref_col, id_col, k, "nr")
        ov_k = cc.join(rc, ["pid", "g"]).agg(
            F.coalesce(F.sum(F.least("nc", "nr")), F.lit(0))
            .cast("long")
            .alias(f"__ov{k}")
        )
        ov_row = (
            ov_k if ov_row is None else ov_row.crossJoin(F.broadcast(ov_k))
        )
    cw = F.size(words_az09(cand_col))
    lens = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.size(words_az09(cand_col)))
        .cast("long")
        .alias("cand_len"),
        F.sum(F.size(words_az09(ref_col))).cast("long").alias("ref_len"),
        *[
            F.coalesce(
                F.sum(F.greatest(cw - (k - 1), F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias(f"__tot{k}")
            for k in ks
        ],
    )
    out = lens.crossJoin(F.broadcast(ov_row)).select(
        "*",
        *[
            F.round(
                F.col(f"__ov{k}").cast("double")
                / F.greatest(F.col(f"__tot{k}"), F.lit(1)).cast("double"),
                6,
            ).alias(f"p{k}")
            for k in ks
        ],
    )
    bp = F.round(
        F.least(
            F.lit(1.0),
            F.exp(
                F.lit(1.0)
                - F.col("ref_len").cast("double")
                / F.greatest(F.col("cand_len"), F.lit(1)).cast("double")
            ),
        ),
        6,
    )
    logsum = None
    for k in range(1, max_n + 1):
        t = F.log(F.col(f"p{k}"))
        logsum = t if logsum is None else logsum + t
    allpos = None
    for k in range(1, max_n + 1):
        c = F.col(f"p{k}") > 0
        allpos = c if allpos is None else (allpos & c)
    return out.select(
        "n_pairs",
        "cand_len",
        "ref_len",
        *[f"p{k}" for k in range(1, max_n + 1)],
        bp.alias("bp"),
        F.when(
            allpos,
            F.round(bp * F.exp(logsum / F.lit(float(max_n))), 6),
        ).alias("bleu"),
    )
