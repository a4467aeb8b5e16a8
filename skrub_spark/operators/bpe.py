"""Byte-pair-encoding tokenizer trained on the corpus (Sennrich et
al. 2015, arXiv:1508.07909 — beyond-reference LLM-pipeline operator,
SURVEY.md §2).

Token accounting for a training corpus needs a REAL subword
tokenizer, not a whitespace proxy. BPE training factors cleanly for
Spark:

- **word counting is distributed**: one explode + groupBy over the
  corpus, then ``TakeOrderedAndProject`` of the ``max_words`` most
  frequent words (a top-k, not a full sort). At 100 TB the corpus is
  petabytes but the *word frequency dict* that BPE training actually
  consumes is bounded — Zipf puts ~all occurrence mass in the head.
- **the merge loop is driver-side** on that bounded dict (classic
  incremental pair-count algorithm, deterministic tie-breaks:
  highest count, then lexicographically smallest pair), independent
  of corpus size.
- **encoding is executor-side**: an Arrow-batched ``pandas_udf``
  with the merge ranks in its closure and a per-executor word →
  tokens memo — Zipf again makes the cache hit rate ~1, so the
  greedy merge loop runs once per distinct word, not per occurrence.

No SQL engine can replay a merge loop, so the battery query
``bpe_token_stats`` is rows-only; correctness is pinned by pytest
contracts instead (hand-worked merges, a from-scratch recount
reference implementation, and round-trip/determinism properties —
tests/test_bpe.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions.text import words_az09

_WORD_RE = re.compile(r"[a-z0-9]+")
EOW = "</w>"


@dataclass
class BPEModel:
    """Ordered merge list; rank = position (lower merges first)."""

    merges: list[tuple[str, str]] = field(default_factory=list)

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _apply_merge(syms: list[str], pair: tuple[str, str], joined: str) -> list[str]:
    """Replace every non-overlapping left-to-right occurrence of
    ``pair`` in ``syms`` with ``joined`` — the single merge rule both
    training and encoding must share."""
    out: list[str] = []
    j = 0
    while j < len(syms):
        if j + 1 < len(syms) and syms[j] == pair[0] and syms[j + 1] == pair[1]:
            out.append(joined)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def _train_merges(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning on a word-frequency dict.

    Incremental: pair counts and a pair → word index are maintained
    across merges so each merge touches only the words containing
    the merged pair. Ties break deterministically (count desc, then
    pair asc) so retraining is reproducible."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, c in word_freq.items():
        words.append([*w, EOW])
        freqs.append(c)

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            where.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for pair, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and pair < best[0]):
                best = (pair, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for i in list(where.get(pair, ())):
            syms, c = words[i], freqs[i]
            # remove this word's contribution to all its pair counts
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        where.pop(p, None)
            out = _apply_merge(syms, pair, joined)
            words[i] = out
            # re-add contributions
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                where.setdefault(p, set()).add(i)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 100_000,
) -> BPEModel:
    """Learn ``n_merges`` BPE merges from the corpus.

    Distributed word count → top-``max_words`` by (count desc, word
    asc) — the only driver collect, bounded by ``max_words`` — then
    the driver-side merge loop."""
    wc = (
        df.select(F.explode(words_az09(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return BPEModel(merges=_train_merges({r["w"]: r["c"] for r in wc}, n_merges))


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
    syms = [*word, EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        syms = _apply_merge(syms, pair, pair[0] + pair[1])
    return syms


def bpe_encode(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Adds ``out_col``: the document's BPE token array.

    Arrow-batched; the per-executor ``memo`` collapses the greedy
    loop to once per distinct word."""
    ranks = model.ranks

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return []
            toks: list[str] = []
            for w in _WORD_RE.findall(t.lower()):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                toks.extend(got)
            return toks

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_stats(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token accounting under ``model``: word count,
    BPE token count, and mean characters per token (EOW markers
    excluded from the character tally)."""
    enc = bpe_encode(df, model, text_col)
    toks = F.col("bpe_tokens")
    n_tokens = F.size(toks)
    n_chars = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(F.replace(t, F.lit(EOW), F.lit(""))),
    )
    return enc.select(
        id_col,
        F.size(words_az09(text_col)).cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_bpe_tokens"),
        F.round(
            n_chars / F.greatest(n_tokens, F.lit(1)).cast("double"), 6
        ).alias("chars_per_token"),
    )
