"""Reciprocal-rank fusion of heterogeneous retrieval rankings.

The repo now has BOTH retrieval halves — dense ANN cosine
(``similarity/topk.py``) and sparse BM25 (``operators/bm25.py``).
Hybrid retrieval (the default in modern RAG / hard-negative-mining
pipelines) fuses them; Cormack et al. 2009's reciprocal rank fusion
is the standard scoreless method because it needs NO score
calibration across systems: fused(d) = Σ_r 1/(k + rank_r(d)).

Determinism/scale design:
- Each input ranking is reduced to (id, rank) by ONE row_number
  window over its own (score DESC, id) order — the candidate lists
  are top-k sized, so the windows are tiny regardless of corpus
  size; the expensive part stays inside the upstream retrievers.
- Rankings fold together with FULL OUTER joins in the given order,
  so the fused sum has a FIXED operand order: each term is one IEEE
  division 1/(k + rank) of exact integers and the sum is 2–4 terms
  in source order — bit-identical in any engine, no decimal bridge
  needed.
- Ties in the fused score break by id — fully deterministic top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def to_ranking(
    scored: DataFrame, id_col: str, score_col: str, limit: int | None = None
) -> DataFrame:
    """(id, rank) from a scored candidate list: rank 1 = best score,
    ties by id. Apply ``limit`` to cap the list (RRF is usually fed
    top-k lists, not full corpora)."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    r = scored.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )
    return r.filter(F.col("rank") <= int(limit)) if limit else r


def rrf_fuse(
    rankings: list[DataFrame], k: int = 60, topn: int | None = None
) -> DataFrame:
    """Fuse (id, rank) frames: (id, n_lists, rrf_score) with
    rrf_score = Σ 1/(k + rank), missing lists contribute 0.
    ``topn`` returns only the best n by (score DESC, id)."""
    if not rankings:
        raise ValueError("no rankings to fuse")
    cur = rankings[0].select("id", F.col("rank").alias("r_0"))
    for i, nxt in enumerate(rankings[1:], start=1):
        cur = cur.join(
            nxt.select("id", F.col("rank").alias(f"r_{i}")),
            "id",
            "full_outer",
        )
    contribs = [
        F.when(
            F.col(f"r_{i}").isNotNull(),
            F.lit(1.0)
            / (F.lit(float(k)) + F.col(f"r_{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        for i in range(len(rankings))
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    hits = [
        F.when(F.col(f"r_{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(rankings))
    ]
    n_lists = hits[0]
    for h in hits[1:]:
        n_lists = n_lists + h
    out = cur.select(
        "id",
        n_lists.cast("long").alias("n_lists"),
        score.alias("rrf_score"),
    )
    if topn:
        out = out.orderBy(
            F.col("rrf_score").desc(), F.col("id").asc()
        ).limit(int(topn))
    return out
