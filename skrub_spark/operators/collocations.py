"""PMI collocation mining (r9c) — the corpus-linguistics staple
(Church & Hanks 1990 association ratio): which adjacent word pairs
occur together far more often than chance? Feeds phrase detection
(word2vec-style phrase joining), keyword refinement next to
TF-IDF (operators/keywords.py), and tokenizer-vocabulary audits.

Exactness: PMI = log[N·c(xy) / (c(x)·c(y))] is monotone in the
integer ratio inside the log, so the score ships as the INTEGER
``score_scaled = (N · c(xy) · 10⁶) div (c(x) · c(y))`` — all
arithmetic in DECIMAL(38,0) (a 100 TB corpus has N ~ 10¹⁴ tokens;
N·c·10⁶ overflows BIGINT long before that), bit-identical in any
engine, no IEEE log anywhere. Callers wanting nats apply
``log(score_scaled / 1e6)`` themselves.

Scale shape: bigrams come from a pure-JVM array transform over each
document's token array (no per-token window, no Python); unigram
and bigram counts are two map-side-combined groupBys; the top-k is
a bounded ordered limit. One corpus scan total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def _token_array(col):
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != ""
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by integer-scaled PMI.

    Returns ``(w1, w2, pair_count, score_scaled)`` ordered by
    (score_scaled desc, w1, w2) — a total order, so the top-k cut
    is deterministic. ``min_count`` filters rare bigrams (PMI's
    classic low-frequency pathology: a hapax pair maxes the score).
    """
    toks = df.select(_token_array(F.col(text_col)).alias("ts")).where(
        F.size("ts") > 0
    )
    toks = toks.persist()
    try:
        uni = toks.select(F.explode("ts").alias("w")).groupBy("w").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        n_tok = toks.select(
            F.sum(F.size("ts")).cast("long").alias("n")
        )
        bi = (
            toks.where(F.size("ts") > 1)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> struct(ts[i-1] AS w1, ts[i] AS w2))"
                    )
                ).alias("p")
            )
            .select("p.w1", "p.w2")
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
            .where(F.col("pair_count") >= min_count)
        )
        scored = (
            bi.join(
                uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
                "w1",
            )
            .join(
                uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
                "w2",
            )
            .crossJoin(F.broadcast(n_tok))
            .select(
                "w1",
                "w2",
                "pair_count",
                (
                    F.col("n").cast("decimal(38,0)")
                    * F.col("pair_count").cast("decimal(38,0)")
                    * F.lit(1000000).cast("decimal(38,0)")
                )
                .cast("decimal(38,0)"),
                (
                    F.col("c1").cast("decimal(38,0)")
                    * F.col("c2").cast("decimal(38,0)")
                ).cast("decimal(38,0)"),
            )
            .toDF("w1", "w2", "pair_count", "num", "den")
            .select(
                "w1",
                "w2",
                "pair_count",
                F.expr("CAST(num div den AS BIGINT)").alias(
                    "score_scaled"
                ),
            )
        )
        return (
            scored.orderBy(
                F.col("score_scaled").desc(), "w1", "w2"
            )
            .limit(top_k)
            .localCheckpoint(eager=True)
        )
    finally:
        toks.unpersist()
