"""Test-set contamination detection (SURVEY.md §2 — LLM-pipeline):
flag eval documents whose long n-grams also appear in the training
corpus. The standard decontamination check (k-gram overlap, k≈13
words) before reporting eval numbers: an eval doc sharing even a
few 13-gram shingles with training text has likely leaked.

Physical plan — inverted-index join, the same O(n²) discipline as
the jaccard dedup:

1. shingle both corpora, keep DISTINCT grams per doc, hash to
   8-byte keys;
2. drop grams appearing in more than ``max_train_doc_freq`` train
   docs (boilerplate carries no contamination signal and would
   create df² join rows — the skew guard);
3. equi-join eval grams against the distinct train gram set (a
   semi-join: which train doc had the gram doesn't matter) and
   count matched grams per eval doc.

Output: one row per eval doc with its total shingle count, how many
shingles also occur in train, and the contaminated fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 13,
    max_train_doc_freq: int | None = None,
) -> DataFrame:
    """Per-eval-doc contamination stats against the train corpus.

    Returns (id, n_shingles, n_contaminated, contamination) — docs
    shorter than ``ngram`` words have zero shingles and report
    contamination 0.0.
    """
    par = train.sparkSession.sparkContext.defaultParallelism

    def grams(df):
        return (
            df.select(
                F.col(id_col).alias("id"),
                F.col(content_col).alias("__t"),
            )
            .repartition(par)
            .select(
                "id",
                F.explode_outer(
                    F.array_distinct(word_shingles(F.col("__t"), ngram))
                ).alias("g"),
            )
            # xxhash64(NULL) is NOT null (it hashes to the seed), so
            # gate on the gram: zero-shingle docs keep h = null, which
            # never equi-joins but survives the left join + groupBy.
            .withColumn(
                "h", F.when(F.col("g").isNotNull(), F.xxhash64("g"))
            )
            .drop("g")
        )

    tg = grams(train).filter(F.col("h").isNotNull())
    if max_train_doc_freq is not None:
        freq = tg.groupBy("h").agg(F.count(F.lit(1)).alias("__df"))
        tg = tg.join(
            freq.filter(F.col("__df") <= max_train_doc_freq).select("h"),
            on="h",
            how="left_semi",
        )
    train_grams = tg.select("h").distinct()

    eg = grams(eval_df)  # explode_outer keeps zero-shingle docs
    hit = F.when(F.col("__hit").isNotNull() & F.col("h").isNotNull(), 1).otherwise(0)
    scored = (
        eg.join(
            train_grams.withColumn("__hit", F.lit(1)),
            on="h",
            how="left",
        )
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("h").isNotNull(), 1).otherwise(0)).alias(
                "n_shingles"
            ),
            F.sum(hit).alias("n_contaminated"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        (
            F.col("n_contaminated")
            / F.greatest(F.col("n_shingles"), F.lit(1))
        ).cast("double").alias("contamination"),
    )


def decontaminate_train(
    train: DataFrame,
    eval_df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 13,
    max_contamination: float = 0.0,
    max_eval_doc_freq: int | None = None,
) -> DataFrame:
    """Remove TRAIN documents that overlap the eval set — the
    GPT-3/CCNet-style decontamination applied at corpus-build time
    (detection flags eval docs; this removes the train side so eval
    numbers stay honest without touching the benchmark itself).

    A train doc survives when its contaminated-shingle fraction
    against the eval corpus is <= ``max_contamination`` (default:
    any shared ``ngram``-gram removes it; docs too short to shingle
    always survive). Same inverted-index plan as
    :func:`ngram_contamination` with the roles swapped, followed by
    one semi-join back to the train payloads."""
    stats = ngram_contamination(
        eval_df,
        train,
        content_col,
        id_col,
        ngram=ngram,
        max_train_doc_freq=max_eval_doc_freq,
    )
    keep = stats.filter(
        F.col("contamination") <= F.lit(float(max_contamination))
    ).select(id_col)
    return train.join(keep, id_col, "left_semi")
