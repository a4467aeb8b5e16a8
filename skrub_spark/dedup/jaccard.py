"""Exact n-gram Jaccard duplicate pairs (SURVEY.md §2).

Prefix-filter style: explode each document's distinct n-grams, join
on shared grams to build candidate pairs with co-occurrence counts,
then compute Jaccard = |∩| / (|A|+|B|-|∩|) directly from the counts
— the arrays themselves never travel through the pair join. Shuffle
volume is O(total grams), with a document-frequency cap dropping
ubiquitous grams (the skew guard: a gram in every doc would create
n² candidate rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, word_shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    unit: str = "word",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard >= threshold) by exact n-gram
    Jaccard. Columns: id_a, id_b, jaccard."""
    def grams_expr_of(c):
        return word_shingles(c, n) if unit == "word" else char_ngrams(c, n)
    par = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("__t"))
        .repartition(par)
        .select("id", F.array_distinct(grams_expr_of(F.col("__t"))).alias("grams"))
        .withColumn("n_grams", F.size("grams"))
    )
    exploded = docs.select("id", "n_grams", F.explode("grams").alias("gram"))
    if max_doc_freq is not None:
        rare = (
            exploded.groupBy("gram")
            .count()
            .filter(F.col("count") <= max_doc_freq)
            .drop("count")
        )
        exploded = exploded.join(rare, on="gram", how="left_semi")
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("n_grams").alias("na"), "gram"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("n_grams").alias("nb"), "gram"
    )
    inter = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
