"""Categorical-string deduplication → canonical spelling.

Behavior parity: skrub/_deduplicate.py (deduplicate) — cluster
near-identical category strings (typos, case variants) and replace
each by its cluster's most frequent member. The reference builds a
dense pairwise ngram-TFIDF distance matrix + hierarchical
clustering, which is O(u²) memory; here clustering is char-ngram
Jaccard pairs within LSH candidate buckets → connected components →
frequency-weighted representative. Works on the distinct-value set
(u « n rows), then maps back with a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import char_ngrams
from .components import connected_components


def deduplicate_strings(
    df: DataFrame,
    col: str,
    *,
    similarity_threshold: float = 0.6,
    ngram: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """Return ``df`` with ``out_col`` (default ``{col}_dedup``) holding
    the canonical spelling for each value."""
    out_col = out_col or f"{col}_dedup"
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("__freq"))
    uniq = counts.select(
        F.col(col).alias("s"),
        "__freq",
        F.array_distinct(char_ngrams(F.col(col), ngram)).alias("grams"),
    )
    expl = uniq.select("s", F.explode("grams").alias("gram"))
    a = expl.select(F.col("s").alias("s_a"), "gram")
    b = expl.select(F.col("s").alias("s_b"), "gram")
    cand = (
        a.join(b, on="gram")
        .filter(F.col("s_a") < F.col("s_b"))
        .dropDuplicates(["s_a", "s_b"])
    )
    ga = uniq.select(F.col("s").alias("s_a"), F.col("grams").alias("ga"))
    gb = uniq.select(F.col("s").alias("s_b"), F.col("grams").alias("gb"))
    pairs = (
        cand.join(ga, on="s_a")
        .join(gb, on="s_b")
        .withColumn(
            "jac",
            F.size(F.array_intersect("ga", "gb")).cast("double")
            / F.greatest(F.size(F.array_union("ga", "gb")).cast("double"), F.lit(1.0)),
        )
        .filter(F.col("jac") >= similarity_threshold)
        .select(F.col("s_a").alias("id_a"), F.col("s_b").alias("id_b"))
    )
    comp = connected_components(pairs, "id_a", "id_b")  # (id=string, component)
    labeled = counts.join(
        comp.withColumnRenamed("id", col), on=col, how="left"
    ).withColumn("component", F.coalesce("component", F.col(col)))
    w = Window.partitionBy("component").orderBy(
        F.col("__freq").desc(), F.col(col).asc()
    )
    canon = (
        labeled.withColumn("__rn", F.row_number().over(w))
        .withColumn(out_col, F.first(col).over(w))
        .select(col, out_col)
    )
    return df.join(broadcast(canon), on=col, how="left")
