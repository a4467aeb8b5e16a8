"""Contrastive-pair mining over embedding columns — the
training-data side of the ANN stack (SURVEY.md §2).

Embedding models train on (anchor, positive, negative) triplets,
and the negatives that matter are the HARD ones: high-similarity
vectors with a different label (Schroff et al., FaceNet; every
dense-retrieval recipe since DPR). Mining them is a top-k scan per
anchor restricted to label mismatches — exactly the
``cosine_knn_join`` shape with a class predicate pushed BEFORE the
ranking, which is why it lives here rather than being a filter on
the join output (post-filtering top-k would under-deliver
negatives for anchors whose neighborhood is same-label).

Exactness: cosine is the same dot/norm arithmetic as
``topk_cosine`` (4dp round), ranking is a per-anchor bounded
window with id tie-break — battery oracle ``hard_negatives``
replays the definitional cross join + rank.

Scale shape: anchors broadcast onto the corpus (anchor batches are
small by construction — a training batch, not the corpus), the
per-pair work is one JVM zip_with dot product, and the vectors are
DROPPED before the rank shuffle (3 scalars per candidate). For
corpus-sized anchor sets switch to the LSH-bucketed
``cosine_knn_join`` and accept post-filter recall semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import dot_product, l2_norm


def hard_negatives(
    corpus: DataFrame,
    anchor_ids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Top-``k`` highest-cosine OTHER-label vectors per anchor:
    ``(query_id, neighbor_id, neighbor_label, rank, cosine)``.
    ``anchor_ids`` is a one-column frame of ``id_col`` values
    selecting the anchors from ``corpus``."""
    a = (
        corpus.join(
            F.broadcast(anchor_ids.select(F.col(id_col))),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
            F.col(label_col).alias("__ql"),
        )
    )
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        F.col(label_col).alias("neighbor_label"),
    )
    pairs = (
        c.repartition(par)
        .crossJoin(F.broadcast(a))
        .filter(F.col("neighbor_label") != F.col("__ql"))
    )
    cos = dot_product(F.col("__qv"), F.col("__cv")) / (
        F.col("__qn") * F.col("__cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("__cos", cos)
        .select("query_id", "neighbor_id", "neighbor_label", "__cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "rank",
            F.round(F.col("__cos"), int(round_digits)).alias("cosine"),
        )
    )
