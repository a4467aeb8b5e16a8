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


def truncation_recall(
    corpus: DataFrame,
    query_vec: list,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: list[int] = (4, 8, 16),
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Matryoshka-style truncation quality curve: for each prefix
    dimension d in ``dims``, the recall@k of cosine top-k computed
    on the FIRST d vector components against the full-dimension
    top-k — ``(dim, recall)``. This is the measurement behind
    serving vectors at a fraction of their trained width (MRL,
    Kusupati et al. 2022): the curve tells you the cheapest prefix
    that keeps recall, the same question SQ8/PQ answer for
    quantization — this answers it for truncation.

    Exact counting over deterministic rankings (cos desc, id asc);
    recall is one IEEE division of exact integers, 6dp. Battery
    oracle ``mrl_recall`` replays each sliced ranking. Each
    ranking is a TakeOrdered top-k over a map-only cosine column —
    |dims|+1 corpus passes, no joins except k-row id sets."""
    qd = [float(x) for x in query_vec]

    def _top(d: int | None):
        if d is None:
            vec = F.col(vec_col)
            qlit = F.expr(
                "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in qd) + ")"
            )
        else:
            vec = F.slice(F.col(vec_col), 1, d)
            qlit = F.expr(
                "array("
                + ",".join(f"CAST({x!r} AS DOUBLE)" for x in qd[:d])
                + ")"
            )
        base = corpus
        if exclude_id is not None:
            base = base.filter(F.col(id_col) != exclude_id)
        cos = dot_product(vec, qlit) / (l2_norm(vec) * l2_norm(qlit))
        return (
            base.select(F.col(id_col).alias("vid"), cos.alias("c"))
            .orderBy(F.col("c").desc(), F.col("vid").asc())
            .limit(int(k))
            .select("vid")
        )

    full = _top(None).persist()
    outs = []
    for d in dims:
        hit = _top(int(d)).join(full, "vid").agg(
            F.lit(int(d)).alias("dim"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.lit(float(k)), 6
            ).alias("recall"),
        )
        outs.append(hit)
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), outs)
