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


def kcenter_select(
    emb,
    id_col: str,
    vec_col: str,
    *,
    k: int,
    seed_id=None,
):
    """Greedy k-center coreset selection (r11 — Gonzalez 1985
    farthest-point traversal, the diversity-sampling complement to
    SemDeDup: instead of REMOVING near-duplicates, PICK the k most
    mutually-distant exemplars, the standard seed set for
    cluster-balanced curation and eval-probe selection; 2-approx to
    the optimal k-center radius).

    Exactness: coordinates are quantized to integer MICRO units
    (round(x, 6) x 1e6 as BIGINT) before any distance, so squared
    L2 is exact integer arithmetic — order-independent, bit-equal
    in any engine — and the argmax (farthest point, ties to the
    LOWEST id) is replayable by a chained-CTE SQL oracle (battery
    ``kcenter_coreset``). The quantization IS the operator's
    documented metric (1e-6 per-coordinate resolution).

    Distributed shape: k-1 passes, each a broadcast join against
    the single new center + one running least() + one max(struct)
    argmax aggregate (map-side combined). Driver state: the k
    chosen (id, vector) pairs — codebook-sized. At 100 TB one pass
    per center is the honest greedy cost; for k in the thousands
    use the cell-bucketed kmeans seeding in dedup/embedding.py
    instead.

    Returns ``(rank, id, mind2)``: selection order, chosen id, and
    the point's exact min squared micro-distance to the previously
    chosen set (NULL for the seed). ``seed_id`` defaults to the
    smallest id (deterministic)."""
    from pyspark.sql import functions as F

    if k < 1:
        raise ValueError("kcenter_select: k must be >= 1")
    spark = emb.sparkSession
    q = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: (F.round(x, 6).cast("decimal(18,6)") * 1000000).cast(
                "long"
            ),
        ).alias("__v"),
    ).persist()
    # r13 (guide §1.2 step 3, VERDICT r12 #6): every exchange in
    # the selection loop aggregates to ONE row (seed min-struct,
    # per-center argmax), so AQE's per-exchange re-optimization
    # jobs are pure overhead at any scale — measured ~2x on the
    # kcenter_coreset query at both 32 and 8 cores (A/B committed
    # in OPTIMIZATION_r13.md).
    from ..session import bounded_exchange_no_aqe

    with bounded_exchange_no_aqe(spark):
        if seed_id is None:
            # ONE job instead of two (min-id scan + seed-row fetch): ids
            # are unique, so min(struct(id, vec)) IS the min-id row and
            # the vector rides along in the struct.
            seed_row = q.agg(F.min(F.struct("__id", "__v"))).first()[0]
            if seed_row is None:
                raise ValueError("kcenter_select: empty input frame")
        else:
            seed_row = q.where(F.col("__id") == seed_id).first()
            if seed_row is None:
                raise ValueError(
                    f"kcenter_select: seed id {seed_id!r} not found"
                )
        chosen = [(int(seed_row["__id"]), list(seed_row["__v"]), None)]

        def _d2(center_vec):
            # explicit per-dimension terms (dim is bounded) instead of a
            # zip_with/aggregate lambda pair — interpreted HOFs over a
            # literal array measured ~3x slower per pass. Built as ONE
            # parsed expr string: the python-composed 64-term loop cost
            # ~1-3 s of py4j driver chatter PER CENTER (~8-10 s per
            # k=8 call, measured r12-opt) vs ~1 ms parsed; the parsed
            # tree is the identical left-folded integer sum.
            terms = " + ".join(
                f"(element_at(__v, {i + 1}) - {int(x)}L) * "
                f"(element_at(__v, {i + 1}) - {int(x)}L)"
                for i, x in enumerate(center_vec)
            )
            return F.expr(f"CAST({terms} AS BIGINT)")

        # ONE job per iteration: the frame carries (id, vector, min-d2),
        # so each round is a map-only least() update, and the argmax
        # aggregate both populates the new cache and returns the next
        # center WITH its vector (array field rides in the max-struct —
        # (m, -id) is unique, so the array never decides the ordering).
        def _argmax(frame):
            return frame.agg(
                F.max(
                    F.struct(
                        F.col("__m"),
                        (-F.col("__id")).alias("__n"),
                        F.col("__v"),
                    )
                )
            ).first()[0]

        mind = q.select("__id", "__v", _d2(chosen[0][1]).alias("__m")).persist()
        top = _argmax(mind)
        for _ in range(int(k) - 1):
            if top is None:
                break
            # max min-distance 0 means every remaining point coincides
            # with a chosen center (k exceeds the distinct vectors, or
            # duplicates dominate) — stop rather than re-select a chosen
            # id into the coreset (ADVICE r11)
            if int(top["__m"]) == 0:
                break
            nid, nvec = -int(top["__n"]), list(top["__v"])
            chosen.append((nid, nvec, int(top["__m"])))
            if len(chosen) >= int(k):
                break
            nxt = mind.select(
                "__id", "__v", F.least(F.col("__m"), _d2(nvec)).alias("__m")
            ).persist()
            top = _argmax(nxt)
            mind.unpersist()
            mind = nxt
        mind.unpersist()
        q.unpersist()
    out = spark.createDataFrame(
        [(i + 1, cid, m) for i, (cid, _, m) in enumerate(chosen)],
        "rank int, id long, mind2 long",
    )
    return out.withColumnRenamed("id", id_col)
