"""Embedding-cosine near-duplicate detection (SURVEY.md §2).

Random-hyperplane LSH buckets candidate pairs (sign-bit sketch of
the embedding — cosine-similar vectors collide with high
probability), exact cosine verifies. Brute-force mode (bucket on a
constant) exists for oracle-checkable exactness on small inputs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot_product


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    exact: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine similarity >= threshold.
    Columns: id_a, id_b, cosine."""
    from ..functions.vector import l2_norm

    # Precompute the norm per row BEFORE the pair join: the cosine of
    # a pair then needs a single fold (the dot product) instead of
    # re-deriving both norms per candidate pair.
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    if exact:
        # broadcast nested-loop cross join keeps every partition of the
        # left side busy (a constant-key equi-join would funnel all
        # pairs through a single reducer).
        a = base.select(
            F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
        )
        b = base.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
        )
        cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            a.repartition(max(df.sparkSession.sparkContext.defaultParallelism, 8))
            .crossJoin(F.broadcast(b))
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes_list = [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]
    # Arrow-batched all-tables bucketing (one numpy matmul per batch
    # per table) — the former per-table fold expressions carried
    # n_tables x n_planes x dim literals through an interpreted HOF
    # tree (the same expression-blowup trap the ANN index fixed in
    # r4). Repartition first: a single-file corpus arrives as one
    # partition and would bucket on one core.
    from ..similarity.index import _buckets_udf

    par = df.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(par).persist()
    banded = base.select(
        "id",
        F.posexplode(_buckets_udf(planes_list)(F.col("v"))).alias(
            "bucket_idx", "bucket"
        ),
    )
    # Candidates stay NARROW (ids only) through the bucket self-join
    # and the pair dedup; the 2x dim-double vectors join back per
    # SURVIVING pair only, not per banded candidate row.
    a = banded.select(F.col("id").alias("id_a"), "bucket_idx", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "bucket_idx", "bucket")
    cand = (
        a.join(b, on=["bucket_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    vb = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
