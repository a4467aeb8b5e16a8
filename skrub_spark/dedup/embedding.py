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


def _hyperplane_bucket(vec_col, planes: np.ndarray):
    """Sign-bit sketch: bit i = (v · plane_i) > 0, packed to a long."""
    bits = []
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


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
    else:
        if dim is None:
            first = df.select(F.size(vec_col).alias("d")).first()
            dim = int(first["d"])
        rng = np.random.default_rng(seed)
        buckets = []
        for t in range(n_tables):
            planes = rng.standard_normal((n_planes, dim))
            buckets.append(_hyperplane_bucket(F.col("v"), planes))
        banded = base.select(
            "id",
            "v",
            "nrm",
            F.posexplode(F.array(*buckets)).alias("bucket_idx", "bucket"),
        )
    a = banded.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "bucket_idx",
        "bucket",
    )
    b = banded.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket_idx",
        "bucket",
    )
    cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, on=["bucket_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
