"""Approximate-nearest-neighbor search over an embedding column
(beyond-reference LLM-pipeline operator, SURVEY.md §2).

- ``topk_cosine``: brute-force exact top-k — one full scan, cosine
  as a JVM aggregate expression, ORDER BY + LIMIT (Spark executes
  as a distributed TakeOrdered: per-partition heap + driver merge,
  no full sort shuffle).
- ``topk_cosine_lsh``: scale path — random-hyperplane bucket the
  corpus once (a cheap, reusable index column), probe only the
  query's bucket ± multi-table OR, exact-rescore the candidates.
  At 100 TB the probe touches ~1/2^bits of the data per table.
- ``topk_cosine_ivf``: IVF-style — k-means-ish centroids sampled
  driver-side, each vector assigned to nearest centroid (one pass),
  probe the ``n_probe`` nearest centroids' partitions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, vector_literal


def topk_cosine(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k rows by cosine similarity to ``query_vec``."""
    q = vector_literal(query_vec)
    sim = cosine_similarity(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _bucket_expr(vec_col, planes: np.ndarray):
    bits = []
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col, F.array(*[F.lit(float(x)) for x in p]),
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


def topk_cosine_lsh(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only rows sharing an LSH bucket with the
    query (any of ``n_tables`` sign-sketches) are rescored."""
    qv = np.asarray(list(query_vec), dtype="float64")
    rng = np.random.default_rng(seed)
    cond = None
    for _ in range(n_tables):
        planes = rng.standard_normal((n_planes, len(qv)))
        qbucket = int(
            sum(1 << i for i, p in enumerate(planes) if float(np.dot(p, qv)) > 0)
        )
        c = _bucket_expr(F.col(vec_col), planes) == F.lit(qbucket)
        cond = c if cond is None else (cond | c)
    return topk_cosine(df.filter(cond), query_vec, k, vec_col, id_col)


def topk_cosine_ivf(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF: centroids = seeded sample of corpus vectors; probe the
    ``n_probe`` centroids nearest the query. One corpus pass to
    assign + filter, then exact rescore of the probed cells."""
    sample = [
        row[0]
        for row in df.select(vec_col).sample(False, 0.5, seed).limit(n_centroids).collect()
    ]
    if not sample:
        return topk_cosine(df, query_vec, k, vec_col, id_col)
    cents = np.asarray([list(v) for v in sample], dtype="float64")
    qv = np.asarray(list(query_vec), dtype="float64")
    d = ((cents - qv) ** 2).sum(axis=1)
    probe = set(int(i) for i in np.argsort(d)[:n_probe])
    # assignment expression: argmin over centroid distances
    best_idx = F.lit(0)
    best_d = None
    for i, c in enumerate(cents):
        lit = F.array(*[F.lit(float(x)) for x in c])
        dist = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if best_d is None:
            best_d = dist
        else:
            cond = dist < best_d
            best_idx = F.when(cond, F.lit(i)).otherwise(best_idx)
            best_d = F.when(cond, dist).otherwise(best_d)
    probed = df.withColumn("__cell", best_idx).filter(
        F.col("__cell").isin(*probe)
    )
    return topk_cosine(probed, query_vec, k, vec_col, id_col)
