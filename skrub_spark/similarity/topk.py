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
- ``topk_cosine_ivf``: IVF-style — seeded-sample centroids refined
  by distributed Lloyd (k-means) iterations, each vector assigned to
  its nearest centroid (one pass), probe the ``n_probe`` nearest
  centroids' partitions.
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
    planes=None,
    round_digits: int | None = None,
) -> DataFrame:
    """Approximate top-k: only rows sharing an LSH bucket with the
    query (any of ``n_tables`` sign-sketches) are rescored.

    Buckets come from the SAME Arrow-batched ``_buckets_udf`` the
    persisted index uses — one numpy matmul per batch per table. The
    pure-Column alternative (n_tables × n_planes fold expressions,
    each carrying dim literals) builds a multi-thousand-literal tree
    that Catalyst takes seconds to plan and executes interpreted —
    per PROBE, which is the hot path of an ANN service.

    ``planes`` (r7): FROZEN [n_tables][n_planes][dim] literals
    override the seed derivation — with 6dp-rounded committed
    planes every bucket is replayable sign-of-dot arithmetic and
    the whole probe gains an exact SQL oracle (battery query
    ``topk_lsh_frozen``); a bucket flip would need a dot within
    float-summation error of 0.
    """
    from .index import _buckets_udf, _planes_for, _query_buckets

    qv = np.asarray(list(query_vec), dtype="float64")
    if planes is not None:
        planes_list = [np.asarray(p, dtype="float64") for p in planes]
        qbuckets = [
            int(sum(1 << i for i, p in enumerate(tbl) if float(p @ qv) > 0))
            for tbl in planes_list
        ]
    else:
        planes_list = _planes_for(seed, n_tables, n_planes, len(qv))
        qbuckets = [
            b for _, b in _query_buckets(query_vec, seed, n_tables, n_planes)
        ]
    row_buckets = _buckets_udf(planes_list)(F.col(vec_col))
    qlit = F.array(*[F.lit(int(b)).cast("long") for b in qbuckets])
    # candidate iff ANY table's row-bucket equals the query's bucket
    cand = F.exists(
        F.zip_with(row_buckets, qlit, lambda a, b: a == b), lambda x: x
    )
    return topk_cosine(
        df.filter(cand), query_vec, k, vec_col, id_col, round_digits
    )


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
    lloyd_iters: int = 2,
) -> DataFrame:
    """IVF: seeded-sample centroids refined by ``lloyd_iters``
    distributed k-means iterations (0 = raw sample); probe the
    ``n_probe`` centroids nearest the query. One corpus pass per
    Lloyd iteration plus one to assign + filter, then exact rescore
    of the probed cells — for repeated probes amortize the k-means
    cost with the persisted index (``build_ivf_index``) instead.
    Assignment reuses the index's Arrow-batched ``_cell_udf`` (one
    numpy matmul per batch) — the pure-Column WHEN-chain argmin
    plans superlinearly in n_centroids."""
    from .index import _cell_udf, lloyd_refine

    sample = [
        row[0]
        for row in df.select(vec_col).sample(False, 0.5, seed).limit(n_centroids).collect()
    ]
    if not sample:
        return topk_cosine(df, query_vec, k, vec_col, id_col)
    cents = np.asarray([list(v) for v in sample], dtype="float64")
    cents = lloyd_refine(df.select(vec_col), vec_col, cents, lloyd_iters)
    qv = np.asarray(list(query_vec), dtype="float64")
    d = ((cents - qv) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d)[:n_probe]]
    probed = df.withColumn("__cell", _cell_udf(cents)(F.col(vec_col))).filter(
        F.col("__cell").isin(*probe)
    )
    return topk_cosine(probed, query_vec, k, vec_col, id_col)
