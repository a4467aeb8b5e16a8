"""Embedding k-NN JOIN: every left row matched to its k most-cosine-
similar right rows (the all-pairs generalization of the single-query
``topk_cosine`` — the shape of retrieval-augmentation / dedup-
candidate / label-propagation jobs over embedding tables).

Two physical modes:

- ``method="exact"``: broadcast cross join + per-left top-k window.
  Exact; right side must be dimension-sized (it is broadcast). This
  is also the oracle baseline.
- ``method="auto"`` (default): exact while the right side fits the
  broadcast budget, LSH once it exceeds ``auto_broadcast_limit``
  rows — the same guard ``fuzzy_join(strategy="auto")`` has, so the
  DEFAULT call can never plan an O(|L|·|R|) cross join against a
  large table.
- ``method="lsh"``: both sides bucketed by seeded random-hyperplane
  sketches over ``n_tables`` tables (the same construction as
  similarity/index.py — at scale the right side's buckets would be
  the PERSISTED index); candidates = pairs sharing any (table,
  bucket), exact-rescored, per-left top-k. Shuffles candidates
  only — never the cross product.

The top-k step is a window over the candidate set, bounded by the
broadcast size (exact) or bucket co-occupancy (lsh) — never over
n_left x n_right.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.vector import dot_product, l2_norm
from .index import _buckets_udf, _planes_for


def cosine_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    *,
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    method: str = "auto",
    exclude_self: bool = True,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    planes=None,
    round_digits: int | None = None,
    auto_broadcast_limit: int = 100_000,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — k nearest right rows
    per left row. ``exclude_self`` drops identical-id pairs (the
    self-match in a self-join).

    ``planes`` (r7): FROZEN [n_tables][n_planes][dim] literals for
    the lsh mode — with committed 6dp planes every bucket on both
    sides is replayable sign-of-dot arithmetic and the lsh join
    gains an exact SQL oracle (battery query
    ``knn_join_lsh_frozen``), same construction as
    ``topk_cosine_lsh(planes=)``."""
    if method == "auto":
        # LIMIT-guarded existence probe (mirrors operators/joiner.py):
        # the scan stops after limit+1 rows, never counts the table.
        over = (
            right.select(right_id).limit(auto_broadcast_limit + 1).count()
            > auto_broadcast_limit
        )
        method = "lsh" if over else "exact"
    l = left.select(
        F.col(left_id).alias("query_id"),
        F.col(left_vec).alias("__lv"),
        l2_norm(F.col(left_vec)).alias("__ln"),
    )
    r = right.select(
        F.col(right_id).alias("neighbor_id"),
        F.col(right_vec).alias("__rv"),
        l2_norm(F.col(right_vec)).alias("__rn"),
    )

    # spread the left (and lsh right) side before the per-pair work:
    # a small single-file table arrives as one partition and the
    # whole O(candidates) dot-product evaluation would run one core
    par = left.sparkSession.sparkContext.defaultParallelism
    if method == "exact":
        pairs = l.repartition(par).crossJoin(broadcast(r))
    elif method == "lsh":
        if planes is None:
            dim = int(
                left.select(F.size(left_vec).alias("d")).first()["d"]
            )
            planes = _planes_for(seed, n_tables, n_planes, dim)
        else:
            planes = [np.asarray(p, dtype="float64") for p in planes]
        buckets = _buckets_udf(planes)

        def banded(df, vec):
            return df.repartition(par).select(
                "*", F.posexplode(buckets(F.col(vec))).alias("__t", "__b")
            )
        lb = banded(l, "__lv")
        rb = banded(r, "__rv")
        pairs = (
            lb.join(rb, on=["__t", "__b"])
            .drop("__t", "__b")
            .dropDuplicates(["query_id", "neighbor_id"])
        )
    else:
        raise ValueError("method must be 'auto', 'exact' or 'lsh'")

    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    cos = dot_product(F.col("__lv"), F.col("__rv")) / (
        F.col("__ln") * F.col("__rn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    out = (
        # project the cosine and DROP the vectors before the top-k
        # window: the sort shuffle then carries 3 scalars per pair
        # instead of two dim-double arrays
        pairs.withColumn("__cos", cos)
        .select("query_id", "neighbor_id", "__cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    c = F.col("__cos")
    if round_digits is not None:
        c = F.round(c, round_digits)
    return out.select("query_id", "neighbor_id", "rank", c.alias("cosine"))
