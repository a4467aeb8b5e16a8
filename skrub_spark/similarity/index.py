"""Persisted ANN index (VERDICT r1 item 5).

``topk_cosine_lsh`` recomputes the hyperplane sketches on every
query — each probe is still a full corpus scan. At 100 TB the index
must be MATERIALIZED once and probed by partition pruning:

- :func:`build_ann_index` stamps each row with (table_idx, bucket)
  pairs — one output row per (row, table) — where bucket is the
  sign-bit sketch of the embedding under that table's hyperplanes.
  The planes are derived deterministically from ``seed``, so a probe
  can recompute the query's buckets without storing the planes.
- :func:`write_ann_index` persists that frame as parquet
  ``partitionBy(table_idx, bucket)``: each bucket is its own
  directory, so a probe's ``(table_idx, bucket) IN (...)`` filter
  becomes PartitionFilters at the scan — only ~n_tables/2^n_planes
  of the data is read, no matter the corpus size.
- :func:`topk_cosine_indexed` probes the indexed frame with the
  query's buckets and exact-rescores candidates using the
  precomputed norm column.

Index maintenance = appending new rows with the same (seed,
n_planes, n_tables): the bucket function is stable, so incremental
ingest is a plain parquet append into the matching partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vector import dot_product, l2_norm, vector_literal

_IDX_COLS = ("__ann_table", "__ann_bucket")


def _planes_for(seed: int, n_tables: int, n_planes: int, dim: int) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]


def _query_buckets(query_vec, seed, n_tables, n_planes) -> list[tuple[int, int]]:
    qv = np.asarray(list(query_vec), dtype="float64")
    out = []
    for t, planes in enumerate(_planes_for(seed, n_tables, n_planes, len(qv))):
        bucket = int(sum(1 << i for i, p in enumerate(planes) if float(p @ qv) > 0))
        out.append((t, bucket))
    return out


def _buckets_udf(planes_list):
    """Vectorized all-tables bucket computation: ONE numpy matmul per
    Arrow batch per table. The pure-Column alternative (n_tables x
    n_planes fold expressions, each with dim literals) builds a
    4096-literal expression tree that Catalyst plans for seconds and
    executes interpreted (higher-order functions skip codegen) — the
    same expression-blowup trap as the round-1 minhash aggs."""
    stacked = [np.asarray(p, dtype="float64") for p in planes_list]

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        cols = []
        for planes in stacked:
            S = (M @ planes.T) > 0  # (n, n_planes) sign bits
            cols.append(S @ (1 << np.arange(planes.shape[0], dtype="int64")))
        arr = np.stack(cols, axis=1)
        return pd.Series([[int(x) for x in row] for row in arr])

    return buckets


def build_ann_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """One row per (input row, table): id, vector, norm, table, bucket.

    Build ONCE, write with :func:`write_ann_index`, probe many times.
    """
    if dim is None:
        dim = int(df.select(F.size(vec_col).alias("d")).first()["d"])
    planes = _planes_for(seed, n_tables, n_planes, dim)
    buckets = _buckets_udf(planes)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        F.posexplode(buckets(F.col(vec_col))).alias(*_IDX_COLS),
    )


def write_ann_index(indexed: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist partitioned by (table, bucket) so probes partition-prune.

    ``mode='append'`` is the incremental-ingest path: new rows
    bucketed with the SAME (seed, n_tables, n_planes) land in the
    matching partitions — no rebuild, probes see old + new rows."""
    indexed.write.mode(mode).partitionBy(*_IDX_COLS).parquet(path)


def read_ann_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def topk_cosine_indexed(
    indexed: DataFrame,
    query_vec,
    k: int = 10,
    *,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k by cosine over an indexed frame (from build_ann_index or
    read_ann_index). Probes ONLY the query's (table, bucket) cells —
    on a written index this is a partition-pruned scan — then
    exact-rescores candidates with the stored norm.

    (seed, n_planes, n_tables) must match the build call; the query's
    buckets are recomputed from the same seeded planes.
    """
    probes = _query_buckets(query_vec, seed, n_tables, n_planes)
    cond = None
    for t, bkt in probes:
        c = (F.col(_IDX_COLS[0]) == t) & (F.col(_IDX_COLS[1]) == bkt)
        cond = c if cond is None else (cond | c)
    qv = [float(x) for x in query_vec]
    qn = float(np.sqrt(sum(x * x for x in qv)))
    sim = dot_product(F.col("v"), vector_literal(qv)) / (F.col("nrm") * F.lit(qn))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        indexed.filter(cond)
        .dropDuplicates(["id"])
        .select(F.col("id").alias("vec_id"), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# ---------------- IVF variant ----------------
#
# LSH buckets derive from the seed, so probes can recompute them.
# IVF cells derive from DATA (sampled centroids), so the index must
# persist the centroids next to the cells: <path>/cells is the
# partitioned corpus, <path>/centroids the (cell, centroid) lookup
# (n_cells x dim doubles — tiny).


def _cell_udf(cents: np.ndarray):
    """Vectorized nearest-centroid assignment: one numpy matmul per
    Arrow batch. A pure-Column argmin (nested WHEN-chain of per-cell
    distance expressions, as topk_cosine_ivf builds for ad-hoc use)
    re-evaluates distances per comparison and its planning time
    grows superlinearly in n_cells — wrong for indexing a corpus."""
    C = np.asarray(cents, dtype="float64")
    c2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def cell(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        # argmin ||x-c||^2 == argmin c*c - 2*x.c ; ties -> first index,
        # matching the strict-< when-chain.
        d = c2[None, :] - 2.0 * (M @ C.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return cell


def lloyd_refine(
    df: DataFrame, vec_col: str, cents: np.ndarray, n_iter: int = 3
) -> np.ndarray:
    """Distributed Lloyd (k-means) iterations: assign every corpus
    vector to its nearest centroid with the Arrow-batched
    ``_cell_udf`` (one numpy matmul per batch), then recompute each
    cell's mean as a posexplode + groupBy(cell, dim) aggregation.
    The per-iteration collect is n_cells x dim doubles — independent
    of corpus size, so 2-3 iterations cost 2-3 extra corpus passes
    and nothing driver-side. Cells that lose all members keep their
    previous centroid. Real centroids turn the sampled-pick Voronoi
    cells into a proper k-means partition, which is what IVF probe
    quality depends on at scale (VERDICT r4 #5)."""
    from ..session import bounded_exchange_no_aqe

    C = np.asarray(cents, dtype="float64")
    # r13 (guide §1.2 step 3): the only exchange per iteration is the
    # (cell, dim) mean groupBy — bounded by n_cells x dim rows after
    # map-side combine at ANY corpus size, so AQE's per-exchange
    # re-optimization jobs are pure overhead here.
    with bounded_exchange_no_aqe(df.sparkSession):
        for _ in range(max(0, n_iter)):
            rows = (
                df.select(
                    _cell_udf(C)(F.col(vec_col)).alias("__cell"),
                    F.posexplode(F.col(vec_col)).alias("__pos", "__x"),
                )
                .groupBy("__cell", "__pos")
                .agg(F.avg("__x").alias("m"))
                .collect()
            )
            nxt = C.copy()
            for r in rows:
                nxt[r["__cell"], r["__pos"]] = r["m"]
            C = nxt
    return C


def build_ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_cells: int = 16,
    seed: int = 42,
    lloyd_iters: int = 3,
    centroids=None,
):
    """Returns (indexed_df, centroids). ``centroids`` (r7) injects a
    FROZEN coarse quantizer ([n_cells][dim]) — skips the pick +
    Lloyd entirely; cells stay stable across index rebuilds and the
    assignment is replayable arithmetic (the ``topk_ivfpq`` oracle
    relies on this). Otherwise initial centroids are a
    deterministic hash-ordered pick of corpus vectors —
    ``sample().limit()`` would read only the first partition(s), so a
    time-ordered corpus would put every centroid in its oldest slice
    and n_probe recall would collapse (the partition-bias trap).
    TakeOrdered over a content hash touches all partitions but
    returns only n_cells rows. The pick is then refined with
    ``lloyd_iters`` distributed k-means iterations
    (:func:`lloyd_refine`); pass 0 to keep the raw sample."""
    if centroids is not None:
        cents = np.asarray([list(c) for c in centroids], dtype="float64")
    else:
        sample = [
            list(r[vec_col])
            for r in df.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)))
            .limit(n_cells)
            .collect()
        ]
        if not sample:
            raise ValueError("build_ivf_index: input has no vectors")
        cents = np.asarray(sample, dtype="float64")
        cents = lloyd_refine(df, vec_col, cents, lloyd_iters)
    assign = _cell_udf(cents)
    indexed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        assign(F.col(vec_col)).alias("__ivf_cell"),
    )
    return indexed, cents


def write_ivf_index(indexed: DataFrame, cents: np.ndarray, path: str) -> None:
    indexed.write.mode("overwrite").partitionBy("__ivf_cell").parquet(
        f"{path}/cells"
    )
    spark = indexed.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def read_ivf_index(spark: SparkSession, path: str):
    cents_rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    cents = np.asarray([list(r["centroid"]) for r in cents_rows], dtype="float64")
    return spark.read.parquet(f"{path}/cells"), cents


def topk_cosine_ivf_indexed(
    indexed: DataFrame,
    cents: np.ndarray,
    query_vec,
    k: int = 10,
    *,
    n_probe: int = 4,
    round_digits: int | None = None,
) -> DataFrame:
    """Probe the ``n_probe`` cells nearest the query — on a written
    index the cell filter is a partition-pruned scan — then
    exact-rescore with the stored norms."""
    qv = np.asarray(list(query_vec), dtype="float64")
    d = ((cents - qv) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d)[:n_probe]]
    qn = float(np.sqrt((qv * qv).sum()))
    sim = dot_product(F.col("v"), vector_literal([float(x) for x in qv])) / (
        F.col("nrm") * F.lit(qn)
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        indexed.filter(F.col("__ivf_cell").isin(*probe))
        .select(F.col("id").alias("vec_id"), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )
