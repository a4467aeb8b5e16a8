"""Recall contracts for the approximate similarity paths.

The approximate operators (hyperplane-LSH top-k, IVF top-k, LSH knn
join) trade exactness for scale; this file turns "approximate, trust
me" into a measured contract: recall@k against the exact numpy
oracle over the REAL sf0.001 embeddings table, across 3 plane/
centroid seeds, asserted >= the documented floor.

The sf0.001 embeddings are 500 isotropic 64-dim vectors — LSH's
WORST case (near-uniform pairwise cosines, so true neighbors are
barely nearer than the bulk). Numpy parameter sweep on this data
(3 seeds x 5 queries): planes=4/tables=8 -> recall .72 at 42%
candidates; planes=4/tables=16 -> .92 at 64%; planes=6/tables=8
(selective, the 100TB-shaped setting) -> .35 at 13%. On real
clustered embeddings the same constructions sit far right of this
curve; the floors below are contracts AT the tested parameters on
THIS data, not universal claims.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from skrub_spark.sources import load_table

K = 10
SEEDS = (1, 2, 3)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype="float64")
    return df, ids, mat


def _exact_topk(ids, mat, qv, k, exclude=None):
    sims = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
    out = [ids[i] for i in order if ids[i] != exclude]
    return set(out[:k])


def test_topk_lsh_recall(emb):
    from skrub_spark.similarity.topk import topk_cosine_lsh

    df, ids, mat = emb
    recalls = []
    for seed in SEEDS:
        for qi in range(5):
            qv = mat[qi]
            want = _exact_topk(ids, mat, qv, K)
            got = {
                r["vec_id"]
                for r in topk_cosine_lsh(
                    df, qv, k=K, n_planes=4, n_tables=16, seed=seed
                ).collect()
            }
            recalls.append(len(got & want) / K)
    mean = float(np.mean(recalls))
    print(f"topk_lsh mean recall@{K} over {len(recalls)} probes: {mean:.3f}")
    assert mean >= 0.9


def test_topk_ivf_recall(emb):
    """IVF recall contract + the Lloyd-refinement win (VERDICT r4
    #5): at EQUAL n_probe, k-means centroids (lloyd_iters=2, the
    default) must not lose to the raw sampled pick, and on this
    worst-case isotropic data they measurably gain — 0.880 vs 0.827
    mean recall@10 probing 8/16 cells (3 seeds x 5 queries)."""
    from skrub_spark.similarity.topk import topk_cosine_ivf

    df, ids, mat = emb

    def mean_recall(lloyd_iters):
        recalls = []
        for seed in SEEDS:
            for qi in range(5):
                qv = mat[qi]
                want = _exact_topk(ids, mat, qv, K)
                got = {
                    r["vec_id"]
                    for r in topk_cosine_ivf(
                        df, qv, k=K, n_centroids=16, n_probe=8, seed=seed,
                        lloyd_iters=lloyd_iters,
                    ).collect()
                }
                recalls.append(len(got & want) / K)
        return float(np.mean(recalls))

    sampled = mean_recall(0)
    lloyd = mean_recall(2)
    print(f"topk_ivf mean recall@{K}: sampled {sampled:.3f}, lloyd {lloyd:.3f}")
    # on isotropic data recall is capped near the probed fraction
    # (true neighbors spread uniformly across cells); the clustered-
    # data test below shows the construction itself is fine.
    assert lloyd >= sampled - 0.02  # never worse than the raw sample
    assert lloyd >= 0.8  # measured 0.880, floor = measured - headroom


def test_knn_join_lsh_recall(emb):
    """LSH knn-join recall over EVERY query row (one distributed job
    per seed — the shape the operator actually runs at scale)."""
    from skrub_spark.similarity.knn_join import cosine_knn_join

    df, ids, mat = emb
    k = 5
    exact = {
        int(i): _exact_topk(ids, mat, mat[pos], k, exclude=int(i))
        for pos, i in enumerate(ids)
    }
    recalls = []
    for seed in SEEDS:
        got: dict[int, set] = {}
        rows = cosine_knn_join(
            df, df, k=k, method="lsh", n_planes=4, n_tables=16, seed=seed
        ).collect()
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        per_q = [
            len(got.get(q, set()) & want) / k for q, want in exact.items()
        ]
        recalls.append(float(np.mean(per_q)))
    mean = float(np.mean(recalls))
    print(f"knn_join_lsh mean recall@{k} over {len(SEEDS)} seeds: {mean:.3f}")
    # measured 0.89 at planes=4/tables=16 on isotropic vectors
    assert mean >= 0.85


def test_lsh_recall_on_clustered_data(spark):
    """On CLUSTERED embeddings (the realistic shape: near-dup text/
    image embeddings form tight cones) the SAME constructions reach
    ~1.0 recall at the SELECTIVE settings that only managed ~0.35 on
    isotropic data — i.e. the recall ceiling above is a property of
    the adversarial test data, not of the operators."""
    from skrub_spark.similarity.knn_join import cosine_knn_join
    from skrub_spark.similarity.topk import topk_cosine_lsh

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((20, 32)) * 5.0
    vecs = []
    for ci, c in enumerate(centers):
        for j in range(25):
            vecs.append(c + rng.standard_normal(32) * 0.3)
    mat = np.array(vecs)
    ids = np.arange(len(mat))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
        "vec_id int, embedding array<double>",
    )
    # selective setting: 6 planes (64 buckets/table), 8 tables
    want = _exact_topk(ids, mat, mat[0], K)
    got = {
        r["vec_id"]
        for r in topk_cosine_lsh(
            df, mat[0], k=K, n_planes=6, n_tables=8, seed=1
        ).collect()
    }
    topk_recall = len(got & want) / K
    exact = {
        int(i): _exact_topk(ids, mat, mat[pos], 5, exclude=int(i))
        for pos, i in enumerate(ids)
    }
    got_knn: dict[int, set] = {}
    for r in cosine_knn_join(
        df, df, k=5, method="lsh", n_planes=6, n_tables=8, seed=1
    ).collect():
        got_knn.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    knn_recall = float(
        np.mean([len(got_knn.get(q, set()) & w) / 5 for q, w in exact.items()])
    )
    print(f"clustered: topk_lsh recall {topk_recall:.3f}, "
          f"knn_join recall {knn_recall:.3f} (selective 6x8)")
    assert topk_recall >= 0.9
    assert knn_recall >= 0.95


def test_scalar_quantizer_reconstruction_and_recall(emb):
    """SQ8 contracts: (a) codes are ints in [0,255]; (b) per-dim
    reconstruction error <= span/510 + eps (the grid's half-step);
    (c) cosine top-10 over dequantized codes recovers >= 8/10 of the
    exact float top-10 — 8-bit scalar quantization barely moves a
    64-dim cosine ranking."""
    from skrub_spark.similarity import (
        dequantize_expr, fit_scalar_quantizer, quantize_embeddings,
        topk_cosine_quantized,
    )

    df, ids, mat = emb
    quant = fit_scalar_quantizer(df, "embedding")
    lo = np.array(quant["lo"])
    hi = np.array(quant["hi"])
    assert np.allclose(lo, mat.min(axis=0), atol=1e-6)
    assert np.allclose(hi, mat.max(axis=0), atol=1e-6)

    coded = quantize_embeddings(df, quant, "embedding", "codes")
    deq = coded.withColumn("xhat", dequantize_expr(quant, "codes"))
    rows = deq.select("vec_id", "codes", "xhat").collect()
    by_id = {r["vec_id"]: r for r in rows}
    span = hi - lo
    half_step = span / 255.0 / 2.0 + 1e-6
    for r in rows:
        codes = np.array(list(r["codes"]))
        assert codes.min() >= 0 and codes.max() <= 255
        orig = mat[list(ids).index(r["vec_id"])]
        err = np.abs(np.array(list(r["xhat"])) - orig)
        assert (err <= half_step).all()

    qv = mat[list(ids).index(0)]
    exact = _exact_topk(ids, mat, qv, K)
    got = {
        r["vec_id"]
        for r in topk_cosine_quantized(df, quant, list(qv), k=K).collect()
    }
    assert len(exact & got) >= 8, (exact, got)
