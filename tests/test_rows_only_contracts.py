"""Numerical contracts behind the rows-only driver queries.

string_encoder_features / gap_encoder_* / image_decode_stats have no
SQL oracle (SVD, NMF and payload synthesis aren't SQL-expressible),
so their driver check is "runs, returns rows". These tests pin the
MATH instead: the StringEncoder projection equals a numpy SVD of the
same tf-idf matrix, the GapEncoder solver's reconstruction error
decreases with iterations, and the image query's pixel stats equal a
hand-computed decode of the same seeded payload.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_string_encoder_svd_geometry_vs_numpy(spark):
    """fit() accumulates Xᵀ X distributedly and eigendecomposes it;
    that must equal numpy's SVD of the SAME tf-idf matrix: identical
    idf weights, identical top-k right-singular SUBSPACE (projectors
    match — individual vectors may flip sign), and transform output
    exactly X @ components."""
    from skrub_spark.encoders.string_encoder import StringEncoder, _gram_expr

    corpus = [
        "apple pie", "apple tart", "apple cake", "steel beam",
        "steel rod", "steel bar", "zebra crossing", "quartz watch",
    ]
    n, d, k = len(corpus), 32, 3
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], "id int, t string"
    )
    enc = StringEncoder("t", n_components=k, hash_dim=d)
    out = enc.fit_transform(df)

    # rebuild X using Spark ONLY for the gram->bucket hash (xxhash64),
    # everything downstream in numpy
    pairs = (
        df.select("id", F.explode(_gram_expr("t", (3, 4))).alias("g"))
        .withColumn("b", F.pmod(F.xxhash64("g"), F.lit(d)).cast("int"))
        .groupBy("id", "b")
        .count()
        .collect()
    )
    X = np.zeros((n, d))
    for r in pairs:
        X[r["id"], r["b"]] = r["count"]
    dfreq = (X > 0).sum(axis=0)
    idf = np.where(dfreq > 0, np.log((1.0 + n) / (1.0 + dfreq)) + 1.0, 0.0)
    nz = dfreq > 0
    assert np.allclose(idf[nz], enc._idf[nz])

    Xt = X * idf
    _, S, Vt = np.linalg.svd(Xt, full_matrices=False)
    # eigengap guard: subspace comparison is only well-defined when
    # the k-th and (k+1)-th singular values are separated
    assert S[k - 1] - S[k] > 1e-6
    V = Vt[:k].T
    C = enc._components
    assert np.allclose(V @ V.T, C @ C.T, atol=1e-6)

    rows = {r["id"]: [r[f"t_{i}"] for i in range(k)] for r in out.collect()}
    want = Xt @ C
    for i in range(n):
        assert np.allclose(rows[i], want[i], atol=1e-8)


def test_gap_encoder_reconstruction_error_decreases():
    """The gamma-Poisson solver behind gap_encoder_topics: generalized
    KL divergence of X from W·H must decrease as iterations grow (the
    multiplicative-update convergence property that makes the encoder
    an NMF at all)."""
    from skrub_spark.encoders.gap_encoder import _fit_full_batch

    rng = np.random.default_rng(0)
    W_true = rng.gamma(1.2, size=(40, 3))
    H_true = rng.gamma(1.2, size=(3, 24))
    X = rng.poisson(W_true @ H_true).astype("float64")

    def gkl(n_iter: int) -> float:
        H, W, _, _ = _fit_full_batch(
            X, 3, 1.1, 1.1, 0.95, n_iter, seed=7
        )
        WH = W @ H + 1e-10
        Xp = X + 1e-10
        return float((Xp * np.log(Xp / WH) - Xp + WH).sum())

    errs = [gkl(i) for i in (1, 3, 10, 30, 100)]
    # strictly decreasing at every checkpoint (measured 2026-08:
    # 1246 -> 1225 -> 1211 -> 1197 -> 1147; the rho-discounted
    # accumulator updates converge slowly but never regress)
    assert all(b < a for a, b in zip(errs, errs[1:])), errs
    assert errs[-1] < errs[0] * 0.95, errs


def test_image_decode_stats_matches_hand_decode(spark, sf_dir):
    """q_image_decode_stats pixel stats == numpy stats of the same
    doc_id-seeded pixel array (the BMP encode/decode round-trip in
    the Arrow batch must not alter the pixel multiset)."""
    from skrub_spark.queries import q_image_decode_stats

    from skrub_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rows = q_image_decode_stats(spark, sf_dir).take(9)
    assert len(rows) == 9
    for r in rows:
        doc_id = r["doc_id"]
        rng = np.random.default_rng(int(doc_id))
        px = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
        if int(doc_id) % 3 == 2:
            # JPEG docs: lossy but DETERMINISTIC — the hand decode of
            # the same encode must match the pipeline's stats exactly
            px = decode_jpeg(encode_jpeg(px, quality=95))
        assert r["decode_ok"] is True
        assert abs(r["px_mean"] - float(px.mean())) < 1e-3
        assert abs(r["px_std"] - float(px.std())) < 1e-3


def test_unigram_em_expected_counts_match_numpy(spark):
    """unigram_token_stats' training query is rows-only (float EM);
    this pins the E-step math: the distributed forward-backward
    expected counts must equal a from-scratch numpy enumeration of
    ALL segmentations of a small word (probability-weighted piece
    counts)."""
    from itertools import product

    from skrub_spark.operators.unigram_lm import _expected_counts

    probs = {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.25}
    word, cnt = "aba", 4
    df = spark.createDataFrame([(word, cnt)], "w string, c long")
    got = {
        r["piece"]: r["ec"]
        for r in _expected_counts(df, probs, 2).collect()
    }

    # enumerate segmentations of 'aba' over the vocab
    def segs(w):
        if not w:
            yield []
            return
        for p in probs:
            if w.startswith(p):
                for rest in segs(w[len(p):]):
                    yield [p] + rest

    paths = list(segs(word))
    weights = [np.prod([probs[p] for p in path]) for path in paths]
    z = sum(weights)
    expect: dict[str, float] = {}
    for path, wgt in zip(paths, weights):
        for p in path:
            expect[p] = expect.get(p, 0.0) + cnt * wgt / z
    assert set(got) == set(expect)
    for p in expect:
        assert abs(got[p] - expect[p]) < 1e-9, (p, got[p], expect[p])
