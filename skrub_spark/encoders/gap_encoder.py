"""GapEncoder-lite — capability parity with skrub/_gap_encoder.py.

The reference fits a gamma-Poisson (NMF-family) factorization of the
bag-of-n-grams matrix and outputs per-row topic activations. Here:

- fit: hashed n-gram count vectors of a seeded sample of DISTINCT
  values (category columns have few uniques relative to rows) are
  pulled to the driver, where a small seeded multiplicative-update
  NMF (numpy) learns ``n_components`` topics W (topics × hash_dim).
  PARTIAL vs reference: plain NMF, not gamma-Poisson with priors.
- transform: distributed topic activation = normalized count vector
  projected on Wᵀ (one explode → broadcast join → groupBy sum),
  softmax-free; the reference performs per-row NNLS inference, this
  linear projection is the documented approximation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkTransformer
from ..functions.text import char_ngrams

_RID = "__sk_row_id"


def _nmf(X: np.ndarray, k: int, n_iter: int = 100, seed: int = 0):
    rng = np.random.default_rng(seed)
    n, d = X.shape
    W = rng.random((n, k)) + 0.1
    H = rng.random((k, d)) + 0.1
    eps = 1e-9
    for _ in range(n_iter):
        W *= (X @ H.T) / (W @ (H @ H.T) + eps)
        H *= (W.T @ X) / ((W.T @ W) @ H + eps)
    # L1-normalize topics
    H /= H.sum(axis=1, keepdims=True) + eps
    return H


class GapEncoder(SparkTransformer):
    def __init__(
        self,
        col: str,
        n_components: int = 10,
        ngram_range: tuple[int, int] = (2, 4),
        hash_dim: int = 512,
        fit_sample: int = 5000,
        drop_original: bool = True,
        random_state: int = 0,
    ):
        self.col = col
        self.n_components = n_components
        self.ngram_range = ngram_range
        self.hash_dim = hash_dim
        self.fit_sample = fit_sample
        self.drop_original = drop_original
        self.random_state = random_state

    def _grams(self, col):
        lo, hi = self.ngram_range
        g = char_ngrams(F.col(col), lo)
        for n in range(lo + 1, hi + 1):
            g = F.concat(g, char_ngrams(F.col(col), n))
        return g

    def _fit(self, df: DataFrame, y=None):
        uniq = (
            df.select(self.col)
            .where(F.col(self.col).isNotNull())
            .distinct()
            .orderBy(self.col)
            .limit(self.fit_sample)
        )
        rows = (
            uniq.select(
                F.col(self.col),
                F.explode(self._grams(self.col)).alias("g"),
            )
            .withColumn("b", F.pmod(F.xxhash64("g"), F.lit(self.hash_dim)).cast("int"))
            .groupBy(self.col, "b")
            .count()
            .collect()
        )
        vals = sorted({r[self.col] for r in rows})
        vidx = {v: i for i, v in enumerate(vals)}
        X = np.zeros((len(vals), self.hash_dim))
        for r in rows:
            X[vidx[r[self.col]], r["b"]] = r["count"]
        X /= X.sum(axis=1, keepdims=True) + 1e-9
        self._H = _nmf(X, self.n_components, seed=self.random_state)

    def get_feature_names_out(self):
        return [f"{self.col}_topic_{i}" for i in range(self.n_components)]

    def _transform(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        k = self.n_components
        proj = spark.createDataFrame(
            [
                (int(b), [float(self._H[t, b]) for t in range(k)])
                for b in range(self.hash_dim)
            ],
            "b int, topics array<double>",
        )
        base = df.withColumn(_RID, F.monotonically_increasing_id())
        counts = (
            base.select(_RID, F.explode(self._grams(self.col)).alias("g"))
            .withColumn("b", F.pmod(F.xxhash64("g"), F.lit(self.hash_dim)).cast("int"))
            .groupBy(_RID, "b")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )
        contrib = counts.join(F.broadcast(proj), "b").select(
            _RID,
            *[
                (F.col("tf") * F.element_at("topics", t + 1)).alias(f"__t{t}")
                for t in range(k)
            ],
        )
        feats = contrib.groupBy(_RID).agg(
            *[F.sum(f"__t{t}").alias(f"{self.col}_topic_{t}") for t in range(k)]
        )
        keep = [c for c in df.columns if not (self.drop_original and c == self.col)]
        out = base.join(feats, on=_RID, how="left").fillna(
            {f"{self.col}_topic_{t}": 0.0 for t in range(k)}
        )
        return out.select(*keep, *[f"{self.col}_topic_{t}" for t in range(k)])
