"""GapEncoder — parity with skrub/_gap_encoder.py.

The reference fits a gamma-Poisson (KL/Poisson-NMF family)
factorization of the bag-of-n-grams matrix and outputs per-row topic
activations. Spark-first realization:

- fit: hashed n-gram count vectors of a seeded sample of DISTINCT
  values (category columns have few uniques relative to rows) are
  pulled to the driver, where Poisson-NMF (KL-divergence
  multiplicative updates — the MAP core of gamma-Poisson without
  the gamma priors) learns ``n_components`` topics H.
- transform: per-row activations w solve min KL(x, wH) by the same
  multiplicative updates, executed distributed in an Arrow-batched
  Pandas UDF (each batch is a small dense numpy problem; the model
  H ships once per executor via closure capture). This is true
  per-row inference, not a linear projection.

PARTIAL vs reference: no gamma priors / online partial_fit; fixed
iteration counts instead of convergence tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..base import SparkTransformer
from ..functions.text import char_ngrams

_EPS = 1e-10


def _poisson_nmf(X: np.ndarray, k: int, n_iter: int = 150, seed: int = 0):
    """KL-divergence NMF: X ≈ WH with multiplicative updates."""
    rng = np.random.default_rng(seed)
    n, d = X.shape
    W = rng.random((n, k)) + 0.1
    H = rng.random((k, d)) + 0.1
    for _ in range(n_iter):
        WH = W @ H + _EPS
        W *= ((X / WH) @ H.T) / (H.sum(axis=1)[None, :] + _EPS)
        WH = W @ H + _EPS
        H *= (W.T @ (X / WH)) / (W.sum(axis=0)[:, None] + _EPS)
    H /= H.sum(axis=1, keepdims=True) + _EPS
    return H


def _infer_activations(X: np.ndarray, H: np.ndarray, n_iter: int = 30):
    """Per-row KL-NMF inference with H fixed."""
    n, _ = X.shape
    k = H.shape[0]
    W = np.full((n, k), 1.0 / k)
    Hsum = H.sum(axis=1)[None, :] + _EPS
    for _ in range(n_iter):
        WH = W @ H + _EPS
        W *= ((X / WH) @ H.T) / Hsum
    # L1-normalize activations (reference outputs topic proportions)
    return W / (W.sum(axis=1, keepdims=True) + _EPS)


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
        X = np.zeros((max(len(vals), 1), self.hash_dim))
        for r in rows:
            X[vidx[r[self.col]], r["b"]] = r["count"]
        self._H = _poisson_nmf(X, self.n_components, seed=self.random_state)

    def get_feature_names_out(self):
        return [f"{self.col}_topic_{i}" for i in range(self.n_components)]

    def _transform(self, df: DataFrame) -> DataFrame:
        H = self._H
        hash_dim = self.hash_dim
        k = self.n_components
        rid = "__gap_row_id"

        # hashed bucket counts computed JVM-side with the SAME
        # xxhash64 bucketing the fit used (a Python-side hash would
        # misalign with H's columns); the UDF only runs the dense
        # fixed-H inference per Arrow batch.
        # localCheckpoint: `base` fans out into two plan branches
        # (sparse counts + the join back), and mono_id is
        # nondeterministic — truncate lineage so both branches see the
        # same ids even under task retries.
        base = df.withColumn(rid, F.monotonically_increasing_id()).localCheckpoint(
            eager=False
        )
        sparse = (
            base.select(rid, F.explode(self._grams(self.col)).alias("g"))
            .withColumn("b", F.pmod(F.xxhash64("g"), F.lit(hash_dim)).cast("int"))
            .groupBy(rid, "b")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            .groupBy(rid)
            .agg(
                F.collect_list(F.struct(F.col("b"), F.col("tf"))).alias("__sparse")
            )
        )

        @pandas_udf("array<double>")
        def topics(entries: pd.Series) -> pd.Series:
            X = np.zeros((len(entries), hash_dim))
            for i, row in enumerate(entries):
                if row is None:
                    continue
                for e in row:
                    X[i, int(e["b"])] = float(e["tf"])
            W = _infer_activations(X, H)
            return pd.Series([[float(x) for x in r] for r in W])

        joined = base.join(sparse, on=rid, how="left")
        out = joined.withColumn("__topics", topics(F.col("__sparse")))
        keep = [c for c in df.columns if not (self.drop_original and c == self.col)]
        return out.select(
            *keep,
            *[
                F.element_at("__topics", i + 1).alias(f"{self.col}_topic_{i}")
                for i in range(k)
            ],
        )
