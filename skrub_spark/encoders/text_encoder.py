"""TextEncoder — capability parity with skrub/_text_encoder.py.

The reference embeds strings with a pretrained language model
(sentence-transformers). Model weights cannot be downloaded in this
environment, so the LM call is STUBBED with a deterministic
hash-projection embedding behind the identical API: the Spark-side
plumbing (batching, schema, output naming) is real. Swap
``_embed_batch`` for a real model (e.g. via a Pandas UDF loading a
local checkpoint per executor) to get true LM embeddings."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..base import SparkTransformer


def _embed_batch(texts: pd.Series, dim: int) -> np.ndarray:
    """Deterministic fake LM: seeded random projection of byte
    histograms. Replace with a real model for production use."""
    out = np.zeros((len(texts), dim), dtype="float64")
    rng_proj = np.random.default_rng(12345).standard_normal((256, dim))
    for i, t in enumerate(texts.fillna("")):
        hist = np.bincount(
            np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8), minlength=256
        )
        v = hist.astype("float64") @ rng_proj
        n = np.linalg.norm(v)
        out[i] = v / n if n > 0 else v
    return out


class TextEncoder(SparkTransformer):
    """Embed a text column to ``n_components`` dims via an
    Arrow-batched Pandas UDF (the standard shape for model inference
    on Spark: per-executor model, vectorized batches)."""

    def __init__(self, col: str, n_components: int = 32, drop_original: bool = True):
        self.col = col
        self.n_components = n_components
        self.drop_original = drop_original

    def _fit(self, df: DataFrame, y=None):
        pass

    def get_feature_names_out(self):
        return [f"{self.col}_{i}" for i in range(self.n_components)]

    def _transform(self, df: DataFrame) -> DataFrame:
        dim = self.n_components

        @pandas_udf("array<double>")
        def embed(texts: pd.Series) -> pd.Series:
            vecs = _embed_batch(texts, dim)
            return pd.Series([list(map(float, v)) for v in vecs])

        out = df.withColumn("__emb", embed(F.col(self.col)))
        keep = [c for c in df.columns if not (self.drop_original and c == self.col)]
        return out.select(
            *keep,
            *[
                F.element_at("__emb", i + 1).alias(f"{self.col}_{i}")
                for i in range(dim)
            ],
        )
