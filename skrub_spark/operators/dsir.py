"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169; beyond-reference LLM-pipeline operator, SURVEY.md
§2).

The standard way to pick pretraining data that "looks like" a target
domain (Wikipedia+books in the paper; any curated corpus in practice)
without training a classifier per domain: estimate bag-of-hashed-
n-gram unigram distributions ``p`` (target) and ``q`` (raw pool) over
a small bucket space, weight every raw document by its importance
``log w(x) = Σ_b count_b(x) · (log p_b − log q_b)``, then sample the
training subset ∝ w(x) WITHOUT replacement via the Gumbel-top-k
trick. Spark-first realization:

- :func:`fit_dsir` — two explode + map-side-combined bucket counts
  (one tiny shuffle of ≤ n_features rows per side); driver state is
  the n_features log-ratio vector, corpus-independent. Laplace
  smoothing keeps unseen buckets finite.
- :func:`dsir_log_weight` — corpus-scale scoring with a FROZEN
  ratio vector: one token explode, one (id, bucket) partial-agg,
  one broadcast join against the n_features-row ratio table, one
  per-doc sum. Pure md5/double arithmetic → with literal ratios the
  whole pass is exact SQL (battery query ``dsir_weights``).
- :func:`dsir_resample` — Gumbel-top-k: key = logw + Gumbel(0,1)
  with the Gumbel drawn from the CONTENT-ADDRESSED md5 uniform
  (same rule as every sampler in this repo), so the "random" draw
  is reproducible on any cluster/partitioning AND SQL-replayable
  (battery query ``dsir_resample``). Top-k runs as a distributed
  TakeOrdered (orderBy + limit) — no global sort, the driver holds
  k rows.

At 100 TB: fit touches the corpus once with an n_features-bounded
shuffle; scoring is the same map-shaped pass as
``score_quality``; resampling adds one map-only key column and a
top-k. Nothing driver-side scales with the corpus.

Reference parity: skrub has no data-selection operator; this is a
beyond-reference operator specified by the brief's training-data
pipeline list (the DoReMi/DSIR family FineWeb-class pipelines run
between heuristic filtering and mixture sampling).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from .quality_classifier import feature_bucket
from .sampling import _FINE_BUCKETS, _hash_bucket

_DEFAULT_SALT = "dsir|"


def _units(content_col: str, bigrams: bool) -> Column:
    """Lowercased unigram (+ word-bigram) units — the same unit rule
    as hashed_text_features, kept in one place so fit and score
    can never drift."""
    u = F.transform(tokens(F.col(content_col)), lambda t: F.lower(t))
    if bigrams:
        u = F.concat(u, word_shingles(F.col(content_col), 2))
    return u


def _bucket_counts(
    df: DataFrame, content_col: str, n_features: int, bigrams: bool, salt: str
) -> dict[int, int]:
    """Total unit count per hashed bucket — ≤ n_features rows ever
    reach the driver."""
    rows = (
        df.select(F.explode(_units(content_col, bigrams)).alias("u"))
        .select(feature_bucket(F.col("u"), n_features, salt).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return {int(r["bucket"]): int(r["cnt"]) for r in rows}


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    content_col: str = "text",
    *,
    n_features: int = 256,
    bigrams: bool = True,
    salt: str = _DEFAULT_SALT,
    alpha: float = 1.0,
) -> dict:
    """Estimate the hashed-n-gram importance model; returns a frozen
    dict ``{"n_features", "bigrams", "salt", "log_ratios":
    [n_features]}`` ready for :func:`dsir_log_weight`.

    ``log_ratios[b] = log((t_b + α)/(T + α·n)) − log((r_b + α)/
    (R + α·n))`` with Laplace smoothing α so buckets unseen on
    either side stay finite. Both passes are distributed; driver
    state is two n_features-sized count maps."""
    t_counts = _bucket_counts(target, content_col, n_features, bigrams, salt)
    r_counts = _bucket_counts(raw, content_col, n_features, bigrams, salt)
    t_tot = sum(t_counts.values()) + alpha * n_features
    r_tot = sum(r_counts.values()) + alpha * n_features
    ratios = [
        math.log((t_counts.get(b, 0) + alpha) / t_tot)
        - math.log((r_counts.get(b, 0) + alpha) / r_tot)
        for b in range(n_features)
    ]
    return {
        "n_features": int(n_features),
        "bigrams": bool(bigrams),
        "salt": salt,
        "log_ratios": ratios,
    }


def dsir_log_weight(
    df: DataFrame,
    model: dict,
    content_col: str = "text",
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
) -> DataFrame:
    """Adds ``weight_col`` = Σ over units of log_ratios[bucket(unit)]
    (the document's log importance weight under the bag-of-hashed-
    n-grams model), ROUNDED to 6dp so the double sum is engine-
    portable. Zero-unit docs get 0.0 — every input row survives.

    ONE explode, ONE map-side-combined per-doc sum: the 256-entry
    ratio vector rides as a constant-folded literal array indexed by
    ``element_at`` (no join, no second shuffle — the weight-table
    BROADCAST join the quality classifier uses is already optimal at
    corpus scale, but a frozen vector this small is cheaper still as
    plan constant). Built as one ``F.expr`` string: 256 per-element
    ``F.lit`` calls would cost a py4j round-trip each."""
    arr = F.expr(
        "array(" + ",".join(
            f"CAST({float(x)!r} AS DOUBLE)" for x in model["log_ratios"]
        ) + ")"
    )
    b = feature_bucket(
        F.col("__u"), model["n_features"], model.get("salt", _DEFAULT_SALT)
    )
    logw = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_units(content_col, model["bigrams"])).alias("__u"),
        )
        .select("id", F.element_at(arr, (b + F.lit(1)).cast("int")).alias("__lr"))
        .groupBy("id")
        .agg(F.round(F.sum("__lr"), 6).alias("__logw"))
    )
    return (
        df.join(logw.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn(weight_col, F.coalesce("__logw", F.lit(0.0)))
        .drop("__logw")
    )


def gumbel_key(
    key: Column, logw: Column, salt: str = "dsirg|"
) -> Column:
    """Gumbel-top-k perturbed key: ``logw + round(−ln(−ln(u)), 6)``
    with ``u = (md5_bucket(key) + 0.5) / 10^8`` — a content-addressed
    Gumbel(0,1) draw, identical on every engine (the ±1-ulp libm/JVM
    ``ln`` drift dies in the 6dp round). Sampling the top-k of these
    keys IS sampling k docs without replacement ∝ exp(logw)."""
    u = (
        _hash_bucket(key, salt, _FINE_BUCKETS).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_FINE_BUCKETS))
    g = F.round(-F.log(-F.log(u)), 6)
    return logw + g


def dsir_resample(
    df: DataFrame,
    model: dict,
    k: int,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    salt: str = "dsirg|",
    key_col: str = "dsir_key",
) -> DataFrame:
    """Select ``k`` documents without replacement with probability
    ∝ exp(log importance weight): score with :func:`dsir_log_weight`,
    perturb with the content-addressed Gumbel, keep the global top-k
    (distributed TakeOrdered — orderBy + limit plans as a per-
    partition top-k merge, never a full sort). Deterministic: ties
    (6dp-rounded keys CAN collide) break on ``id_col``."""
    scored = dsir_log_weight(df, model, content_col, id_col)
    keyed = scored.withColumn(
        key_col,
        F.round(gumbel_key(F.col(id_col), F.col("dsir_logw"), salt), 6),
    )
    return keyed.orderBy(
        F.col(key_col).desc(), F.col(id_col).asc()
    ).limit(int(k))
