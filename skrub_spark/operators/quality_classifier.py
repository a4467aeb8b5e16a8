"""Learned document-quality classifier (beyond-reference LLM-pipeline
operator, SURVEY.md §2 — the FineWeb-Edu / fastText shape).

Production curation pipelines (FineWeb-Edu, RefinedWeb, DCLM) filter
with a LEARNED classifier, not just heuristics: an expensive teacher
(LLM annotations, curated positives) labels a bounded sample, a cheap
linear model over hashed word n-gram features distills the teacher,
and the frozen model then scores the full corpus map-side. This
module provides that loop Spark-first:

- :func:`hashed_text_features` — hashed unigram+bigram counts. The
  bucket hash is the ENGINE-PORTABLE md5 rule shared with the
  samplers (``conv(substring(md5(salt||unit),1,15),16,10) mod
  n_features``), so a SQL oracle replays every bucket exactly.
- :func:`fit_quality_classifier` — distributed MLlib
  LogisticRegression over per-doc tf vectors (features are built
  JVM-side: map_from_entries + a dense transform; no Python in the
  feature path). Fit runs on the LABELED sample — bounded by the
  teacher's budget, not the corpus — exactly as FineWeb-Edu trains
  on ~500k annotated pages, never the full crawl.
- :func:`score_quality` — corpus-scale scoring with FROZEN weights:
  one explode + one (id, bucket) map-side-combined aggregation +
  one broadcast join against the n_features-row weight table.
  ``score = sigmoid(bias + mean(weight[bucket(unit)]))`` is pure
  arithmetic, so with literal weights the whole pass is exact SQL
  (battery query ``quality_classifier_scores``) and feeds
  :func:`~skrub_spark.operators.sampling.sample_weighted` for the
  keep-proportional-to-quality rule (``quality_classifier_filter``).

Reference parity: skrub has no learned text filter (its closest
surface is GapEncoder/StringEncoder feature extraction); this is a
beyond-reference operator specified by the brief's training-data
pipeline list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles

_DEFAULT_SALT = "qc1|"


def feature_bucket(unit: Column, n_features: int, salt: str = _DEFAULT_SALT) -> Column:
    """Stable, engine-portable feature bucket in [0, n_features):
    60 md5 bits -> mod n_features (same construction as
    ``sampling._hash_bucket``; DuckDB replays it as
    ``('0x' || substr(md5(salt || u), 1, 15))::BIGINT % n``)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), unit)), 1, 15), 16, 10
        ).cast("long"),
        F.lit(int(n_features)),
    )


def hashed_text_features(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_features: int = 256,
    bigrams: bool = True,
    salt: str = _DEFAULT_SALT,
) -> DataFrame:
    """Hashed n-gram counts: one row per (doc, bucket) with the count
    of lowercased whitespace unigrams (and word bigrams when
    ``bigrams``) hashing into that bucket. The explode + groupBy is
    map-side combined; nothing leaves the JVM. (r10 note: a
    fan_out here was measured NET-NEGATIVE — unigram+bigram md5
    work per doc is too small to amortize the extra shuffle, unlike
    the char-trigram pipeline in operators/language_id.py.)"""
    units = F.transform(tokens(F.col(content_col)), lambda t: F.lower(t))
    if bigrams:
        units = F.concat(units, word_shingles(F.col(content_col), 2))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(units).alias("u"))
        .select("id", feature_bucket(F.col("u"), n_features, salt).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_quality_classifier(
    df: DataFrame,
    label_col: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_features: int = 256,
    bigrams: bool = True,
    salt: str = _DEFAULT_SALT,
    reg_param: float = 1e-3,
    max_iter: int = 100,
) -> dict:
    """Train the distillation classifier; returns a frozen-model dict
    ``{"n_features", "bigrams", "salt", "weights": [n_features],
    "bias"}`` ready for :func:`score_quality`.

    ``label_col`` is the TEACHER signal (0/1): LLM annotations,
    curated positives, or a heuristic being distilled. Feature
    vectors are per-doc term frequencies (bucket count / total
    units), assembled JVM-side and handed to MLlib's distributed
    LogisticRegression (L2, LBFGS). Docs with zero units carry no
    gradient and are skipped. Driver state = the n_features
    coefficient vector — corpus-independent."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = hashed_text_features(
        df, content_col, id_col,
        n_features=n_features, bigrams=bigrams, salt=salt,
    )
    dense = (
        feats.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("bucket").cast("int"), F.col("cnt"))
                )
            ).alias("m"),
            F.sum("cnt").cast("double").alias("tot"),
        )
        .select(
            "id",
            array_to_vector(
                F.transform(
                    F.sequence(F.lit(0), F.lit(int(n_features) - 1)),
                    lambda i: F.coalesce(
                        F.element_at("m", i).cast("double"), F.lit(0.0)
                    )
                    / F.col("tot"),
                )
            ).alias("features"),
        )
    )
    labeled = dense.join(
        df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("double").alias("label"),
        ),
        "id",
    )
    lr = LogisticRegression(
        maxIter=int(max_iter), regParam=float(reg_param), elasticNetParam=0.0
    )
    model = lr.fit(labeled)
    return {
        "n_features": int(n_features),
        "bigrams": bool(bigrams),
        "salt": salt,
        "weights": [float(x) for x in model.coefficients.toArray()],
        "bias": float(model.intercept),
    }


def quality_score_column(
    model: dict, content_col: str = "text"
) -> Column:
    """The frozen-model quality score as a PURE Column — the
    per-unit weight lookup and mean run inside the row (F.aggregate
    over the unit array, weights as a constant-folded literal
    array), so there is no groupBy/join at all. This is the form
    that runs unchanged inside Structured Streaming (stateless map;
    battery query ``streaming_quality_gate``) and the cheapest batch
    shape for pipelines that already carry the text column. Same
    arithmetic as :func:`score_quality` — identical scores after the
    battery queries' 6dp round (the in-row sum orders additions
    sequentially; the groupBy form orders them by shuffle)."""
    units = F.transform(tokens(F.col(content_col)), lambda t: F.lower(t))
    if model["bigrams"]:
        units = F.concat(units, word_shingles(F.col(content_col), 2))
    warr = F.expr(
        "array(" + ",".join(
            f"CAST({float(w)!r} AS DOUBLE)" for w in model["weights"]
        ) + ")"
    )
    n_feat = int(model["n_features"])
    salt = model.get("salt", _DEFAULT_SALT)
    total = F.aggregate(
        units,
        F.lit(0.0),
        lambda acc, u: acc
        + F.element_at(
            warr, (feature_bucket(u, n_feat, salt) + F.lit(1)).cast("int")
        ),
    )
    n = F.size(units)
    margin = F.lit(float(model["bias"])) + F.when(
        n > 0, total / n.cast("double")
    ).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def score_quality(
    df: DataFrame,
    model: dict,
    content_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Score every document with a frozen model: adds ``score_col`` =
    ``sigmoid(bias + mean over units of weights[bucket(unit)])``.

    The 100 TB path: one token explode, one map-side-combined
    (id, bucket) aggregation, one BROADCAST join against the
    n_features-row weight table, one per-doc aggregation — no
    Python, no driver data. Zero-unit docs score ``sigmoid(bias)``
    (the empty-feature margin), so every input row survives with a
    score. Mean (not sum) of unit weights keeps the margin
    length-invariant — the same tf normalization the fit used."""
    feats = hashed_text_features(
        df, content_col, id_col,
        n_features=model["n_features"], bigrams=model["bigrams"],
        salt=model.get("salt", _DEFAULT_SALT),
    )
    spark = df.sparkSession
    wt = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(model["weights"])],
        "bucket long, w double",
    )
    dots = (
        feats.join(F.broadcast(wt), "bucket", "left")
        .groupBy("id")
        .agg(
            (
                F.sum(F.col("cnt") * F.coalesce("w", F.lit(0.0)))
                / F.sum("cnt")
            ).alias("__dot")
        )
    )
    margin = F.lit(float(model["bias"])) + F.coalesce(
        F.col("__dot"), F.lit(0.0)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return (
        df.join(
            dots.withColumnRenamed("id", id_col), id_col, "left"
        )
        .withColumn(score_col, score)
        .drop("__dot")
    )
