"""InterpolationJoiner — parity with skrub/_interpolation_joiner.py.

The reference joins values that may not exist in the aux table by
PREDICTING them with a supervised model fit on the aux table
(features = join keys, targets = requested columns; default
estimator HistGradientBoosting, _interpolation_joiner.py:19-20).
Spark-first realizations, selected by ``model=``:

- ``model="knn"`` (default): numeric means / categorical modes of
  the k closest aux rows. Broadcastable aux → broadcast cross join +
  per-left top-k + one groupBy. Deterministic (tiebreak column).
- ``model="gbt"`` / ``model="linear"``: one Spark MLlib model per
  target, FIT ON THE AUX TABLE (distributed), then scored on the
  DISTINCT main keys only — the main table itself is never shuffled;
  predictions broadcast-join back. Numeric targets get a
  GBTRegressor / LinearRegression; string targets get a classifier
  (the reference defaults to HistGradientBoostingClassifier for
  categorical targets, _interpolation_joiner.py:19-20): binary →
  GBTClassifier, multiclass → RandomForestClassifier (MLlib's GBT is
  binary-only; the forest is its multiclass tree-ensemble analog),
  ``model="linear"`` → multinomial LogisticRegression. Labels round-
  trip through StringIndexer/IndexToString so predictions come back
  as the original strings.

At 100 TB with a huge aux table you would bucket both sides on a
coarse quantization of the keys first (same banding trick as the
other joins); the hook is ``aux_prefilter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..base import SparkTransformer




def _interpolation_join_ml(
    main: DataFrame,
    aux: DataFrame,
    main_key: list[str],
    aux_key: list[str],
    targets: list[str],
    suffix: str,
    model: str,
    seed: int,
) -> DataFrame:
    """Learned-model path: one MLlib model per target (regressor for
    numeric targets, classifier for string targets), fit on the aux
    table, scored on DISTINCT main keys, broadcast back."""
    from pyspark.ml.feature import VectorAssembler

    aux_types = dict(aux.dtypes)
    for ak in aux_key:
        if aux_types.get(ak) == "string":
            raise ValueError(
                "model='gbt'/'linear' needs numeric key columns; "
                f"{ak!r} is a string — use model='knn' or encode it first"
            )
    _num = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    for t in targets:
        dt = aux_types.get(t, "")
        if not (dt in _num or dt.startswith("decimal") or dt == "string"):
            raise ValueError(
                "model='gbt'/'linear' needs numeric (regression) or "
                f"string (classification) targets; {t!r} is {dt!r}"
            )
    feat = VectorAssembler(
        inputCols=[f"__f{i}" for i in range(len(aux_key))], outputCol="__features"
    )
    train = aux.select(
        *[F.col(ak).cast("double").alias(f"__f{i}") for i, ak in enumerate(aux_key)],
        *[F.col(t) for t in targets],
    ).na.drop(subset=[f"__f{i}" for i in range(len(aux_key))])
    train_vec = feat.transform(train)

    # score ONLY the distinct main keys (predictions are a function of
    # the keys), then broadcast-join back: the main table never moves.
    key_points = main.select(*main_key).distinct()
    score_vec = feat.transform(
        key_points.select(
            *main_key,
            *[
                F.col(mk).cast("double").alias(f"__f{i}")
                for i, mk in enumerate(main_key)
            ],
        ).na.drop(subset=[f"__f{i}" for i in range(len(main_key))])
    )
    preds = score_vec
    for t in targets:
        tr = train_vec.na.drop(subset=[t])
        if aux_types.get(t) == "string":
            preds = _fit_predict_classifier(tr, preds, t, model, seed)
            continue
        if model == "gbt":
            from pyspark.ml.regression import GBTRegressor

            est = GBTRegressor(
                featuresCol="__features", labelCol=t, predictionCol=f"__p_{t}",
                maxIter=20, maxDepth=4, seed=seed,
            )
        else:
            from pyspark.ml.regression import LinearRegression

            est = LinearRegression(
                featuresCol="__features", labelCol=t, predictionCol=f"__p_{t}"
            )
        fitted = est.fit(tr)
        preds = fitted.transform(preds)
    out = preds.select(
        *main_key, *[F.col(f"__p_{t}").alias(f"{t}{suffix}") for t in targets]
    )
    return main.join(broadcast(out), on=main_key, how="left")


def _fit_predict_classifier(
    train: DataFrame, preds: DataFrame, t: str, model: str, seed: int
) -> DataFrame:
    """Classification branch for one string target: index labels,
    fit the classifier on the aux rows, score the key points, map
    predicted indexes back to the original label strings."""
    from pyspark.ml.feature import IndexToString, StringIndexer

    idx = StringIndexer(
        inputCol=t, outputCol=f"__y_{t}", handleInvalid="skip"
    ).fit(train)
    tr = idx.transform(train)
    n_classes = len(idx.labels)
    common = dict(
        featuresCol="__features",
        labelCol=f"__y_{t}",
        predictionCol=f"__pi_{t}",
    )
    if model == "gbt":
        if n_classes <= 2:
            from pyspark.ml.classification import GBTClassifier

            est = GBTClassifier(maxIter=20, maxDepth=4, seed=seed, **common)
        else:
            # MLlib's GBTClassifier is binary-only; the random forest
            # is its multiclass tree-ensemble counterpart.
            from pyspark.ml.classification import RandomForestClassifier

            est = RandomForestClassifier(
                numTrees=50, maxDepth=6, seed=seed, **common
            )
    else:
        from pyspark.ml.classification import LogisticRegression

        est = LogisticRegression(**common)
    scored = est.fit(tr).transform(preds)
    back = IndexToString(
        inputCol=f"__pi_{t}", outputCol=f"__p_{t}", labels=idx.labels
    )
    # default-named score columns would clash on the next target's
    # transform — drop them along with the index-space prediction
    return back.transform(scored).drop(
        f"__pi_{t}", "rawPrediction", "probability"
    )


def interpolation_join(
    main: DataFrame,
    aux: DataFrame,
    *,
    main_key,
    aux_key,
    targets: list[str],
    k: int = 3,
    tiebreak: str | None = None,
    suffix: str = "",
    model: str = "knn",
    seed: int = 42,
) -> DataFrame:
    main_key = [main_key] if isinstance(main_key, str) else list(main_key)
    aux_key = [aux_key] if isinstance(aux_key, str) else list(aux_key)
    if model in ("gbt", "linear"):
        return _interpolation_join_ml(
            main, aux, main_key, aux_key, targets, suffix, model, seed
        )
    if model != "knn":
        raise ValueError("model must be 'knn', 'gbt' or 'linear'")
    tiebreak = tiebreak or aux_key[0]

    aux_cols = list(dict.fromkeys(aux_key + targets + [tiebreak]))
    # alias every aux-side column to a unique internal name BEFORE the
    # crossJoin: main_key and aux_key often share names (key="lat"),
    # and bare F.col(name) in the distance expression would be
    # AMBIGUOUS_REFERENCE.
    _a = "__skrub_aux_"
    aux_small = aux.select(*[F.col(c).alias(_a + c) for c in aux_cols])
    # predictions depend only on the key values: compute kNN once per
    # DISTINCT main key (tiny for categorical/low-card keys), then
    # broadcast-join predictions back onto the main rows. The main
    # table is never cross-joined or shuffled.
    key_points = main.select(*main_key).distinct()
    pairs = key_points.crossJoin(broadcast(aux_small))
    main_types = dict(main.dtypes)
    dist = None
    for mk, ak in zip(main_key, aux_key):
        if main_types.get(mk) == "string":
            # categorical key: 0/1 mismatch distance (exact-match
            # neighbors first, like a tree split on the category)
            d = (F.col(mk) != F.col(_a + ak)).cast("double")
        else:
            d = (F.col(mk).cast("double") - F.col(_a + ak).cast("double")) ** 2
        dist = d if dist is None else dist + d
    # nulls_last: a null-key aux row has a null distance, which asc()
    # would rank FIRST (beating every real neighbor) — push it last.
    w = Window.partitionBy(*main_key).orderBy(
        dist.asc_nulls_last(), F.col(_a + tiebreak).asc_nulls_last()
    )
    topk = pairs.withColumn("__rnk", F.row_number().over(w)).filter(
        F.col("__rnk") <= k
    )
    target_types = dict(aux.dtypes)
    aggs = []
    for t in targets:
        out_name = f"{t}{suffix}"
        if target_types[t] == "string":
            aggs.append(F.mode(F.col(_a + t)).alias(out_name))
        else:
            aggs.append(F.avg(F.col(_a + t).cast("double")).alias(out_name))
    preds = topk.groupBy(*main_key).agg(*aggs)
    return main.join(broadcast(preds), on=main_key, how="left")


class InterpolationJoiner(SparkTransformer):
    def __init__(self, aux_table: DataFrame, **kwargs):
        self.aux_table = aux_table
        self.kwargs = kwargs

    def _fit(self, df, y=None):
        pass

    def _transform(self, df: DataFrame) -> DataFrame:
        return interpolation_join(df, self.aux_table, **self.kwargs)
