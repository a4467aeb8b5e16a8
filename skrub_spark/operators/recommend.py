"""Collaborative-filtering recommendations via MLlib ALS (r9c).

The classic implicit-feedback recommender over interaction counts
(customer × part quantities here): MLlib's distributed alternating
least squares (block-partitioned normal equations — the factor
matrices shard across executors, so this trains at any interaction
scale Spark can shuffle).

Correctness contract: an iterative least-squares fit is float-
accumulation-order dependent, so — like the repo's other MLlib fits
(GBT/logistic in operators/interpolation_joiner.py) — the battery
query is ROWS-ONLY, with pytest contracts pinning the semantics:
reconstruction RMSE beats the global-mean baseline, and
recommendations exclude already-seen items (the filter is exact
set subtraction, not model behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def als_recommend(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    *,
    rank: int = 8,
    max_iter: int = 8,
    reg: float = 0.1,
    implicit: bool = True,
    top_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Top-k unseen-item recommendations per user:
    ``(user, item, score, rec_rank)``.

    ``implicit=True`` uses the Hu-Koren-Volinsky confidence
    weighting (right for count data); the already-interacted items
    are anti-joined out AFTER scoring, so every returned item is
    genuinely novel to the user.
    """
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import Window

    base = interactions.select(
        F.col(user_col).cast("int").alias("user"),
        F.col(item_col).cast("int").alias("item"),
        F.col(rating_col).cast("float").alias("rating"),
    ).where(
        F.col("user").isNotNull()
        & F.col("item").isNotNull()
        & F.col("rating").isNotNull()
    )
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        implicitPrefs=implicit,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        seed=seed,
    )
    model = als.fit(base)
    # recommendForAllUsers returns a top-N dense array per user;
    # over-fetch so the seen-item anti-join still leaves top_k.
    # ADVICE r9: fetching top_k + max(n_seen) for EVERY user lets
    # one heavy user inflate every user's recommendation array, so
    # fetch top_k + p95(n_seen) for the bulk and top up only the
    # heavy tail (n_seen > p95) at top_k + max(n_seen). Each user's
    # fetch still covers top_k + their own n_seen, so the output is
    # identical — the arrays shipped per user are just bounded by
    # the typical, not the worst, history length.
    seen_per_user = base.groupBy("user").agg(
        F.countDistinct("item").alias("n_seen")
    )
    bounds = seen_per_user.agg(
        F.max("n_seen").alias("mx"),
        F.expr("percentile_approx(n_seen, 0.95, 10000)").alias("p95"),
    ).first()
    max_seen = int(bounds["mx"] or 0)
    p95_seen = int(bounds["p95"] or 0)

    def _flatten(r):
        return r.select(
            "user", F.explode("recommendations").alias("r")
        ).select(
            "user",
            F.col("r.item").alias("item"),
            F.col("r.rating").alias("score"),
        )

    recs = _flatten(
        model.recommendForAllUsers(int(top_k + min(max_seen, p95_seen)))
    )
    if max_seen > p95_seen:
        heavy = seen_per_user.where(
            F.col("n_seen") > p95_seen
        ).select("user")
        heavy_recs = _flatten(
            model.recommendForUserSubset(heavy, int(top_k + max_seen))
        )
        recs = recs.join(heavy, "user", "left_anti").unionByName(
            heavy_recs
        )
    unseen = recs.join(
        base.select("user", "item").distinct(), ["user", "item"], "left_anti"
    )
    w = Window.partitionBy("user").orderBy(
        F.col("score").desc(), F.col("item").asc()
    )
    return (
        unseen.withColumn("rec_rank", F.row_number().over(w))
        .where(F.col("rec_rank") <= top_k)
    )


def als_topk_frozen(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    *,
    model: dict | None = None,
    top_k: int = 5,
) -> DataFrame:
    """EXACT frozen-factor serving twin of :func:`als_recommend`
    (r11 — the tree_compile/_frozen.py precedent applied to the last
    rows-only scoring path): the iterative MLlib FIT stays
    rows-only by nature, but once the user/item factor tables are
    frozen to 6dp literals (``_frozen.ALS_MODEL``, pilot cohort x
    item slice), top-k scoring is pure integer-micro dot products —
    ``score12 = sum(u6_f * i6_f)`` in exact BIGINT (units 1e-12) —
    with the already-seen pairs anti-joined out of the CURRENT-scale
    interactions and a deterministic (score desc, item asc)
    tie-break. Bit-replayable by a SQL oracle at every scale.

    Returns ``(custkey, partkey, score, rec_rank)``; ``score`` is
    the one-IEEE-division double ``score12 / 1e12`` (no rounding —
    division is exactly rounded, so both engines emit the identical
    double).

    100 TB shape: the factor tables are codebook-sized literals
    (the cross join is |cohort| x |slice|, broadcast); the
    corpus-scale work is the seen-pairs distinct + anti-join. For a
    full-catalog serve, route factors through the quantized ANN
    path (similarity/quantize.py) instead of the cross join.
    """
    from pyspark.sql import Window

    if model is None:
        from .._frozen import ALS_MODEL as model  # type: ignore[no-redef]
    rank = int(model["rank"])
    ucols = [f"u{j}" for j in range(1, rank + 1)]
    icols = [f"i{j}" for j in range(1, rank + 1)]
    spark = interactions.sparkSession

    def _micro(rows, idname, cols):
        return spark.createDataFrame(
            [
                tuple([int(r[0])] + [int(round(float(x) * 1e6)) for x in r[1:]])
                for r in rows
            ],
            [idname] + cols,
        )

    uf = _micro(model["users"], "custkey", ucols)
    itf = _micro(model["items"], "partkey", icols)
    dot = None
    for uc, ic in zip(ucols, icols):
        t = F.col(uc) * F.col(ic)
        dot = t if dot is None else dot + t
    scored = uf.crossJoin(F.broadcast(itf)).select(
        "custkey", "partkey", dot.cast("long").alias("score12")
    )
    seen = interactions.select(
        F.col(user_col).cast("int").alias("custkey"),
        F.col(item_col).cast("int").alias("partkey"),
    ).distinct()
    unseen = scored.join(seen, ["custkey", "partkey"], "left_anti")
    w = Window.partitionBy("custkey").orderBy(
        F.col("score12").desc(), F.col("partkey").asc()
    )
    return (
        unseen.withColumn("rec_rank", F.row_number().over(w))
        .where(F.col("rec_rank") <= int(top_k))
        .select(
            "custkey",
            "partkey",
            (F.col("score12").cast("double") / F.lit(1e12)).alias("score"),
            "rec_rank",
        )
    )


def als_rmse(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    **als_kwargs,
) -> tuple[float, float]:
    """(model reconstruction RMSE, global-mean-baseline RMSE) on
    the training interactions — the pytest contract pair. Uses
    explicit feedback (ratings reconstructed directly)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.recommendation import ALS

    base = interactions.select(
        F.col(user_col).cast("int").alias("user"),
        F.col(item_col).cast("int").alias("item"),
        F.col(rating_col).cast("float").alias("rating"),
    )
    kwargs = dict(
        rank=8, maxIter=8, regParam=0.05, implicitPrefs=False, seed=42
    )
    kwargs.update(als_kwargs)
    als = ALS(
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        **kwargs,
    )
    model = als.fit(base)
    pred = model.transform(base)
    ev = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    )
    rmse = ev.evaluate(pred)
    gm = base.agg(F.avg("rating")).first()[0]
    baseline = (
        base.select(
            F.pow(F.col("rating") - F.lit(gm), 2).alias("se")
        )
        .agg(F.sqrt(F.avg("se")))
        .first()[0]
    )
    return float(rmse), float(baseline)
