"""AggJoiner / MultiAggJoiner / AggTarget.

Behavior parity: skrub/_agg_joiner.py and _multi_agg_joiner.py —
aggregate an auxiliary table on key columns with named operations,
then left-join the aggregates onto the main table, suffixing new
columns. Spark plan: partial (map-side) aggregation happens for
free in groupBy; the aggregated side is tiny relative to the main
table, so we broadcast it to avoid shuffling the 100 TB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..base import SparkTransformer

_OPS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "std": lambda c: F.stddev_samp(c),
    "var": lambda c: F.var_samp(c),
    "median": lambda c: F.median(c),
    "mode": lambda c: F.mode(c),
    "count_distinct": lambda c: F.count_distinct(c),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
}


def _as_list(x) -> list:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def aggregate_table(
    aux: DataFrame,
    key: list[str],
    cols: list[str],
    operations: list[str],
    suffix: str = "",
) -> DataFrame:
    """groupBy(key).agg(op(col) for each col × op), outputs named
    ``{col}_{op}{suffix}`` (reference naming: _agg_joiner.py:34)."""
    aggs = []
    for col in cols:
        for op in operations:
            if op not in _OPS:
                raise ValueError(f"unknown operation {op!r}; options: {sorted(_OPS)}")
            aggs.append(_OPS[op](F.col(col)).alias(f"{col}_{op}{suffix}"))
    return aux.groupBy(*[F.col(k) for k in key]).agg(*aggs)


class AggJoiner(SparkTransformer):
    """Aggregate ``aux_table`` on ``aux_key``, left-join onto main on
    ``main_key``. The aggregate (one row per key) is broadcast when
    small — the main table never shuffles."""

    def __init__(
        self,
        aux_table: DataFrame,
        *,
        operations,
        key=None,
        main_key=None,
        aux_key=None,
        cols=None,
        suffix: str = "",
        broadcast_aux: bool = True,
    ):
        if key is not None:
            main_key = aux_key = key
        self.main_key = _as_list(main_key)
        self.aux_key = _as_list(aux_key)
        if not self.main_key or len(self.main_key) != len(self.aux_key):
            raise ValueError("main_key and aux_key must be same-length non-empty")
        self.aux_table = aux_table
        self.operations = _as_list(operations)
        self.cols = _as_list(cols) or [
            c for c in aux_table.columns if c not in self.aux_key
        ]
        self.suffix = suffix
        self.broadcast_aux = broadcast_aux

    def _fit(self, df: DataFrame, y=None):
        self._agg = aggregate_table(
            self.aux_table, self.aux_key, self.cols, self.operations, self.suffix
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        right = broadcast(self._agg) if self.broadcast_aux else self._agg
        cond = [
            df[m] == right[a] for m, a in zip(self.main_key, self.aux_key)
        ]
        joined = df.join(right, on=cond, how="left")
        # drop the aux-side key columns (reference keeps only main keys)
        for a in self.aux_key:
            joined = joined.drop(right[a])
        return joined


class MultiAggJoiner(SparkTransformer):
    """n aux tables, each with its own keys/cols/operations
    (reference: _multi_agg_joiner.py)."""

    def __init__(
        self,
        aux_tables,
        *,
        operations,
        main_keys,
        aux_keys,
        cols=None,
        suffixes=None,
    ):
        n = len(aux_tables)
        self.joiners = []
        cols = cols or [None] * n
        suffixes = suffixes or [f"_{i + 1}" for i in range(n)]
        for i in range(n):
            self.joiners.append(
                AggJoiner(
                    aux_tables[i],
                    operations=operations[i],
                    main_key=main_keys[i],
                    aux_key=aux_keys[i],
                    cols=cols[i],
                    suffix=suffixes[i],
                )
            )

    def _fit(self, df: DataFrame, y=None):
        for j in self.joiners:
            j.fit(df)

    def _transform(self, df: DataFrame) -> DataFrame:
        for j in self.joiners:
            df = j.transform(df)
        return df


class AggTarget(SparkTransformer):
    """Aggregate the target column by key and join back as features
    (reference: _agg_joiner.py:411 AggTarget). ``y`` is a column name
    in the main table here (Spark has no separate y frame)."""

    def __init__(self, main_key, operations, target_col: str, suffix: str = "_target"):
        self.main_key = _as_list(main_key)
        self.operations = _as_list(operations)
        self.target_col = target_col
        self.suffix = suffix

    def _fit(self, df: DataFrame, y=None):
        self._agg = aggregate_table(
            df, self.main_key, [self.target_col], self.operations, self.suffix
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.join(broadcast(self._agg), on=self.main_key, how="left")
