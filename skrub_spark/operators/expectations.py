"""Declarative data-quality constraint audit (Deequ shape).

The reference's `TableReport`/`Cleaner` (reference:
``skrub/_reporting/_summarize.py``, ``skrub/_cleaner.py``) DESCRIBE a
table; production pipelines also need to ASSERT on it — the
AWS-Deequ / Great-Expectations "unit tests for data" model: a suite
of declarative constraints (completeness, uniqueness, bounds,
pattern compliance, set membership) evaluated against a table, each
yielding a metric and a pass/fail status, so an ingest job can gate
a 100 TB batch before it poisons downstream training data.

Scale design:
- Every ROW-LEVEL analyzer (completeness, min/max/mean, compliance,
  row_count) compiles to ONE aggregate expression; the whole suite
  is a single map-side-combined `df.agg(...)` pass — one scan, one
  1-row result, regardless of how many constraints. The 1-row frame
  is unpivoted to long form with `stack` (driver-free).
- `uniqueness`/`distinctness` genuinely need a per-column groupBy
  (Deequ does the same); each is one shuffle ON THAT COLUMN whose
  output is two partial-agged counters, then the scalar rows union
  onto the same long frame. No payload ever leaves the scan.
- Means over doubles go through DECIMAL casts so the metric is a
  ratio of EXACT integers — partitioning-invariant and replayable
  bit-identically in any engine (a float `avg()` depends on
  summation order).
- `validate_rows` is the row-level twin (Great Expectations'
  "unexpected rows"): map-only — each rule becomes a CASE WHEN
  appending its name to a violations array, so quarantining bad
  rows at 100 TB costs one scan and no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint.

    kind ∈ {completeness, uniqueness, distinctness, min, max, mean,
    compliance, row_count}. ``predicate`` (SQL boolean expression
    string) is required for compliance. The check passes when
    min_value ≤ metric ≤ max_value (either bound optional).
    ``decimals`` controls the DECIMAL(38,d) cast used for exact
    mean sums (match the column's true scale, e.g. 2 for money)."""

    kind: str
    column: str | None = None
    predicate: str | None = None
    min_value: float | None = None
    max_value: float | None = None
    name: str | None = None
    decimals: int = 2

    @property
    def label(self) -> str:
        if self.name:
            return self.name
        col = self.column or (self.predicate or "*")
        return f"{self.kind}({col})"


_ROW_LEVEL = {
    "completeness", "min", "max", "mean", "compliance", "row_count",
}


def _metric_expr(c: Check) -> Column:
    if c.kind == "completeness":
        return (
            F.count(F.col(c.column)).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        )
    if c.kind == "min":
        return F.min(F.col(c.column)).cast("double")
    if c.kind == "max":
        return F.max(F.col(c.column)).cast("double")
    if c.kind == "mean":
        # exact decimal sum -> one IEEE division: order-invariant
        d = int(c.decimals)
        return (
            F.sum(F.col(c.column).cast(f"decimal(38,{d})")).cast("double")
            / F.greatest(F.count(F.col(c.column)), F.lit(1)).cast("double")
        )
    if c.kind == "compliance":
        return (
            F.sum(F.when(F.expr(c.predicate), 1).otherwise(0)).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        )
    if c.kind == "row_count":
        return F.count(F.lit(1)).cast("double")
    raise ValueError(f"unknown row-level check kind {c.kind!r}")


def _status(metric: Column, c: Check) -> Column:
    ok = F.lit(True)
    if c.min_value is not None:
        ok = ok & (metric >= F.lit(float(c.min_value)))
    if c.max_value is not None:
        ok = ok & (metric <= F.lit(float(c.max_value)))
    return ok & metric.isNotNull()


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate the suite; returns long-form
    (constraint, column, metric, passed).

    All row-level checks share ONE aggregation pass; each
    uniqueness/distinctness check adds one groupBy on its column
    (counters only). Metrics are rounded to 6dp so the frame is
    engine-replayable."""
    row_checks = [c for c in checks if c.kind in _ROW_LEVEL]
    grp_checks = [c for c in checks if c.kind not in _ROW_LEVEL]
    for c in grp_checks:
        if c.kind not in ("uniqueness", "distinctness"):
            raise ValueError(f"unknown check kind {c.kind!r}")

    parts: list[DataFrame] = []
    if row_checks:
        aggs = [
            F.round(_metric_expr(c), 6).alias(f"m{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        stack = ", ".join(
            f"'{c.label}', '{c.column or ''}', m{i}"
            for i, c in enumerate(row_checks)
        )
        long = one.selectExpr(
            f"stack({len(row_checks)}, {stack}) "
            "AS (constraint, column, metric)"
        )
        parts.append(long)

    for c in grp_checks:
        counts = df.groupBy(F.col(c.column).alias("__v")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        if c.kind == "uniqueness":
            # fraction of ROWS whose value occurs exactly once
            num = F.sum(F.when(F.col("__n") == 1, 1).otherwise(0))
        else:  # distinctness: distinct values / rows
            num = F.count(F.lit(1))
        scal = counts.agg(
            F.round(
                num.cast("double")
                / F.greatest(F.sum("__n"), F.lit(1)).cast("double"),
                6,
            ).alias("metric")
        ).select(
            F.lit(c.label).alias("constraint"),
            F.lit(c.column or "").alias("column"),
            F.col("metric"),
        )
        parts.append(scal)

    out = reduce(DataFrame.unionByName, parts)
    # re-attach pass/fail per constraint label (literal CASE chain —
    # the suite is small and driver-known)
    status = F.lit(None).cast("boolean")
    for c in checks:
        status = F.when(
            F.col("constraint") == c.label, _status(F.col("metric"), c)
        ).otherwise(status)
    return out.select(
        "constraint", "column", F.col("metric").cast("double").alias("metric"),
        status.alias("passed"),
    )


@dataclass(frozen=True)
class RowRule:
    """A row must satisfy ``predicate`` (SQL boolean expression);
    violators collect ``name`` in their violations array."""

    name: str
    predicate: str


def validate_rows(
    df: DataFrame, rules: list[RowRule], keep_cols: list[str]
) -> DataFrame:
    """Map-only row validation: returns keep_cols + a SORTED
    ``violations`` array (names of failed rules; NULL predicate
    results count as violations, as in Great Expectations)."""
    viol = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.coalesce(F.expr(r.predicate), F.lit(False)),
                        F.lit(r.name),
                    )
                    for r in rules
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return df.select(*keep_cols, viol.alias("violations"))


def quarantine(
    df: DataFrame, rules: list[RowRule], keep_cols: list[str]
) -> DataFrame:
    """Rows failing ≥1 rule, with the reasons — the frame an ingest
    job writes aside instead of dropping silently."""
    v = validate_rows(df, rules, keep_cols)
    return v.filter(F.size("violations") > 0)
