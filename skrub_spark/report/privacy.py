"""k-anonymity / l-diversity audit and rare-group suppression.

Training corpora and analytics extracts both ship with
quasi-identifier columns (location, segment, coarse balance, ...)
whose rare combinations re-identify individuals. The standard
pre-release gates (Sweeney's k-anonymity; Machanavajjhala's
l-diversity) are pure relational algebra, so they run as exact
Spark aggregations at any scale:

- ``k_anonymity_report``: ONE map-side-combined groupBy on the
  quasi-identifier tuple — the shuffle carries only the quasi
  columns (and optionally one sensitive column for the distinct
  count), never the payload. Output is one row per equivalence
  class with its size, its sensitive-value diversity and the two
  risk flags; at 100 TB this is the same cost as the release
  join itself would be, on a fraction of the bytes.
- ``suppress_rare``: generalization-by-suppression — quasi values
  of classes below ``k`` are nulled. Implemented as the class-size
  groupBy above plus ONE co-partitioned join back on the same
  quasi key (Catalyst reuses the shuffle partitioning), so the
  payload moves through exactly one shuffle.

Both are deterministic Column programs — no sampling, no UDFs —
and replay bit-identically in ANSI SQL (battery oracles
``k_anonymity_audit`` / ``k_suppression``).

Reference parity note: the skrub reference has no privacy surface;
this extends the report family (TableReport, associations, drift,
skew) that maps to ``skrub/_reporting`` (reference
``skrub/_reporting/_summarize.py:1``) with the release-gate audits
a corpus pipeline needs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    ``(*quasi_cols, cnt, risky_k[, n_sensitive, risky_l])``.

    ``risky_k`` marks classes smaller than ``k`` (re-identifiable);
    with ``sensitive_col``, ``n_sensitive`` is the class's distinct
    sensitive-value count and ``risky_l`` marks classes below ``l``
    (attribute-disclosable even when k-anonymous).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("cnt")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col))
            .cast("long")
            .alias("n_sensitive")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = out.withColumn("risky_k", F.col("cnt") < F.lit(int(k)))
    if sensitive_col is not None:
        out = out.withColumn(
            "risky_l", F.col("n_sensitive") < F.lit(int(l))
        )
    return out


def suppress_rare(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Null the quasi-identifier columns of every row whose
    equivalence class has fewer than ``k`` members; all other
    columns pass through unchanged. Column order and types are
    preserved (suppressed cells become typed NULLs).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    sizes = (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    joined = df.join(sizes, on=list(quasi_cols), how="left")
    keep = F.col("__cnt") >= F.lit(int(k))
    exprs = []
    for c, t in df.dtypes:
        if c in quasi_cols:
            exprs.append(
                F.when(keep, F.col(c))
                .otherwise(F.lit(None).cast(t))
                .alias(c)
            )
        else:
            exprs.append(F.col(c))
    return joined.select(*exprs)
