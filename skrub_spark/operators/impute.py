"""Group-wise robust imputation — beyond-reference data-prep
operator (SURVEY.md §2).

The reference's cleaning stages drop null-heavy columns
(``Cleaner``/``DropUninformative``); production feature pipelines
more often FILL: a missing account balance is imputed from its
nation's median, a missing sensor reading from its device's — the
sklearn ``SimpleImputer(strategy='median')`` shape, but grouped
and distributed. Mean imputation breaks on the same skew that
motivates ``mad_outliers``; the median is the robust default.

Exactness: the per-group median reuses the ``mad_outliers`` rank
-selection discipline (``report/outliers.py::_group_median2`` —
lower+upper middle values summed as exact DECIMALs, halved by an
exact power-of-two IEEE division), computed over NON-NULL values
only; the fill is a broadcast join + coalesce. Battery oracle
``impute_median`` replays selection and fill verbatim.

Scale shape: one group-partitioned rank window over the non-null
subset + a |groups|-sized broadcast join back — the same single
group-key shuffle a groupBy takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Adds ``out_col`` (default ``<value_col>_imputed``, DOUBLE)
    and ``<value_col>_was_imputed``: NULLs replaced by the exact
    per-group median of the non-null values (lower+upper-middle
    convention). Groups that are entirely NULL stay NULL (flagged
    imputed=false — there is nothing to impute FROM). ``value_col``
    should be DECIMAL/integer for exact replay."""
    from ..report.outliers import _group_median2

    out_col = out_col or f"{value_col}_imputed"
    v = F.col(value_col)
    med2 = _group_median2(
        df.filter(v.isNotNull()), group_col, v, id_col, "med2"
    )
    joined = df.join(F.broadcast(med2), group_col, "left")
    med = F.col("med2").cast("double") / F.lit(2.0)
    return joined.select(
        *df.columns,
        F.coalesce(v.cast("double"), F.round(med, 6)).alias(out_col),
        (v.isNull() & F.col("med2").isNotNull()).alias(
            f"{value_col}_was_imputed"
        ),
    )
