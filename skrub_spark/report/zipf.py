"""Zipf power-law fit over corpus token frequencies — the
"does this corpus look like natural language" health check.

Natural-language corpora follow freq ∝ rank^s with s ≈ −1
(Zipf 1949); synthetic, template-generated or boilerplate-heavy
corpora bend away from it, so the fitted slope (and its R²) is a
cheap corpus-level quality signal logged beside the readability
and repetition filters.

Shape at 100 TB: ONE map-side-combined (term, count) reduce is the
only corpus-scale work; ranking and the OLS fit run on the
VOCABULARY frame (a bounded distinct-values window, the same
pattern as the spearman rank transform). The fit is ordinary least
squares of ln(freq) on ln(rank): per-term terms round to 6dp and
the five moment sums run over DECIMAL(28,6) (the proven
cross-engine float bridge), then slope / intercept / R² are
fixed-order IEEE arithmetic on the decimal sums cast to double —
bit-identically SQL-replayable (battery oracle ``zipf_fit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def zipf_fit(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One row: ``(n_types, n_tokens, slope, intercept, r2)`` for
    the OLS fit of ln(freq) ~ ln(rank) over the corpus vocabulary.
    Rank ties break by term (ascending); ``intercept`` uses the
    6dp-rounded slope so every output replays exactly."""
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("t").asc())
    xy = counts.select(
        "cnt",
        F.round(F.log(F.row_number().over(w).cast("double")), 6).alias(
            "x"
        ),
        F.round(F.log(F.col("cnt").cast("double")), 6).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("x").cast("decimal(28,6)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).alias("sy"),
        F.sum(
            F.round(F.col("x") * F.col("y"), 6).cast("decimal(28,6)")
        ).alias("sxy"),
        F.sum(
            F.round(F.col("x") * F.col("x"), 6).cast("decimal(28,6)")
        ).alias("sxx"),
        F.sum(
            F.round(F.col("y") * F.col("y"), 6).cast("decimal(28,6)")
        ).alias("syy"),
    )
    n = F.col("n_types").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # degenerate corpora (single type / all-equal ranks or freqs)
    # yield NULL rather than a 0/0
    slope = F.when(varx != F.lit(0.0), F.round(cov / varx, 6))
    return sums.select(
        "n_types",
        "n_tokens",
        slope.alias("slope"),
        F.when(
            varx != F.lit(0.0),
            F.round((sy - slope * sx) / n, 6),
        ).alias("intercept"),
        F.when(
            (varx != F.lit(0.0)) & (vary != F.lit(0.0)),
            F.round((cov * cov) / (varx * vary), 6),
        ).alias("r2"),
    )
