"""Benford first-digit audit — beyond-reference data-quality
operator (SURVEY.md §2).

Naturally-occurring multiplicative quantities (prices, populations,
transaction amounts) follow Benford's law: the leading significant
digit d appears with probability ``log10(1 + 1/d)`` (30.1% of values
start with 1, only 4.6% with 9). Fabricated or clipped data does not
— auditors and data-quality monitors chi-square the observed
first-digit histogram against the Benford expectation to flag
suspicious feeds before they poison a training mix.

Exactness discipline:

- First-digit extraction never touches floats: the value is scaled
  to an exact BIGINT (DECIMAL(18,4) · 10⁴) and the leading digit is
  peeled with a FIXED CHAIN of conditional integer divisions
  (``d = d >= 10 ? d div 10 : d`` × 18) — a log10-based extraction
  would misclassify exact powers of ten through float rounding.
- Expected probabilities are 6dp literals of ``log10(1+1/d)``
  embedded identically in both engines (no runtime log).
- ``expected_n = n · p`` is exact decimal; the chi-square term
  casts the exact decimals to (correctly-rounded) doubles and does
  ONE multiply + ONE divide in fixed operand order before the 6dp
  round — IEEE * and / are correctly rounded, so the value is
  bit-identical on both engines (only reordered sums and
  transcendentals need the DECIMAL-sum bridge).

Scale shape: one map (digit chain) + ONE map-side-combined groupBy
on 9 keys; the total count rides along as a window-free second
aggregation joined back (9-row broadcast). At 100 TB this is a
single reduce of 9 partial rows per task.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: round(log10(1 + 1/d), 6) for d = 1..9 — the Benford expectation.
BENFORD_P = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def first_digit(col, *, max_digits: int = 19):
    """Leading significant digit of an exact positive BIGINT column
    via a fixed chain of conditional integer divisions (no floats,
    no string formatting)."""
    # ONE CASE picks the power-of-10 divisor (linear expression — a
    # nested conditional-divide chain triples per level and blows
    # up the analyzer), then ONE integer `div`; a float `/` + floor
    # would be off-by-one near 2^53
    p = F.lit(1).cast("long")
    for e in range(1, max_digits):
        p = F.when(col >= 10**e, F.lit(10**e).cast("long")).otherwise(p)
    return F.call_function("div", col, p).cast("long").alias("digit")


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit histogram vs Benford's law over the positive
    values of ``value_col``: 9 rows ``(digit, n_values, observed,
    observed_p, expected_p, chi2_term)``; Σ chi2_term is the
    chi-square statistic (8 degrees of freedom). Digits that never
    occur still get a row (observed 0, full expected term).
    Battery oracle ``benford_audit`` replays the digit chain and
    the fixed-order IEEE arithmetic verbatim."""
    scaled = (
        F.col(value_col).cast("decimal(18,4)") * F.lit(10000)
    ).cast("long")
    pos = df.filter(F.col(value_col) > 0).select(
        first_digit(scaled).alias("digit")
    )
    obs = pos.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    digits = obs.sparkSession.range(1, 10).select(
        F.col("id").cast("long").alias("digit")
    )
    # total rides along from the 9-row agg — no second corpus pass
    totals = obs.agg(
        F.sum("observed").cast("long").alias("n_values")
    )
    p_lit = F.lit(None).cast("decimal(8,6)")
    for d in range(9, 0, -1):
        p_lit = F.when(
            F.col("digit") == d,
            F.lit(str(BENFORD_P[d])).cast("decimal(8,6)"),
        ).otherwise(p_lit)
    full = (
        digits.join(obs, "digit", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "digit",
            "n_values",
            F.coalesce("observed", F.lit(0)).cast("long").alias(
                "observed"
            ),
            p_lit.alias("expected_p"),
        )
    )
    exp_n = (F.col("n_values") * F.col("expected_p")).alias("__e")
    diff = (
        F.col("observed").cast("decimal(20,6)") - exp_n
    ).cast("double")
    return full.select(
        "digit",
        "n_values",
        "observed",
        F.round(
            F.col("observed").cast("double")
            / F.col("n_values").cast("double"),
            6,
        ).alias("observed_p"),
        F.col("expected_p").cast("double").alias("expected_p"),
        F.round(diff * diff / exp_n.cast("double"), 6).alias(
            "chi2_term"
        ),
    )
