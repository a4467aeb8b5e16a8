"""Target-statistics encoders: m-estimate smoothing, leave-one-out,
and weight-of-evidence — beyond-reference encoder-family operators
(SURVEY.md §2; the reference's encoder stack — similarity/minhash/
gap/string encoders, reference skrub/_similarity_encoder.py etc. —
covers unsupervised text→numeric, and delegates supervised category
statistics to sklearn's TargetEncoder; at 100 TB those are native
shuffle-on-category aggregations, so they belong in the engine).

Three classical variants, all exact-oracle-able:

- ``target_encode`` (m-estimate / additive smoothing): category c
  maps to ``(S_c + m·ȳ·n... )`` — computed as the all-integer form
  ``(N·S_c + m·S) / (N·(n_c + m))``: ONE IEEE division of exact
  integers, 6dp-rounded, so the encoding is bit-identical on any
  engine or partitioning (the naive two-step mean-then-blend would
  drift).
- ``target_encode_loo`` (leave-one-out): each ROW gets its
  category's mean computed WITHOUT itself — ``(S_c − y_i)/(n_c−1)``,
  again one exact-integer division — the standard leakage guard
  when the encoding feeds a learner trained on the same rows;
  singleton categories fall back to the global mean ``S/N``.
- ``woe_iv`` (weight of evidence + information value, the credit-
  scoring standard): ``WOE_c = ln((g_c+½)·B̂ / ((b_c+½)·Ĝ))`` with
  Laplace ½-smoothing (Ĝ = G + ½·|C|, B̂ likewise, so smoothed
  proportions stay normalized and no category divides by zero).
  The single runtime ``ln`` is 6dp-rounded — the proven
  cross-engine float bridge — and each category's IV term is a
  6dp-rounded product so the reported IV sums as DECIMAL(28,6).

Scale shape: every variant is ONE map-side-combined groupBy on the
category key (|C| result rows) + a broadcast join back for the
row-level encodings; no windows, no corpus-wide sorts. Skewed
categories are plain AQE-splittable agg keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cat_stats(df: DataFrame, category_col: str, target_col: str):
    """(per-category S_c/n_c, global S/N) for an integer target."""
    y = F.col(target_col).cast("long")
    per = df.groupBy(category_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum(y).cast("long").alias("s_c"),
    )
    tot = per.agg(
        F.sum("n_c").cast("long").alias("n"),
        F.sum("s_c").cast("long").alias("s"),
    )
    return per, tot


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    *,
    m: int = 20,
) -> DataFrame:
    """Per-category m-estimate encoding:
    ``(category, n_c, encoding)`` with
    ``encoding = round((N·S_c + m·S) / (N·(n_c + m)), 6)`` — the
    smoothed mean pulled toward the global mean by ``m`` virtual
    rows, as ONE exact-integer IEEE division (battery oracle
    ``target_encode``)."""
    m = int(m)
    per, tot = _cat_stats(df, category_col, target_col)
    # N·S_c at 100 TB row counts (N ~ 1e10+, S_c comparable) overflows
    # int64 silently under non-ANSI Spark — compute both products in
    # decimal(38,0) (exact to 38 digits, plenty for 1e20-scale values)
    # before the final IEEE double division. Same double comes out at
    # any scale where long did not overflow, so oracles are unchanged.
    n_dec = F.col("n").cast("decimal(19,0)")
    num = (
        n_dec * F.col("s_c").cast("decimal(19,0)")
        + F.lit(m).cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
    )
    den = n_dec * (F.col("n_c") + F.lit(m)).cast("decimal(19,0)")
    return per.crossJoin(F.broadcast(tot)).select(
        category_col,
        "n_c",
        F.round(
            num.cast("double") / den.cast("double"),
            6,
        ).alias("encoding"),
    )


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    id_col: str,
) -> DataFrame:
    """Row-level leave-one-out encoding:
    ``(id, category, y, encoding)`` with
    ``encoding = round((S_c − y_i)/(n_c − 1), 6)``; singleton
    categories fall back to the global mean ``S/N`` (battery
    oracle ``target_encode_loo``)."""
    per, tot = _cat_stats(df, category_col, target_col)
    y = F.col(target_col).cast("long")
    return (
        df.select(F.col(id_col), F.col(category_col), y.alias("y"))
        .join(F.broadcast(per), category_col)
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            category_col,
            "y",
            F.when(
                F.col("n_c") > 1,
                F.round(
                    (F.col("s_c") - F.col("y")).cast("double")
                    / (F.col("n_c") - 1).cast("double"),
                    6,
                ),
            )
            .otherwise(
                F.round(
                    F.col("s").cast("double") / F.col("n").cast("double"),
                    6,
                )
            )
            .alias("encoding"),
        )
    )


def woe_iv(
    df: DataFrame,
    category_col: str,
    target_col: str,
) -> DataFrame:
    """Weight of evidence + information value per category:
    ``(category, n_c, n_pos, n_neg, woe, iv_term)`` where with
    Laplace ½-smoothing over |C| categories
    ``woe = round(ln((g_c+½)·B̂ / ((b_c+½)·Ĝ)), 6)`` and
    ``iv_term = round((round((g_c+½)/Ĝ,6) − round((b_c+½)/B̂,6))
    · woe, 6)`` — Σ iv_term is the IV. Every float step is a
    6dp-rounded single operation, so the oracle replays it
    (battery oracle ``woe_iv``)."""
    per, _ = _cat_stats(df, category_col, target_col)
    per = per.withColumn("b_c", F.col("n_c") - F.col("s_c"))
    smooth = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_cats"),
        F.sum("s_c").cast("long").alias("g"),
        F.sum("b_c").cast("long").alias("b"),
    )
    # work in half-units so every quantity stays an exact integer:
    # g2 = 2·g_c + 1, ĝ2 = 2·G + |C|  (= 2·(G + ½·|C|))
    base = per.crossJoin(F.broadcast(smooth)).select(
        category_col,
        "n_c",
        F.col("s_c").alias("n_pos"),
        F.col("b_c").alias("n_neg"),
        (F.lit(2) * F.col("s_c") + 1).alias("g2"),
        (F.lit(2) * F.col("b_c") + 1).alias("b2"),
        (F.lit(2) * F.col("g") + F.col("n_cats")).alias("gt2"),
        (F.lit(2) * F.col("b") + F.col("n_cats")).alias("bt2"),
    )
    woe = F.round(
        F.log(
            (F.col("g2") * F.col("bt2")).cast("double")
            / (F.col("b2") * F.col("gt2")).cast("double")
        ),
        6,
    )
    gp = F.round(
        F.col("g2").cast("double") / F.col("gt2").cast("double"), 6
    )
    bp = F.round(
        F.col("b2").cast("double") / F.col("bt2").cast("double"), 6
    )
    return base.select(
        category_col,
        "n_c",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        F.round((gp - bp) * woe, 6).alias("iv_term"),
    )
