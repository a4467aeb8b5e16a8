"""Inter-annotator agreement (r12 — the labeling-QA half of the
SFT/preference pipeline: before `preference_pairs` trusts human
rankings, the standard check is whether annotators agree beyond
chance; Cohen 1960 for two raters, Fleiss 1971 for a fixed panel.
Beyond-reference LLM-pipeline operators, SURVEY.md §2).

Both kappas are pure count arithmetic, reduced here to ONE exact
integer ratio each so the score is a single IEEE division (the
engine-parity discipline):

- Cohen: with n items, A agreements, and S = Σ_c na_c·nb_c the
  chance-agreement numerator, κ = (A·n − S) / (n² − S).
- Fleiss: with N items × n raters, Q = Σ_ij n_ij², and
  C = Σ_j c_j² the category-total squares,
  κ = ((Q − N·n)·(N·n)² − C·N·n·(n−1))
      / (N·n·(n−1)·((N·n)² − C)).

Counts come from map-side-combined groupBys (the per-(item,
category) frame is the only shuffle); the squares/sums run in
DECIMAL(38,0) so the integers stay exact far past int64 (N ~ 1e9
items × panels). The DuckDB oracles replay the same integers in
HUGEINT (battery ``cohen_kappa``, ``fleiss_kappa``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def cohen_kappa(
    df: DataFrame, rater_a_col: str, rater_b_col: str
) -> DataFrame:
    """Two-rater agreement over one row per item: ``(n_items,
    n_agree, po, pe, kappa)``. Rows where either label is NULL are
    dropped (an unlabeled item carries no agreement signal). po and
    pe are single IEEE divisions on exact integers; kappa is the
    exact ratio (A·n − S)/(n² − S), NULL when pe = 1 (a single
    shared category — chance agreement saturates and κ is
    undefined)."""
    a = F.col(rater_a_col).cast("string")
    b = F.col(rater_b_col).cast("string")
    base = df.select(a.alias("a"), b.alias("b")).where(
        a.isNotNull() & b.isNotNull()
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast(_D).alias("c")
    )
    na = cells.groupBy("a").agg(F.sum("c").alias("na"))
    nb = cells.groupBy("b").agg(F.sum("c").alias("nb"))
    s = (
        na.join(nb, na["a"] == nb["b"])
        .agg(F.sum(F.col("na") * F.col("nb")).alias("s"))
        .select(F.coalesce("s", F.lit(0).cast(_D)).alias("s"))
    )
    agg = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))).alias("ag"),
    ).select(
        F.col("n"),
        F.coalesce("ag", F.lit(0).cast(_D)).alias("ag"),
    )
    j = agg.crossJoin(F.broadcast(s))
    n = F.col("n")
    ag = F.col("ag")
    sv = F.col("s")
    return j.select(
        n.cast("long").alias("n_items"),
        ag.cast("long").alias("n_agree"),
        F.round(ag.cast("double") / n.cast("double"), 6).alias("po"),
        F.round(sv.cast("double") / (n * n).cast("double"), 6).alias("pe"),
        F.when(
            n * n != sv,
            F.round(
                (ag * n - sv).cast("double")
                / (n * n - sv).cast("double"),
                6,
            ),
        ).alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    rating_col: str,
    *,
    n_raters: int,
) -> DataFrame:
    """Fixed-panel agreement from one row per (item, rating):
    ``(n_items, n_raters, p_bar, p_e, kappa)``. Items with a rating
    count different from ``n_raters`` are DROPPED (Fleiss requires
    a constant panel; the drop is the documented convention —
    filter upstream to audit them). NULL ratings are dropped first.
    p_bar, p_e are single IEEE divisions on exact integers; kappa
    is the exact integer ratio from the module docstring, NULL when
    chance agreement saturates (every rating in one category)."""
    if int(n_raters) < 2:
        raise ValueError("fleiss_kappa: n_raters must be >= 2")
    nr = int(n_raters)
    base = df.select(
        F.col(item_col).alias("i"),
        F.col(rating_col).cast("string").alias("r"),
    ).where(F.col(rating_col).isNotNull())
    per_item = base.groupBy("i").agg(F.count(F.lit(1)).alias("__nr"))
    ok = per_item.where(F.col("__nr") == nr).select("i")
    kept = base.join(ok, "i", "left_semi")
    cells = kept.groupBy("i", "r").agg(
        F.count(F.lit(1)).cast(_D).alias("c")
    )
    q = cells.agg(
        F.sum(F.col("c") * F.col("c")).alias("q"),
        F.count_distinct("i").cast(_D).alias("n_items"),
    ).select(
        F.coalesce("q", F.lit(0).cast(_D)).alias("q"), "n_items"
    )
    ctot = (
        cells.groupBy("r")
        .agg(F.sum("c").alias("cj"))
        .agg(F.sum(F.col("cj") * F.col("cj")).alias("csq"))
        .select(F.coalesce("csq", F.lit(0).cast(_D)).alias("csq"))
    )
    j = q.crossJoin(F.broadcast(ctot))
    nn = F.col("n_items") * F.lit(nr).cast(_D)
    d1 = nn * F.lit(nr - 1).cast(_D)
    d2 = nn * nn
    num = (F.col("q") - nn) * d2 - F.col("csq") * d1
    den = d1 * (d2 - F.col("csq"))
    return j.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.lit(nr).cast("long").alias("n_raters"),
        F.when(
            F.col("n_items") > 0,
            F.round(
                (F.col("q") - nn).cast("double") / d1.cast("double"), 6
            ),
        ).alias("p_bar"),
        F.when(
            F.col("n_items") > 0,
            F.round(F.col("csq").cast("double") / d2.cast("double"), 6),
        ).alias("p_e"),
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def adjusted_rand_index(
    df: DataFrame, label_a_col: str, label_b_col: str
) -> DataFrame:
    """Adjusted Rand index between two partitions of the same rows
    (Hubert & Arabie 1985 — the standard score for judging a dedup
    clustering against gold labels; chance-corrected, so random
    assignments score ~0 and identical partitions 1). Rows with a
    NULL on either side are dropped.

    Exact single-division form (multiply the usual expression
    through by 2·C(n,2)):

        ARI = 2·(S_ij·C − S_a·S_b) / (C·(S_a + S_b) − 2·S_a·S_b)

    with S_ij = Σ C(n_ij,2) over the contingency cells, S_a/S_b the
    row/column analogues, C = C(n,2) — all exact DECIMAL(38,0)
    integers from three map-side-combined groupBys (the contingency
    frame is |labels_a|·|labels_b|, never row-scale), so the score
    is ONE IEEE division. Degenerate partitions (denominator 0 —
    both sides a single cluster, or all singletons on both sides)
    yield NULL rather than an arbitrary convention. Returns
    ``(n_rows, s_ij, s_a, s_b, ari)``."""
    a = F.col(label_a_col).cast("string")
    b = F.col(label_b_col).cast("string")
    base = df.select(a.alias("a"), b.alias("b")).where(
        a.isNotNull() & b.isNotNull()
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast(_D).alias("c")
    )

    def pairs2(col):
        # 2*C(c,2) = c*(c-1): keep the doubled form so every
        # intermediate stays an integer
        return F.sum(F.col(col) * (F.col(col) - 1))

    sij = cells.agg(
        pairs2("c").alias("sij2"), F.sum("c").alias("n")
    ).select(
        F.coalesce("sij2", F.lit(0).cast(_D)).alias("sij2"),
        F.coalesce("n", F.lit(0).cast(_D)).alias("n"),
    )
    sa = (
        cells.groupBy("a")
        .agg(F.sum("c").alias("ai"))
        .agg(pairs2("ai").alias("sa2"))
        .select(F.coalesce("sa2", F.lit(0).cast(_D)).alias("sa2"))
    )
    sb = (
        cells.groupBy("b")
        .agg(F.sum("c").alias("bj"))
        .agg(pairs2("bj").alias("sb2"))
        .select(F.coalesce("sb2", F.lit(0).cast(_D)).alias("sb2"))
    )
    j = sij.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    n = F.col("n")
    c2 = n * (n - 1)  # 2*C(n,2)
    num = F.lit(2).cast(_D) * (
        F.col("sij2") * c2 - F.col("sa2") * F.col("sb2")
    )
    den = c2 * (F.col("sa2") + F.col("sb2")) - F.lit(2).cast(_D) * (
        F.col("sa2") * F.col("sb2")
    )
    return j.select(
        n.cast("long").alias("n_rows"),
        (F.col("sij2") / 2).cast("long").alias("s_ij"),
        (F.col("sa2") / 2).cast("long").alias("s_a"),
        (F.col("sb2") / 2).cast("long").alias("s_b"),
        F.when(
            den != 0, F.round(num.cast("double") / den.cast("double"), 6)
        ).alias("ari"),
    )
