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


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    rating_col: str,
    *,
    max_raters: int = 8,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) from one row per
    (unit, rating) vote — the generalization of Cohen/Fleiss that
    tolerates MISSING ratings and a varying number of raters per
    unit (Krippendorff 2004, the content-analysis standard; the
    right agreement statistic when an annotation pool is spread
    unevenly over items, as real labeling queues are).

    Semantics: NULL ratings are dropped; units with fewer than 2
    ratings are dropped (no pairable information); units with more
    than ``max_raters`` ratings are DROPPED, a documented bound
    that keeps the per-unit pair denominators inside one fixed
    integer scale — audit panel sizes upstream with a groupBy if
    that drop matters.

    Exact-integer form: with n_uc the count of category c in unit
    u, m_u = Σ_c n_uc the unit's ratings, P = Σ_u m_u the pairable
    total, n_c = Σ_u n_uc the margins, S = Σ_c n_c², and
    L = lcm(1..max_raters−1):

        DoL = Σ_u (L/(m_u−1)) · Σ_c n_uc·(m_u − n_uc)
        α   = 1 − DoL·(P−1) / (L·(P² − S))

    Every term is an exact DECIMAL(38,0) integer (L/(m_u−1) divides
    exactly by construction), so alpha is ONE IEEE division; the
    observed/expected disagreements Do = DoL/(L·P) and
    De = (P² − S)/(P·(P−1)) are each a single division too. α is
    NULL when De = 0 (a single observed category — chance
    disagreement saturates). Returns ``(n_units, n_ratings, do,
    de, alpha)``.

    Plan shape (100 TB): two map-side-combined groupBys — the
    per-(unit, category) cell frame and its per-unit totals, which
    re-join co-partitioned on the unit key (Catalyst reuses the
    shuffle) — then scalar aggregates; the margins frame is
    |categories| rows and broadcast.
    """
    import math

    if int(max_raters) < 2:
        raise ValueError("krippendorff_alpha: max_raters must be >= 2")
    mr = int(max_raters)
    lcm = math.lcm(*range(1, mr))
    r = F.col(rating_col).cast("string")
    base = df.select(
        F.col(unit_col).alias("u"), r.alias("r")
    ).where(r.isNotNull())
    cells = base.groupBy("u", "r").agg(
        F.count(F.lit(1)).cast(_D).alias("c")
    )
    per_unit = cells.groupBy("u").agg(F.sum("c").alias("m"))
    kept = cells.join(per_unit, "u").where(
        (F.col("m") >= 2) & (F.col("m") <= mr)
    )
    ell = F.lit(lcm).cast(_D)
    top = kept.agg(
        F.sum(
            (ell / (F.col("m") - 1)).cast(_D)
            * F.col("c")
            * (F.col("m") - F.col("c"))
        ).alias("dol"),
        F.sum("c").alias("p"),
        F.count_distinct("u").cast(_D).alias("n_units"),
    ).select(
        F.coalesce("dol", F.lit(0).cast(_D)).alias("dol"),
        F.coalesce("p", F.lit(0).cast(_D)).alias("p"),
        "n_units",
    )
    marg = (
        kept.groupBy("r")
        .agg(F.sum("c").alias("nc"))
        .agg(F.sum(F.col("nc") * F.col("nc")).alias("s"))
        .select(F.coalesce("s", F.lit(0).cast(_D)).alias("s"))
    )
    j = top.crossJoin(F.broadcast(marg))
    p = F.col("p")
    dol = F.col("dol")
    s = F.col("s")
    de_den = p * (p - 1)
    de_num = p * p - s
    return j.select(
        F.col("n_units").cast("long").alias("n_units"),
        p.cast("long").alias("n_ratings"),
        F.when(
            p > 0,
            F.round(
                dol.cast("double") / (ell * p).cast("double"), 6
            ),
        ).alias("do"),
        F.when(
            de_den > 0,
            F.round(de_num.cast("double") / de_den.cast("double"), 6),
        ).alias("de"),
        F.when(
            de_num != 0,
            F.round(
                (F.lit(1).cast("double"))
                - (dol * (p - 1)).cast("double")
                / (ell * de_num).cast("double"),
                6,
            ),
        ).alias("alpha"),
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


def rasch_prox(
    df: DataFrame,
    person_col: str,
    item_col: str,
    correct_col: str,
) -> DataFrame:
    """Rasch 1PL calibration by the PROX normal approximation
    (Cohen 1979 / Wright & Stone 1979 — the labeling-QA step past
    agreement scores: put ANNOTATOR ability and ITEM difficulty on
    one logit scale, so a rater's errors on hard items stop
    counting like errors on easy ones). One row per kept item and
    per kept person: ``(kind 'item'|'person', id, n_obs,
    n_correct, logit, measure)``.

    Procedure (the standard complete-design approximation, applied
    to the observed marginals; repeated (person, item) attempts
    simply accumulate):
      1. item marginals; EXTREME items (all correct / none) are
         dropped — their logit is infinite by construction,
      2. person marginals over the kept items; extreme persons
         dropped likewise,
      3. raw logits d_i = ln((N_i−S_i)/S_i), b_p = ln(R_p/(L_p−R_p)),
         items mean-centered,
      4. PROX expansion: D_i = d_i·sqrt((1+V_b/2.89)/(1−V_b·V_d/8.35)),
         B_p = b_p·sqrt((1+V_d/2.89)/(1−V_b·V_d/8.35)).

    Exactness: logits are 6dp-quantized to integer micro units
    before any sum, the item mean uses the exact HALF_UP integer
    mean, and both variances come from exact DECIMAL(38,0) sums of
    squared micro logits — so every output is a fixed chain of IEEE
    ops on exact integers, 6dp-rounded, bit-replayable in SQL.
    Degenerate spreads (PROX denominator ≤ 0, or fewer than 2 kept
    items/persons) yield NULL measures.

    Plan shape (100 TB): two map-side-combined marginal groupBys
    (the (person,item) frame never materializes beyond its reduce);
    items are codebook-sized and broadcast into the person filter;
    the four variance scalars ride one-row broadcast cross joins.
    """
    p = F.col(person_col).cast("string")
    i = F.col(item_col).cast("string")
    c = F.col(correct_col).cast("int")
    base = df.select(
        p.alias("__p"), i.alias("__i"), c.alias("__c")
    ).where(p.isNotNull() & i.isNotNull() & c.isNotNull())
    items = base.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__ni"),
        F.sum("__c").cast("long").alias("__si"),
    )
    kept_items = items.where(
        (F.col("__si") > 0) & (F.col("__si") < F.col("__ni"))
    )
    base2 = base.join(
        F.broadcast(kept_items.select("__i")), "__i", "left_semi"
    )
    pers = base2.groupBy("__p").agg(
        F.count(F.lit(1)).cast("long").alias("__lp"),
        F.sum("__c").cast("long").alias("__rp"),
    )
    kept_pers = pers.where(
        (F.col("__rp") > 0) & (F.col("__rp") < F.col("__lp"))
    )
    q_i = F.round(
        F.log(
            (F.col("__ni") - F.col("__si")).cast("double")
            / F.col("__si").cast("double")
        )
        * 1e6,
        0,
    ).cast(_D)
    q_p = F.round(
        F.log(
            F.col("__rp").cast("double")
            / (F.col("__lp") - F.col("__rp")).cast("double")
        )
        * 1e6,
        0,
    ).cast(_D)
    it = kept_items.withColumn("__q", q_i)
    pe = kept_pers.withColumn("__q", q_p)
    # exact HALF_UP integer mean of the item logits (doremi rule);
    # works for negative sums too via the sign split
    isum = it.agg(
        F.sum("__q").alias("__qs"),
        F.count(F.lit(1)).cast(_D).alias("__ki"),
    ).select(
        F.when(
            F.col("__qs") >= 0,
            (F.lit(2).cast(_D) * F.col("__qs") + F.col("__ki")),
        )
        .otherwise(
            F.lit(2).cast(_D) * F.col("__qs") - F.col("__ki")
        )
        .alias("__num2"),
        F.col("__ki"),
    ).select(
        F.expr("CAST(__num2 div (2 * __ki) AS decimal(38,0))").alias(
            "__mu"
        ),
        F.col("__ki"),
    )
    itc = it.crossJoin(F.broadcast(isum)).withColumn(
        "__d", F.col("__q") - F.col("__mu")
    )
    ivar = itc.agg(
        F.sum(F.col("__d") * F.col("__d")).alias("__sdd"),
        F.count(F.lit(1)).cast(_D).alias("__ki2"),
    )
    pvar = pe.agg(
        F.sum(F.col("__q") * F.col("__q")).alias("__sqq"),
        F.sum("__q").alias("__sq"),
        F.count(F.lit(1)).cast(_D).alias("__kp"),
    )
    # variances in logit^2 (double, from exact integer sums)
    vd = F.when(
        F.col("__ki2") > 1,
        F.col("__sdd").cast("double")
        / 1e12
        / (F.col("__ki2") - 1).cast("double"),
    )
    vb = F.when(
        F.col("__kp") > 1,
        (
            F.col("__sqq").cast("double")
            - F.col("__sq").cast("double")
            * F.col("__sq").cast("double")
            / F.col("__kp").cast("double")
        )
        / 1e12
        / (F.col("__kp") - 1).cast("double"),
    )
    den = F.lit(1.0) - vb * vd / F.lit(8.35)
    ex_i = F.when(
        den > 0, F.sqrt((F.lit(1.0) + vb / F.lit(2.89)) / den)
    )
    ex_p = F.when(
        den > 0, F.sqrt((F.lit(1.0) + vd / F.lit(2.89)) / den)
    )
    scal = (
        ivar.crossJoin(F.broadcast(pvar))
        .select(ex_i.alias("__exi"), ex_p.alias("__exp"))
    )
    out_i = (
        itc.crossJoin(F.broadcast(scal))
        .select(
            F.lit("item").alias("kind"),
            F.col("__i").alias("id"),
            F.col("__ni").alias("n_obs"),
            F.col("__si").alias("n_correct"),
            F.round(F.col("__d").cast("double") / 1e6, 6).alias(
                "logit"
            ),
            F.round(
                F.col("__d").cast("double") / 1e6 * F.col("__exi"), 6
            ).alias("measure"),
        )
    )
    out_p = (
        pe.crossJoin(F.broadcast(scal))
        .select(
            F.lit("person").alias("kind"),
            F.col("__p").alias("id"),
            F.col("__lp").alias("n_obs"),
            F.col("__rp").alias("n_correct"),
            F.round(F.col("__q").cast("double") / 1e6, 6).alias(
                "logit"
            ),
            F.round(
                F.col("__q").cast("double") / 1e6 * F.col("__exp"), 6
            ).alias("measure"),
        )
    )
    return out_i.unionByName(out_p)


def pairwise_cluster_eval(
    df: DataFrame, pred_col: str, gold_col: str
) -> DataFrame:
    """Pairwise precision/recall/F1 of a predicted clustering
    against gold (r12b — the standard record-linkage / dedup
    evaluation: of all within-cluster pairs the system formed, how
    many are truly coreferent, and how many true pairs did it
    find). One row: ``(n_rows, tp_pairs, pred_pairs, gold_pairs,
    precision, recall, f1)``.

    Reuses the ARI contingency machinery: with doubled pair counts
    2·TP = Σ c_ij(c_ij−1), 2·P = Σ a_i(a_i−1), 2·G = Σ b_j(b_j−1)
    (all exact DECIMAL(38,0) from three map-side-combined
    groupBys), precision/recall are single IEEE divisions and
    F1 = 2TP/(P+G) ONE exact ratio. Rows with a NULL on either
    side are dropped; empty pair sets yield NULL scores.
    """
    a = F.col(pred_col).cast("string")
    b = F.col(gold_col).cast("string")
    base = df.select(a.alias("a"), b.alias("b")).where(
        a.isNotNull() & b.isNotNull()
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast(_D).alias("c")
    )

    def pairs2(col):
        return F.sum(F.col(col) * (F.col(col) - 1))

    tp = cells.agg(
        pairs2("c").alias("tp2"), F.sum("c").alias("n")
    ).select(
        F.coalesce("tp2", F.lit(0).cast(_D)).alias("tp2"),
        F.coalesce("n", F.lit(0).cast(_D)).alias("n"),
    )
    pp = (
        cells.groupBy("a")
        .agg(F.sum("c").alias("ai"))
        .agg(pairs2("ai").alias("pp2"))
        .select(F.coalesce("pp2", F.lit(0).cast(_D)).alias("pp2"))
    )
    gp = (
        cells.groupBy("b")
        .agg(F.sum("c").alias("bj"))
        .agg(pairs2("bj").alias("gp2"))
        .select(F.coalesce("gp2", F.lit(0).cast(_D)).alias("gp2"))
    )
    j = tp.crossJoin(F.broadcast(pp)).crossJoin(F.broadcast(gp))
    tp2, pp2, gp2 = F.col("tp2"), F.col("pp2"), F.col("gp2")
    return j.select(
        F.col("n").cast("long").alias("n_rows"),
        (tp2 / 2).cast("long").alias("tp_pairs"),
        (pp2 / 2).cast("long").alias("pred_pairs"),
        (gp2 / 2).cast("long").alias("gold_pairs"),
        F.when(
            pp2 > 0,
            F.round(tp2.cast("double") / pp2.cast("double"), 6),
        ).alias("precision"),
        F.when(
            gp2 > 0,
            F.round(tp2.cast("double") / gp2.cast("double"), 6),
        ).alias("recall"),
        F.when(
            pp2 + gp2 > 0,
            F.round(
                (F.lit(2).cast(_D) * tp2).cast("double")
                / (pp2 + gp2).cast("double"),
                6,
            ),
        ).alias("f1"),
    )
