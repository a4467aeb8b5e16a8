"""A/B experiment readout: two-proportion z-test + chi-square —
beyond-reference decision analytics (SURVEY.md §2).

The question every experiment dashboard answers: variant B
converted p2 vs control's p1 — is the lift real? The pooled
two-proportion z statistic

    z = (p1 - p2) / sqrt(p_pool (1 - p_pool) (1/n1 + 1/n2))

and the 2x2 chi-square statistic (= z² for this table) are pure
arithmetic over four exact counts, so the whole readout is
SQL-replayable: counts are integers, every ratio/sqrt/product is
fixed-order IEEE arithmetic on exact operands, outputs rounded 6dp
(battery oracle ``ab_test_report``).

Scale shape: ONE entity-level conditional agg (map-side combined)
collapses the corpus to per-entity conversion flags, ONE 2-key
groupBy collapses those to four counts; the stats touch one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ab_proportion_test(
    df: DataFrame,
    entity_col: str,
    variant_col: str,
    converted_col: str,
) -> DataFrame:
    """One-row experiment readout from an entity-level frame
    (``variant_col`` ∈ two values, ``converted_col`` 0/1 per
    entity): ``(variant_a, variant_b, n_a, n_b, conv_a, conv_b,
    rate_a, rate_b, lift, z, chi2)``. Variant A is the
    lexicographically smaller label (deterministic); z > 0 means A
    converts better. NULL z/chi2 when a variant is empty or the
    pooled rate is degenerate (0 or 1)."""
    per_variant = (
        df.groupBy(F.col(variant_col).alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(converted_col).cast("long"))
            .cast("long")
            .alias("c"),
        )
    )
    per_variant = per_variant.persist()  # feeds both single-row picks
    a = per_variant.orderBy("v").limit(1).select(
        F.col("v").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("c").alias("conv_a"),
    )
    b = per_variant.orderBy(F.col("v").desc()).limit(1).select(
        F.col("v").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("c").alias("conv_b"),
    )
    row = a.crossJoin(b)
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    p1 = F.col("conv_a").cast("double") / n1
    p2 = F.col("conv_b").cast("double") / n2
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (n1 + n2)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    valid = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (pp > F.lit(0.0))
        & (pp < F.lit(1.0))
        & (F.col("variant_a") != F.col("variant_b"))
    )
    z = F.when(valid, F.round((p1 - p2) / se, 6))
    return row.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        F.when(p2 > 0, F.round((p1 - p2) / p2, 6)).alias("lift"),
        z.alias("z"),
        F.when(valid, F.round(((p1 - p2) / se) * ((p1 - p2) / se), 6))
        .alias("chi2"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U test (r9 — the NONPARAMETRIC two-sample test
    next to the z-test: compares whole distributions, immune to the
    heavy tails that break mean-based tests on revenue-like
    metrics). One row: ``(n_a, n_b, u_a, u_b, z)``.

    Distributed midranks via the spearman recipe — distinct-value
    counts + a cumulative sum over the bounded distinct-value frame
    + a value→rank join-back; NO corpus-wide row window. All rank
    arithmetic stays in 2× integer space (double-midrank =
    2·cum_before + cnt + 1 is always integral), so U is EXACT; the
    normal approximation z applies the standard tie correction and
    rounds to 6dp (single sqrt/divisions on integer-derived
    doubles — the proven cross-engine bridge)."""
    two = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        (F.col(group_col) == group_a).alias("is_a"),
        F.col(value_col).alias("v"),
    )
    counts = two.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.col("is_a").cast("long")).alias("ta"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = counts.withColumn(
        "cum", F.sum("t").over(w)
    ).select(
        "v",
        "t",
        "ta",
        # 2x the midrank of every row tied at v: integral, exact
        (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("dr"),
    )
    agg = ranked.agg(
        F.sum("ta").cast("long").alias("n_a"),
        F.sum(F.col("t") - F.col("ta")).cast("long").alias("n_b"),
        F.sum(F.col("ta") * F.col("dr")).cast("long").alias("r2a"),
        # tie correction term: sum t^3 - t over distinct values
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("ties"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    # U_a = R_a - n_a(n_a+1)/2, with R_a = r2a / 2 (exact halves)
    ua = (
        F.col("r2a").cast("double") / F.lit(2.0)
        - na * (na + F.lit(1.0)) / F.lit(2.0)
    )
    n = na + nb
    mu = na * nb / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * (
            (n + F.lit(1.0))
            - F.col("ties").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(ua, 6).alias("u_a"),
        F.round(na * nb - ua, 6).alias("u_b"),
        F.when(
            var > 0, F.round((ua - mu) / F.sqrt(var), 6)
        ).alias("z"),
    )


def msprt_two_proportion(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    checkpoint_col: str,
    *,
    tau2: float = 0.01,
    alpha: float = 0.05,
) -> DataFrame:
    """Always-valid sequential two-proportion test (r10 — mixture
    SPRT, Johari/Pekelis/Walsh "peeking problem" construction): the
    p-value trajectory an experiment dashboard may read at EVERY
    checkpoint without inflating false positives, unlike the fixed-
    horizon z-test (:func:`ab_proportion_test`) which is only valid
    once.

    Per checkpoint (ordered ascending) over CUMULATIVE counts:
      delta  = pa − pb,   pool = (ca+cb)/(na+nb)
      Vn     = pool·(1−pool)·(1/na + 1/nb)
      lnΛ    = 0.5·ln(Vn/(Vn+τ²)) + delta²·τ²/(2·Vn·(Vn+τ²))
      p_m    = min(1, exp(−lnΛ));  p_always_valid = min over m'≤m
    Checkpoints where either arm is empty or Vn = 0 carry a NULL
    test (insufficient data) without breaking the running minimum.

    Output: one row per checkpoint — ``(checkpoint, n_a, n_b,
    conv_a, conv_b, delta, log_lambda, p_always_valid,
    significant)``. Variants are the two DISTINCT values of
    ``variant_col`` (lexicographic a < b; >2 variants raise via the
    embedded assert, the cuped_adjust discipline).

    Scale shape: ONE (checkpoint, variant) map-side-combined agg
    collapses the corpus; cumulative windows run over the BOUNDED
    checkpoint frame. Determinism: counts are exact integers; every
    ratio is fixed-order IEEE; ln/exp agree across engines at the
    6dp the outputs are rounded to."""
    g = F.col(variant_col).cast("string")
    per = (
        df.select(
            F.col(checkpoint_col).alias("cp"),
            g.alias("v"),
            F.col(converted_col).cast("boolean").alias("c"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("cp", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("conv"),
        )
    )
    labs = per.agg(
        F.countDistinct("v").cast("long").alias("__ng"),
        F.min("v").alias("va"),
        F.max("v").alias("vb"),
    )
    wide = (
        per.crossJoin(F.broadcast(labs))
        .groupBy("cp")
        .agg(
            F.sum(F.when(F.col("v") == F.col("va"), F.col("n")))
            .cast("long")
            .alias("dna"),
            F.sum(F.when(F.col("v") == F.col("va"), F.col("conv")))
            .cast("long")
            .alias("dca"),
            F.sum(F.when(F.col("v") == F.col("vb"), F.col("n")))
            .cast("long")
            .alias("dnb"),
            F.sum(F.when(F.col("v") == F.col("vb"), F.col("conv")))
            .cast("long")
            .alias("dcb"),
            F.max("__ng").alias("__ng"),
        )
    )
    w = Window.orderBy("cp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = wide.select(
        "cp",
        "__ng",
        F.sum(F.coalesce("dna", F.lit(0))).over(w).alias("na"),
        F.sum(F.coalesce("dca", F.lit(0))).over(w).alias("ca"),
        F.sum(F.coalesce("dnb", F.lit(0))).over(w).alias("nb"),
        F.sum(F.coalesce("dcb", F.lit(0))).over(w).alias("cb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ca, cb = F.col("ca").cast("double"), F.col("cb").cast("double")
    t2 = F.lit(float(tau2))
    delta = ca / na - cb / nb
    pool = (ca + cb) / (na + nb)
    vn = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    loglam = F.lit(0.5) * F.log(vn / (vn + t2)) + (
        (delta * delta) * t2
    ) / (F.lit(2.0) * vn * (vn + t2))
    ok = (F.col("na") > 0) & (F.col("nb") > 0)
    loglam_c = F.when(ok & (vn > 0), loglam)
    p_m = F.when(
        loglam_c.isNotNull(), F.least(F.lit(1.0), F.exp(-loglam_c))
    )
    wmin = Window.orderBy("cp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pav = F.min(p_m).over(wmin)
    # Gate EVERY output column on the exactly-2-labels assert so
    # Catalyst column pruning can't drop the contract (r10 advice).
    def _gated(col):
        return F.when(
            F.assert_true(
                F.col("__ng") == 2,
                F.concat(
                    F.lit(
                        "msprt_two_proportion requires exactly 2 variant "
                        "labels, got "
                    ),
                    F.col("__ng").cast("string"),
                ),
            ).isNull(),
            col,
        )

    return cum.select(
        _gated(F.col("cp")).alias("checkpoint"),
        _gated(F.col("na")).alias("n_a"),
        _gated(F.col("nb")).alias("n_b"),
        _gated(F.col("ca")).alias("conv_a"),
        _gated(F.col("cb")).alias("conv_b"),
        _gated(F.round(F.when(ok, delta), 6)).alias("delta"),
        _gated(F.round(loglam_c, 6)).alias("log_lambda"),
        _gated(F.round(pav, 6)).alias("p_always_valid"),
        _gated(
            F.when(pav.isNotNull(), pav <= F.lit(float(alpha)))
        ).alias("significant"),
    )


def eb_shrunk_rates(
    df: DataFrame,
    group_col: str,
    converted_col: str,
) -> DataFrame:
    """Empirical-Bayes beta-binomial rate shrinkage (r10): per-group
    conversion rates pulled toward the corpus prior, the standard
    fix for small-n groups dominating a rate leaderboard.

    Method-of-moments prior over the per-group RAW rates r_g (6dp-
    quantized, so the moment sums are exact integers in micro
    space): with m = mean(r), v = var(r),
      α+β = m(1−m)/v − 1,  α = m·(α+β)
    and the posterior mean per group is (conv + α)/(n + α + β).
    Degenerate moments (v ≤ 0 or v ≥ m(1−m), fewer than 2 groups)
    return the raw rate with NULL α/β — shrinkage needs a real
    prior.

    Output: ``(group, n, conv, raw_rate, shrunk_rate, alpha,
    beta)``. Scale: ONE group agg; the moment pass runs over the
    bounded per-group frame; the prior is two scalars broadcast
    back. Rates round 6dp; moment sums are DECIMAL-exact."""
    per = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(converted_col).cast("boolean").alias("c"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("c"), 1).otherwise(0))
            .cast("long")
            .alias("conv"),
        )
        .withColumn(
            "raw_rate",
            F.round(
                F.col("conv").cast("double") / F.col("n").cast("double"), 6
            ),
        )
        .withColumn(
            "r6i",
            F.round(F.col("raw_rate") * 1000000, 0).cast("decimal(38,0)"),
        )
    )
    mom = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("r6i").alias("s1"),
        F.sum(F.col("r6i") * F.col("r6i")).alias("s2"),
    )
    k = F.col("k").cast("double")
    m = F.col("s1").cast("double") / (k * F.lit(1000000.0))
    # v = E[r²] − m² over the 6dp-quantized rates (population var)
    er2 = F.col("s2").cast("double") / (
        k * F.lit(1000000.0) * F.lit(1000000.0)
    )
    v = er2 - m * m
    ab = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior_ok = (
        (F.col("k") >= 2)
        & (v > 0)
        & (v < m * (F.lit(1.0) - m))
        & (ab > 0)
    )
    prior = mom.select(
        F.when(prior_ok, F.round(m * ab, 6)).alias("alpha"),
        F.when(prior_ok, F.round((F.lit(1.0) - m) * ab, 6)).alias("beta"),
    )
    out = per.crossJoin(F.broadcast(prior))
    shrunk = F.when(
        F.col("alpha").isNotNull(),
        F.round(
            (F.col("conv").cast("double") + F.col("alpha"))
            / (
                F.col("n").cast("double")
                + F.col("alpha")
                + F.col("beta")
            ),
            6,
        ),
    ).otherwise(F.col("raw_rate"))
    return out.select(
        F.col("g").alias(group_col),
        "n",
        "conv",
        "raw_rate",
        shrunk.alias("shrunk_rate"),
        "alpha",
        "beta",
    )


def yuen_trimmed_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    trim_num: int = 1,
    trim_den: int = 5,
) -> DataFrame:
    """Yuen's two-sample trimmed-mean t-test (r10 — the robust
    companion to the mean tests above; Yuen 1974): compare
    γ-trimmed means with winsorized variances, the standard answer
    when heavy tails make the plain t-test fragile.

    Per group (γ = trim_num/trim_den as a RATIONAL, g = ⌊n·γ⌋,
    h = n − 2g): trimmed mean over ranks g+1..n−g; winsorized
    moments clamp the tails to the boundary order statistics
    x_(g+1) / x_(n−g); d = s²_w·(n−1)/(h·(h−1));
    t = (m̄t_a − m̄t_b)/√(d_a + d_b) with Welch-Satterthwaite df.

    Returns one row: ``(group_a, group_b, n_a, n_b, h_a, h_b,
    tmean_a, tmean_b, diff, se, t, df)``. Exactly two group labels
    (embedded assert). Exactness: values quantize to 6dp micro
    ints; all sums are DECIMAL-exact; ranks are exact window
    integers; the final handful of IEEE ops is fixed-order, 6dp."""
    d0 = "decimal(38,0)"
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        (F.col(value_col).cast("decimal(18,6)") * 1000000)
        .cast("long")
        .alias("v6"),
    ).filter(F.col("v6").isNotNull() & F.col("g").isNotNull())
    gp = Window.partitionBy("g")
    w = gp.orderBy(F.col("v6").asc())
    tn, td = int(trim_num), int(trim_den)
    if not (0 <= tn * 2 < td):
        raise ValueError("yuen_trimmed_test: need 0 <= 2*trim < 1")
    ranked = (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(gp))
        .withColumn(
            "gg", F.expr(f"CAST((n * {tn}) DIV {td} AS BIGINT)")
        )
    )
    kept = (F.col("rn") > F.col("gg")) & (
        F.col("rn") <= F.col("n") - F.col("gg")
    )
    per = ranked.groupBy("g").agg(
        F.max("n").cast("long").alias("n"),
        F.max("gg").cast("long").alias("gg"),
        F.min(F.when(F.col("rn") == F.col("gg") + 1, F.col("v6")))
        .cast("long")
        .alias("lo6"),
        F.min(
            F.when(F.col("rn") == F.col("n") - F.col("gg"), F.col("v6"))
        )
        .cast("long")
        .alias("hi6"),
        F.sum(F.when(kept, F.col("v6").cast(d0))).alias("sk"),
        F.sum(
            F.when(kept, F.col("v6").cast(d0) * F.col("v6").cast(d0))
        ).alias("skk"),
    )
    h = F.col("n") - 2 * F.col("gg")
    sw = (
        F.col("sk")
        + F.col("gg").cast(d0) * F.col("lo6").cast(d0)
        + F.col("gg").cast(d0) * F.col("hi6").cast(d0)
    )
    sww = (
        F.col("skk")
        + F.col("gg").cast(d0)
        * (F.col("lo6").cast(d0) * F.col("lo6").cast(d0))
        + F.col("gg").cast(d0)
        * (F.col("hi6").cast(d0) * F.col("hi6").cast(d0))
    )
    stats = per.select(
        "g",
        "n",
        h.alias("h"),
        (F.col("sk").cast("double") / (h.cast("double") * F.lit(1e6)))
        .alias("tmean"),
        sw.alias("sw"),
        sww.alias("sww"),
    )
    # winsorized sample variance in micro^2:
    # s2w = (sww − sw²/n)/(n−1); d = s2w·(n−1)/(h(h−1)) = (sww −
    # sw²/n)/(h(h−1)) — in value units divide by 1e12
    dvar = (
        (
            F.col("sww").cast("double")
            - F.col("sw").cast("double")
            * F.col("sw").cast("double")
            / F.col("n").cast("double")
        )
        / (
            F.col("h").cast("double")
            * (F.col("h").cast("double") - F.lit(1.0))
        )
        / F.lit(1e12)
    )
    labs = base.agg(
        F.countDistinct("g").cast("long").alias("__ng"),
        F.min("g").alias("ga"),
        F.max("g").alias("gb"),
    )
    st2 = stats.withColumn("d", dvar)
    agg = (
        st2.crossJoin(F.broadcast(labs))
        .agg(
            F.max("__ng").alias("__ng"),
            F.max("ga").alias("group_a"),
            F.max("gb").alias("group_b"),
            F.max(F.when(F.col("g") == F.col("ga"), F.col("n"))).alias("n_a"),
            F.max(F.when(F.col("g") == F.col("gb"), F.col("n"))).alias("n_b"),
            F.max(F.when(F.col("g") == F.col("ga"), F.col("h"))).alias("h_a"),
            F.max(F.when(F.col("g") == F.col("gb"), F.col("h"))).alias("h_b"),
            F.max(F.when(F.col("g") == F.col("ga"), F.col("tmean"))).alias(
                "tma"
            ),
            F.max(F.when(F.col("g") == F.col("gb"), F.col("tmean"))).alias(
                "tmb"
            ),
            F.max(F.when(F.col("g") == F.col("ga"), F.col("d"))).alias("da"),
            F.max(F.when(F.col("g") == F.col("gb"), F.col("d"))).alias("db"),
        )
    )
    se = F.sqrt(F.col("da") + F.col("db"))
    tstat = (F.col("tma") - F.col("tmb")) / se
    dfw = (
        (F.col("da") + F.col("db"))
        * (F.col("da") + F.col("db"))
        / (
            F.col("da") * F.col("da")
            / (F.col("h_a").cast("double") - F.lit(1.0))
            + F.col("db") * F.col("db")
            / (F.col("h_b").cast("double") - F.lit(1.0))
        )
    )
    # Gate EVERY output column on the exactly-2-labels assert so
    # Catalyst column pruning can't drop the contract (r10 advice).
    def _gated(col):
        return F.when(
            F.assert_true(
                F.col("__ng") == 2,
                F.concat(
                    F.lit(
                        "yuen_trimmed_test requires exactly 2 group "
                        "labels, got "
                    ),
                    F.col("__ng").cast("string"),
                ),
            ).isNull(),
            col,
        )

    ok = (F.col("da") + F.col("db") > 0) & (F.col("h_a") > 1) & (
        F.col("h_b") > 1
    )
    return agg.select(
        _gated(F.col("group_a")).alias("group_a"),
        _gated(F.col("group_b")).alias("group_b"),
        _gated(F.col("n_a")).alias("n_a"),
        _gated(F.col("n_b")).alias("n_b"),
        _gated(F.col("h_a")).alias("h_a"),
        _gated(F.col("h_b")).alias("h_b"),
        _gated(F.round("tma", 6)).alias("tmean_a"),
        _gated(F.round("tmb", 6)).alias("tmean_b"),
        _gated(F.round(F.col("tma") - F.col("tmb"), 6)).alias("diff"),
        _gated(F.when(ok, F.round(se, 6))).alias("se"),
        _gated(F.when(ok, F.round(tstat, 6))).alias("t"),
        _gated(F.when(ok, F.round(dfw, 6))).alias("df"),
    )


# two-sided z for alpha, and z for power — the universal normal
# quantiles every power calculator hard-codes (16-digit doubles, so
# Spark and SQL replays see the same literal)
_Z_ALPHA = {
    0.01: 2.5758293035489004,
    0.05: 1.959963984540054,
    0.10: 1.6448536269514722,
}
_Z_POWER = {
    0.80: 0.8416212335729143,
    0.90: 1.2815515655446004,
    0.95: 1.6448536269514722,
}


def ab_power_report(
    df: DataFrame,
    metric_col: str,
    group_col: str | None = None,
    *,
    alpha: float = 0.05,
    power: float = 0.80,
    mde_rel: float = 0.02,
) -> DataFrame:
    """Pre-experiment power / MDE sizing from historical metric data
    (r12b — the calculator every experimentation platform runs
    before an A/B test: given this metric's variance, what lift is
    detectable at the current traffic, and how many units per arm
    does the TARGET lift need; two-sample z approximation with a
    50/50 split, Kohavi et al.'s standard formulas):

      mde_abs  = (z_{1−α/2} + z_{power}) · sqrt(2σ²/n_arm),  n_arm = n/2
      n_target = ceil(2σ²(z_{1−α/2} + z_{power})² / (mean·mde_rel)²)

    One row per group (or one row total): ``(group?, n, mean,
    variance, mde_abs, mde_rel_achievable, n_per_arm_target)``.
    ``mde_rel_achievable`` = mde_abs/mean. Groups with n < 2 or
    zero variance (or zero mean for the relative targets) yield
    NULLs rather than a convention.

    alpha must be one of {0.01, 0.05, 0.10} and power one of
    {0.80, 0.90, 0.95} — the z constants are embedded as exact
    double literals so the whole chain replays bit-identically in
    SQL (no erf inverse in either engine).

    Exactness: the metric is cast to DECIMAL(18,6) micro integers;
    n, Σx, Σx² are exact DECIMAL(38,0), variance is the single
    exact ratio (nΣx² − (Σx)²)/(n(n−1)) — so each output is a fixed
    IEEE chain, 6dp-rounded. ONE map-side-combined groupBy; no
    window, no join.
    """
    a, p = round(float(alpha), 2), round(float(power), 2)
    if a not in _Z_ALPHA:
        raise ValueError(
            "ab_power_report: alpha must be one of 0.01/0.05/0.10"
        )
    if p not in _Z_POWER:
        raise ValueError(
            "ab_power_report: power must be one of 0.80/0.90/0.95"
        )
    if not float(mde_rel) > 0:
        raise ValueError("ab_power_report: mde_rel must be > 0")
    z = _Z_ALPHA[a] + _Z_POWER[p]
    _DI = "decimal(38,0)"
    x6 = (
        F.col(metric_col).cast("decimal(18,6)") * 1_000_000
    ).cast(_DI)
    base = df.where(F.col(metric_col).isNotNull())
    keys = [F.col(group_col)] if group_col else []
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_DI).alias("__n"),
        F.sum(x6).alias("__sx"),
        F.sum(x6 * x6).alias("__sxx"),
    )
    n = F.col("__n")
    mean = F.col("__sx").cast("double") / n.cast("double") / 1e6
    var = F.when(
        n > 1,
        (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
            "double"
        )
        / (n * (n - 1)).cast("double")
        / 1e12,
    )
    n_arm = F.expr("CAST(__n div 2 AS double)")
    mde_abs = F.when(
        (n_arm > 0) & (var > 0),
        F.lit(z) * F.sqrt(F.lit(2.0) * var / n_arm),
    )
    target_abs = mean * F.lit(float(mde_rel))
    n_target = F.when(
        (var > 0) & (target_abs != 0),
        F.ceil(
            F.lit(2.0) * var * F.lit(z) * F.lit(z)
            / (target_abs * target_abs)
        ).cast("long"),
    )
    # displayed variance via the exact HALF_UP integer rule: at
    # price-squared magnitudes round(double, 6) is not
    # engine-portable (the 6th decimal is past double precision)
    var6 = F.when(
        n > 1,
        F.expr(
            "CAST((2 * (__n * __sxx - __sx * __sx)"
            " + __n * (__n - 1) * 1000000)"
            " div (2 * __n * (__n - 1) * 1000000)"
            " AS decimal(38,0))"
        ).cast("double")
        / 1e6,
    )
    out_cols = ([F.col(group_col)] if group_col else []) + [
        n.cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        var6.alias("variance"),
        F.round(mde_abs, 6).alias("mde_abs"),
        F.when(mean != 0, F.round(mde_abs / mean, 6)).alias(
            "mde_rel_achievable"
        ),
        n_target.alias("n_per_arm_target"),
    ]
    return agg.select(*out_cols)
