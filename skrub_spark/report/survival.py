"""Kaplan-Meier survival curves — beyond-reference
time-to-event analytics (SURVEY.md §2).

Churn/retention questions ("what fraction of customers are still
active t days after their first order?") are censored-data
questions: entities still active at the end of observation have
not churned *yet*, and dropping or mis-counting them biases naive
retention rates. The Kaplan-Meier product-limit estimator is the
standard answer: at every distinct event time t_i,

    S(t) = prod_{t_i <= t, d_i > 0} (1 - d_i / n_i)

with d_i = events at t_i and n_i = entities still at risk (not yet
event-ed or censored) just before t_i.

Exactness discipline (battery oracle ``survival_km``):

- The corpus-scale work is ONE (group, t) counting groupBy; the
  risk-set table is a PERIOD frame (one row per distinct duration
  per group), never entity-sized.
- ``n_risk`` is exact integer arithmetic: group total minus the
  cumulative removals STRICTLY before t (window ``ROWS UNBOUNDED
  PRECEDING .. 1 PRECEDING`` over the bounded per-group duration
  frame).
- The product is carried in log space via the proven cross-engine
  bridge: each factor contributes ``round(ln((n_i - d_i)/n_i), 6)``
  (the operand is ONE IEEE division of exact integers), terms sum
  in DECIMAL(38,6) (order-free), and ``survival = round(exp(sum),
  6)``. A time where d_i == n_i kills the whole risk set; survival
  is exactly 0 from there on (tracked by a cumulative flag — no
  ln(0)).

Scale shape: one group-key shuffle for the counting groupBy, one
bounded window partitioned by GROUP over distinct durations, one
|groups|-sized broadcast join for the totals. At 100 TB with
millions of groups every post-agg frame is |groups × distinct
durations|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Per-group Kaplan-Meier curve: one row per (group, distinct
    duration) — ``(group, t, n_risk, n_events, n_censored,
    survival)`` with ``survival`` the product-limit estimate AT t
    (events at t included). ``duration_col`` must be integer-valued
    (e.g. days); ``event_col`` is 1 = event observed, 0 = censored
    at t."""
    d = F.col(event_col).cast("long")
    per_t = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("long").alias("t"),
            d.alias("e"),
        )
        .groupBy("grp", "t")
        .agg(
            F.sum("e").cast("long").alias("n_events"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("n_censored"),
        )
        .persist()  # feeds both the totals agg and the risk window
    )
    tot = per_t.groupBy("grp").agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("__tot")
    )
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = per_t.join(F.broadcast(tot), "grp").withColumn(
        "n_risk",
        F.col("__tot")
        - F.coalesce(
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev),
            F.lit(0),
        ),
    )
    # ln factor only where 0 < d < n_risk; d == n_risk zeroes the
    # curve from this t on (cumulative max of the wipeout flag).
    term = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    wiped = F.max(
        (F.col("n_events") == F.col("n_risk")).cast("int")
    ).over(w_cum)
    ln_s = F.sum(term.cast("decimal(38,6)")).over(w_cum)
    return risk.select(
        F.col("grp").alias(group_col),
        F.col("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        "n_censored",
        F.when(wiped == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(ln_s.cast("double")), 6))
        .alias("survival"),
    )


def nelson_aalen(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Per-group Nelson–Aalen cumulative hazard (r9c) — the
    estimator dual to ``kaplan_meier`` above: H(t) = Σ_{t_i ≤ t}
    d_i/n_i. Preferred when hazard RATES are the question (failure
    intensity over time, competing-risk building block) and better-
    behaved than −ln(KM) in small risk sets.

    Exactness: shares KM's counting frame and exact-integer risk
    sets; each increment is ``round(d_i/n_i, 6)`` (ONE IEEE
    division of exact integers) and the cumulative sum runs in
    DECIMAL(38,6) — order-free, so the curve replays bit-identically
    in SQL (battery oracle ``nelson_aalen``). The Fleming-Harrington
    survival ``exp(−H)`` rides along through the proven exp bridge.

    Returns ``(group, t, n_risk, n_events, hazard_inc, cum_hazard,
    fh_survival)``.
    """
    d = F.col(event_col).cast("long")
    per_t = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("long").alias("t"),
            d.alias("e"),
        )
        .groupBy("grp", "t")
        .agg(
            F.sum("e").cast("long").alias("n_events"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("n_censored"),
        )
        .persist()
    )
    tot = per_t.groupBy("grp").agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("__tot")
    )
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = per_t.join(F.broadcast(tot), "grp").withColumn(
        "n_risk",
        F.col("__tot")
        - F.coalesce(
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev),
            F.lit(0),
        ),
    )
    inc = F.when(
        F.col("n_events") > 0,
        F.round(
            F.col("n_events").cast("double")
            / F.col("n_risk").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    cum = F.sum(inc.cast("decimal(38,6)")).over(w_cum)
    return risk.select(
        F.col("grp").alias(group_col),
        F.col("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        inc.alias("hazard_inc"),
        cum.cast("double").alias("cum_hazard"),
        F.round(F.exp(-cum.cast("double")), 6).alias("fh_survival"),
    )


def log_rank_test(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Two-group log-rank (Mantel-Cox) test (r10 — the hypothesis
    test the Kaplan-Meier / Nelson-Aalen curves above feed): are
    the two survival curves the same?

    At every distinct duration t with pooled events d_t, with n_gt
    at risk per group: E_at = d_t·n_at/n_t and
    Var_t = d_t·(n_at/n_t)·(1−n_at/n_t)·(n_t−d_t)/(n_t−1);
    the statistic is χ² = (Σ(d_at − E_at))² / ΣVar_t and
    z = Σ(d_at − E_at)/√ΣVar_t (negative when group a has FEWER
    events than expected, i.e. better survival).

    Returns one row: ``(group_a, group_b, n_a, n_b, events_a,
    events_b, o_minus_e, variance, chi2, z)``. Exactly two group
    labels are required (embedded assert — the cuped discipline).

    Determinism: risk sets are exact integer window arithmetic over
    the bounded per-duration frame (the kaplan_meier discipline);
    each per-time term is ONE fixed-order IEEE expression over
    exact integers rounded 6dp, summed as DECIMAL(18,6) —
    order-independent."""
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("long").alias("e"),
    ).filter(F.col("t").isNotNull() & F.col("g").isNotNull())
    labs = base.agg(
        F.countDistinct("g").cast("long").alias("__ng"),
        F.min("g").alias("ga"),
        F.max("g").alias("gb"),
    )
    per_t = (
        base.crossJoin(F.broadcast(labs))
        .groupBy("t")
        .agg(
            F.max("__ng").alias("__ng"),
            F.max("ga").alias("ga"),
            F.max("gb").alias("gb"),
            F.sum(F.when(F.col("g") == F.col("ga"), 1).otherwise(0))
            .cast("long")
            .alias("ra"),  # removals (events+censor) at t, group a
            F.sum(F.when(F.col("g") == F.col("gb"), 1).otherwise(0))
            .cast("long")
            .alias("rb"),
            F.sum(
                F.when(F.col("g") == F.col("ga"), F.col("e")).otherwise(0)
            )
            .cast("long")
            .alias("da"),
            F.sum(
                F.when(F.col("g") == F.col("gb"), F.col("e")).otherwise(0)
            )
            .cast("long")
            .alias("db"),
        )
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tots = base.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = tots.crossJoin(F.broadcast(labs)).agg(
        F.sum(F.when(F.col("g") == F.col("ga"), F.col("n")))
        .cast("long")
        .alias("na_tot"),
        F.sum(F.when(F.col("g") == F.col("gb"), F.col("n")))
        .cast("long")
        .alias("nb_tot"),
    )
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "*",
        (
            F.col("na_tot")
            - F.coalesce(F.sum("ra").over(w), F.lit(0))
        ).alias("n1"),
        (
            F.col("nb_tot")
            - F.coalesce(F.sum("rb").over(w), F.lit(0))
        ).alias("n2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    d1, d2 = F.col("da").cast("double"), F.col("db").cast("double")
    n = n1 + n2
    d = d1 + d2
    e1 = d * (n1 / n)
    v = F.when(
        (d > 0) & (n > 1),
        d * (n1 / n) * (F.lit(1.0) - n1 / n) * ((n - d) / (n - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    terms = risk.where(F.col("da") + F.col("db") > 0).select(
        F.round(d1 - e1, 6).cast("decimal(18,6)").alias("oe"),
        F.round(v, 6).cast("decimal(18,6)").alias("vv"),
        F.col("da"),
        F.col("db"),
    )
    agg = (
        terms.agg(
            F.sum("da").cast("long").alias("events_a"),
            F.sum("db").cast("long").alias("events_b"),
            F.sum("oe").cast("double").alias("oe_sum"),
            F.sum("vv").cast("double").alias("v_sum"),
        )
        .crossJoin(F.broadcast(labs))
        .crossJoin(F.broadcast(tot))
        .withColumnsRenamed(
            {"ga": "group_a", "gb": "group_b",
             "na_tot": "n_a", "nb_tot": "n_b"}
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
                        "log_rank_test requires exactly 2 group labels, got "
                    ),
                    F.col("__ng").cast("string"),
                ),
            ).isNull(),
            col,
        )

    return agg.select(
        _gated(F.col("group_a")).alias("group_a"),
        _gated(F.col("group_b")).alias("group_b"),
        _gated(F.col("n_a")).alias("n_a"),
        _gated(F.col("n_b")).alias("n_b"),
        _gated(F.col("events_a")).alias("events_a"),
        _gated(F.col("events_b")).alias("events_b"),
        _gated(F.round("oe_sum", 6)).alias("o_minus_e"),
        _gated(F.round("v_sum", 6)).alias("variance"),
        _gated(
            F.when(
                F.col("v_sum") > 0,
                F.round(
                    F.col("oe_sum") * F.col("oe_sum") / F.col("v_sum"), 6
                ),
            )
        ).alias("chi2"),
        _gated(
            F.when(
                F.col("v_sum") > 0,
                F.round(F.col("oe_sum") / F.sqrt("v_sum"), 6),
            )
        ).alias("z"),
    )


def aalen_johansen(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    cause_col: str,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under competing risks
    (r12b — the correct replacement for "1 − KM per cause", which
    overstates risk when other causes remove subjects; Aalen &
    Johansen 1978, the standard multi-state estimator): one row per
    (group, event time, cause) — ``(group, t, cause, n_risk,
    n_events, cif)`` with

        CIF_k(t) = Σ_{s≤t} S(s−) · d_k(s)/n(s)

    where S is the ANY-cause Kaplan-Meier curve. ``cause_col`` is
    0 for censored, any positive integer for a competing cause;
    ``duration_col`` must be integer-valued.

    Determinism bridge (the kaplan_meier discipline): S(s−) comes
    from 6dp-rounded ln factors summed exactly in DECIMAL(38,6)
    (strictly-before window) and one exp; each CIF increment is
    6dp-quantized before the exact DECIMAL cumulative sum, so the
    curve replays bit-identically in SQL. A time where events
    exhaust the risk set zeroes S from the NEXT time on (the KM
    wipeout rule).

    Plan shape (100 TB): two counting groupBys (per (group, t) and
    per (group, t, cause)); every window partitions by group (or
    (group, cause)) over DISTINCT event times — bounded by the
    duration grid, never row-scale.
    """
    c = F.col(cause_col).cast("long")
    per_t = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("long").alias("t"),
            c.alias("k"),
        )
        .groupBy("grp", "t")
        .agg(
            F.sum(F.when(F.col("k") > 0, 1).otherwise(0))
            .cast("long")
            .alias("d"),
            F.sum(F.when(F.col("k") <= 0, 1).otherwise(0))
            .cast("long")
            .alias("cens"),
        )
        .persist()
    )
    tot = per_t.groupBy("grp").agg(
        F.sum(F.col("d") + F.col("cens")).alias("__tot")
    )
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = per_t.join(F.broadcast(tot), "grp").withColumn(
        "n_risk",
        F.col("__tot")
        - F.coalesce(
            F.sum(F.col("d") + F.col("cens")).over(w_prev), F.lit(0)
        ),
    )
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    wiped_prev = F.coalesce(
        F.max((F.col("d") == F.col("n_risk")).cast("int")).over(
            w_prev
        ),
        F.lit(0),
    )
    ln_prev = F.coalesce(
        F.sum(term.cast("decimal(38,6)")).over(w_prev),
        F.lit(0).cast("decimal(38,6)"),
    )
    s_prev = F.when(wiped_prev == 1, F.lit(0.0)).otherwise(
        F.exp(ln_prev.cast("double"))
    )
    base = risk.select(
        "grp", "t", "n_risk", s_prev.alias("__sprev")
    )
    per_tc = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("long").alias("t"),
            c.alias("cause"),
        )
        .where(F.col("cause") > 0)
        .groupBy("grp", "t", "cause")
        .agg(F.count(F.lit(1)).cast("long").alias("dk"))
    )
    j = per_tc.join(base, ["grp", "t"])
    inc = F.round(
        F.col("__sprev")
        * F.col("dk").cast("double")
        / F.col("n_risk").cast("double"),
        6,
    ).cast("decimal(38,6)")
    w_cif = (
        Window.partitionBy("grp", "cause")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        F.col("grp").alias(group_col),
        "t",
        "cause",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("dk").alias("n_events"),
        F.round(
            F.sum(inc).over(w_cif).cast("double"), 6
        ).alias("cif"),
    )
