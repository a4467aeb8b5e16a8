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
