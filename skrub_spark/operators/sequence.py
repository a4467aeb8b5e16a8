"""Event-sequence analytics: Markov transition matrices and
mean-shift changepoint detection (beyond-reference operators for
the events/session family, SURVEY.md §2).

Both are exact distributed aggregations:

- ``event_transitions``: the first-order Markov transition matrix
  of a state column over per-entity event streams — the behavioral
  fingerprint session analytics and bot-detection score against.
  ONE window partitioned by entity (bounded per-entity frames,
  parallel across entities; ties broken by a unique event id) +
  ONE counting reduce; probabilities are single divisions of exact
  counts rounded 6dp.
- ``changepoint_mean_shift``: single most-likely changepoint in a
  per-period count series by binary segmentation — for every split
  k the scaled two-sample statistic
  ``|mean_left − mean_right| · sqrt(k·(n−k)/n)`` via cumulative
  windows over the PERIOD frame (bounded by the number of periods,
  never the raw corpus; the corpus-scale work is one counting
  groupBy per period). Deterministic arg-max (earliest split wins
  ties); all arithmetic fixed-order IEEE over exact counts,
  rounded 6dp — SQL-replayable (battery oracles
  ``event_transitions`` / ``changepoint_daily``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    df: DataFrame,
    entity_col: str,
    order_cols: list,
    state_col: str,
) -> DataFrame:
    """First-order transition matrix: ``(from_state, to_state, n,
    prob)`` with ``prob`` row-normalized per ``from_state``.
    ``order_cols`` must make the per-entity order total (append a
    unique id after the timestamp)."""
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    s = df.select(
        F.col(state_col).alias("to_state"),
        F.lag(F.col(state_col)).over(w).alias("from_state"),
    ).filter(F.col("from_state").isNotNull())
    pairs = s.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return pairs.join(F.broadcast(tot), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("__tot").cast("double"), 6
        ).alias("prob"),
    )


def changepoint_mean_shift(
    counts: DataFrame,
    period_col: str = "period",
    value_col: str = "cnt",
) -> DataFrame:
    """One row ``(split_after, stat, mean_left, mean_right)``: the
    period after which the series' mean most likely shifted —
    arg-max over splits k ∈ [1, n−1] of
    ``round(|Σ_left/k − Σ_right/(n−k)| · sqrt(k·(n−k)/n), 6)``,
    earliest period on ties. ``counts`` is the per-period frame
    (one row per period); returns an empty frame when n < 2."""
    w = (
        Window.orderBy(period_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        F.col(period_col).alias("p"),
        F.sum(F.col(value_col)).over(w).alias("cum"),
        F.row_number()
        .over(Window.orderBy(period_col))
        .alias("k"),
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col)).alias("s"),
    )
    j = cum.join(F.broadcast(tot)).filter(F.col("k") < F.col("n"))
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    ml = F.col("cum").cast("double") / kd
    mr = (F.col("s") - F.col("cum")).cast("double") / (nd - kd)
    stat = F.round(
        F.abs(ml - mr) * F.sqrt(kd * (nd - kd) / nd), 6
    )
    return (
        j.select(
            F.col("p").alias("split_after"),
            stat.alias("stat"),
            F.round(ml, 6).alias("mean_left"),
            F.round(mr, 6).alias("mean_right"),
        )
        .orderBy(F.col("stat").desc(), F.col("split_after").asc())
        .limit(1)
    )


def sequence_anomaly(
    df: DataFrame,
    entity_col: str,
    order_cols: list,
    state_col: str,
) -> DataFrame:
    """Per-entity sequence anomaly score under the corpus's own
    first-order Markov model: ``(entity, n_transitions,
    avg_surprise)`` where each observed transition contributes
    ``round(−ln(p), 6)`` surprise (p = the row-normalized corpus
    transition probability — every observed transition has p > 0
    by construction) and the score is the per-entity mean. Bots,
    scrapers and broken clients walk the state graph along rare
    edges; organic sessions ride the bulk — this is the standard
    behavioral-anomaly gate over ``event_transitions``.

    Exactness: p is the 6dp-rounded exact-count ratio, the single
    runtime ln is 6dp-rounded (the proven cross-engine bridge),
    per-entity surprises sum as DECIMAL(28,6), and the mean is one
    IEEE division — the DuckDB oracle (battery query
    ``sequence_anomaly``) replays the whole composition.

    Scale shape: the lag window is partitioned by ENTITY (one
    entity-key shuffle, bounded frames); the transition frame is
    computed ONCE and persisted at the branch point (matrix agg +
    scoring join would otherwise re-run the window); the
    |states|²-sized matrix broadcasts.
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    s = (
        df.select(
            F.col(entity_col).alias("entity"),
            F.col(state_col).alias("to_state"),
            F.lag(F.col(state_col)).over(w).alias("from_state"),
        )
        .filter(F.col("from_state").isNotNull())
        .persist()
    )
    pairs = s.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    matrix = pairs.join(F.broadcast(tot), "from_state").select(
        "from_state",
        "to_state",
        F.round(
            F.col("n").cast("double") / F.col("__tot").cast("double"), 6
        ).alias("prob"),
    )
    surprised = s.join(
        F.broadcast(matrix), ["from_state", "to_state"]
    ).select(
        "entity",
        F.round(-F.log(F.col("prob")), 6).alias("surp"),
    )
    return surprised.groupBy("entity").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.round(
            F.sum(F.col("surp").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_surprise"),
    )
