"""Interval algebra: overlapping-interval merge (coverage) and
event attribution — beyond-reference temporal operators
(SURVEY.md §2).

``range_join`` answers "which intervals overlap each other";
coverage answers "how much time is covered at all" — billing for
concurrent sessions, machine-utilization rollups, dedup of
overlapping crawl windows. The classic gaps-and-islands shape:
sort each entity's intervals, carry a running maximum of interval
ends, start a new island exactly when the next interval begins
after every previous end, then aggregate per island.

Attribution (`last_touch`) is the marketing-analytics standard:
credit each conversion event to the LAST qualifying touch strictly
before it (within a lookback window) — an as-of join semantics
expressed as ONE bounded window max over each entity's own stream
(no join at all, unlike ``asof_join`` which pairs two tables).

Exactness: all comparisons in integer microseconds, island ids are
integer cumulative sums, coverage sums are exact integers;
attribution picks max(struct(ts, id)) — a total order. Battery
oracles ``interval_coverage`` / ``attribution_last_touch`` replay
the windows verbatim.

Scale shape: every window partitions by the ENTITY key (the one
group shuffle); frames are bounded per entity. Nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_coverage(
    df: DataFrame,
    entity_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge each entity's overlapping-or-touching integer
    intervals and report ``(entity, n_intervals, n_islands,
    covered)`` where ``covered`` is the exact union length
    (end-exclusive: [s, e) with e > s; [1,3) + [3,5) merge into
    [1,5)). Zero/negative-length intervals are dropped."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    base = df.select(
        F.col(entity_col).alias("entity"),
        s.alias("s"),
        e.alias("e"),
    ).filter(F.col("e") > F.col("s"))
    w = Window.partitionBy("entity").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("s") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("entity", "island").agg(
        F.count(F.lit(1)).cast("long").alias("n_iv"),
        (F.max("e") - F.min("s")).alias("len"),
    )
    return islands.groupBy("entity").agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("len").cast("long").alias("covered"),
    )


def attribution_last_touch(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    *,
    conversion: str,
    lookback_us: int,
) -> DataFrame:
    """Last-touch attribution: one row per conversion event —
    ``(entity, conversion_id, conversion_us, touch_id, touch_state,
    touch_us)`` crediting the latest NON-conversion event strictly
    before the conversion and within ``lookback_us``; NULL touch
    columns when no qualifying touch exists. Ties in timestamp
    break by the larger event id (max(struct) total order)."""
    us = F.expr(f"unix_micros({ts_col})")
    ev = df.select(
        F.col(entity_col).alias("entity"),
        us.alias("us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(state_col).alias("state"),
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("us", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.max(
        F.when(
            F.col("state") != conversion,
            F.struct(
                F.col("us").alias("tus"),
                F.col("eid").alias("tid"),
                F.col("state").alias("tstate"),
            ),
        )
    ).over(w)
    out = (
        ev.withColumn("__t", touch)
        .filter(F.col("state") == conversion)
        .select(
            "entity",
            F.col("eid").alias("conversion_id"),
            F.col("us").alias("conversion_us"),
            F.when(
                F.col("__t.tus") > F.col("us") - F.lit(int(lookback_us)),
                F.col("__t.tid"),
            ).alias("touch_id"),
            F.when(
                F.col("__t.tus") > F.col("us") - F.lit(int(lookback_us)),
                F.col("__t.tstate"),
            ).alias("touch_state"),
            F.when(
                F.col("__t.tus") > F.col("us") - F.lit(int(lookback_us)),
                F.col("__t.tus"),
            ).alias("touch_us"),
        )
    )
    return out


def attribution_linear(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    *,
    conversion: str,
    lookback_us: int,
) -> DataFrame:
    """Linear multi-touch attribution (r9 — the fairness upgrade
    over :func:`attribution_last_touch`): every conversion's credit
    splits EQUALLY across ALL its qualifying touches — one row per
    (conversion, touch) with ``credit = round(1/n_touches, 6)``.
    A touch qualifies when it is a non-conversion event of the same
    entity, strictly earlier in the (ts, id) total order, and
    within ``lookback_us``. Conversions with no qualifying touch
    emit one row with NULL touch columns and NULL credit.

    Shape: one equi-join on the entity key + the window predicate —
    per-entity work bounded by that entity's event count, the same
    cost class as sessionization; no corpus-wide window. The join
    replays directly in SQL (exact oracle ``attribution_linear``)."""
    us = F.expr(f"unix_micros({ts_col})")
    ev = df.select(
        F.col(entity_col).alias("entity"),
        us.alias("us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(state_col).alias("state"),
    )
    conv = ev.filter(F.col("state") == conversion).select(
        "entity",
        F.col("eid").alias("conversion_id"),
        F.col("us").alias("conversion_us"),
    )
    touch = ev.filter(F.col("state") != conversion).select(
        "entity",
        F.col("eid").alias("touch_id"),
        F.col("us").alias("touch_us"),
        F.col("state").alias("touch_state"),
    )
    j = conv.join(touch, "entity", "left").filter(
        F.col("touch_id").isNull()
        | (
            (
                (F.col("touch_us") < F.col("conversion_us"))
                | (
                    (F.col("touch_us") == F.col("conversion_us"))
                    & (F.col("touch_id") < F.col("conversion_id"))
                )
            )
            & (
                F.col("touch_us")
                > F.col("conversion_us") - F.lit(int(lookback_us))
            )
        )
    )
    # conversions whose every touch was filtered out still need a row
    n = Window.partitionBy("entity", "conversion_id")
    counted = j.withColumn(
        "n_touches",
        F.count("touch_id").over(n).cast("long"),
    )
    base = conv.join(
        counted.select("entity", "conversion_id").distinct(),
        ["entity", "conversion_id"],
        "left_anti",
    ).select(
        "entity",
        "conversion_id",
        "conversion_us",
        F.lit(None).cast("long").alias("touch_id"),
        F.lit(None).cast("long").alias("touch_us"),
        F.lit(None).cast("string").alias("touch_state"),
        F.lit(0).cast("long").alias("n_touches"),
    )
    out = counted.select(
        "entity",
        "conversion_id",
        "conversion_us",
        "touch_id",
        "touch_us",
        "touch_state",
        "n_touches",
    ).unionByName(base)
    return out.withColumn(
        "credit",
        F.when(
            F.col("touch_id").isNotNull(),
            F.round(
                F.lit(1.0) / F.col("n_touches").cast("double"), 6
            ),
        ),
    )


def attribution_markov(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    *,
    conversion: str,
    n_iter: int = 12,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution (r9c) — the
    data-driven alternative to the positional rules above
    (``attribution_last_touch`` / ``attribution_linear``): model
    journeys as a first-order chain over channels with absorbing
    CONV/NULL states, score each channel by how much the start→CONV
    absorption probability DROPS when the channel is removed
    (Anderl et al. 2014), and attribute conversions ∝ removal
    effects.

    Determinism + oracle design: transition probabilities stay
    exact rationals c_ij/c_i; absorption probabilities are K fixed
    integer fixed-point iterations (the pagerank discipline,
    operators/graph.py) — p'_s = (Σ_j c_sj·v_j) div c_s with
    v_CONV = ``scale``, v_NULL = v_removed = 0 — so every scenario
    replays as chained SQL CTEs (battery oracle
    ``markov_attribution``). K bounds path length: the score is
    P(convert within K steps), the honest finite-horizon variant
    (journeys are short; K=12 covers >99.9% of paths at typical
    6-step journeys even with revisits).

    Scale shape: journey extraction is one row-scale window pass
    per entity (events up to and including the FIRST conversion);
    everything after lives on the BOUNDED transition matrix
    (channels² + absorbing rows), collected once (the repo's
    codebook discipline — one ~channels²-row collect) with the K
    iterations run driver-side in exact integer arithmetic; final
    rounding goes back through Spark expressions so the HALF_UP
    rule matches the SQL oracle.

    Returns ``(channel, base_cvr, removed_cvr, removal_effect,
    attribution)`` sorted columns-stable; attribution is NULL when
    the total removal effect is 0.
    """
    ev = df.select(
        F.col(entity_col).alias("u"),
        F.expr(f"unix_micros({ts_col})").alias("us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(state_col).cast("string").alias("state"),
    )
    w = Window.partitionBy("u").orderBy("us", "eid")
    rn = ev.withColumn("rn", F.row_number().over(w))
    first_conv = rn.where(F.col("state") == conversion).groupBy("u").agg(
        F.min("rn").alias("conv_rn")
    )
    kept = rn.join(first_conv, "u", "left").where(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    )
    wk = Window.partitionBy("u").orderBy("rn")
    steps = kept.select(
        "u",
        "rn",
        "state",
        F.lead("state", 1).over(wk).alias("nxt"),
    )
    conv_s, null_s, start_s = "__conv__", "__null__", "__start__"

    def canon(c):
        return (
            F.when(c.isNull(), F.lit(null_s))
            .when(c == conversion, F.lit(conv_s))
            .otherwise(c)
        )

    trans = (
        steps.where(F.col("state") != conversion)
        .select(F.col("state").alias("src"), canon(F.col("nxt")).alias("dst"))
        .unionByName(
            steps.where(F.col("rn") == 1).select(
                F.lit(start_s).alias("src"),
                canon(F.col("state")).alias("dst"),
            )
        )
    )
    counts = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # The matrix is bounded (channels^2 + absorbing rows): ONE
    # bounded collect (the repo's codebook discipline), then the
    # K fixed-point iterations run driver-side in exact integer
    # arithmetic — identical math to the SQL oracle's chained CTEs,
    # without paying 8 rounds of distributed-plan overhead for a
    # 20-row frame.
    mat = [
        (r["src"], r["dst"], int(r["c"])) for r in counts.collect()
    ]
    out_deg: dict = {}
    for src, _dst, c in mat:
        out_deg[src] = out_deg.get(src, 0) + c
    channels = sorted({src for src, _, _ in mat if src != start_s})
    states = sorted(out_deg)

    def absorb(removed: str | None) -> int:
        p = {st: 0 for st in states}
        for _ in range(int(n_iter)):
            nxt = {}
            for st in states:
                nxt[st] = p[st]
            acc = {st: 0 for st in states}
            for src, dst, c in mat:
                if dst == conv_s:
                    v = int(scale)
                elif dst == null_s or dst == removed:
                    v = 0
                else:
                    v = p.get(dst, 0)
                acc[src] += c * v
            p = {st: acc[st] // out_deg[st] for st in states}
        return p.get(start_s, 0)

    base_p = absorb(None)
    rows = []
    for ch in channels:
        rp = absorb(ch)
        rows.append((ch, base_p, rp, base_p - rp))
    total_re = sum(r[3] for r in rows)
    spark = df.sparkSession
    # final rounding through Spark expressions (HALF_UP on the JVM,
    # matching the SQL oracle) — python round() is banker's.
    raw = spark.createDataFrame(
        [(ch, bp, rp, re, total_re) for ch, bp, rp, re in rows],
        "channel string, bp long, rp long, re long, te long",
    )
    sc = F.lit(float(scale))
    return raw.select(
        "channel",
        F.round(F.col("bp").cast("double") / sc, 6).alias("base_cvr"),
        F.round(F.col("rp").cast("double") / sc, 6).alias("removed_cvr"),
        F.round(F.col("re").cast("double") / sc, 6).alias("removal_effect"),
        F.when(
            F.col("te") > 0,
            F.round(
                F.col("re").cast("double") / F.col("te").cast("double"), 6
            ),
        ).alias("attribution"),
    )


def attribution_time_decay(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    *,
    conversion: str,
    lookback_us: int,
    halflife_us: int,
) -> DataFrame:
    """Time-decay multi-touch attribution (r11 — the recency-aware
    member of the attribution family, between last-touch's
    winner-take-all and linear's equal split): each qualifying
    touch's credit is proportional to ``0.5 ** (age / halflife)``
    (a touch one half-life before the conversion earns half the
    weight of a same-instant touch), normalized per conversion.

    Exactness: per-touch weights are rounded to 6dp and summed as
    exact DECIMAL (order-independent); the credit is one IEEE
    division + round — the same bridge as the rest of the battery
    (exact oracle ``attribution_time_decay``). A conversion whose
    every in-window touch rounds to weight 0 emits NULL credits
    (no mass to split); no-touch conversions emit one NULL-touch
    row, matching :func:`attribution_linear`.

    Shape: identical to linear — one entity-key equi-join with the
    window predicate; per-entity work bounded by that entity's
    event count, no corpus-wide window."""
    if int(lookback_us) <= 0 or int(halflife_us) <= 0:
        # halflife_us = 0 would divide by zero in the decay exponent
        # and silently NULL every credit (ADVICE r11); match the
        # sibling operators' validation style
        raise ValueError(
            "attribution_time_decay: lookback_us and halflife_us "
            "must be > 0"
        )
    us = F.expr(f"unix_micros({ts_col})")
    ev = df.select(
        F.col(entity_col).alias("entity"),
        us.alias("us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(state_col).alias("state"),
    )
    conv = ev.filter(F.col("state") == conversion).select(
        "entity",
        F.col("eid").alias("conversion_id"),
        F.col("us").alias("conversion_us"),
    )
    touch = ev.filter(F.col("state") != conversion).select(
        "entity",
        F.col("eid").alias("touch_id"),
        F.col("us").alias("touch_us"),
        F.col("state").alias("touch_state"),
    )
    j = conv.join(touch, "entity", "inner").filter(
        (
            (F.col("touch_us") < F.col("conversion_us"))
            | (
                (F.col("touch_us") == F.col("conversion_us"))
                & (F.col("touch_id") < F.col("conversion_id"))
            )
        )
        & (
            F.col("touch_us")
            > F.col("conversion_us") - F.lit(int(lookback_us))
        )
    )
    w6 = F.round(
        F.pow(
            F.lit(0.5),
            (F.col("conversion_us") - F.col("touch_us")).cast("double")
            / F.lit(float(halflife_us)),
        ),
        6,
    ).cast("decimal(18,6)")
    weighted = j.withColumn("__w6", w6)
    nw = Window.partitionBy("entity", "conversion_id")
    scored = (
        weighted.withColumn("__sw", F.sum("__w6").over(nw))
        .select(
            "entity",
            "conversion_id",
            "conversion_us",
            "touch_id",
            "touch_us",
            "touch_state",
            F.col("__w6").cast("double").alias("weight"),
            F.when(
                F.col("__sw") > 0,
                F.round(
                    F.col("__w6").cast("double")
                    / F.col("__sw").cast("double"),
                    6,
                ),
            ).alias("credit"),
        )
    )
    base = conv.join(
        scored.select("entity", "conversion_id").distinct(),
        ["entity", "conversion_id"],
        "left_anti",
    ).select(
        "entity",
        "conversion_id",
        "conversion_us",
        F.lit(None).cast("long").alias("touch_id"),
        F.lit(None).cast("long").alias("touch_us"),
        F.lit(None).cast("string").alias("touch_state"),
        F.lit(None).cast("double").alias("weight"),
        F.lit(None).cast("double").alias("credit"),
    )
    return scored.unionByName(base)
