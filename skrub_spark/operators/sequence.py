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


def window_funnel(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    steps: list,
    *,
    window_us: int,
) -> DataFrame:
    """Time-bounded ordered funnel (the ClickHouse
    ``windowFunnel`` shape): per entity, the furthest step of
    ``steps`` reached with every step STRICTLY after the previous
    one and the WHOLE chain inside ``window_us`` microseconds of
    the entity's FIRST step-1 event — greedy-first matching, the
    deterministic convention. The untimed cousin
    (``report/funnel.py`` / battery ``funnel_conversion``) answers
    "ever converted"; the window answers "converted as one
    session", which is what conversion and abuse funnels measure.

    Returns ``(entity, step_reached, t_first_us)`` for entities
    with ≥1 step-1 event; ``t_first_us`` anchors the window.
    Exactness: timestamps compare in integer microseconds
    (``unix_micros``); one conditional-min agg per step, each a
    map-side-combined entity-key groupBy joined broadcastless on
    the entity key — no windows, no sorts (battery oracle
    ``window_funnel`` replays the chained conditional mins).
    """
    wus = int(window_us)
    us = F.expr(f"unix_micros({ts_col})")
    ev = df.select(
        F.col(entity_col).alias("entity"),
        F.col(state_col).alias("state"),
        us.alias("us"),
    )
    cur = (
        ev.filter(F.col("state") == steps[0])
        .groupBy("entity")
        .agg(F.min("us").alias("t1"))
        .withColumn("t_prev", F.col("t1"))
    )
    reached = cur.select(
        "entity", F.lit(1).alias("step_reached"), F.col("t1")
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("state") == step)
            .join(cur, "entity")
            .filter(
                (F.col("us") > F.col("t_prev"))
                & (F.col("us") <= F.col("t1") + F.lit(wus))
            )
            .groupBy("entity")
            .agg(
                F.min("us").alias("t_prev"),
                F.first("t1").alias("t1"),
            )
            .select("entity", "t1", "t_prev")
        )
        cur = nxt
        reached = reached.unionByName(
            cur.select(
                "entity", F.lit(i).alias("step_reached"), F.col("t1")
            )
        )
    return reached.groupBy("entity").agg(
        F.max("step_reached").cast("int").alias("step_reached"),
        F.min("t1").cast("long").alias("t_first_us"),
    )


def seasonal_profile(
    df: DataFrame,
    ts_col: str,
) -> DataFrame:
    """Time-of-week seasonal profile of event volume: one row per
    (day-of-week, hour-of-day) cell — ``(dow, hour, n, share,
    lift)`` with ``share = n/total`` and ``lift = 168·n/total``
    (ratio to a uniform week; lift ≫ 1 = peak cell, ≪ 1 = dead
    cell). The weekly fingerprint is the baseline behavioral
    seasonality bot detection and load forecasting divide by —
    traffic that ignores the human week is machine traffic.

    Cells with zero events still get rows (a dense 7×24 grid from
    a range cross join) so downstream consumers never special-case
    holes. Exactness: dow/hour come from INTEGER microsecond
    arithmetic (``dow = (day+3) mod 7``, 0 = Monday — no engine
    date/timezone functions), counts are exact, share/lift are
    single IEEE divisions of exact integers, 6dp (battery oracle
    ``seasonal_profile``). One map + ONE 168-key map-side-combined
    groupBy; the total rides along from the cell agg.
    """
    us = F.expr(f"unix_micros({ts_col})")
    day = F.call_function("div", us, F.lit(86_400_000_000))
    cells = df.select(
        ((day + 3) % 7).cast("int").alias("dow"),
        (
            F.call_function("div", us, F.lit(3_600_000_000)) % 24
        ).cast("int").alias("hour"),
    )
    obs = cells.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = obs.agg(F.sum("n").cast("long").alias("total"))
    spark = df.sparkSession
    grid = spark.range(0, 7).select(
        F.col("id").cast("int").alias("dow")
    ).crossJoin(
        spark.range(0, 24).select(F.col("id").cast("int").alias("hour"))
    )
    return (
        grid.join(obs, ["dow", "hour"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.round(
                F.coalesce("n", F.lit(0)).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("share"),
            F.round(
                (F.lit(168) * F.coalesce("n", F.lit(0))).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("lift"),
        )
    )


def autocorrelation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of a regular integer-valued series at
    lags 1..``max_lag``: ``(lag, n_pairs, acf)``. The weekly ACF
    signature (a spike at lag 7) is the seasonality detector that
    decides whether ``seasonal_profile``'s weekly model applies at
    all; flat ACF = arrival noise, slow decay = trend leakage.

    Exactness: the textbook estimator
    ``r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)²`` is computed through
    the n²-scaled integer identity — numerator·n² =
    ``Σ (n·y_t − S)(n·y_{t+k} − S)`` and denominator·n² =
    ``Σ (n·y_t − S)²`` with S = Σy, so BOTH sides are exact
    integers (no float mean ever exists) and ``acf`` is ONE IEEE
    division rounded 6dp (battery oracle ``autocorrelation``).
    ``x_col`` must step by 1 between consecutive points (an
    epoch-day index); pairs exist only where both endpoints do, so
    gaps simply drop pairs.

    Scale shape: the series is a PERIOD frame (one row per day),
    not corpus-sized — the corpus-scale work happened in the
    upstream groupBy. The lag join is a self-equi-join on
    ``x + k`` over that bounded frame; n and S ride along from one
    total agg. ANSI guard: n·y products stay in int64 for series
    up to ~3·10⁹ total volume per 10³-point window.
    """
    base = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).persist()
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    centered = base.crossJoin(F.broadcast(tot)).select(
        "x",
        (F.col("n") * F.col("y") - F.col("s")).alias("c"),
        "n",
        "s",
    )
    lags = centered.sparkSession.range(1, int(max_lag) + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    right = centered.select(
        F.col("x").alias("xr"), F.col("c").alias("cr")
    )
    pairs = (
        centered.crossJoin(F.broadcast(lags))
        .join(
            right,
            F.col("xr") == F.col("x") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("c") * F.col("cr")).alias("num"),
        )
    )
    den = centered.agg(
        F.sum(F.col("c") * F.col("c")).alias("den")
    )
    return (
        lags.join(pairs, "lag", "left")
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias(
                "n_pairs"
            ),
            F.when(
                (F.col("den") > 0) & F.col("num").isNotNull(),
                F.round(
                    F.col("num").cast("double")
                    / F.col("den").cast("double"),
                    6,
                ),
            ).alias("acf"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    alpha: float = 0.3,
    k: int = 14,
) -> DataFrame:
    """Truncated exponentially-weighted moving average over a
    regular integer-indexed series: ``(x, y, ewma, resid)`` with
    ``ewma_t = Σ_{i<k} w_i·y_{t−i} / Σ w_i`` and weights
    ``w_i = round(α(1−α)^i, 6)`` — the k-term truncation of the
    recursive EWMA, which (unlike the recursion) is an exact
    FINITE weighted sum and therefore SQL-replayable. The residual
    ``y − ewma`` is the de-trended series anomaly monitors
    threshold (pair with ``mad_outliers`` for robust bands).

    Exactness: weights are 6dp LITERALS precomputed in Python (the
    same literals are emitted into the oracle — no runtime pow),
    per-term products ``w_i · y_{t−i}`` are exact DECIMALs (y
    integer), the numerator sums in fixed order as DECIMAL(38,6),
    the denominator is one literal, and the division is ONE IEEE
    op rounded 6dp (battery oracle ``ewma_smooth``). Rows with
    fewer than k preceding points emit NULL ewma (no silent
    partial-window renormalization).

    Scale shape: the input is a PERIOD frame (one row per x —
    corpus-scale work happened upstream); the lag window orders
    the bounded period frame. ``x_col`` must step by 1; gaps make
    the window see non-adjacent periods, so gapfill first
    (``time_bucket_gapfill``).
    """
    a = float(alpha)
    ws = [round(a * (1 - a) ** i, 6) for i in range(int(k))]
    wsum = round(sum(ws), 6)
    w = Window.orderBy(x_col)
    y = F.col(y_col).cast("long")
    terms = [
        (
            F.lag(y, i).over(w)
            * F.lit(f"{ws[i]:.6f}").cast("decimal(8,6)")
        ).cast("decimal(38,6)")
        for i in range(int(k))
    ]
    num = terms[0]
    for t in terms[1:]:
        num = num + t
    return df.select(
        F.col(x_col).alias("x"),
        y.alias("y"),
        F.round(
            num.cast("double")
            / F.lit(f"{wsum:.6f}").cast("decimal(8,6)").cast("double"),
            6,
        ).alias("ewma"),
        F.round(
            y.cast("double")
            - num.cast("double")
            / F.lit(f"{wsum:.6f}").cast("decimal(8,6)").cast("double"),
            6,
        ).alias("resid"),
    )


def twap_daily(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Time-weighted average value per (entity, day) — the TWAP
    shape (finance: fair daily price from irregular ticks; ops:
    true average gauge level from event-driven samples — a plain
    AVG over-weights bursts): each observation holds its value
    until the next one in the same day, the last until midnight —
    ``(entity, day, n_obs, twap)``.

    Exactness: weights are exact integer microseconds (lead over
    the (entity, day) window; day-end fallback), per-row products
    ``value · w`` are 6dp-rounded into DECIMAL(38,6) order-free
    sums, and twap is ONE IEEE division rounded 6dp (battery
    oracle ``twap_daily``). Windows partition by (entity, day) —
    bounded frames, one shuffle. ``id_col`` breaks timestamp ties
    (tied observations would otherwise split the interval
    order-dependently; with the tie-break the earlier id holds for
    0 µs — deterministic on every engine).
    """
    us = F.expr(f"unix_micros({ts_col})")
    day = F.call_function("div", us, F.lit(86_400_000_000))
    base = df.select(
        F.col(entity_col).alias("entity"),
        day.alias("day"),
        us.alias("us"),
        F.col(id_col).alias("oid"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = Window.partitionBy("entity", "day").orderBy("us", "oid")
    nxt = F.lead("us").over(w)
    day_end = (F.col("day") + 1) * F.lit(86_400_000_000)
    weight = F.coalesce(nxt, day_end) - F.col("us")
    terms = base.select(
        "entity",
        "day",
        F.round(F.col("v") * weight.cast("double"), 6)
        .cast("decimal(38,6)")
        .alias("vw"),
        weight.alias("w"),
    )
    return terms.groupBy("entity", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.round(
            F.sum("vw").cast("double")
            / F.sum("w").cast("double"),
            6,
        ).alias("twap"),
    )


def cumulative_distinct(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Running distinct-entity count by day (r9 — the "total users
    ever seen" curve; naive COUNT(DISTINCT) OVER would shuffle every
    event into one task): ``(day, n_active, new_entities,
    cum_entities)`` where ``new_entities`` counts entities whose
    FIRST event falls on the day and ``cum_entities`` is their
    running sum — exactly the distinct-to-date count, computed from
    one per-entity min reduce + per-day counts + a cumsum over the
    bounded day frame (days, not rows — never corpus-wide)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    ev = df.select(F.col(entity_col).alias("e"), day)
    active = ev.groupBy("day").agg(
        F.count_distinct("e").cast("long").alias("n_active")
    )
    firsts = (
        ev.groupBy("e")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("new_entities"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active.join(firsts, "day", "left")
        .withColumn(
            "new_entities", F.coalesce("new_entities", F.lit(0)).cast("long")
        )
        .withColumn(
            "cum_entities", F.sum("new_entities").over(w).cast("long")
        )
    )


def stl_decompose(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    *,
    trend_window: int = 7,
    season_period: str = "dow",
) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of daily
    series (r9 — the STL shape with the moving-average trend and
    period-mean seasonal, the honest SQL-replayable core of
    Cleveland et al.'s loess version): per (series, day) —
    ``(series, day, value, trend, seasonal, residual)``.

    value = per-day DECIMAL sum (exact); trend = centered
    ``trend_window``-day moving average (NULL until the window is
    full — no edge extrapolation lies); seasonal = 6dp mean of the
    detrended values per day-of-week; residual = value - trend -
    seasonal. Every sum is exact decimal, every division a single
    IEEE op, so all three components replay bit-identically
    (battery oracle ``stl_daily``). Windows are bounded by DAYS per
    series, never rows."""
    if season_period != "dow":
        raise ValueError("only day-of-week seasonality is implemented")
    if trend_window % 2 != 1:
        raise ValueError("trend_window must be odd (centered MA)")
    half = trend_window // 2
    daily = (
        df.select(
            F.col(series_col).alias("series"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(value_col).cast("decimal(12,2)").alias("v"),
        )
        .groupBy("series", "day")
        .agg(F.sum("v").alias("value"))
    )
    w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    trended = daily.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w) == trend_window,
            F.round(
                F.sum("value").over(w).cast("double")
                / F.lit(float(trend_window)),
                6,
            ),
        ),
    ).withColumn(
        "detrended",
        F.round(F.col("value").cast("double") - F.col("trend"), 6),
    )
    # derived-frame self-join: alias to distinct names up front
    # (failAmbiguousSelfJoin rule)
    seas = trended.groupBy(
        F.col("series").alias("__ss"),
        F.dayofweek("day").alias("__dow"),
    ).agg(
        F.round(
            F.sum(F.col("detrended").cast("decimal(28,6)")).cast("double")
            / F.count("detrended").cast("double"),
            6,
        ).alias("seasonal")
    )
    return (
        trended.join(
            seas,
            (F.col("series") == F.col("__ss"))
            & (F.dayofweek(F.col("day")) == F.col("__dow")),
        )
        .select(
            "series",
            "day",
            F.col("value").cast("double").alias("value"),
            "trend",
            "seasonal",
            F.round(F.col("detrended") - F.col("seasonal"), 6).alias(
                "residual"
            ),
        )
    )


def rolling_hampel(
    series: DataFrame,
    by: list[str],
    period_col: str,
    value_col: str,
    *,
    half_window: int = 3,
    k: float = 3.0,
) -> DataFrame:
    """Rolling Hampel filter (r9c) — the robust time-series outlier
    detector (Pearson/Hampel): a point is anomalous when it sits
    more than ``k`` scaled-MADs from its centered rolling MEDIAN.
    Unlike the global Hampel pass (report/outliers.py) this flags
    LOCAL spikes in nonstationary series — the monitoring shape
    (traffic dips, metric glitches) a global median misses.

    Per group: a centered ``2·half_window+1``-row frame, median and
    MAD as explicit order statistics over the frame's sorted array
    (even n → mean of the middle two) — no percentile
    interpolation, so the frame replays bit-identically in SQL.
    MAD scales by the literal 1.4826 (consistency with σ under
    normality); a zero-MAD frame flags any nonzero deviation.

    Scale shape: one window pass partitioned by the series keys —
    the frame is (2w+1) values regardless of series length, and the
    per-period input is already aggregated (bounded per group), so
    no unpartitioned window over row-scale data exists.

    Returns ``(*by, period, value, med, mad, is_outlier)``.
    """

    def _median(arr):
        n = F.size(arr)
        mid = F.element_at(arr, ((n + 1) / 2).cast("int"))
        lo = F.element_at(arr, (n / 2).cast("int"))
        hi = F.element_at(arr, (n / 2 + 1).cast("int"))
        return F.when(n % 2 == 1, mid.cast("double")).otherwise(
            (lo.cast("double") + hi.cast("double")) / F.lit(2.0)
        )

    w = (
        Window.partitionBy(*by)
        .orderBy(period_col)
        .rowsBetween(-half_window, half_window)
    )
    vals = series.select(
        *by,
        F.col(period_col).alias("period"),
        F.col(value_col).cast("double").alias("value"),
        F.array_sort(
            F.collect_list(F.col(value_col).cast("double")).over(w)
        ).alias("__win"),
    )
    med = _median(F.col("__win"))
    with_med = vals.withColumn("med", med).withColumn(
        "__dev",
        F.array_sort(
            F.transform(
                F.col("__win"), lambda x: F.abs(x - F.col("med"))
            )
        ),
    )
    mad = _median(F.col("__dev"))
    out = with_med.withColumn("mad", mad).select(
        *by,
        "period",
        "value",
        "med",
        "mad",
        F.when(
            F.col("mad") == 0.0, F.abs(F.col("value") - F.col("med")) > 0
        )
        .otherwise(
            F.abs(F.col("value") - F.col("med"))
            > F.lit(float(k)) * F.lit(1.4826) * F.col("mad")
        )
        .alias("is_outlier"),
    )
    return out


def seasonal_naive_backtest(
    series: DataFrame,
    by: list[str],
    period_col: str,
    value_col: str,
    *,
    season: int = 7,
) -> DataFrame:
    """Rolling-origin backtest (r9c) of the two standard forecast
    baselines over a per-period series: NAIVE (ŷ_t = y_{t-1}) and
    SEASONAL-NAIVE (ŷ_t = y_{t-season}) — the skill floor any real
    forecasting model must beat (Hyndman's golden rule), and the
    fairest honest evaluation that needs no fitting at all: every
    forecast uses only past rows, so there is no leakage by
    construction.

    Exactness: per-group MAE = Σ|err| / n (exact integer/decimal
    sum, ONE IEEE division) and WAPE = Σ|err| / Σy (exact ratio —
    the per-row-division MAPE would sum IEEE doubles in engine-
    dependent order, so it is deliberately NOT emitted). Skill =
    mae_seasonal / mae_naive, one further IEEE division.

    Scale: the input is the already-aggregated period frame; lags
    are one window pass partitioned by the series keys. Returns
    ``(*by, n_eval, mae_naive, mae_seasonal, wape_seasonal,
    skill)`` over periods where BOTH baselines have a forecast
    (row position > season), making the two MAEs comparable.
    """
    w = Window.partitionBy(*by).orderBy(period_col)
    lagged = series.select(
        *by,
        F.col(value_col).cast("decimal(18,6)").alias("y"),
        F.lag(F.col(value_col).cast("decimal(18,6)"), 1).over(w).alias("f1"),
        F.lag(F.col(value_col).cast("decimal(18,6)"), season)
        .over(w)
        .alias("fs"),
    ).where(F.col("f1").isNotNull() & F.col("fs").isNotNull())
    return lagged.groupBy(*by).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(
            F.sum(F.abs(F.col("y") - F.col("f1"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mae_naive"),
        F.round(
            F.sum(F.abs(F.col("y") - F.col("fs"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mae_seasonal"),
        F.when(
            F.sum("y") > 0,
            F.round(
                F.sum(F.abs(F.col("y") - F.col("fs"))).cast("double")
                / F.sum("y").cast("double"),
                6,
            ),
        ).alias("wape_seasonal"),
        F.when(
            F.sum(F.abs(F.col("y") - F.col("f1"))) > 0,
            F.round(
                F.sum(F.abs(F.col("y") - F.col("fs"))).cast("double")
                / F.sum(F.abs(F.col("y") - F.col("f1"))).cast("double"),
                6,
            ),
        ).alias("skill"),
    )


def cross_correlation(
    a: DataFrame,
    b: DataFrame,
    x_col: str,
    y_col: str,
    *,
    max_lag: int = 7,
) -> DataFrame:
    """Sample cross-correlation between two regular integer series
    at lags −max_lag..+max_lag (positive lag: series ``a`` LEADS —
    a_t pairs with b_{t+lag}); the lead-lag detector ("do errors
    precede purchase dips?") next to ``autocorrelation``'s
    within-series version.

    Exactness (the autocorrelation identity, extended): with
    full-series sums S_a, S_b over the n COMMON periods,
    numerator·n² = Σ_pairs (n·a_t − S_a)(n·b_{t+k} − S_b) and each
    denominator·n² = Σ_common (n·a − S_a)² — all exact
    DECIMAL(38,0) integers; ccf is (num / (sqrt(da)·sqrt(db)))
    from three exact integers via two correctly-rounded sqrts and
    one divide, 6dp round. ``x_col`` must step by 1 (an epoch-day
    index); only periods present in BOTH series enter n/S (gaps
    drop pairs).

    Returns ``(lag, n_pairs, ccf)``.
    """
    av = a.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("ya"),
    )
    bv = b.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("yb"),
    )
    common = av.join(bv, "x").persist()
    d38 = "decimal(38,0)"
    tot = common.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ya").cast("long").alias("sa"),
        F.sum("yb").cast("long").alias("sb"),
    )
    cen = common.crossJoin(F.broadcast(tot)).select(
        "x",
        (
            F.col("n").cast(d38) * F.col("ya").cast(d38)
            - F.col("sa").cast(d38)
        ).alias("ca"),
        (
            F.col("n").cast(d38) * F.col("yb").cast(d38)
            - F.col("sb").cast(d38)
        ).alias("cb"),
    )
    den = cen.agg(
        F.sum(F.col("ca") * F.col("ca")).alias("da"),
        F.sum(F.col("cb") * F.col("cb")).alias("db"),
    )
    lags = common.sparkSession.range(
        -max_lag, max_lag + 1
    ).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        cen.select("x", "ca")
        .crossJoin(F.broadcast(lags))
        .join(
            cen.select(F.col("x").alias("x2"), "cb"),
            F.col("x") + F.col("lag") == F.col("x2"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).alias("num"),
        )
    )
    out = pairs.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.when(
            (F.col("da") > 0) & (F.col("db") > 0),
            F.round(
                F.col("num").cast("double")
                / (
                    F.sqrt(F.col("da").cast("double"))
                    * F.sqrt(F.col("db").cast("double"))
                ),
                6,
            ),
        ).alias("ccf"),
    )
    return out
