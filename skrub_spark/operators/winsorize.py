"""Quantile winsorization — robust clipping at exact empirical
quantiles (the hard-clip companion to the reference's soft
``SquashingScaler``, reference ``skrub/_squashing_scaler.py:1``;
outlier capping before scaling/aggregation is the standard
preprocessing rung sklearn spells ``RobustScaler``/winsorize).

Exactness discipline: the cut points are DISCRETE lower quantiles —
the smallest value whose cumulative count reaches ``ceil(p·n)`` —
computed entirely in INTEGER arithmetic (p carried as basis points:
``k = (p_bp·n + 9999) div 10000``; a float ``ceil(p*n)`` is an
off-by-one trap — 0.01·500 is 5.000000000000001 in IEEE). So the
cut points, and therefore every clipped value, are
partitioning-invariant and replay bit-identically in SQL (battery
oracle ``quantile_clip``).

Scale shape: one (value, count) reduce, a cumulative window over
DISTINCT values (bounded by value cardinality — quantize first for
unbounded continuous data, as with ``ks_statistic``), two scalar
cut points broadcast back, then a map-only clip of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_clip(
    df: DataFrame,
    col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Adds ``out_col`` (default ``<col>_clipped``): values clipped
    to the [p_low, p_high] discrete empirical quantiles of ``col``
    (NULLs pass through). Quantile probabilities are carried at
    basis-point resolution (p rounds to 1/10000)."""
    lo_bp = int(round(float(p_low) * 10000))
    hi_bp = int(round(float(p_high) * 10000))
    if not 0 <= lo_bp <= hi_bp <= 10000:
        raise ValueError("need 0 <= p_low <= p_high <= 1")
    out_col = out_col or f"{col}_clipped"
    v = F.col(col)
    counts = (
        df.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v", F.sum("c").over(w).alias("cum")
    )
    n = df.filter(v.isNotNull()).agg(F.count(F.lit(1)).alias("n"))
    cuts = (
        cum.join(F.broadcast(n))
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({lo_bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias("__qlo"),
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({hi_bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias("__qhi"),
        )
    )
    clipped = F.when(
        v.isNotNull(),
        F.least(F.greatest(v, F.col("__qlo")), F.col("__qhi")),
    )
    return (
        df.join(F.broadcast(cuts))
        .withColumn(out_col, clipped)
        .drop("__qlo", "__qhi")
    )


def quantile_discretize(
    df: DataFrame,
    col: str,
    n_bins: int = 4,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency binning (sklearn ``KBinsDiscretizer
    strategy='quantile'`` shape): adds ``out_col`` (default
    ``<col>_bin``) in ``[0, n_bins)`` — the bin index is the number
    of quantile edges ≤ the value, edges at p = i/n_bins computed
    with the same integer basis-point rule as ``quantile_clip``.
    NULLs get a NULL bin. Degenerate distributions collapse bins
    (identical edges) rather than failing.

    One (value, count) reduce + distinct-value cumsum produce all
    ``n_bins − 1`` edges in a single aggregation row (broadcast
    back); the binning itself is map-only. Exact oracle:
    ``quantile_bins``."""
    n_bins = int(n_bins)
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    out_col = out_col or f"{col}_bin"
    v = F.col(col)
    counts = (
        df.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("c").over(w).alias("cum"))
    n = df.filter(v.isNotNull()).agg(F.count(F.lit(1)).alias("n"))
    edge_aggs = []
    for i in range(1, n_bins):
        bp = round(10000 * i / n_bins)
        edge_aggs.append(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias(f"__e{i}")
        )
    edges = cum.join(F.broadcast(n)).agg(*edge_aggs)
    bin_ix = F.lit(0)
    for i in range(1, n_bins):
        bin_ix = bin_ix + (v >= F.col(f"__e{i}")).cast("int")
    return (
        df.join(F.broadcast(edges))
        .withColumn(
            out_col, F.when(v.isNotNull(), bin_ix.cast("int"))
        )
        .drop(*[f"__e{i}" for i in range(1, n_bins)])
    )


def quantile_discretize_multi(
    df: DataFrame,
    cols: list,
    n_bins: int = 4,
    out_cols: list | None = None,
) -> DataFrame:
    """Equal-frequency binning of SEVERAL columns in ONE corpus
    aggregation — bin-for-bin identical to chaining
    :func:`quantile_discretize` per column, but the corpus is read
    once for ALL cut points instead of once per column, and the
    binning is a single broadcast of one edges row (r12-opt,
    guide §2.4: the chained form re-aggregated the input per column
    AND serialized each pass behind the previous pass's broadcast).

    Exactness precondition: every column must be integral or
    decimal-typed (≤ 6 fractional digits) — values are stacked
    through an exact ``decimal(38,6)`` cast so per-column edges and
    comparisons replay bit-identically. Float columns must use the
    single-column form (their cast would round).
    """
    n_bins = int(n_bins)
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    cols = list(cols)
    out_cols = list(out_cols) if out_cols else [f"{c}_bin" for c in cols]
    if len(out_cols) != len(cols):
        raise ValueError("out_cols must match cols")
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if not (
            dt in ("tinyint", "smallint", "int", "bigint")
            or dt.startswith("decimal")
        ):
            raise ValueError(
                f"quantile_discretize_multi: column {c!r} has type "
                f"{dt}; only integral/decimal columns bin exactly "
                "through the stacked decimal cast — use "
                "quantile_discretize per column instead"
            )
        if dt.startswith("decimal"):
            # r13 (ADVICE r12): enforce the docstring's exactness
            # precondition instead of silently rounding/overflowing —
            # the stacked decimal(38,6) cast is exact only when
            # scale <= 6 and the integer part fits 32 digits.
            from pyspark.sql.types import DecimalType

            dtyp = df.schema[c].dataType
            assert isinstance(dtyp, DecimalType)
            if dtyp.scale > 6 or dtyp.precision - dtyp.scale > 32:
                raise ValueError(
                    f"quantile_discretize_multi: column {c!r} has "
                    f"type {dt}; the stacked decimal(38,6) cast is "
                    "exact only for scale <= 6 and precision-scale "
                    "<= 32 — use quantile_discretize per column "
                    "instead"
                )
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("m"),
                        F.col(c).cast("decimal(38,6)").alias("v"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("p")
    ).select(F.col("p.m").alias("m"), F.col("p.v").alias("v"))
    counts = (
        stacked.filter(F.col("v").isNotNull())
        .groupBy("m", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("m")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "m", "v", F.col("c"), F.sum("c").over(w).alias("cum")
    )
    n_per = counts.groupBy("m").agg(F.sum("c").alias("n"))
    j = cum.join(F.broadcast(n_per), "m")
    edge_aggs = []
    for mi in range(len(cols)):
        for i in range(1, n_bins):
            bp = round(10000 * i / n_bins)
            edge_aggs.append(
                F.min(
                    F.when(
                        (F.col("m") == mi)
                        & (
                            F.col("cum")
                            >= F.expr(f"({bp}L * n + 9999L) div 10000L")
                        ),
                        F.col("v"),
                    )
                ).alias(f"__e_{mi}_{i}")
            )
    edges = j.agg(*edge_aggs)
    out = df.join(F.broadcast(edges))
    new_cols = {}
    for mi, (c, oc) in enumerate(zip(cols, out_cols)):
        v = F.col(c)
        bin_ix = F.lit(0)
        for i in range(1, n_bins):
            bin_ix = bin_ix + (v >= F.col(f"__e_{mi}_{i}")).cast("int")
        new_cols[oc] = F.when(v.isNotNull(), bin_ix.cast("int"))
    return out.withColumns(new_cols).drop(
        *[
            f"__e_{mi}_{i}"
            for mi in range(len(cols))
            for i in range(1, n_bins)
        ]
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    names: list[str] | None = None,
) -> DataFrame:
    """Per-group discrete quantiles — the p50/p95/p99 SLA report
    every latency dashboard runs, with the same integer
    basis-point cut rule as ``quantile_clip`` but PARTITIONED BY
    GROUP: ``(group, n, <p50>, <p95>, <p99>)``. Each quantile is
    the smallest actual value whose per-group cumulative count
    reaches ``ceil(p·n)`` (p at 1/10000 resolution) — pure rank
    SELECTION, no interpolation arithmetic, so float columns
    replay bit-exactly (the emitted values are input values).

    Scale shape: ONE (group, value) counting groupBy (map-side
    combined), a cumsum window over per-group DISTINCT VALUES
    (bounded by value cardinality, never row count), and ONE
    conditional-min agg per group. NULLs are excluded from n and
    selection. Battery oracle ``latency_sla`` replays the rule.
    """
    bps = [int(round(float(p) * 10000)) for p in probs]
    if names is None:
        names = [f"p{str(p).replace('0.', '')}" for p in probs]
    v = F.col(col)
    counts = (
        df.select(F.col(group_col).alias("__g"), v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("__g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "__g",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("__g")).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for bp, name in zip(bps, names):
        aggs.append(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias(name)
        )
    return (
        cum.groupBy("__g")
        .agg(*aggs)
        .withColumnRenamed("__g", group_col)
    )


def weighted_group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    weight_col: str,
    probs: list[float] = (0.25, 0.5, 0.75),
    names: list[str] | None = None,
) -> DataFrame:
    """Per-group WEIGHTED quantiles (weighted median & friends —
    "median price weighted by units sold", survey-weighted
    percentiles, token-weighted document stats): the smallest actual
    value whose per-group cumulative WEIGHT reaches ``ceil(p·W)``,
    with p at 1/10000 resolution — the same integer rank-selection
    rule as :func:`group_quantiles`, so the emitted values are input
    values and float columns replay bit-exactly.

    ``weight_col`` must be non-negative and INTEGER-VALUED (cast to
    long internally; pre-scale fractional weights — e.g. ×100 — to
    keep the cut rule exact). Rows with NULL value or NULL/≤0 weight
    are excluded from W and selection. int64 headroom: the cut
    computes ``bp·W`` in long, bounding per-group total weight at
    ~9.2e14 (document-token weights at 100 TB sit well inside; shard
    the group key beyond that).

    Scale shape (same as the unweighted SLA report): ONE
    (group, value) weight-sum groupBy (map-side combined), a cumsum
    window over per-group DISTINCT VALUES, one conditional-min agg.
    Returns ``(group, w_total, <names...>)``. Battery oracle
    ``weighted_median`` replays the rule."""
    bps = [int(round(float(p) * 10000)) for p in probs]
    if names is None:
        names = [f"wq{bp}" for bp in bps]
    counts = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(col).alias("v"),
            F.col(weight_col).cast("long").alias("__w"),
        )
        .filter(F.col("v").isNotNull() & (F.col("__w") > 0))
        .groupBy("__g", "v")
        .agg(F.sum("__w").alias("c"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "__g",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("__g")).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("w_total")]
    for bp, name in zip(bps, names):
        aggs.append(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({bp}L * n + 9999L) div 10000L"),
                    F.col("v"),
                )
            ).alias(name)
        )
    return (
        cum.groupBy("__g").agg(*aggs).withColumnRenamed("__g", group_col)
    )


def histogram_report(
    df: DataFrame,
    col: str,
    *,
    n_bins: int = 20,
) -> DataFrame:
    """Equal-width histogram of an INTEGER-valued column (scale
    decimals to cents first): ``(bin, lo_edge, hi_edge, cnt)`` with
    dense rows for empty bins. Bin index is pure integer
    arithmetic — ``(v − lo) · n_bins div (hi − lo + 1)`` over the
    exact global min/max — so every edge and count replays
    bit-exactly (battery oracle ``histogram_report``). ONE min/max
    agg (broadcast back) + ONE |bins|-key map-side-combined
    groupBy + a range frame for the dense grid."""
    nb = int(n_bins)
    if nb < 1:
        raise ValueError("n_bins must be >= 1")
    v = F.col(col)
    mm = df.filter(v.isNotNull()).agg(
        F.min(v).cast("long").alias("__lo"),
        F.max(v).cast("long").alias("__hi"),
    )
    width = F.col("__hi") - F.col("__lo") + 1
    binned = (
        df.filter(v.isNotNull())
        .crossJoin(F.broadcast(mm))
        .select(
            F.call_function(
                "div", (v.cast("long") - F.col("__lo")) * nb, width
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spark = df.sparkSession
    grid = (
        spark.range(0, nb)
        .select(F.col("id").alias("bin"))
        .crossJoin(F.broadcast(mm))
        .select(
            "bin",
            (
                F.col("__lo")
                + F.call_function("div", F.col("bin") * width, F.lit(nb))
            ).alias("lo_edge"),
            (
                F.col("__lo")
                + F.call_function(
                    "div", (F.col("bin") + 1) * width, F.lit(nb)
                )
                - 1
            ).alias("hi_edge"),
        )
    )
    return grid.join(binned, "bin", "left").select(
        F.col("bin").cast("int").alias("bin"),
        "lo_edge",
        "hi_edge",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
    )


def robust_scale_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group robust scaling (r9 — the GROUP-parameterized half
    of SquashingScaler's robust-scale step: each segment gets its
    own center/spread, the normalization cross-segment comparisons
    need): ``out_col = round((x − p50_g) / (p75_g − p25_g), 6)``,
    NULL when the group's IQR is zero (degenerate spread) or x is
    NULL.

    The quartiles come from :func:`group_quantiles` — pure rank
    SELECTION, so the emitted parameters are input values and the
    scaling is one subtract + one divide on bit-identical operands
    (exact-oracle battery query ``robust_scale_group``). Scale
    shape: the quantile reduce + ONE broadcast join of the bounded
    per-group parameter frame; the scan stays map-only."""
    q = group_quantiles(
        df, group_col, col, probs=[0.25, 0.5, 0.75],
        names=["q1", "med", "q3"],
    ).select(
        F.col(group_col).alias("__rg"), "q1", "med", "q3"
    )
    x = F.col(col).cast("double")
    iqr = F.col("q3").cast("double") - F.col("q1").cast("double")
    return (
        df.join(
            F.broadcast(q), F.col(group_col) == F.col("__rg"), "left"
        )
        .withColumn(
            out_col,
            F.when(
                x.isNotNull() & (iqr > 0),
                F.round(
                    (x - F.col("med").cast("double")) / iqr, 6
                ),
            ),
        )
        .drop("__rg", "q1", "med", "q3")
    )


def quantile_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    q_num: int = 1,
    q_den: int = 2,
    z: float = 1.959964,
) -> DataFrame:
    """Distribution-free confidence interval for a per-group
    quantile via order statistics (r10 — completes the CI family
    next to the Poisson bootstrap for means, report/bootstrap.py):
    the point estimate is the exact rank-selection quantile
    (rank ⌈n·q⌉, integer arithmetic — the group_quantiles rule) and
    the interval is the classic binomial order-statistic bracket in
    its normal approximation,

        lo_rank = max(1, ⌊n·q − z·√(n·q(1−q))⌋)
        hi_rank = min(n, ⌈n·q + z·√(n·q(1−q))⌉ + 1)

    q rides as the RATIONAL q_num/q_den so the point rank is exact;
    the bracket ranks are one fixed-order IEEE expression over the
    exact n (sqrt is correctly rounded, so both engines agree
    bit-for-bit). Output: one row per group — ``(group_cols…, n,
    q_est, ci_lo, ci_hi)``.

    Scale shape: ONE per-group window pass (row_number + count over
    the same partitioning — a single shuffle), then a conditional
    aggregation; no global sort."""
    if not (0 < q_num < q_den):
        raise ValueError("quantile_ci: need 0 < q_num < q_den")
    gp = Window.partitionBy(*group_cols)
    w = gp.orderBy(F.col("__v").asc())
    ranked = (
        df.select(
            *group_cols, F.col(value_col).cast("double").alias("__v")
        )
        .where(F.col("__v").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(gp))
    )
    qn, qd = int(q_num), int(q_den)
    r0 = F.expr(f"CAST((__n * {qn} + {qd - 1}) DIV {qd} AS BIGINT)")
    qdbl = F.lit(float(qn)) / F.lit(float(qd))
    nq = F.col("__n").cast("double") * qdbl
    s = F.sqrt(nq * (F.lit(1.0) - qdbl))
    zl = F.lit(float(z))
    lo = F.greatest(
        F.lit(1).cast("long"), F.floor(nq - zl * s).cast("long")
    )
    hi = F.least(
        F.col("__n").cast("long"),
        F.ceil(nq + zl * s).cast("long") + 1,
    )
    marked = ranked.select(
        *group_cols,
        "__rn",
        "__n",
        "__v",
        r0.alias("__r0"),
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    return marked.groupBy(*group_cols).agg(
        F.max("__n").cast("long").alias("n"),
        F.min(F.when(F.col("__rn") == F.col("__r0"), F.col("__v"))).alias(
            "q_est"
        ),
        F.min(F.when(F.col("__rn") == F.col("__lo"), F.col("__v"))).alias(
            "ci_lo"
        ),
        F.min(F.when(F.col("__rn") == F.col("__hi"), F.col("__v"))).alias(
            "ci_hi"
        ),
    )
