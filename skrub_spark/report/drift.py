"""Distribution-drift report: population stability index (PSI) and
the two-sample Kolmogorov–Smirnov distance (``ks_statistic``).

The report family describes one table (`TableReport`), asserts on
one table (`operators/expectations.py`), and diffs snapshot
MEMBERSHIP (`snapshot_diff`); this adds the standard ML-ops
DISTRIBUTION drift metric between two corpus slices — the
reference/current comparison every production scorecard runs before
trusting a new crawl or retraining batch:

    PSI(col) = Σ_bins (p_b − q_b) · ln(p_b / q_b)

(< 0.1 stable, 0.1–0.25 moderate, > 0.25 action). Conventions:

- **Declared bins.** Numeric columns bin on LITERAL edges,
  categoricals on a literal category list (+ ``<other>``; NULL gets
  its own bin) — the bin universe is driver-known, so missing bins
  appear with count 0 on both sides and two engines produce the
  same row set. Deriving edges from reference quantiles is the
  caller's job (`quantile_sketch` does it deterministically).
- **One aggregation pass per side, all columns.** Each row explodes
  into its (column, bin) labels; ONE map-side-combined groupBy per
  frame counts every column's histogram simultaneously — two corpus
  scans total regardless of how many columns are monitored.
- **Exact arithmetic.** Fractions are single IEEE divisions of
  exact counts; zero fractions clip to the standard 1e-4 floor;
  each bin's PSI term rounds to 6dp and the per-column sum runs
  over DECIMAL(28,6) — partitioning-invariant and bit-identically
  SQL-replayable (battery query ``drift_psi``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_BIN = "<null>"
_OTHER_BIN = "<other>"
_CLIP = 1e-4


@dataclass(frozen=True)
class DriftSpec:
    """One monitored column: numeric with ``edges`` (bins are
    (-inf, e0), [e0, e1), …, [en, inf)) or categorical with
    ``categories`` (everything else lands in ``<other>``)."""

    column: str
    kind: str = "numeric"
    edges: tuple = ()
    categories: tuple = ()

    def bin_labels(self) -> list[str]:
        if self.kind == "numeric":
            e = [f"{float(x):g}" for x in self.edges]
            labels = [f"(-inf,{e[0]})"]
            labels += [f"[{a},{b})" for a, b in zip(e, e[1:])]
            labels.append(f"[{e[-1]},inf)")
            return labels + [_NULL_BIN]
        return [str(c) for c in self.categories] + [_OTHER_BIN, _NULL_BIN]

    def bin_expr(self) -> Column:
        c = F.col(self.column)
        if self.kind == "numeric":
            e = [float(x) for x in self.edges]
            lbl = self.bin_labels()
            expr = F.when(c.isNull(), F.lit(_NULL_BIN)).when(
                c < F.lit(e[0]), F.lit(lbl[0])
            )
            for i in range(1, len(e)):
                expr = expr.when(c < F.lit(e[i]), F.lit(lbl[i]))
            return expr.otherwise(F.lit(lbl[len(e)]))
        expr = F.when(c.isNull(), F.lit(_NULL_BIN))
        for cat in self.categories:
            expr = expr.when(c == F.lit(str(cat)), F.lit(str(cat)))
        return expr.otherwise(F.lit(_OTHER_BIN))


def _bin_counts(df: DataFrame, specs: list[DriftSpec]) -> DataFrame:
    """(column, bin, cnt, total) — ONE exploded groupBy for every
    monitored column; total rides along via a scalar crossJoin."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(s.column).alias("column"),
                s.bin_expr().alias("bin"),
            )
            for s in specs
        ]
    )
    exploded = df.select(F.explode(pairs).alias("p")).select(
        "p.column", "p.bin"
    )
    counts = exploded.groupBy("column", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return counts.join(F.broadcast(total))


def psi_report(
    ref: DataFrame, cur: DataFrame, specs: list[DriftSpec]
) -> DataFrame:
    """Per-bin drift rows (column, bin, ref_frac, cur_frac,
    psi_term) plus the per-column ``psi`` total on every row —
    ready to gate on ``psi > 0.25``."""
    spark = ref.sparkSession
    universe = spark.createDataFrame(
        [(s.column, b) for s in specs for b in s.bin_labels()],
        "column string, bin string",
    )
    rc = _bin_counts(ref, specs).withColumnRenamed("cnt", "rc")
    cc = _bin_counts(cur, specs).withColumnRenamed("cnt", "cc")
    j = (
        universe.join(
            rc.select("column", "bin", "rc", F.col("total").alias("rt")),
            ["column", "bin"],
            "left",
        )
        .join(
            cc.select("column", "bin", "cc", F.col("total").alias("ct")),
            ["column", "bin"],
            "left",
        )
    )
    # totals: any bin row carries them; re-broadcast the scalars so
    # count-0 bins still divide by the right total
    rt = ref.agg(F.count(F.lit(1)).alias("rt2"))
    ct = cur.agg(F.count(F.lit(1)).alias("ct2"))
    j = j.join(F.broadcast(rt)).join(F.broadcast(ct))
    p = F.coalesce(F.col("rc"), F.lit(0)).cast("double") / F.col(
        "rt2"
    ).cast("double")
    q = F.coalesce(F.col("cc"), F.lit(0)).cast("double") / F.col(
        "ct2"
    ).cast("double")
    pc = F.greatest(p, F.lit(float(_CLIP)))
    qc = F.greatest(q, F.lit(float(_CLIP)))
    term = F.round((pc - qc) * F.log(pc / qc), 6).cast("decimal(28,6)")
    from pyspark.sql import Window

    out = j.select(
        "column",
        "bin",
        p.alias("ref_frac"),
        q.alias("cur_frac"),
        term.alias("psi_term"),
    )
    w = Window.partitionBy("column")
    return out.select(
        "column",
        "bin",
        "ref_frac",
        "cur_frac",
        F.col("psi_term").cast("double").alias("psi_term"),
        F.sum("psi_term").over(w).cast("double").alias("psi"),
    )


def ks_statistic(
    ref: DataFrame, cur: DataFrame, column: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between ``ref`` and
    ``cur`` on ``column``: ONE row ``(col_name, n_ref, n_cur, ks,
    at_value)`` where ``ks = sup_v |ECDF_ref(v) − ECDF_cur(v)|``
    and ``at_value`` is the smallest value attaining it.

    PSI needs declared bins; KS is the bin-free companion for
    numeric columns. Shape: one counting groupBy per side (shuffles
    the value column only), a full-outer merge of the DISTINCT
    value frames, and one cumulative window over distinct values
    (bounded by cardinality, never a per-row global sort — quantize
    ``column`` first for unbounded continuous data). The supremum
    is maximized in INTEGER space — ``|cum_ref·n_cur −
    cum_cur·n_ref|`` — so the argmax and the 6dp-rounded statistic
    replay bit-identically in SQL (battery oracle ``drift_ks``).
    Integer-exactness needs ``n_ref·n_cur < 2^63`` (≈3e9 rows per
    side); beyond that ANSI mode raises rather than silently
    wrapping — quantize + pre-aggregate first at that scale.

    NULLs are dropped (KS is defined over observed values);
    ``n_ref`` / ``n_cur`` count non-null rows.
    """
    v = F.col(column)
    a = (
        ref.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    b = (
        cur.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    m = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = m.select(
        "v",
        F.sum("rc").over(w).alias("cum_r"),
        F.sum("cc").over(w).alias("cum_c"),
    )
    rt = ref.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    ct = cur.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    c = c.join(F.broadcast(rt)).join(F.broadcast(ct))
    num = F.abs(
        F.col("cum_r") * F.col("n_cur")
        - F.col("cum_c") * F.col("n_ref")
    )
    top = (
        c.select(
            "v", "n_ref", "n_cur", num.alias("num")
        )
        .orderBy(F.col("num").desc(), F.col("v").asc())
        .limit(1)
    )
    return top.select(
        F.lit(column).alias("col_name"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(
            F.col("num").cast("double")
            / (
                F.col("n_ref").cast("double")
                * F.col("n_cur").cast("double")
            ),
            6,
        ).alias("ks"),
        F.col("v").alias("at_value"),
    )


def chi2_drift(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
) -> DataFrame:
    """Chi-square homogeneity test for CATEGORICAL drift (r9 — the
    third drift lens next to PSI (binned magnitude) and KS
    (continuous supremum): "did the category mix shift more than
    sampling noise explains?"). One row: ``(n_categories, dof,
    n_baseline, n_current, chi2)``.

    Both sides reduce to per-category counts (map-side combined);
    the statistic is assembled from INTEGER counts only — per-cell
    term ``(o·N − rowtot·coltot)² / (rowtot·coltot·N)`` computed in
    DECIMAL(38,0) numerators (counts up to ~1e9 stay exact; the
    headroom bound is documented like target_encode's), one IEEE
    division per cell rounded to 6dp, summed as exact
    DECIMAL(28,6) — partitioning-invariant and SQL-replayable
    (battery oracle ``drift_chi2``). NULL categories fold to a
    sentinel so they count as a real level."""
    sent = "<null>"

    def counted(df, name):
        return (
            df.select(
                F.coalesce(F.col(col).cast("string"), F.lit(sent)).alias(
                    "cat"
                )
            )
            .groupBy("cat")
            .agg(F.count(F.lit(1)).alias(name))
        )
    b = counted(baseline, "nb")
    c = counted(current, "nc")
    cells = (
        b.join(c, "cat", "full")
        .select(
            "cat",
            F.coalesce("nb", F.lit(0)).alias("nb"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
        .withColumn("rowtot", F.col("nb") + F.col("nc"))
    )
    tot = cells.agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )
    j = cells.join(F.broadcast(tot))
    big = "decimal(38,0)"
    n_all = (F.col("tb") + F.col("tc")).cast(big)

    def term(o, coltot):
        num = (
            o.cast(big) * n_all
            - F.col("rowtot").cast(big) * coltot.cast(big)
        )
        den = (
            F.col("rowtot").cast(big) * coltot.cast(big) * n_all
        )
        return F.round(
            (num * num).cast("double") / den.cast("double"), 6
        ).cast("decimal(28,6)")

    per = j.select(
        F.col("cat"),
        (
            term(F.col("nb"), F.col("tb"))
            + term(F.col("nc"), F.col("tc"))
        ).alias("t"),
    )
    out = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum("t").cast("double").alias("chi2"),
    )
    return out.join(F.broadcast(tot)).select(
        "n_categories",
        (F.col("n_categories") - 1).cast("long").alias("dof"),
        F.col("tb").cast("long").alias("n_baseline"),
        F.col("tc").cast("long").alias("n_current"),
        F.round("chi2", 6).alias("chi2"),
    )


def wasserstein_1d(
    ref: DataFrame, cur: DataFrame, column: str
) -> DataFrame:
    """Two-sample 1-D Wasserstein-1 (earth-mover) distance between
    ``ref`` and ``cur`` on a numeric ``column`` (r12b — the drift
    metric that sees HOW FAR mass moved, which PSI's bins and KS's
    supremum both miss; the standard numeric-drift companion:
    W1 = ∫|F_ref − F_cur| dv). ONE row: ``(col_name, n_ref, n_cur,
    w1, w1_norm)`` with ``w1_norm = w1/(max−min)`` (scale-free;
    NULL for a degenerate single-value support).

    Exactness: values are 6dp-quantized to integer micro units; on
    the merged distinct-value frame each step contributes the exact
    integer |cum_ref·n_cur − cum_cur·n_ref| · Δv6, summed in
    DECIMAL(38,0), so w1 is ONE IEEE division — bit-replayable in
    SQL. NULLs are dropped. Integer-exactness needs n_ref·n_cur <
    2^63 (the ks_statistic bound); ANSI mode raises beyond it.

    Shape (100 TB): one counting groupBy per side (shuffles the
    value column only), a full-outer merge of the DISTINCT value
    frames, one cumulative window over distinct values (bounded by
    cardinality — quantize first for unbounded continuous data),
    one scalar aggregate.
    """
    from pyspark.sql import Window

    v6 = (F.col(column).cast("decimal(18,6)") * 1_000_000).cast(
        "long"
    )
    a = (
        ref.select(v6.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    b = (
        cur.select(v6.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    m = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("v")
    c = m.select(
        "v",
        F.sum("rc").over(w).alias("cum_r"),
        F.sum("cc").over(w).alias("cum_c"),
        (F.lead("v").over(wn) - F.col("v")).alias("dv"),
    )
    rt = ref.select(v6.alias("x")).filter(
        F.col("x").isNotNull()
    ).agg(F.count(F.lit(1)).alias("n_ref"))
    ct = cur.select(v6.alias("x")).filter(
        F.col("x").isNotNull()
    ).agg(F.count(F.lit(1)).alias("n_cur"))
    c = c.join(F.broadcast(rt)).join(F.broadcast(ct))
    _DI = "decimal(38,0)"
    num = F.abs(
        F.col("cum_r") * F.col("n_cur")
        - F.col("cum_c") * F.col("n_ref")
    ).cast(_DI)
    term = F.when(
        F.col("dv").isNotNull(), num * F.col("dv").cast(_DI)
    )
    agg = c.agg(
        F.coalesce(F.sum(term), F.lit(0).cast(_DI)).alias("s"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )
    nn = (
        F.col("n_ref").cast("double") * F.col("n_cur").cast("double")
    )
    w1 = F.col("s").cast("double") / nn / 1e6
    rng = (F.col("vmax") - F.col("vmin")).cast("double") / 1e6
    return agg.select(
        F.lit(column).alias("col_name"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.when(nn > 0, F.round(w1, 6)).alias("w1"),
        F.when((nn > 0) & (rng > 0), F.round(w1 / rng, 6)).alias(
            "w1_norm"
        ),
    )
