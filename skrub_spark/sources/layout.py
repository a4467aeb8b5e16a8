"""Z-order data layout (SURVEY.md §4: multi-dimensional scan
pruning).

Parquet readers skip whole files/row-groups when the column min/max
stats exclude the predicate — but stats only help if the data is
CLUSTERED on the filtered columns. Sorting clusters ONE column;
multi-dimensional range queries (``user BETWEEN .. AND ts BETWEEN
..``) need a space-filling curve: interleave the bits of each
dimension's rank so rows close in N-dim space land in the same
files, and every dimension's min/max stays tight in every file.
At 100 TB the difference is reading 2% of files instead of 100%.

- :func:`zorder_value` — the interleaved-bit key as a pure Catalyst
  Column over fixed per-column ranges (integer shift/mask
  arithmetic, so a SQL oracle replays every key exactly — battery
  query ``zorder_keys``).
- :func:`write_zordered` — range-repartition on the key + sort
  within partitions + parquet write: each output file covers one
  compact z-range, which is what makes its per-dimension min/max
  selective.
- :func:`file_skip_fraction` — measures the layout's worth from the
  parquet footers alone: the fraction of files a range predicate
  can skip on min/max stats (the exact decision a reader's
  row-group pruning makes). The bench demo compares plain vs
  linear-sort vs z-order layouts with this number.

Ranges are FIXED inputs (from table stats or domain knowledge), not
computed per write: layout keys must be stable across ingest batches
or file boundaries drift every run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: dict[str, tuple[float, float]], bits: int = 16
) -> Column:
    """Interleaved-bit z-value over ``{col: (lo, hi)}`` ranges.

    Each column is min-max scaled to an integer cell in
    [0, 2^bits); bit i of column c lands at output bit
    ``i · n_cols + c``. Values outside [lo, hi] clamp to the edge
    cells (layout keys must never error on a straggler). Pure
    integer arithmetic after the one scale division — engine-exact.
    Output fits a BIGINT for n_cols · bits ≤ 63."""
    names = list(cols)
    n = len(names)
    if n * bits > 63:
        raise ValueError("n_cols * bits must fit a signed 64-bit key")
    cells = []
    for c in names:
        lo, hi = cols[c]
        span = float(hi) - float(lo)
        if span <= 0:
            raise ValueError(f"empty range for {c!r}")
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit(float(2**bits))
        )
        cell = F.least(
            F.lit((2**bits) - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), F.floor(scaled).cast("long")),
        )
        cells.append(cell)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, cell in enumerate(cells):
            # ((cell >> i) & 1) << (i * n + ci)
            z = z + F.expr(
                f"CAST({2 ** (i * n + ci)} AS BIGINT)"
            ) * F.shiftright(cell, i).bitwiseAND(F.lit(1).cast("long"))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: dict[str, tuple[float, float]],
    *,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve: range
    repartition on the z-value (each output file owns one compact
    z-interval) + sort within partitions (tight row-group stats
    inside each file too)."""
    keyed = df.withColumn("__z", zorder_value(cols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_fraction(
    path: str, predicate: dict[str, tuple[float, float]]
) -> float:
    """Fraction of parquet files under ``path`` whose footer min/max
    stats let a reader SKIP them for ``{col: (lo, hi)}`` range
    predicates — exactly the stats-pruning decision, measured from
    the footers without reading data pages."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        can_skip = False
        for col, (lo, hi) in predicate.items():
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins and (min(mins) > hi or max(maxs) < lo):
                can_skip = True
                break
        skipped += can_skip
    return skipped / len(files)


def _minmax_cell(col: str, lo: float, hi: float, bits: int) -> Column:
    """The zorder_value clamp/scale, shared by both curves."""
    span = float(hi) - float(lo)
    if span <= 0:
        raise ValueError(f"empty range for {col!r}")
    scaled = (
        (F.col(col).cast("double") - F.lit(float(lo)))
        / F.lit(span)
        * F.lit(float(2**bits))
    )
    return F.least(
        F.lit((2**bits) - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(scaled).cast("long")),
    )


def hilbert_key(
    df: DataFrame,
    cols: dict[str, tuple[float, float]],
    bits: int = 8,
    out_col: str = "hkey",
) -> DataFrame:
    """2-D Hilbert-curve key (r9 — the locality upgrade over
    z-order: CONSECUTIVE Hilbert cells are always spatially
    adjacent, while the z-curve jumps across the grid at every
    power-of-two boundary, so Hilbert-ranged files have tighter
    per-dimension min/max and skip better on off-corner ranges;
    Faloutsos & Roseman PODS'89 measured ~25-50% fewer "runs" per
    range than z-order). Adds ``out_col`` to ``df``.

    The classic rotate-and-reflect walk (the xy2d loop), one bit
    level per step — each level tests the current bit pair,
    accumulates ``s²·((3rx) XOR ry)``, and reflects/swaps the
    quadrant frame. The per-level (d, x, y) state is MATERIALIZED
    as columns (a pure-Column unroll duplicates the x/y subtree at
    every swap — 2^bits copies — and OOMs Catalyst at plan build;
    sequential projections keep the plan linear in ``bits``).
    Integer ops only, so the key replays exactly in SQL as one
    chained CTE per level (battery oracle ``hilbert_keys``).

    ``bits`` defaults to 8 (256×256 = 65k cells — far beyond any
    file count, which is what layout keys cluster)."""
    names = list(cols)
    if len(names) != 2:
        raise ValueError("hilbert_key is 2-D (the classic walk)")
    one = F.lit(1).cast("long")
    cur = df.withColumns(
        {
            "__hx": _minmax_cell(names[0], *cols[names[0]], bits),
            "__hy": _minmax_cell(names[1], *cols[names[1]], bits),
            "__hd": F.lit(0).cast("long"),
        }
    )
    n1 = F.lit((1 << bits) - 1).cast("long")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        x, y = F.col("__hx"), F.col("__hy")
        rx = F.shiftright(x, level).bitwiseAND(one)
        ry = F.shiftright(y, level).bitwiseAND(one)
        refl = (ry == 0) & (rx == one)
        cur = cur.withColumns(
            {
                "__hd": F.col("__hd")
                + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry),
                "__hx": F.when(
                    ry == 0, F.when(refl, n1 - y).otherwise(y)
                ).otherwise(x),
                "__hy": F.when(
                    ry == 0, F.when(refl, n1 - x).otherwise(x)
                ).otherwise(y),
            }
        )
    return cur.withColumn(out_col, F.col("__hd")).drop(
        "__hx", "__hy", "__hd"
    )


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: dict[str, tuple[float, float]],
    *,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Hilbert curve —
    ``write_zordered`` with the better curve: each output file owns
    one compact Hilbert interval, whose cells are CONTIGUOUS in
    space, so per-dimension min/max are tighter than the z-curve's
    jump-crossing intervals."""
    keyed = hilbert_key(df, cols, bits, out_col="__h")
    (
        keyed.repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )
