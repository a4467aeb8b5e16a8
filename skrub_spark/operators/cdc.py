"""Changelog application: CDC upsert-merge and SCD2 history.

The snapshot/ingest family (``sources/snapshots.py``) versions whole
corpora; production tables instead evolve through CHANGE STREAMS —
Debezium/Kafka-style (op, seq) changelogs applied onto a base
snapshot. This is the MERGE INTO / `APPLY CHANGES` shape every
lakehouse runs (Delta Live Tables, Iceberg upserts), re-expressed as
plain deterministic DataFrame ops so it works on any store:

- ``apply_changes``: latest-change-wins per key (ONE row_number
  window over the changelog, partitioned by key, ordered by seq
  DESC with a total tiebreak) then one full-outer join with the
  base. Deletes drop the key, inserts/updates replace the payload.
  At 100 TB the window shuffles only the CHANGELOG (usually ≪ the
  base) and the join is one co-partitioned shuffle on the key —
  the base is never rewritten except through the join.
- ``scd2_history``: the audit twin — every change becomes a
  validity interval [valid_from, valid_to) via ONE lead() window
  per key; the current row has valid_to NULL. Dimension tables at
  scale keep full history this way (Kimball type-2).

Both are pure window/join compositions — no UDFs, whole-stage
codegen end to end, and exactly replayable in SQL (the battery
oracles do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OPS = ("I", "U", "D")


def latest_changes(
    changes: DataFrame, key: str, seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Latest change per key: row_number over (seq DESC, op ASC)
    — the op tiebreak makes same-seq batches deterministic:
    'D' < 'I' < 'U', so ascending op lets a delete win a
    same-sequence tie (the Debezium tombstone convention)."""
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE the changelog into the base snapshot.

    Change rows must carry the base's payload columns (for I/U; D
    rows may leave them NULL). Returns the new snapshot with the
    base's schema."""
    payload = [c for c in base.columns if c != key]
    last = latest_changes(changes, key, seq_col, op_col).select(
        F.col(key),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__new_{c}") for c in payload],
    )
    joined = base.join(last, key, "full_outer")
    kept = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != "D")
    )
    out = kept.select(
        F.col(key),
        *[
            F.when(
                F.col("__op").isNotNull(), F.col(f"__new_{c}")
            ).otherwise(F.col(c)).alias(c)
            for c in payload
        ],
    )
    return out


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    ts_col: str,
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    strict: bool = False,
) -> DataFrame:
    """Point-in-time join: each fact picks the history row whose
    validity interval contains its timestamp — the consumption half
    of SCD2 (Kimball's "as-was" lookup). ``strict=False`` means
    state AS OF ts (valid_from ≤ ts < valid_to); ``strict=True``
    means state JUST BEFORE ts (valid_from < ts ≤ valid_to) — the
    leakage-safe variant a training pipeline wants (a feature must
    not see the change the label row itself caused). Left join:
    facts with no matching interval keep NULL state.

    Scale shape: an equi-join on the key does the heavy lifting
    (co-partitioned shuffle); the interval predicate filters within
    each key's history, which is small per key — no range-bucketing
    needed, unlike a general interval join."""
    lo = F.col(from_col) < F.col(ts_col) if strict else (
        F.col(from_col) <= F.col(ts_col)
    )
    hi = F.col(to_col).isNull() | (
        F.col(ts_col) <= F.col(to_col) if strict
        else F.col(ts_col) < F.col(to_col)
    )
    h = history.withColumnRenamed(key, "__hk")
    return facts.join(
        h, (F.col(key) == F.col("__hk")) & lo & hi, "left"
    ).drop("__hk")


def scd2_history(
    changes: DataFrame, key: str, seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a changelog:
    one row per change with [valid_from, valid_to) validity —
    valid_to = the NEXT change's seq (lead window), NULL while
    current; ``is_current`` marks the live row (false for a
    terminal delete). ONE window per key, no self-join."""
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).asc(), F.col(op_col).asc()
    )
    nxt = F.lead(F.col(seq_col)).over(w)
    return changes.select(
        "*",
        F.col(seq_col).alias("valid_from"),
        nxt.alias("valid_to"),
        (nxt.isNull() & (F.col(op_col) != "D")).alias("is_current"),
    )


def refresh_aggregate(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: list,
    *,
    count_col: str = "n",
    sum_cols: dict | None = None,
) -> DataFrame:
    """Incremental view maintenance for count/sum aggregates: fold
    a DELTA of raw rows into an already-materialized ``base_agg``
    WITHOUT touching the base fact table — the nightly-refresh
    pattern that turns a 100 TB full regroup into a delta-sized
    job. ``base_agg`` has the group ``keys``, a ``count_col`` and
    the summed measures; ``sum_cols`` maps each output sum column
    to the raw delta column it sums (cast delta measures to
    DECIMAL upstream — exact decimal sums are what make the
    refreshed view BIT-IDENTICAL to a full recompute, which is the
    battery oracle ``incremental_agg``).

    Shape: ONE map-side-combined groupBy over the delta (delta-
    sized, not base-sized) + ONE key-hash full-outer join against
    the |groups|-sized base. Counts/sums are associative, so new
    groups appear, existing groups combine, and base-only groups
    pass through untouched. Deletions are delta rows with negative
    measures/count upstream (CDC convention); this op is the
    combine step.
    """
    sum_cols = dict(sum_cols or {})
    d_agg = delta.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("__d_n"),
        *[
            F.sum(F.col(src)).alias(f"__d_{out}")
            for out, src in sum_cols.items()
        ],
    )
    joined = base_agg.join(d_agg, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    out_cols.append(
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("__d_n"), F.lit(0))
        ).cast("long").alias(count_col)
    )
    for out in sum_cols:
        zero = F.lit(0).cast("decimal(12,2)")
        out_cols.append(
            (
                F.coalesce(F.col(out), zero)
                + F.coalesce(F.col(f"__d_{out}"), zero)
            ).alias(out)
        )
    return joined.select(*out_cols)


def refresh_join(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    *,
    a_key: str,
    b_key: str,
    on: str,
    op_col: str = "op",
) -> DataFrame:
    """Two-sided delta-join incremental view maintenance (r11,
    VERDICT r10 #6): keep a materialized INNER-join view
    ``V = A join B on A.on = B.on`` current under per-side keyed
    deltas, with delta-sized work — the companion to
    :func:`refresh_aggregate` for the other thing 100 TB pipelines
    materialize.

    This is the classical expansion Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    realized with delete handling through key anti-joins:

        a_kept = A_old ANTI ΔA_keys        b_kept = B_old ANTI ΔB_keys
        added  = ΔA_ins ⋈ b_kept  ∪  a_kept ⋈ ΔB_ins  ∪  ΔA_ins ⋈ ΔB_ins
        V_new  = (V ANTI ΔA_keys ANTI ΔB_keys)  ∪  added

    ``delta_a`` / ``delta_b`` follow the :func:`apply_changes`
    convention — ONE final change per key (run
    :func:`latest_changes` upstream), ``op_col`` in {'I','U','D'},
    I/U rows carrying the side's full payload — and ``a_key`` /
    ``b_key`` must be unique within their side (``b_key`` may BE
    the join column, the dimension-table case). The refreshed view
    is bit-identical to re-joining the updated sides — the battery
    oracle ``incremental_join`` IS that full recompute.

    100 TB shape: the deltas (and their key sets) broadcast, so
    every term is map-only — ΔA_ins⋈B is a broadcast join against
    the base, the base/view anti-joins are broadcast too, and the
    view's unjoined payload never shuffles. On a partitioned store
    the base/view scans additionally prune to delta-matching
    partitions; nothing here is sized by |V| beyond one linear
    pass."""
    from pyspark.sql.functions import broadcast

    spark = view.sparkSession

    def _empty(side: DataFrame) -> DataFrame:
        return (
            spark.createDataFrame([], side.schema)
            .withColumn(op_col, F.lit("I"))
            .select(op_col, *side.columns)
        )

    if delta_a is None:
        delta_a = _empty(a_old)
    if delta_b is None:
        delta_b = _empty(b_old)
    da_keys = delta_a.select(a_key).distinct()
    db_keys = delta_b.select(b_key).distinct()
    a_ins = delta_a.filter(F.col(op_col) != "D").select(*a_old.columns)
    b_ins = delta_b.filter(F.col(op_col) != "D").select(*b_old.columns)
    a_kept = a_old.join(broadcast(da_keys), a_key, "left_anti")
    b_kept = b_old.join(broadcast(db_keys), b_key, "left_anti")
    added = (
        broadcast(a_ins).join(b_kept, on)
        .unionByName(a_kept.join(broadcast(b_ins), on))
        .unionByName(broadcast(a_ins).join(broadcast(b_ins), on))
    )
    # USING-style joins put the join key first — restore the view's
    # column order on both branches
    v_kept = (
        view.join(broadcast(da_keys), a_key, "left_anti")
        .join(broadcast(db_keys), b_key, "left_anti")
        .select(*view.columns)
    )
    return v_kept.unionByName(added.select(*view.columns))
