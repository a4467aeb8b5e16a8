"""Distributed connected components over a pair list.

Alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): each round applies

- large-star: every node u links each LARGER neighbor to
  m = min(Γ(u) ∪ {u}), and
- small-star: every node u links its smaller-or-equal neighbors
  (and itself) to the minimum among them,

which provably converges to one star per component (every member
pointing at the component minimum) in O(log n) rounds — unlike plain
min-label propagation, whose round count is the graph DIAMETER (a
templated-spam chain at 100 TB can be arbitrarily long). Convergence
is detected with an order-independent (count, xor-of-hashes)
fingerprint after each phase — a cheap action on the pair frame, no
data-scale collect. If the fingerprint still moves at ``max_iter``
the result would be silently wrong, so the default is to raise
(``on_nonconverged="warn"`` downgrades to a warning).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(e: DataFrame) -> tuple:
    """Order-independent edge-set fingerprint: (count, xor of row
    hashes). Edges are kept distinct, so xor cancellation of
    duplicate rows cannot occur."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("x"),
    ).first()
    return (row["n"], row["x"])


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def _large_star(e_sym: DataFrame) -> DataFrame:
    """{(v, min Γ⁺(u)) : v ∈ Γ(u), v > u} over the symmetric edge set."""
    m = (
        e_sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        e_sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e_sym: DataFrame) -> DataFrame:
    """{(v, m) : v ∈ Γ≤(u) ∪ {u}}, m = min(Γ≤(u) ∪ {u}), self-loops
    dropped — Γ≤(u) are the neighbors ≤ u."""
    le = e_sym.filter(F.col("v") <= F.col("u"))
    m = (
        le.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        le.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_iter: int = 20,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Input: undirected edges (col_a, col_b). Output: (id, component)
    where component = min id reachable, for every id appearing in the
    input. ``on_nonconverged``: "raise" (default) or "warn" when the
    edge set is still moving after ``max_iter`` large+small-star
    rounds (convergence is O(log n) rounds, so the default 20 covers
    graphs far beyond any real near-dup pair list)."""
    edges = (
        pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # invariant: e is the symmetrized edge set entering each phase
    e = _symmetrize(edges).localCheckpoint(eager=True)
    converged = False
    before = _fingerprint(e)
    for _ in range(max_iter):
        e2 = _symmetrize(
            _small_star(_symmetrize(_large_star(e)))
        ).localCheckpoint(eager=True)
        after = _fingerprint(e2)
        e = e2
        if after == before:
            # one full round left the (symmetrized) edge set unchanged
            # -> fixpoint of L∘S; stars are the only such fixpoints
            # (Kiveris et al. Thm 1-2), so labels below are exact.
            converged = True
            break
        before = after
    if not converged:
        msg = (
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds; labels would be incomplete. "
            "Increase max_iter."
        )
        if on_nonconverged == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    labels = (
        e.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(F.col("u").alias("id"), F.least("u", "mv").alias("component"))
    )
    # nodes whose only edge was a self-pair were dropped by the
    # u != v filter but must still be labeled (as their own component)
    singletons = (
        pairs.select(F.col(col_a).alias("id"))
        .union(pairs.select(F.col(col_b).alias("id")))
        .distinct()
        .join(labels, on="id", how="left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return labels.union(singletons)
