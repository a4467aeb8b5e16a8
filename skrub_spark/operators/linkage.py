"""Fellegi–Sunter probabilistic record linkage (Splink-shape).

The reference's ``fuzzy_join``/``Joiner`` (reference:
``skrub/_joiner.py``) links two tables by a DETERMINISTIC
nearest-neighbour rule on one key. Production entity resolution
(census linkage, MDM, the open-source Splink engine) instead runs
the Fellegi & Sunter (1969) PROBABILISTIC model: several noisy
fields each vote through a per-field agreement level, and the vote
weights are LEARNED from the data itself (unsupervised EM, Winkler
1988) — no labels required. This module is that model, Spark-first:

- **Blocking** (``candidate_pairs``): the union of several cheap
  equi-joins on derived keys. Never all-pairs — at 100 TB each rule
  is one shuffle join on its blocking key, the union dedupes id
  pairs only (payloads re-join afterwards by id), and a missed pair
  costs recall, not correctness. Multiple weak rules with different
  failure modes are the standard recall fix (Splink's
  ``blocking_rules_to_generate_predictions``).
- **Comparison vectors** (``comparison_columns``): one small-int
  agreement level γ per field — exact / fuzzy(levenshtein ≤ k) /
  disagree for strings, exact / within-tol / disagree for numerics.
  Pure JVM Column expressions, map-only over the candidate pairs.
- **EM fit** (``em_fit``): the likelihood depends on the data ONLY
  through the pattern counts n_γ (≤ Π_i levels_i distinct
  patterns, e.g. 36 for 4 fields) — so the distributed part is one
  groupBy over the gamma columns, and the EM loop runs driver-side
  on that constant-size table. Deterministic: fixed init (u from
  the observed candidate marginals, m agreement-favored), fixed
  iteration count, no RNG. This is the exact shape Splink runs
  (``estimate_parameters_using_expectation_maximisation`` also
  aggregates to pattern counts first).
- **Scoring** (``match_columns``, ``link_records``): with a FROZEN
  model the per-pair match weight is Σ_i log2(m_i[γ_i]/u_i[γ_i])
  and the posterior is K/(1+K) with K = λ/(1−λ) · Π_i ratio_i[γ_i]
  — sums and products of 6dp-rounded literals in a fixed order, so
  the computation is bit-identical in any engine (the DuckDB
  oracles replay it with no transcendental in sight) and map-only
  at any scale.

NULL field values take the "disagree" level (γ = 0) — the
simplification classical FS uses; Splink's separate null level is a
model refinement, not a different algorithm.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Comparison:
    """One linked field: how to compare left vs right, and the
    agreement-level ladder.

    kind = "string": γ ∈ {0 disagree, 1 levenshtein ≤ fuzzy_max,
    2 case-insensitive exact}; "numeric": γ ∈ {0, 1 |l−r| ≤ tol,
    2 exact}; "exact": γ ∈ {0, 1 equal}."""

    name: str
    left: str
    right: str
    kind: str = "string"
    fuzzy_max: int = 2
    tol: float = 1.0

    @property
    def n_levels(self) -> int:
        return 2 if self.kind == "exact" else 3

    @property
    def gamma_col(self) -> str:
        return f"g_{self.name}"


def gamma_column(c: Comparison) -> Column:
    l, r = F.col(c.left), F.col(c.right)
    null = l.isNull() | r.isNull()
    if c.kind == "string":
        return (
            F.when(null, F.lit(0))
            .when(F.lower(l) == F.lower(r), F.lit(2))
            .when(F.levenshtein(l, r) <= int(c.fuzzy_max), F.lit(1))
            .otherwise(F.lit(0))
        )
    if c.kind == "numeric":
        return (
            F.when(null, F.lit(0))
            .when(l == r, F.lit(2))
            .when(F.abs(l - r) <= float(c.tol), F.lit(1))
            .otherwise(F.lit(0))
        )
    if c.kind == "exact":
        return F.when(null, F.lit(0)).when(l == r, F.lit(1)).otherwise(
            F.lit(0)
        )
    raise ValueError(f"unknown comparison kind {c.kind!r}")


def candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    blocking_rules: list[list[tuple[Column | str, Column | str]]],
    l_id: str = "l_id",
    r_id: str = "r_id",
) -> DataFrame:
    """Union of equi-joins, one per blocking rule; each rule is a
    list of (left_key, right_key) expression pairs. Returns the
    DISTINCT (l_id, r_id) pairs with both payloads re-joined.

    The union carries ids only (8–16 bytes/pair); payloads join
    back once by id — at 100 TB the wide document rows cross the
    wire once, not once per rule."""

    def _k(x: Column | str) -> Column:
        return F.col(x) if isinstance(x, str) else x

    parts = []
    for rule in blocking_rules:
        keys = [f"__bk{i}" for i in range(len(rule))]
        li = left.select(
            F.col(l_id), *[_k(lk).alias(k) for k, (lk, _) in zip(keys, rule)]
        )
        ri = right.select(
            F.col(r_id), *[_k(rk).alias(k) for k, (_, rk) in zip(keys, rule)]
        )
        parts.append(li.join(ri, keys).select(l_id, r_id))
    ids = reduce(DataFrame.unionByName, parts).dropDuplicates([l_id, r_id])
    return ids.join(left, l_id).join(right, r_id)


def comparison_columns(
    pairs: DataFrame, comparisons: list[Comparison]
) -> DataFrame:
    out = pairs
    for c in comparisons:
        out = out.withColumn(c.gamma_col, gamma_column(c))
    return out


def em_fit(
    gamma_df: DataFrame,
    comparisons: list[Comparison],
    *,
    n_iter: int = 60,
    lambda_init: float = 0.1,
    eps: float = 1e-6,
) -> dict:
    """Unsupervised EM over the gamma PATTERN COUNTS.

    One distributed groupBy reduces the candidate pairs to ≤
    Π levels_i rows; the EM loop is pure driver arithmetic on that
    constant-size table (independent of corpus size). Deterministic:
    m init favors agreement ([0.05, 0.15, 0.8] / [0.1, 0.9]), u
    init is the observed candidate marginals, fixed ``n_iter``.

    Returns the frozen-able model dict: λ, per-field m/u vectors,
    and the 6dp-rounded scoring literals (``ratio``,
    ``log2_ratio``, ``prior_factor``) the exact oracles replay."""
    gcols = [c.gamma_col for c in comparisons]
    rows = gamma_df.groupBy(*gcols).count().collect()
    patterns = [
        (tuple(int(r[g]) for g in gcols), int(r["count"])) for r in rows
    ]
    total = sum(n for _, n in patterns)
    if total == 0:
        raise ValueError("no candidate pairs to fit on")
    nlv = [c.n_levels for c in comparisons]

    def _clip(p: float) -> float:
        return min(max(p, eps), 1.0 - eps)

    m = [
        [0.1, 0.9] if k == 2 else [0.05, 0.15, 0.8] for k in nlv
    ]
    # u init: observed marginal level frequencies among candidates
    u = []
    for i, k in enumerate(nlv):
        cnt = [0.0] * k
        for g, n in patterns:
            cnt[g[i]] += n
        u.append([_clip(x / total) for x in cnt])
    lam = lambda_init

    for _ in range(int(n_iter)):
        # E-step: P(match | γ) per pattern
        resp = []
        for g, n in patterns:
            pm = lam
            pu = 1.0 - lam
            for i, gi in enumerate(g):
                pm *= m[i][gi]
                pu *= u[i][gi]
            resp.append((g, n, pm / (pm + pu)))
        # M-step
        wm = sum(n * p for _, n, p in resp)
        wu = sum(n * (1.0 - p) for _, n, p in resp)
        lam = _clip(wm / total)
        for i, k in enumerate(nlv):
            sm = [0.0] * k
            su = [0.0] * k
            for g, n, p in resp:
                sm[g[i]] += n * p
                su[g[i]] += n * (1.0 - p)
            m[i] = [_clip(x / wm) for x in sm]
            u[i] = [_clip(x / wu) for x in su]

    def r6(x: float) -> float:
        return round(x, 6)

    names = [c.name for c in comparisons]
    return {
        "lambda": r6(lam),
        "cols": names,
        "levels": {nm: k for nm, k in zip(names, nlv)},
        "m": {nm: [r6(x) for x in mi] for nm, mi in zip(names, m)},
        "u": {nm: [r6(x) for x in ui] for nm, ui in zip(names, u)},
        # the scoring literals BOTH engines replay — rounded once
        # here so Spark and SQL parse identical doubles
        "ratio": {
            nm: [r6(mi[l] / ui[l]) for l in range(k)]
            for nm, mi, ui, k in zip(names, m, u, nlv)
        },
        "log2_ratio": {
            nm: [r6(math.log2(mi[l] / ui[l])) for l in range(k)]
            for nm, mi, ui, k in zip(names, m, u, nlv)
        },
        "prior_factor": r6(lam / (1.0 - lam)),
    }


def _level_pick(gamma_col: str, values: list[float]) -> Column:
    c = F.when(F.col(gamma_col) == 0, F.lit(float(values[0])))
    for lvl in range(1, len(values)):
        c = c.when(F.col(gamma_col) == lvl, F.lit(float(values[lvl])))
    return c.otherwise(F.lit(float(values[0])))


def match_columns(model: dict) -> tuple[Column, Column]:
    """(match_weight, posterior) Columns over the gamma columns.

    weight = Σ_i log2-ratio literal picked by γ_i (left-assoc fixed
    order); posterior = K/(1+K), K = prior_factor · Π ratio
    literals. No exp/log at score time — every operation is an
    IEEE-exact +,·,/ over identical literals, so any engine
    produces bit-identical doubles."""
    cols = model["cols"]
    w = reduce(
        lambda a, b: a + b,
        [_level_pick(f"g_{nm}", model["log2_ratio"][nm]) for nm in cols],
    )
    k = reduce(
        lambda a, b: a * b,
        [_level_pick(f"g_{nm}", model["ratio"][nm]) for nm in cols],
        F.lit(float(model["prior_factor"])),
    )
    return w.alias("match_weight"), (k / (F.lit(1.0) + k)).alias("posterior")


def link_records(
    left: DataFrame,
    right: DataFrame,
    comparisons: list[Comparison],
    blocking_rules: list[list[tuple[Column | str, Column | str]]],
    model: dict,
    *,
    threshold: float = 0.9,
    one_to_one: bool = False,
    l_id: str = "l_id",
    r_id: str = "r_id",
) -> DataFrame:
    """Score all blocked pairs with a (frozen or freshly-fit) model;
    keep posterior ≥ threshold. ``one_to_one`` resolves each left
    id to its best right match (max posterior, ties to min r_id) —
    one window shuffle over the already-thresholded pairs."""
    pairs = candidate_pairs(
        left, right, blocking_rules, l_id=l_id, r_id=r_id
    )
    g = comparison_columns(pairs, comparisons)
    w, p = match_columns(model)
    scored = g.select(
        l_id, r_id, *[c.gamma_col for c in comparisons], w, p
    ).filter(F.col("posterior") >= float(threshold))
    if not one_to_one:
        return scored
    from pyspark.sql import Window

    win = Window.partitionBy(l_id).orderBy(
        F.col("posterior").desc(), F.col(r_id).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
