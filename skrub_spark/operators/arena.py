"""Bradley-Terry strength ranking from pairwise outcomes (r12 —
the arena-ranking op of LLM evaluation: model A vs model B battles
with a winner per battle → a latent strength per model, the
Chatbot-Arena / reward-model-eval standard; Bradley & Terry 1952,
MM fit per Hunter 2004. Beyond-reference LLM-pipeline operator,
SURVEY.md §2).

Exact-integer discipline (the DoReMi/UniMax/IPF recipe): the
corpus-scale work is ONE map-side-combined groupBy to per-(winner,
loser) battle counts — a frame bounded by |items|², codebook-sized
by the operator's contract (an eval has tens of models, not
millions). The MM iterations then run driver-side in exact integer
micro units:

    t_ij    = (n_ij * 10^12) DIV (p6_i + p6_j)     per opponent j
    p6_i'   = (W_i * 10^12) DIV Σ_j t_ij           (clamped ≥ 1)
    p6_i''  = (p6_i' * |items| * 10^6) DIV Σ p6'   (re-normalize)

— every step integer DIV, so a chained-CTE SQL oracle replays all
``n_iter`` iterations bit-for-bit (battery ``bradley_terry``;
HUGEINT in DuckDB, unbounded ints here). Items that never win
converge to the 1-micro floor (the MM degenerate case, clamped so
later divisions stay defined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_S = 1_000_000  # micro scale
_S2 = _S * _S


def bradley_terry(
    battles: DataFrame,
    winner_col: str,
    loser_col: str,
    *,
    n_iter: int = 8,
) -> DataFrame:
    """Fit Bradley-Terry strengths over a battle log. Returns one
    row per item: ``(item, n_wins, n_battles, score)`` with scores
    normalized to mean 1.0 (sum = |items|), 6-decimal micro
    precision. Rows where winner == loser or either side is NULL
    are ignored (a self-battle carries no signal)."""
    if int(n_iter) < 1:
        raise ValueError("bradley_terry: n_iter must be >= 1")
    w = F.col(winner_col).cast("string")
    l = F.col(loser_col).cast("string")
    counts = (
        battles.where(w.isNotNull() & l.isNotNull() & (w != l))
        .groupBy(w.alias("w"), l.alias("l"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows = counts.collect()
    if not rows:
        spark = battles.sparkSession
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("item", StringType()),
                    StructField("n_wins", LongType()),
                    StructField("n_battles", LongType()),
                    StructField("score", DoubleType()),
                ]
            ),
        )
    wins: dict[str, int] = {}
    pair_n: dict[tuple[str, str], int] = {}
    items = set()
    for r in rows:
        a, b, n = r["w"], r["l"], int(r["n"])
        items.add(a)
        items.add(b)
        wins[a] = wins.get(a, 0) + n
        key = (a, b) if a < b else (b, a)
        pair_n[key] = pair_n.get(key, 0) + n
    order = sorted(items)
    n_items = len(order)
    p6 = {i: _S for i in order}
    opponents: dict[str, list[str]] = {i: [] for i in order}
    for a, b in pair_n:
        opponents[a].append(b)
        opponents[b].append(a)
    for _ in range(int(n_iter)):
        new = {}
        for i in order:
            denom = 0
            for j in opponents[i]:
                key = (i, j) if i < j else (j, i)
                denom += (pair_n[key] * _S2) // (p6[i] + p6[j])
            if denom == 0:
                new[i] = p6[i]
            else:
                new[i] = max(1, (wins.get(i, 0) * _S2) // denom)
        total = sum(new.values())
        p6 = {
            i: max(1, (v * n_items * _S) // total) for i, v in new.items()
        }
    spark = battles.sparkSession
    n_batt = {i: 0 for i in order}
    for (a, b), n in pair_n.items():
        n_batt[a] += n
        n_batt[b] += n
    out = spark.createDataFrame(
        [(i, int(wins.get(i, 0)), int(n_batt[i]), int(p6[i])) for i in order],
        ["item", "n_wins", "n_battles", "p6"],
    )
    return out.select(
        "item",
        F.col("n_wins").cast("long").alias("n_wins"),
        F.col("n_battles").cast("long").alias("n_battles"),
        (F.col("p6").cast("double") / F.lit(float(_S))).alias("score"),
    )
