"""DoReMi-lite domain-mixture reweighting (r11).

The data-mixing OPTIMIZER that the deterministic samplers
(operators/sampling.py: ``sample_to_targets`` / ``temperature_mixture``
/ ``sample_token_budget``) take as given: given a per-example proxy
loss and reference loss, learn per-domain mixture weights with the
Group-DRO multiplicative-weights update of DoReMi (Xie et al. 2023,
"DoReMi: Optimizing Data Mixtures Speeds Up Language Model
Pretraining", NeurIPS) — domains where the proxy model is furthest
behind the reference (largest clipped excess loss) are upweighted, so
the next training mixture spends its token budget where learning
headroom remains.

Lite = the excess-loss signal is computed ONCE from the supplied
loss columns (a full DoReMi re-trains the proxy under the evolving
mixture each step; with a frozen signal the K smoothed
multiplicative updates still converge to a non-trivial fixed point
because the uniform-smoothing step re-injects mass every round).

Determinism + oracle design (the IPF / markov-attribution
discipline, operators/raking.py + operators/intervals.py): the
corpus-scale work is ONE groupBy — per-example clipped excess terms
are rounded to 6dp and DECIMAL-summed (order-independent), the
per-domain mean is one IEEE division, and the update multiplier
``exp(eta * excess)`` is rounded to 6dp — everything after that
lives in integer micro space (x1e6). The K update iterations run
driver-side on the collected |domains|-row frame (codebook
discipline — domain counts are dozens-to-thousands, never
corpus-scale) in EXACT integer arithmetic:

    a'_d = (a_d * m_d) // scale                    (multiplicative)
    n_d  = (a'_d * scale) // sum(a')               (normalize)
    a_d  = ((scale - c) * n_d) // scale + c // D   (uniform smooth)

so the whole chain replays as K textually-expanded SQL CTEs
(battery oracle ``doremi_weights``) and the result is bit-identical
on any cluster, partitioning, or run.

100 TB shape: one shuffle (the domain groupBy, map-side combined);
driver state and the iteration frame are |domains| rows; the output
joins back into ``sample_to_targets`` as a broadcast — see the
``doremi_mixture`` battery composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def doremi_weights(
    df: DataFrame,
    domain_col: str,
    loss_col: str,
    ref_loss_col: str,
    *,
    eta: float = 1.0,
    smoothing: float = 0.01,
    n_iter: int = 10,
) -> DataFrame:
    """Learn DoReMi mixture weights from per-example losses.

    Parameters
    ----------
    df : frame with one row per training example.
    domain_col : the mixture domain (source / lang / bucket).
    loss_col, ref_loss_col : per-example proxy-model and
        reference-model losses (e.g. log-perplexities from
        ``operators/lm_filter.py``); the per-domain signal is the
        mean CLIPPED excess ``max(loss - ref_loss, 0)`` (the
        paper's per-example clipping).
    eta : multiplicative-update step size.
    smoothing : uniform-mixing coefficient c in [0, 1); every
        domain keeps at least ~``c/D`` weight (coverage floor).
    n_iter : fixed iteration count K (no data-dependent stopping —
        replayable).

    Returns one row per domain: ``(domain, n_docs, excess_loss,
    multiplier, weight)`` with ``weight`` summing to ~1 (6dp).
    """
    if not (0.0 <= float(smoothing) < 1.0):
        raise ValueError("doremi_weights: smoothing must be in [0, 1)")
    scale = _SCALE
    c6 = int(round(float(smoothing) * scale))
    zero = F.lit("0").cast("decimal(18,6)")
    # per-example clipped excess in integer MICRO units — the
    # per-domain mean is then exact-integer HALF_UP
    # ((2S + n) DIV 2n), because a double division + round() hits
    # exact .5 boundaries whenever the micro sum divides the count
    # (measured at sf0.1: 169037.5) and the two engines' double
    # round() disagree there.
    term6 = (
        F.greatest(
            F.round(F.col(loss_col).cast("double"), 6).cast(
                "decimal(18,6)"
            )
            - F.round(F.col(ref_loss_col).cast("double"), 6).cast(
                "decimal(18,6)"
            ),
            zero,
        )
        * scale
    ).cast("long")
    per = (
        df.select(F.col(domain_col).alias("domain"), term6.alias("t6"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("t6").cast("long").alias("s6"),
        )
        .select(
            "domain",
            "n_docs",
            F.expr("(2 * s6 + n_docs) DIV (2 * n_docs)").alias("e6"),
        )
        .withColumn(
            "m6",
            # try_cast: under ANSI a DECIMAL(18,6) overflow would
            # throw an opaque ArithmeticException mid-collect; NULL
            # instead routes to the ValueError below (ADVICE r11)
            (
                F.round(
                    F.exp(
                        F.lit(float(eta))
                        * F.col("e6").cast("double")
                        / F.lit(float(scale))
                    ),
                    6,
                ).try_cast("decimal(18,6)")
                * scale
            )
            .try_cast("long"),
        )
    )
    rows = sorted(per.collect(), key=lambda r: str(r["domain"]))
    if not rows:
        return per.select(
            "domain",
            "n_docs",
            F.lit(0.0).alias("excess_loss"),
            F.lit(0.0).alias("multiplier"),
            F.lit(0.0).alias("weight"),
        )
    d_n = len(rows)
    a6 = {r["domain"]: scale // d_n for r in rows}
    m6 = {}
    for r in rows:
        if r["m6"] is None:
            # exp(eta * excess) overflowed DECIMAL(18,6) — the
            # caller almost certainly passed raw perplexities
            # instead of log-losses (ADVICE r11)
            raise ValueError(
                "doremi_weights: multiplier overflow for domain "
                f"{r['domain']!r} (exp(eta * excess_loss) exceeds "
                "DECIMAL(18,6)); pass log-space losses or use a "
                "smaller eta"
            )
        m6[r["domain"]] = int(r["m6"])
    for _ in range(int(n_iter)):
        ap = {d: (a6[d] * m6[d]) // scale for d in a6}
        s = sum(ap.values())
        a6 = {
            d: ((scale - c6) * ((ap[d] * scale) // s)) // scale
            + c6 // d_n
            for d in ap
        }
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (r["domain"], int(r["n_docs"]), int(r["e6"]), int(r["m6"]),
             int(a6[r["domain"]]))
            for r in rows
        ],
        ["domain", "n_docs", "e6", "m6", "a6"],
    )
    # final 6dp emission goes back through F.round (HALF_UP — python
    # round() is banker's; the attribution_markov precedent)
    sc = F.lit(float(scale))
    return out.select(
        "domain",
        "n_docs",
        F.round(F.col("e6").cast("double") / sc, 6).alias("excess_loss"),
        F.round(F.col("m6").cast("double") / sc, 6).alias("multiplier"),
        F.round(F.col("a6").cast("double") / sc, 6).alias("weight"),
    )


def doremi_targets(
    weights: DataFrame, budget_rows: int
) -> dict[str, int]:
    """Convert learned weights to integer per-domain row targets for
    ``sample_to_targets``: ``target_d = (budget * weight_micro) //
    1e6`` in exact integer arithmetic (weights re-derived from the
    6dp emission are exact micro integers)."""
    rows = weights.select("domain", "weight").collect()
    return {
        str(r["domain"]): (
            int(budget_rows) * int(round(float(r["weight"]) * _SCALE))
        )
        // _SCALE
        for r in rows
    }
