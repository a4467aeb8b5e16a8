"""SFT / preference-data curation (r9c): conversation parsing,
turn-level dedup, and preference-pair bias auditing.

Post-training corpora are CONVERSATIONS (role-tagged turns) and
PREFERENCE PAIRS (chosen/rejected), not flat documents — and their
standard QA stages differ from pretraining curation: role-alternation
validation, per-role turn statistics, corpus-wide dedup of assistant
turns (the overfit/memorization vector — identical assistant replies
across many dialogs), and length-bias audits of preference pairs
(reward models latch onto "longer = chosen" unless the data is
checked). All three here are pure-JVM Column/groupBy work over a
simple serialized format:

    role<TAB>text<0x1E>role<TAB>text...

(records separated by 0x1E, role and text by the first TAB) — the
format any chat-JSON flattens to with one upstream map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REC_SEP = "\x1e"
_FIELD_SEP = "\t"


def parse_turns(
    df: DataFrame, convo_col: str, id_col: str
) -> DataFrame:
    """Explode serialized conversations into
    ``(conv_id, turn_idx, role, text)`` — one JVM split/posexplode
    pass, no Python. Malformed records (no TAB) get role NULL and
    full text preserved (visible, not dropped)."""
    parts = F.split(F.col(convo_col), _REC_SEP)
    ex = df.select(
        F.col(id_col).alias("conv_id"),
        F.posexplode(parts).alias("turn_idx", "rec"),
    )
    tab = F.instr(F.col("rec"), _FIELD_SEP)
    return ex.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(tab > 0, F.substring_index(F.col("rec"), _FIELD_SEP, 1))
        .alias("role"),
        F.when(
            tab > 0,
            F.expr(f"substring(rec, instr(rec, '{_FIELD_SEP}') + 1)"),
        )
        .otherwise(F.col("rec"))
        .alias("text"),
    )


def conversation_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation QA frame from a parsed-turn frame:
    ``(conv_id, n_turns, n_user, n_assistant, n_malformed,
    starts_with_user, alternates, assistant_chars)``.
    ``alternates`` = no two consecutive turns share a role (the
    schema every chat trainer assumes); computed with one lag
    window per conversation."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = turns.withColumn("prev_role", F.lag("role").over(w))
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.col("role").isNull().cast("long"))
        .cast("long")
        .alias("n_malformed"),
        F.max(
            F.when(F.col("turn_idx") == 0, F.col("role") == "user")
        ).alias("starts_with_user"),
        (
            F.sum(
                (
                    F.col("prev_role").isNotNull()
                    & F.col("prev_role").eqNullSafe(F.col("role"))
                ).cast("long")
            )
            == 0
        ).alias("alternates"),
        F.sum(
            F.when(F.col("role") == "assistant", F.length("text"))
            .otherwise(0)
        )
        .cast("long")
        .alias("assistant_chars"),
    )


def assistant_turn_dedup(
    turns: DataFrame, *, min_chars: int = 20
) -> DataFrame:
    """Corpus-wide duplicate ASSISTANT turns — the memorization
    vector SFT dedup targets (identical canned replies across many
    dialogs). Returns ``(text_hash, n_occurrences, n_conversations,
    example_conv_id)`` for texts appearing in more than one
    conversation; hashing is md5 of the exact text (the repo's
    engine-portable rule), short boilerplate below ``min_chars``
    excluded."""
    at = turns.where(
        (F.col("role") == "assistant")
        & (F.length("text") >= min_chars)
    ).select("conv_id", F.md5(F.col("text")).alias("text_hash"))
    return (
        at.groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("conv_id").cast("long").alias(
                "n_conversations"
            ),
            F.min("conv_id").alias("example_conv_id"),
        )
        .where(F.col("n_conversations") > 1)
    )


def preference_bias_report(
    pairs: DataFrame, chosen_col: str, rejected_col: str
) -> DataFrame:
    """One-row length-bias audit of preference pairs:
    ``(n_pairs, n_chosen_longer, n_equal_len, chosen_longer_rate,
    mean_len_chosen, mean_len_rejected)`` — exact counts and
    exact-sum means (one IEEE division each). A chosen_longer_rate
    far from 0.5 flags data a reward model can game on length
    alone."""
    base = pairs.select(
        F.length(F.col(chosen_col)).cast("long").alias("lc"),
        F.length(F.col(rejected_col)).cast("long").alias("lr"),
    ).where(F.col("lc").isNotNull() & F.col("lr").isNotNull())
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("lc") > F.col("lr")).cast("long"))
        .cast("long")
        .alias("n_chosen_longer"),
        F.sum((F.col("lc") == F.col("lr")).cast("long"))
        .cast("long")
        .alias("n_equal_len"),
        F.round(
            F.sum((F.col("lc") > F.col("lr")).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("chosen_longer_rate"),
        F.round(
            F.sum("lc").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_len_chosen"),
        F.round(
            F.sum("lr").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_len_rejected"),
    )


def preference_pairs(
    responses: DataFrame,
    prompt_col: str,
    response_col: str,
    rank_col: str,
    *,
    strategy: str = "best_vs_rest",
    dedup_across_prompts: bool = True,
    min_chars: int = 1,
    length_match_tol: int = 10,
) -> DataFrame:
    """Chosen/rejected preference-pair construction from per-prompt
    RANKED response lists (r12 — the DPO/RLHF data-assembly step
    upstream of `preference_bias_report`): ``rank_col`` is the
    human/model ranking within each prompt (lower = better).

    Hygiene before pairing (the `assistant_turn_dedup` discipline):
    within a prompt, duplicate response texts collapse to their
    best rank (a (text, text) pair carries no signal); responses
    whose exact text appears under MORE THAN ONE prompt are dropped
    entirely when ``dedup_across_prompts`` (canned replies are the
    memorization vector — and a reward model pair with a canned
    side teaches the canned reply, not the preference). Responses
    shorter
    than ``min_chars`` are dropped.

    ``strategy``: 'best_vs_rest' (the common DPO shape — the top
    response against every strictly-worse one), 'adjacent'
    (consecutive ranks only — the hardest, most informative
    margins), or 'all' (every strictly-ordered pair). Ties in rank
    NEVER produce a pair (no signal); the within-prompt order is
    totalized by (rank asc, response asc) so the output is
    partitioning-invariant.

    Every pair carries ``length_matched`` = |len(chosen) −
    len(rejected)| ≤ ``length_match_tol`` — the length-matched
    control subset: `preference_bias_report` over it separates
    genuine quality signal from the length confound the full set
    may hide (pinned in tests).

    100 TB shape: one groupBy per dedup rung (map-side combined),
    one left-anti against the (bounded) cross-prompt duplicate
    texts, windows partitioned by prompt over the per-prompt
    response lists (bounded by responses-per-prompt, never corpus-
    wide), and one per-prompt self-equi-join. Returns ``(prompt,
    chosen, rejected, chosen_rank, rejected_rank,
    length_matched)``."""
    from pyspark.sql import Window

    if strategy not in ("best_vs_rest", "adjacent", "all"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    base = responses.select(
        F.col(prompt_col).alias("prompt"),
        F.col(response_col).alias("resp"),
        F.col(rank_col).cast("long").alias("rank"),
    ).where(
        F.col(response_col).isNotNull()
        & (F.length(response_col) >= int(min_chars))
        & F.col(rank_col).isNotNull()
    )
    r1 = base.groupBy("prompt", "resp").agg(F.min("rank").alias("rank"))
    if dedup_across_prompts:
        multi = (
            r1.groupBy("resp")
            .agg(F.count_distinct("prompt").alias("__np"))
            .where(F.col("__np") > 1)
            .select("resp")
        )
        r1 = r1.join(multi, "resp", "left_anti")
    w = Window.partitionBy("prompt").orderBy(
        F.col("rank").asc(), F.col("resp").asc()
    )
    rr = r1.select("prompt", "resp", "rank").withColumn(
        "pos", F.row_number().over(w)
    )
    left = rr.select(
        "prompt",
        F.col("resp").alias("chosen"),
        F.col("rank").alias("chosen_rank"),
        F.col("pos").alias("__lpos"),
    )
    right = rr.select(
        "prompt",
        F.col("resp").alias("rejected"),
        F.col("rank").alias("rejected_rank"),
        F.col("pos").alias("__rpos"),
    )
    joined = left.join(right, "prompt").where(
        F.col("chosen_rank") < F.col("rejected_rank")
    )
    if strategy == "best_vs_rest":
        joined = joined.where(F.col("__lpos") == 1)
    elif strategy == "adjacent":
        joined = joined.where(F.col("__rpos") == F.col("__lpos") + 1)
    return joined.select(
        "prompt",
        "chosen",
        "rejected",
        "chosen_rank",
        "rejected_rank",
        (
            F.abs(F.length("chosen") - F.length("rejected"))
            <= int(length_match_tol)
        ).alias("length_matched"),
    )


def best_of_n_curve(
    df: DataFrame,
    prompt_col: str,
    reward_col: str,
    id_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Expected best-of-n reward curve from per-prompt scored
    response pools (r12b — the rejection-sampling calculator every
    RLHF/BoN pipeline consults: how much does reward improve if we
    sample n candidates and keep the best? Order-statistics over
    the empirical per-prompt reward distribution, sampling WITH
    replacement):

        E[max of n] = Σ_i r_(i) · ((i/m)^n − ((i−1)/m)^n)

    with r_(1..m) the prompt's rewards ascending. One output row
    per (pool size m, n): ``(m, n, n_prompts, exp_best)`` averaged
    over all prompts with that pool size — pooling by m keeps the
    cross-prompt mean ONE exact integer ratio, Σ_p N_p / (k·m^n),
    since every prompt in the group shares the denominator m^n.

    Exactness: rewards are 6dp-quantized; the rank powers i^n are
    built by repeated DECIMAL multiplication (never IEEE pow), so
    each per-prompt numerator N_p = Σ r6·(i^n − (i−1)^n) is an
    exact DECIMAL(38,0) integer and ``exp_best`` a single IEEE
    division. Ties in reward are handled by an id tie-break; the
    formula's value is tie-order invariant. NULL rewards are
    dropped. ``m^max_n`` must stay inside DECIMAL(38,0) — fine for
    any realistic pool (m ≤ 10^9 at n=4).

    Plan shape (100 TB): one per-prompt rank window (bounded by the
    pool size), a JVM array explode of the ``max_n`` per-row terms,
    and two map-side-combined groupBys. No driver loop.
    """
    if int(max_n) < 1:
        raise ValueError("best_of_n_curve: max_n must be >= 1")
    from pyspark.sql import Window

    _DI = "decimal(38,0)"
    nn = int(max_n)
    r6 = F.round(F.col(reward_col).cast("double") * 1e6, 0).cast(
        _DI
    )
    base = df.select(
        F.col(prompt_col).alias("__pr"),
        r6.alias("__r6"),
        F.col(id_col).alias("__rid"),
    ).where(F.col(reward_col).isNotNull())
    wp = Window.partitionBy("__pr").orderBy(
        F.col("__r6").asc(), F.col("__rid").asc()
    )
    wm = Window.partitionBy("__pr")
    ranked = base.select(
        "__pr",
        "__r6",
        F.row_number().over(wp).cast(_DI).alias("__i"),
        F.count(F.lit(1)).over(wm).cast(_DI).alias("__m"),
    )

    def ipow(col, k):
        out = F.lit(1).cast(_DI)
        for _ in range(k):
            out = out * col
        return out

    i, im1, m = F.col("__i"), F.col("__i") - 1, F.col("__m")
    structs = [
        F.struct(
            F.lit(k).alias("n"),
            (F.col("__r6") * (ipow(i, k) - ipow(im1, k))).alias(
                "term"
            ),
            ipow(m, k).alias("mpow"),
        )
        for k in range(1, nn + 1)
    ]
    terms = ranked.select(
        "__pr", "__m", F.explode(F.array(*structs)).alias("__t")
    ).select(
        "__pr",
        "__m",
        F.col("__t.n").alias("__n"),
        F.col("__t.term").alias("__term"),
        F.col("__t.mpow").alias("__mpow"),
    )
    per_prompt = terms.groupBy("__pr", "__m", "__n").agg(
        F.sum("__term").alias("__np"), F.max("__mpow").alias("__mp")
    )
    out = per_prompt.groupBy("__m", "__n").agg(
        F.count(F.lit(1)).cast(_DI).alias("__k"),
        F.sum("__np").alias("__s"),
        F.max("__mp").alias("__mp2"),
    )
    return out.select(
        F.col("__m").cast("long").alias("m"),
        F.col("__n").cast("int").alias("n"),
        F.col("__k").cast("long").alias("n_prompts"),
        F.round(
            F.col("__s").cast("double")
            / (F.col("__k") * F.col("__mp2")).cast("double")
            / 1e6,
            6,
        ).alias("exp_best"),
    )
