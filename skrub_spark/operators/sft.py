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
