"""Curation-funnel attrition report (beyond-reference LLM-pipeline
observability, SURVEY.md §2).

Every production curation pipeline lives on its funnel metrics: how
many documents and tokens did each filter remove? Silent
over-filtering (a quality threshold that kills half the corpus) and
silent under-filtering (a dedup stage that removes nothing) are both
invisible without per-stage counts. ``curation_funnel`` runs the
standard four-stage gauntlet — boilerplate line removal -> Gopher
repetition filter -> exact dedup -> token-window substring dedup —
and returns one row per stage with surviving document and token
counts.

Stage semantics are EXACTLY the corresponding operators'
(``remove_boilerplate_lines``, ``repetition_filter``,
``drop_exact_duplicates``, ``dedup_token_spans(counts_only=True)``),
so the DuckDB oracle (battery query ``curation_funnel``) replays the
whole cascade and the counts are exact, not monitoring-grade
estimates.

Cache discipline (VERDICT r6 #2): exactly ONE full-text frame is
persisted — the boilerplate output, which feeds three downstream
consumers — and one NARROW per-doc frame (id, n_tokens, n_removed)
from the counts-only substring stage, which supplies BOTH the
exact-dedup and substring stage rows without re-reading text. The
five stage rows are materialized eagerly inside the call (bounded:
one row per stage, corpus-independent) and both cached frames are
unpersisted before returning, so no corpus-sized frame outlives the
report computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _stage_row(frame: DataFrame, idx: int, name: str, tok_col) -> DataFrame:
    return frame.agg(
        F.lit(idx).cast("long").alias("stage_idx"),
        F.lit(name).alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(tok_col), F.lit(0)).cast("long").alias("n_tokens"),
    )


def curation_funnel(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 20,
    window: int = 20,
) -> DataFrame:
    """(stage_idx, stage, n_docs, n_tokens) for raw -> boilerplate ->
    repetition -> exact_dedup -> substring_dedup."""
    from ..dedup.exact import drop_exact_duplicates
    from ..operators.boilerplate import remove_boilerplate_lines
    from ..operators.repetition import repetition_filter
    from ..operators.span_dedup import dedup_token_spans

    raw = df.select(F.col(id_col), F.col(content_col))
    ntok = F.size(tokens(content_col))
    rows = [_stage_row(raw, 0, "raw", ntok)]

    b = (
        remove_boilerplate_lines(raw, content_col, min_words=min_words)
        .filter(F.col("n_lines_kept") >= 1)
        .select(id_col, F.col("clean_text").alias(content_col))
        .persist()
    )
    rows.append(_stage_row(b, 1, "boilerplate", ntok))

    rep_ids = (
        repetition_filter(b, content_col, id_col)
        .filter(F.col("keep"))
        .select(id_col)
    )
    kept = b.join(rep_ids, id_col)
    rows.append(_stage_row(kept, 2, "repetition", ntok))

    d = drop_exact_duplicates(kept, content_col, id_col)
    # counts_only emits exactly one (id, n_tokens, n_removed) row per
    # surviving doc, so this ONE narrow frame answers both the
    # exact-dedup stage row (count, sum(n_tokens)) and the substring
    # stage row — the full-text dedup output is never cached.
    sd = dedup_token_spans(
        d, content_col, id_col, window=window, counts_only=True
    ).select(id_col, "n_tokens", "n_removed").persist()
    rows.append(_stage_row(sd, 3, "exact_dedup", F.col("n_tokens")))
    surv = sd.filter(F.col("n_tokens") - F.col("n_removed") >= 1)
    rows.append(
        _stage_row(
            surv, 4, "substring_dedup",
            F.col("n_tokens") - F.col("n_removed"),
        )
    )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    # materialize the (bounded, one-row-per-stage) report eagerly so
    # the cached corpus frames can be released before returning
    data = out.collect()
    b.unpersist()
    sd.unpersist()
    return df.sparkSession.createDataFrame(data, out.schema)
