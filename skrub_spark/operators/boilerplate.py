"""jusText-lite boilerplate line removal (beyond-reference
LLM-pipeline operator, SURVEY.md §2).

Web-corpus curation (C4, RefinedWeb, jusText) strips navigation /
header / footer lines before deduplication: short lines without
terminal punctuation and SHOUTING lines are boilerplate, prose lines
are content. Without HTML markup the usable signals are per-line
word count, uppercase ratio and terminal punctuation — all cheap
Catalyst expressions.

Everything here is array higher-order functions over the line split
(filter/transform lambdas, linear per row, no explode, no shuffle,
no UDFs): a pure map stage that scales embarrassingly at 100 TB and
fuses into whole-stage codegen with whatever runs next. The split
and classification regexes are RE2-compatible so a DuckDB oracle
replays the rule byte-exactly (battery query ``boilerplate_removal``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import lines

_TERMINAL = (".", "!", "?", '"', "'")


def _is_content(line: Column, min_words: int, max_upper_ratio: float) -> Column:
    """True when ``line`` (already trimmed, non-empty) looks like
    prose: ends in terminal punctuation, OR has >= min_words
    whitespace tokens with an uppercase-letter ratio (over letters)
    <= max_upper_ratio."""
    n_words = F.size(F.filter(F.split(line, r"\s+"), lambda t: t != ""))
    letters = F.length(F.regexp_replace(line, "[^A-Za-z]", ""))
    uppers = F.length(F.regexp_replace(line, "[^A-Z]", ""))
    upper_ratio = uppers / F.greatest(letters, F.lit(1)).cast("double")
    ends_punct = F.substring(line, -1, 1).isin(*_TERMINAL)
    return ends_punct | (
        (n_words >= F.lit(min_words)) & (upper_ratio <= F.lit(max_upper_ratio))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 4,
    max_upper_ratio: float = 0.5,
    out_col: str = "clean_text",
) -> DataFrame:
    """Rebuild each document from its content lines only.

    Adds ``out_col`` (content lines re-joined with ``\\n``; empty
    string when nothing survives), ``n_lines_total`` and
    ``n_lines_kept``. All other columns pass through.
    """
    all_lines = lines(text_col)
    kept = F.filter(
        all_lines, lambda ln: _is_content(ln, min_words, max_upper_ratio)
    )
    return (
        df.withColumn("n_lines_total", F.size(all_lines).cast("long"))
        .withColumn("n_lines_kept", F.size(kept).cast("long"))
        .withColumn(out_col, F.array_join(kept, "\n"))
    )
