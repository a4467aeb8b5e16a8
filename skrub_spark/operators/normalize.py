"""Text normalization — the ftfy/NFKC-lite cleanup stage every
CommonCrawl-scale pipeline runs between HTML extraction and the
quality filters (beyond-reference, SURVEY.md §2).

Crawled text arrives with three systematic defects that poison
downstream shingling, token counting and language ID:

1. **Mojibake** — UTF-8 bytes decoded as cp1252 once upstream
   (``â€™`` for ``’``, ``Ã©`` for ``é``; the ftfy failure class).
   Fixed by an ORDERED literal replace chain over the unambiguous
   high-frequency sequences (longest first so ``â€™`` wins over a
   later ``â€`` prefix rule).
2. **Typographic punctuation & invisible characters** — curly
   quotes, en/em dashes, ellipsis, NBSP/thin/ideographic spaces,
   zero-width chars, soft hyphens, BOM. Mapped to their ASCII
   equivalents / removed.
3. **Whitespace chaos** — CR/CRLF line ends, control chars, tab
   runs, 3+ blank lines. Canonicalized to ``\\n`` + single spaces.

Everything is a chain of JVM-side ``replace``/``regexp_replace``
Columns — map-only, no UDF, linear in bytes, exactly what you want
in front of a 100 TB corpus scan. The battery oracle
(``normalize_text``) is GENERATED from the same mapping tables
(:func:`normalize_sql`), so the Spark chain and the DuckDB replay
can never drift; the regex subset used ([ \\t]+, \\n{3,}, explicit
\\x ranges) parses identically in Java regex and RE2.

Reference parity: skrub's ``Cleaner`` handles *tabular* nulls and
dtypes; this is its text-corpus counterpart from the brief's
text-analysis list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# UTF-8-read-as-cp1252 sequences whose repair is unambiguous.
# ORDER MATTERS: longer/more specific first.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€œ", "“"),  # â€œ -> “
    ("â€”", "—"),  # â€” -> —
    ("â€“", "–"),  # â€“ -> –
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã­", "í"),  # Ã­ -> í
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â ", " "),  # Â + NBSP (mojibake'd NBSP) -> space
]

# Typographic / invisible character canonicalization (after the
# mojibake repair so repaired curly quotes fold too).
PUNCT_MAP: list[tuple[str, str]] = [
    ("’", "'"),
    ("‘", "'"),
    ("“", '"'),
    ("”", '"'),
    ("—", "-"),
    ("–", "-"),
    ("−", "-"),  # minus sign
    ("…", "..."),
    (" ", " "),  # NBSP
    (" ", " "),  # narrow NBSP
    ("　", " "),  # ideographic space
    ("​", ""),  # zero-width space
    ("‌", ""),  # ZWNJ
    ("‍", ""),  # ZWJ
    ("﻿", ""),  # BOM
    ("­", ""),  # soft hyphen
]
# thin/em/en etc. spaces U+2000..U+200A fold to plain space
PUNCT_MAP = [(chr(cp), " ") for cp in range(0x2000, 0x200B)] + PUNCT_MAP

# whitespace canonicalization: (java+RE2-compatible regex, repl)
_WS_REGEX: list[tuple[str, str]] = [
    ("\r\n", "\n"),  # literal, expressed as replace
    ("\r", "\n"),
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),
    ("[ \\t]+", " "),
    (" ?\\n ?", "\n"),  # spaces hugging a line break
    ("\\n{3,}", "\n\n"),
]


def normalize_text_column(
    col: Column | str,
    *,
    fix_mojibake: bool = True,
    normalize_punct: bool = True,
    normalize_whitespace: bool = True,
) -> Column:
    """The full normalization chain as ONE Column expression
    (map-only, whole-stage-codegen). Stages toggle independently;
    defaults run all three in the documented order."""
    c = F.col(col) if isinstance(col, str) else col
    if fix_mojibake:
        for bad, good in MOJIBAKE_MAP:
            c = F.replace(c, F.lit(bad), F.lit(good))
    if normalize_punct:
        for bad, good in PUNCT_MAP:
            c = F.replace(c, F.lit(bad), F.lit(good))
    if normalize_whitespace:
        c = F.replace(c, F.lit("\r\n"), F.lit("\n"))
        c = F.replace(c, F.lit("\r"), F.lit("\n"))
        for pat, rep in _WS_REGEX[2:]:
            c = F.regexp_replace(c, pat, rep)
        c = F.trim(c)
    return c


def normalize_text(
    df: DataFrame,
    content_col: str = "text",
    out_col: str | None = None,
    **stages,
) -> DataFrame:
    """DataFrame form: adds/overwrites ``out_col`` (default: in
    place) with the normalized text plus ``chars_removed`` (length
    delta — the cheap corpus-health signal curation funnels chart)."""
    out = out_col or content_col
    c = F.col(content_col)
    norm = normalize_text_column(c, **stages)
    # delta computed BEFORE the overwrite so in-place mode still
    # reports against the original bytes
    return df.withColumn(
        "chars_removed",
        (
            F.coalesce(F.length(c), F.lit(0))
            - F.coalesce(F.length(norm), F.lit(0))
        ).cast("long"),
    ).withColumn(out, norm)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_sql(expr: str, **stages) -> str:
    """The SAME chain as :func:`normalize_text_column`, rendered as
    DuckDB SQL from the same tables — the battery oracle's half.
    DuckDB's regexp_replace defaults to first-match, so every regex
    gets the 'g' flag (Spark is global by default)."""
    fix_mojibake = stages.get("fix_mojibake", True)
    normalize_punct = stages.get("normalize_punct", True)
    normalize_whitespace = stages.get("normalize_whitespace", True)
    c = expr
    if fix_mojibake:
        for bad, good in MOJIBAKE_MAP:
            c = f"replace({c}, {_sql_quote(bad)}, {_sql_quote(good)})"
    if normalize_punct:
        for bad, good in PUNCT_MAP:
            c = f"replace({c}, {_sql_quote(bad)}, {_sql_quote(good)})"
    if normalize_whitespace:
        c = f"replace({c}, chr(13) || chr(10), chr(10))"
        c = f"replace({c}, chr(13), chr(10))"
        for pat, rep in _WS_REGEX[2:]:
            c = (
                f"regexp_replace({c}, {_sql_quote(pat)}, "
                f"{_sql_quote(rep)}, 'g')"
            )
        c = f"trim({c})"
    return c
