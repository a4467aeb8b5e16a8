"""HTML main-content extraction (beyond-reference LLM-pipeline
operator, SURVEY.md §2) — the DOM-level stage between ``read_warc``
HTTP bodies and line-level ``remove_boilerplate_lines`` that every
CommonCrawl-style pipeline runs (trafilatura / resiliparse /
boilerpipe shape, all public methods).

Pipeline position::

    read_warc -> html_extract -> remove_boilerplate_lines -> dedup/...

Method (pure python, stdlib ``html.parser`` only — no external
deps):

1. strip ``<script>/<style>/<noscript>/<template>/<svg>/<iframe>``
   subtrees and comments; decode character references;
2. segment the document into text BLOCKS at block-level element
   boundaries (p, div, h1-h6, li, td, article, ...);
3. classify each block: blocks inside ``nav/header/footer/aside``
   containers are boilerplate, as is any block whose LINK DENSITY
   (non-whitespace chars inside ``<a>`` / non-whitespace chars)
   exceeds ``max_link_density`` — the jusText/boilerpipe signal that
   separates menus and link farms from prose;
4. emit ``title`` (the ``<title>`` tag, falling back to the first
   ``<h1>``) and ``main_text`` (kept blocks joined with ``\\n``),
   plus ``n_blocks`` / ``n_kept`` audit counts.

Spark shape: ONE Arrow-batched ``mapInPandas`` map stage — no
shuffle, no driver state, embarrassingly parallel at 100 TB; the
parser is linear in the document and allocation-light. All other
columns pass through (same discipline as
``multimodal/columns.py``). Correctness: battery query
``html_extract`` plants deterministic markup (nav + menu + article +
footer) around ``documents.text`` and the DuckDB oracle recomputes
title/main_text/counts from the raw columns — exact at both scales;
malformed-markup and link-density edge cases are pinned by pytest
contracts (tests/test_r9_ops.py).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Elements whose entire subtree is never content.
_SKIP = {"script", "style", "noscript", "template", "svg", "iframe"}
# Elements that open/close a text block.
_BLOCK = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "td", "th", "article", "section",
    "header", "footer", "nav", "aside", "pre", "blockquote", "br",
    "hr", "main", "figure", "figcaption", "dl", "dt", "dd", "form",
    "fieldset", "address", "details", "summary",
}
# Containers whose blocks are boilerplate regardless of density.
_BOILER = {"nav", "header", "footer", "aside"}
# Void block elements: starttag only, must not track nesting depth.
_VOID = {"br", "hr"}


class _MainContentParser(HTMLParser):
    """One-pass block segmenter; tolerant of malformed markup
    (stdlib HTMLParser never raises on bad nesting / stray ``<``)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # each block: [text_parts, link_nonws_chars, born_in_boiler]
        self.blocks: list[tuple[str, int, bool]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._link_depth = 0
        self._boiler_depth = 0
        self._in_title = False
        self._title_parts: list[str] = []
        self._h1_parts: list[str] = []
        self._h1_depth = 0
        self._h1_done = False

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                (text, self._link_chars, self._boiler_depth > 0)
            )
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK:
            self._flush()
            if tag in _BOILER and tag not in _VOID:
                self._boiler_depth += 1
            if tag == "h1" and not self._h1_done:
                self._h1_depth += 1

    def handle_startendtag(self, tag, attrs):
        # <br/>, <hr/> — block boundary, no depth tracking
        if self._skip_depth:
            return
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK and tag not in _VOID:
            self._flush()
            if tag in _BOILER:
                self._boiler_depth = max(0, self._boiler_depth - 1)
            if tag == "h1" and self._h1_depth:
                self._h1_depth = max(0, self._h1_depth - 1)
                if self._h1_depth == 0:
                    self._h1_done = True

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self._title_parts.append(data)
            return
        if self._h1_depth and not self._h1_done:
            self._h1_parts.append(data)
        self._parts.append(data)
        if self._link_depth:
            self._link_chars += len("".join(data.split()))


def extract_main_content(
    html: str | None, max_link_density: float = 0.5
) -> dict:
    """Pure-python extraction of one document; returns
    ``{"title", "main_text", "n_blocks", "n_kept"}`` (all counts
    over NON-EMPTY blocks). ``None``/unparseable input yields empty
    title/text and zero counts — never raises (the CC-scale rule:
    one bad page must not kill a task)."""
    if not html:
        return {"title": "", "main_text": "", "n_blocks": 0, "n_kept": 0}
    p = _MainContentParser()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — malformed beyond tolerance
        return {"title": "", "main_text": "", "n_blocks": 0, "n_kept": 0}
    p._flush()
    kept = []
    for text, link_chars, in_boiler in p.blocks:
        if in_boiler:
            continue
        nonws = len("".join(text.split()))
        if nonws and (link_chars / nonws) > max_link_density:
            continue
        kept.append(text)
    title = " ".join("".join(p._title_parts).split())
    if not title:
        title = " ".join("".join(p._h1_parts).split())
    return {
        "title": title,
        "main_text": "\n".join(kept),
        "n_blocks": len(p.blocks),
        "n_kept": len(kept),
    }


def html_extract(
    df: DataFrame,
    html_col: str = "content",
    *,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Add ``title`` / ``main_text`` / ``n_blocks`` / ``n_kept`` to
    every row by extracting main content from ``html_col``. One
    Arrow-batched ``mapInPandas`` stage; all input columns pass
    through unchanged."""
    import pandas as pd

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("title", StringType()),
            StructField("main_text", StringType()),
            StructField("n_blocks", LongType()),
            StructField("n_kept", LongType()),
        ]
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            titles, texts, nb, nk = [], [], [], []
            for html in pdf[html_col]:
                r = extract_main_content(
                    html, max_link_density=max_link_density
                )
                titles.append(r["title"])
                texts.append(r["main_text"])
                nb.append(r["n_blocks"])
                nk.append(r["n_kept"])
            yield pdf.assign(
                title=titles, main_text=texts, n_blocks=nb, n_kept=nk
            )

    return df.mapInPandas(fn, out_schema)
