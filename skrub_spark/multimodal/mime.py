"""Magic-byte MIME sniffing for binary columns (r9,
beyond-reference multimodal plumbing).

Corpus ingest sees payloads whose extension/transport metadata lies
constantly; every real pipeline routes on the leading bytes (the
``file(1)`` / WHATWG-sniffing idea). This is a single JVM-side CASE
chain over binary prefix compares — map-only, codegen'd, no Python
— returning the MIME to route each payload to the right decoder
(png/jpeg/gif/bmp → image codecs, RIFF → wav/avi demux, %PDF →
pdf.py, gzip/zip → archive handling, markup → html_extract).

The magic table is the module-level spec shared with tests; every
entry is the format's actual signature (verified against the repo's
own encoders where one exists — encode_png/encode_jpeg/encode_gif/
encode_bmp/encode_wav/encode_avi/build_pdf round-trip through
``sniff_mime`` in tests/test_r9_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (mime, offset, signature-bytes) — ORDER MATTERS (RIFF container
# subtypes before any generic fallbacks; longest-signature rules
# are naturally disjoint here).
MAGIC: list[tuple[str, int, bytes]] = [
    ("image/png", 0, b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", 0, b"\xff\xd8\xff"),
    ("image/gif", 0, b"GIF87a"),
    ("image/gif", 0, b"GIF89a"),
    ("image/bmp", 0, b"BM"),
    ("audio/wav", 8, b"WAVE"),  # RIFF....WAVE
    ("video/avi", 8, b"AVI "),  # RIFF....AVI<sp>
    ("application/pdf", 0, b"%PDF-"),
    ("application/gzip", 0, b"\x1f\x8b"),
    ("application/zip", 0, b"PK\x03\x04"),
]
# RIFF rules additionally require the outer container tag:
_RIFF = b"RIFF"


def sniff_mime(col: Column | str, out_unknown: str = "application/octet-stream") -> Column:
    """MIME from leading bytes: one CASE chain of binary prefix
    equality tests (``substring`` on BinaryType is a byte slice).
    NULL payloads stay NULL; markup sniffing (``<!DOCTYPE``/
    ``<html`` after optional whitespace/BOM) tags text/html;
    everything else falls through to ``out_unknown``."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(out_unknown)
    # markup: decode the first bytes as a string and regex it
    head = F.lower(F.substring(c.cast("string"), 1, 64))
    is_html = head.rlike(r"^\s*(<!doctype html|<html)")
    expr = F.when(is_html, F.lit("text/html")).otherwise(expr)
    for mime, off, sig in reversed(MAGIC):
        cond = F.substring(c, off + 1, len(sig)) == F.lit(sig)
        if off > 0:
            cond = cond & (F.substring(c, 1, 4) == F.lit(_RIFF))
        expr = F.when(cond, F.lit(mime)).otherwise(expr)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(expr)
