"""REAL PDF text extraction — stdlib ``zlib`` + ``re``, no poppler.

PDF (ISO 32000) is an object graph of dictionaries and streams; the
text a page shows lives in its content stream(s) as operator
sequences — ``(string) Tj``, ``[(a) -120 (b)] TJ``, quote/doublequote
show-and-newline, with ``Td/TD/T*/Tm`` moving the text cursor. For
the corpus-ingest use case (born-digital PDFs with simple 1-byte
fonts) that is all plain parsing: split the file into ``obj …
endobj`` bodies, inflate ``/FlateDecode`` streams with stdlib zlib,
walk the page tree in ``/Kids`` order, and unescape the string
literals — the same scope as the repo's other pure-python codecs
(PNG/JPEG/AVI, multimodal/columns.py header).

Honest limits, same discipline as the JPEG decoder: ``/Encrypt``-ed
documents and ``/Type0`` (CID / composite-font) text return
``decode_ok=False`` with null text — mapping CIDs needs the font's
CMap, which is out of scope here — and ANY malformed construct
degrades to False, never a mid-job crash. Simple-font string bytes
decode as Latin-1 (the PDFDocEncoding/WinAnsi overlap that covers
born-digital ASCII corpora).

``build_pdf(pages)`` is the matching writer (uncompressed or
FlateDecode) so tests and the ``pdf_text_stats`` battery oracle can
round-trip deterministic documents without fixture files.

Reference parity: skrub has no document codecs; this is a
beyond-reference operator from the brief's multimodal list.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

_OBJ_START_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_ESC = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _split_objects(data: bytes) -> dict[int, bytes]:
    """obj number -> body bytes (between ``N G obj`` and ``endobj``).

    SEQUENTIAL scan, not one regex: compressed stream bytes are
    arbitrary binary and can contain ``endobj``/``N 0 obj``/
    ``endstream`` by chance, so each object's extent is derived from
    its declared ``/Length`` when the stream dict carries a direct
    one (falling back to an ``endstream`` search), and the scanner
    resumes PAST the stream — bytes inside a stream can never start
    or end an object. Works without the xref table, so truncated or
    appended-to files still yield every intact object."""
    objs: dict[int, bytes] = {}
    pos = 0
    n = len(data)
    while pos < n:
        m = _OBJ_START_RE.search(data, pos)
        if m is None:
            break
        start = m.end()
        sm = _STREAM_RE.search(data, start)
        em = data.find(b"endobj", start)
        if sm is not None and (em < 0 or sm.start() < em):
            head = data[start : sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm:
                after = sm.end() + int(lm.group(1))
            else:
                es = data.find(b"endstream", sm.end())
                after = es if es >= 0 else sm.end()
            em = data.find(b"endobj", after)
        if em < 0:
            pos = start
            continue
        objs[int(m.group(1))] = data[start:em]
        pos = em + len(b"endobj")
    return objs


def _dict_head(body: bytes) -> bytes:
    """The object's dictionary part — body up to the ``stream``
    keyword. Metadata checks (/Type, /Subtype, /Encrypt) must look
    HERE, never at raw stream bytes (binary can contain anything)."""
    m = _STREAM_RE.search(body)
    return body if m is None else body[: m.start()]


def _stream_of(body: bytes) -> bytes | None:
    """Raw stream bytes of an object body, sized by the dict's
    direct ``/Length`` when present (binary-safe) and by the
    ``endstream`` delimiter otherwise; inflated when the dict
    declares /FlateDecode."""
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    head = body[: m.start()]
    lm = _LENGTH_RE.search(head)
    if lm:
        data = body[m.end() : m.end() + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            return None
        data = body[m.end() : end]
        # trailing EOL before `endstream` belongs to the delimiter
        if data.endswith(b"\n"):
            data = data[:-1]
            if data.endswith(b"\r"):
                data = data[:-1]
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(…)`` literal starting at the ``(``; returns
    (decoded text, index past the closing paren). Handles nesting,
    the 8 named escapes, 1-3 digit octal, backslash-EOL
    continuations, and the bare-EOL-becomes-LF rule."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESC:
                out.append(_ESC[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0D, 0x0A):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        elif c == 0x0D:  # bare EOL (CR or CRLF) records as LF
            out.append("\n")
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``<…>`` hex string starting at the ``<``; odd final
    digit pads with 0 (spec)."""
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1"), j + 1


def _text_from_content(data: bytes) -> str:
    """Extract show-text strings from one content stream, inserting
    one newline wherever the text cursor moves between shows
    (``Td/TD/T*/Tm`` or the quote operators)."""
    out: list[str] = []
    pending_nl = False
    strings: list[str] = []  # operand stack of recent strings
    i, n = 0, len(data)

    def emit(s: str, newline_first: bool) -> None:
        nonlocal pending_nl
        if (pending_nl or newline_first) and out:
            out.append("\n")
        pending_nl = False
        out.append(s)

    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal(data, i)
            strings.append(s)
        elif c == 0x3C:  # < or <<
            if i + 1 < n and data[i + 1] == 0x3C:
                i += 2
            else:
                s, i = _parse_hex(data, i)
                strings.append(s)
        elif c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif (
            0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A or c in (0x27, 0x22)
        ):
            m = re.match(rb"[A-Za-z'\"*]+", data[i:])
            op = m.group(0)
            i += len(op)
            if op == b"Tj" and strings:
                emit(strings[-1], False)
                strings.clear()
            elif op == b"TJ" and strings:
                emit("".join(strings), False)
                strings.clear()
            elif op == b"'" and strings:
                emit(strings[-1], True)
                strings.clear()
            elif op == b'"' and strings:
                emit(strings[-1], True)
                strings.clear()
            elif op in (b"Td", b"TD", b"Tm"):
                pending_nl = True
                strings.clear()
            elif op == b"T*":
                pending_nl = True
            elif op in (b"BT", b"ET"):
                strings.clear()
        else:
            i += 1
    return "".join(out)


def _kids_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in /Root → /Pages → /Kids traversal
    order; falls back to ascending object number when the tree is
    unparseable (hand-made / damaged files)."""
    pages = {
        num
        for num, body in objs.items()
        if re.search(rb"/Type\s*/Page\b", body)
        and not re.search(rb"/Type\s*/Pages\b", body)
    }
    roots = [
        num
        for num, body in objs.items()
        if re.search(rb"/Type\s*/Pages\b", body)
    ]
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen:
            return
        seen.add(num)
        if num in pages:
            order.append(num)
            return
        body = objs.get(num, b"")
        m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
        if m:
            for r in _REF_RE.finditer(m.group(1)):
                walk(int(r.group(1)))

    for root in sorted(roots):
        walk(root)
    missing = sorted(pages - set(order))
    return order + missing if order or missing else sorted(pages)


def extract_pdf_text(payload: bytes | None) -> dict:
    """PDF bytes -> ``{"decode_ok", "n_pages", "n_streams",
    "text"}``. ``decode_ok=False`` (null text/pages) for
    non-PDFs, encrypted documents and Type0/CID-font text."""
    bad = {"decode_ok": False, "n_pages": None, "n_streams": 0, "text": None}
    if payload is None or not bytes(payload).startswith(b"%PDF-"):
        return bad
    data = bytes(payload)
    try:
        objs = _split_objects(data)
        if not objs:
            return bad
        heads = {num: _dict_head(b) for num, b in objs.items()}
        n_streams = sum(
            1 for num, b in objs.items() if len(heads[num]) < len(b)
        )
        trailer_at = data.rfind(b"trailer")
        trailer = data[trailer_at:] if trailer_at >= 0 else b""
        if re.search(rb"/Encrypt\b", trailer) or any(
            re.search(rb"/Subtype\s*/Type0\b", h) for h in heads.values()
        ):
            return {**bad, "n_streams": n_streams}
        page_nums = _kids_order(heads)
        page_texts: list[str] = []
        for num in page_nums:
            m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", heads[num])
            refs: list[int] = []
            if m:
                refs = [int(m.group(1))]
            else:
                ma = re.search(rb"/Contents\s*\[(.*?)\]", heads[num], re.S)
                if ma:
                    refs = [int(r.group(1)) for r in _REF_RE.finditer(ma.group(1))]
            parts = []
            for ref in refs:
                stream = _stream_of(objs.get(ref, b""))
                if stream is not None:
                    parts.append(_text_from_content(stream))
            page_texts.append("".join(parts))
        return {
            "decode_ok": True,
            "n_pages": len(page_nums),
            "n_streams": n_streams,
            "text": "\n".join(page_texts),
        }
    except Exception:
        return bad


def _escape_literal(s: str) -> bytes:
    """Writer-side escaping: backslash, parens, and the EOL chars
    that would otherwise trigger the bare-EOL-to-LF reading rule."""
    out = []
    for ch in s:
        if ch in ("\\", "(", ")"):
            out.append("\\" + ch)
        elif ch == "\r":
            out.append("\\015")
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


def build_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Minimal single-font PDF writer: one content stream per page
    (``BT /F1 12 Tf 72 720 Td (…) Tj ET``), Helvetica, optional
    FlateDecode, valid xref so external viewers accept the file.
    Round-trips through :func:`extract_pdf_text` exactly:
    ``text == "\\n".join(pages)``."""
    n_pages = len(pages)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(pages):
        page_obj = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {3 + 2 * n_pages} 0 R >> >> "
            f"/Contents {4 + 2 * i} 0 R >>"
        ).encode()
        content = (
            b"BT /F1 12 Tf 72 720 Td ("
            + _escape_literal(text)
            + b") Tj ET"
        )
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        stream_obj = (
            b"<< "
            + filt
            + f"/Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )
        objs.append(page_obj)
        objs.append(stream_obj)
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def pdf_text_stats(df, payload_col: str = "payload"):
    """binary PDF payload -> extraction row (one Arrow-batched
    ``mapInPandas`` pass, the multimodal plumbing discipline):
    adds ``decode_ok boolean, n_pages int, n_streams int, n_chars
    long, text string``. Linear in bytes, no shuffle."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("decode_ok", BooleanType()),
            StructField("n_pages", IntegerType()),
            StructField("n_streams", IntegerType()),
            StructField("n_chars", LongType()),
            StructField("text", StringType()),
        ]
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                extract_pdf_text(
                    bytes(p) if p is not None else None
                )
                for p in pdf[payload_col]
            ]
            yield pdf.assign(
                decode_ok=[r["decode_ok"] for r in rows],
                n_pages=[r["n_pages"] for r in rows],
                n_streams=[r["n_streams"] for r in rows],
                n_chars=[
                    len(r["text"]) if r["text"] is not None else None
                    for r in rows
                ],
                text=[r["text"] for r in rows],
            )

    return df.mapInPandas(fn, out_schema)
