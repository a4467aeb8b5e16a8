"""WARC source: framing, gzip members, HTTP split, distribution."""

from __future__ import annotations

import gzip

from skrub_spark.sources.warc import (
    parse_warc_member,
    read_warc,
    warc_bytes,
)


def _recs():
    return [
        {
            "record_id": "urn:uuid:1",
            "warc_type": "warcinfo",
            "target_uri": "",
            "warc_date": "2024-01-01T00:00:00Z",
            "content": "software: test",
        },
        {
            "record_id": "urn:uuid:2",
            "warc_type": "response",
            "target_uri": "https://example.org/a",
            "warc_date": "2024-01-01T00:00:00Z",
            "http_status": 404,
            # CRLF + blank lines INSIDE the body: only Content-Length
            # framing survives this
            "content": "line1\r\n\r\nline2\r\n\r\n",
        },
        {
            "record_id": "urn:uuid:3",
            "warc_type": "response",
            "target_uri": "https://example.org/b",
            "warc_date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "content": "unicode ümläut ✓",
        },
    ]


def test_roundtrip_framing_and_http_split():
    got = list(parse_warc_member(warc_bytes(_recs())))
    assert [r["record_id"] for r in got] == [
        "urn:uuid:1", "urn:uuid:2", "urn:uuid:3",
    ]
    # warcinfo payload passes through, no HTTP split
    assert got[0]["warc_type"] == "warcinfo"
    assert got[0]["http_status"] is None
    assert got[0]["content"] == "software: test"
    # CRLF-laden body survives (length framing, not delimiter scan)
    assert got[1]["http_status"] == 404
    assert got[1]["content"] == "line1\r\n\r\nline2\r\n\r\n"
    # utf-8 round trip
    assert got[2]["content"] == "unicode ümläut ✓"


def test_multi_member_gzip():
    """The CommonCrawl layout: one gzip member PER RECORD,
    concatenated — gzip.decompress handles it and the parser sees
    one continuous stream."""
    recs = _recs()
    blob = b"".join(gzip.compress(warc_bytes([r])) for r in recs)
    data = gzip.decompress(blob)
    got = list(parse_warc_member(data))
    assert len(got) == 3


def test_read_warc_distributed(spark, tmp_path):
    recs = _recs()
    (tmp_path / "a.warc").write_bytes(warc_bytes(recs[:2]))
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(warc_bytes(recs[2:])))
    df = read_warc(spark, str(tmp_path))
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {"urn:uuid:1", "urn:uuid:2", "urn:uuid:3"}
    assert rows["urn:uuid:2"]["warc_file"] == "a.warc"
    assert rows["urn:uuid:3"]["warc_file"] == "b.warc.gz"
    assert rows["urn:uuid:3"]["content"] == "unicode ümläut ✓"
    assert rows["urn:uuid:2"]["http_status"] == 404
    # two files -> two input partitions (file-per-task shape)
    assert df.rdd.getNumPartitions() >= 2
