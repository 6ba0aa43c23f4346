"""WARC parser (sources/warc.py) — framing round-trip and adversarial
rejection. The gate (docs_warc_ingest_stats) validates the parsed
bodies cross-engine; these tests pin the framing rules the oracle
can't see.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.sources.warc import (
    build_warc_record,
    parse_warc,
    warc_records,
)

_H = {
    "WARC-Type": "response",
    "WARC-Record-ID": "<urn:uuid:1>",
    "WARC-Date": "2026-01-01T00:00:00Z",
    "WARC-Target-URI": "http://example.com/x",
}


def test_roundtrip_multi_record_and_binary_bodies():
    bodies = [b"hello", bytes(range(256)), "zh文字".encode()]
    buf = b"".join(build_warc_record(_H, b) for b in bodies)
    recs = parse_warc(buf)
    assert [r["body"] for r in recs] == bodies
    assert [r["content_length"] for r in recs] == [len(b) for b in bodies]
    assert all(r["type"] == "response" for r in recs)
    assert recs[0]["uri"] == "http://example.com/x"


def test_content_length_is_bytes_not_chars():
    body = "ééé".encode()  # 3 chars, 6 bytes
    rec = parse_warc(build_warc_record(_H, body))[0]
    assert rec["content_length"] == 6


def test_header_names_case_insensitive():
    raw = build_warc_record(_H, b"x").replace(
        b"WARC-Type: response", b"warc-TYPE: response"
    )
    assert parse_warc(raw)[0]["type"] == "response"


def test_rejects_bad_version():
    raw = build_warc_record(_H, b"x").replace(b"WARC/1.0", b"WARC/9.9")
    with pytest.raises(ValueError, match="unsupported WARC version"):
        parse_warc(raw)
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"HTTP/1.0 200 OK\r\n\r\n")


def test_rejects_missing_mandatory_header():
    h = {k: v for k, v in _H.items() if k != "WARC-Date"}
    with pytest.raises(ValueError, match="missing mandatory"):
        parse_warc(build_warc_record(h, b"x"))


def test_rejects_truncated_body_and_missing_separator():
    raw = build_warc_record(_H, b"0123456789")
    with pytest.raises(ValueError, match="truncated WARC body|separator"):
        parse_warc(raw[:-6])
    with pytest.raises(ValueError, match="separator"):
        parse_warc(raw[:-2])


def test_rejects_body_length_lie():
    raw = build_warc_record(_H, b"0123456789")
    # shrink the declared length: framing then misses the separator
    bad = raw.replace(b"Content-Length: 10", b"Content-Length: 8")
    with pytest.raises(ValueError, match="separator"):
        parse_warc(bad)


def test_rejects_malformed_header_line():
    raw = build_warc_record(_H, b"x").replace(
        b"WARC-Date: 2026-01-01T00:00:00Z", b"WARC-Date 2026"
    )
    with pytest.raises(ValueError, match="malformed header"):
        parse_warc(raw)


def test_warc_records_quarantine(spark):
    good = build_warc_record(_H, b"payload body")
    rows = [(1, bytearray(good)), (2, bytearray(b"not a warc at all"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = warc_records(df, on_error="quarantine").orderBy("id").collect()
    assert out[0]["err"] is None and out[0]["content_length"] == 12
    assert out[1]["err"] is not None and out[1]["rec_type"] is None
    with pytest.raises(Exception):
        warc_records(df, on_error="fail").collect()
