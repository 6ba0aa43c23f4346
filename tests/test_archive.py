"""ZIP ingestion (sources/archive.py) — round-trip, determinism, CRC
integrity, and quarantine semantics.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.sources.archive import (
    build_zip,
    read_zip,
    zip_members,
)

_MEMBERS = [
    ("doc/1.txt", b"hello archive world " * 50),  # compressible
    ("meta/1.json", '{"lang":"zh文"}'.encode()),
    ("bin/blob", bytes(range(256))),
]


def test_roundtrip_and_real_compression():
    buf = build_zip(_MEMBERS)
    out = read_zip(buf)
    assert [(m["name"], m["body"]) for m in out] == _MEMBERS
    # the repetitive text member really compresses: archive smaller
    # than its raw contents
    assert len(buf) < sum(len(b) for _, b in _MEMBERS)


def test_deterministic_bytes():
    assert build_zip(_MEMBERS) == build_zip(_MEMBERS)


def test_crc_corruption_detected():
    buf = bytearray(build_zip(_MEMBERS))
    # flip a byte inside the first member's compressed stream (after
    # the ~40-byte local header, well before the central directory)
    buf[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch|not a ZIP"):
        read_zip(bytes(buf))


def test_rejects_non_zip_and_truncation():
    with pytest.raises(ValueError, match="not a ZIP"):
        read_zip(b"PK\x03\x04 this is not really a zip")
    buf = build_zip(_MEMBERS)
    with pytest.raises(ValueError, match="not a ZIP"):
        read_zip(buf[: len(buf) // 2])


def test_zip_members_quarantine(spark):
    good = build_zip([("a/x.txt", b"abc"), ("b/y.txt", b"defg")])
    rows = [(1, bytearray(good)), (2, bytearray(b"PK garbage"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = zip_members(df, on_error="quarantine").orderBy("id", "name").collect()
    ok = [r for r in out if r["id"] == 1]
    assert [(r["name"], r["size"]) for r in ok] == [
        ("a/x.txt", 3),
        ("b/y.txt", 4),
    ]
    bad = [r for r in out if r["id"] == 2]
    assert len(bad) == 1 and bad[0]["err"] is not None
    with pytest.raises(Exception):
        zip_members(df, on_error="fail").collect()
