"""S2/S3 — paginated extract → landing dir → Spark read (the extract
loop is driver-side by nature; everything after landing is
distributed). HTTP is faked: the container has no network."""

from __future__ import annotations

import json

from epl_cas_etl_2026_spark.etl.zenput import parse_submissions
from epl_cas_etl_2026_spark.sources.rest import PAGE_SIZE, extract_to_landing


def _fake_pages():
    # exactly-100 page then a short page (the two termination shapes,
    # etl_sync.py:96-114 / FIXTURES.md §A6)
    full = [
        {"id": i, "smetadata": {"location": {"id": f"L{i}"},
         "created_by": {"display_name": "Ana"},
         "date_submitted": "2026-02-10T14:30:00Z", "lat": 1.0, "lon": 2.0},
         "answers": []}
        for i in range(PAGE_SIZE)
    ]
    short = [
        {"id": 1000 + i, "smetadata": {"location": {"id": "LX"},
         "created_by": {"display_name": "Luis"},
         "date_submitted": "2026-02-11T10:00:00Z", "lat": 1.0, "lon": 2.0},
         "answers": []}
        for i in range(7)
    ]
    yield full
    yield short


def test_extract_lands_pages_and_spark_reads(spark, tmp_path):
    landing = str(tmp_path / "landing")
    n = extract_to_landing(_fake_pages, landing)
    assert n == PAGE_SIZE + 7

    raw = spark.read.text(landing)
    parsed = parse_submissions(raw)
    assert parsed.count() == PAGE_SIZE + 7
    assert parsed.filter("zenput_location_id = 'LX'").count() == 7


def test_landing_is_restart_safe(tmp_path):
    landing = str(tmp_path / "landing2")
    extract_to_landing(_fake_pages, landing)
    # second extract overwrites the same page files (idempotent rename)
    n2 = extract_to_landing(_fake_pages, landing)
    assert n2 == PAGE_SIZE + 7

    import os

    files = sorted(os.listdir(landing))
    assert files == ["page-000000.jsonl", "page-000001.jsonl"]
    with open(os.path.join(landing, "page-000001.jsonl")) as f:
        assert len(f.readlines()) == 7
