"""Paginated REST extract source (SURVEY.md §2.1 S2/S3).

The reference pulls Zenput submissions with an offset-paginated GET
loop, 100 records/page, filtered by ``date_submitted_after`` =
checkpoint watermark (etl_sync.py:90-120). That extract is inherently
driver-side (a sequential paginated API); the Spark-native design is:

  1. land each page's raw JSON to a landing directory (one file per
     page) — cheap, restartable, and the natural input for either
     ``spark.read.json`` (batch) or ``readStream`` (Structured
     Streaming with a file source picking up new pages);
  2. everything after landing is distributed (etl/zenput.py).

``requests`` is gated behind an import-try: this container has no
network; tests inject a fake ``fetch_page``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

PAGE_SIZE = 100  # reference etl_sync.py:97


def fetch_pages_http(
    base_url: str,
    form_id: str,
    after_date: str | None,
    token: str,
    page_size: int = PAGE_SIZE,
    timeout: int = 30,
) -> Iterator[list[dict]]:
    """Offset-paginated GET loop (etl_sync.py:90-120): yield pages
    until a short page signals the end."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("requests not available in this environment") from e

    offset = 0
    while True:
        params = {"form_id": form_id, "limit": page_size, "offset": offset}
        if after_date:
            params["date_submitted_after"] = after_date
        resp = requests.get(
            base_url,
            params=params,
            headers={"Authorization": f"Bearer {token}"},
            timeout=timeout,
        )
        resp.raise_for_status()
        page = resp.json().get("data", [])
        if not page:
            return
        yield page
        if len(page) < page_size:
            return
        offset += page_size


def land_pages(
    pages: Iterator[list[dict]],
    landing_dir: str,
    prefix: str = "page",
) -> int:
    """Write each page as newline-delimited JSON to the landing dir.
    Returns total records landed. Restart-safe: page files are
    atomic-ish (write temp, rename)."""
    os.makedirs(landing_dir, exist_ok=True)
    total = 0
    for i, page in enumerate(pages):
        tmp = os.path.join(landing_dir, f".{prefix}-{i:06d}.tmp")
        dst = os.path.join(landing_dir, f"{prefix}-{i:06d}.jsonl")
        with open(tmp, "w") as f:
            for rec in page:
                f.write(json.dumps(rec) + "\n")
        os.replace(tmp, dst)
        total += len(page)
    return total


def extract_to_landing(
    fetch_pages: Callable[[], Iterator[list[dict]]],
    landing_dir: str,
) -> int:
    """S2 composed: run any page iterator (HTTP or injected fake) and
    land it. The Spark job then reads the landing dir."""
    return land_pages(fetch_pages(), landing_dir)
