"""Real WARC (ISO 28500 / CommonCrawl) record parsing — the container
format actual pretraining corpora arrive in.

Writer + strict parser in stdlib bytes handling: version line, CRLF
header block (case-insensitive names), mandatory headers (WARC-Type,
WARC-Record-ID, WARC-Date, Content-Length), byte-exact Content-Length
body framing, and the 2×CRLF record separator. Loud ValueError on any
malformation — bad version, header without a colon, missing mandatory
header, truncated body, missing separator.

Spark integration is the multimodal batch shape: one WARC FILE per
row as an opaque binary payload; ``warc_records`` explodes it to one
row per record via ``mapInPandas`` (scan-stage parallel, quarantine
mode for corrupt files — the etl/zenput.py dead-letter pattern). At
100 TB this is exactly how CommonCrawl segments are read: a manifest
of file splits, each split parsed independently inside its partition,
record bodies never leaving the executor until reduced to typed
columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MANDATORY = ("warc-type", "warc-record-id", "warc-date", "content-length")


def build_warc_record(headers: dict, body: bytes) -> bytes:
    """Serialize one WARC/1.0 record; Content-Length is derived from
    the body (never trusted from the caller)."""
    out = [b"WARC/1.0\r\n"]
    hdrs = {k: v for k, v in headers.items()}
    hdrs["Content-Length"] = str(len(body))
    for k, v in hdrs.items():
        out.append(f"{k}: {v}\r\n".encode())
    out.append(b"\r\n")
    return b"".join(out) + body + b"\r\n\r\n"


def parse_warc(buf: bytes) -> list[dict]:
    """Parse a WARC file (concatenated records) → list of
    {type, record_id, uri, date, content_length, body}."""
    buf = bytes(buf)
    pos, out = 0, []
    while pos < len(buf):
        end_hdr = buf.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            raise ValueError("truncated WARC header block")
        lines = buf[pos:end_hdr].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            raise ValueError("bad WARC version line")
        version = lines[0][5:].decode("ascii", "replace")
        if version not in ("1.0", "1.1"):
            raise ValueError(f"unsupported WARC version {version!r}")
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            if b":" not in ln:
                raise ValueError(f"malformed header line {ln!r}")
            k, v = ln.split(b":", 1)
            hdrs[k.strip().decode().lower()] = v.strip().decode()
        for req in _MANDATORY:
            if req not in hdrs:
                raise ValueError(f"missing mandatory header {req}")
        try:
            clen = int(hdrs["content-length"])
        except ValueError as e:
            raise ValueError("non-integer Content-Length") from e
        if clen < 0:
            raise ValueError("negative Content-Length")
        body_start = end_hdr + 4
        body = buf[body_start : body_start + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC body")
        if buf[body_start + clen : body_start + clen + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        out.append(
            {
                "type": hdrs["warc-type"],
                "record_id": hdrs["warc-record-id"],
                "uri": hdrs.get("warc-target-uri"),
                "date": hdrs["warc-date"],
                "content_length": clen,
                "body": body,
            }
        )
        pos = body_start + clen + 4
    return out


WARC_RECORDS_SCHEMA = (
    "id long, rec_type string, uri string, content_length long, "
    "body_h60 long, err string"
)


def _h60(b: bytes) -> int:
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def warc_records(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "fail",
) -> DataFrame:
    """Explode WARC-file payloads to one row per record. body_h60 is
    the md5-derived 60-bit body hash (the cross-engine idiom), so a
    SQL oracle can recompute it from the generation arithmetic."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine: {on_error}")
    cols = [id_col, payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for rec in parse_warc(bytes(b)):
                        rows.append(
                            (
                                int(i), rec["type"], rec["uri"],
                                rec["content_length"],
                                _h60(rec["body"]), None,
                            )
                        )
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the catch-everything path by contract
                    if on_error == "fail":
                        raise
                    rows.append((int(i), None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "rec_type", "uri", "content_length",
                    "body_h60", "err",
                ],
            )

    return df.select(*cols).mapInPandas(batches, WARC_RECORDS_SCHEMA)
