"""ZIP archive ingestion — the other container format corpora and
labeling-vendor deliveries actually arrive in (next to WARC,
sources/warc.py). Stdlib ``zipfile`` + ``zlib``: members are REALLY
DEFLATE-compressed, and every read is CRC32-verified by the stdlib
extractor, so a corrupt member fails loudly (or quarantines) rather
than yielding silent garbage — the property the gate exercises.

Determinism: the writer pins the member timestamp to the DOS epoch
(1980-01-01) and uses a fixed compression level, so an archive is a
pure function of its member list — required for the fingerprint-style
gates this repo uses.

Spark integration is the multimodal batch shape: one archive per row
as an opaque binary column; ``zip_members`` explodes it to one row
per member via ``mapInPandas`` (scan-stage parallel, bodies never
leave the partition; body_h60 is the md5-derived 60-bit hash both
engines compute).
"""

from __future__ import annotations

import hashlib
import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def build_zip(members: list[tuple[str, bytes]], level: int = 6) -> bytes:
    """Serialize (name, body) members into a deterministic ZIP
    (DEFLATE, fixed DOS-epoch timestamps)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(
        buf, "w", compression=zipfile.ZIP_DEFLATED, compresslevel=level
    ) as zf:
        for name, body in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, body)
    return buf.getvalue()


def read_zip(buf: bytes) -> list[dict]:
    """Parse a ZIP archive → [{name, size, body}], CRC-verifying every
    member. Raises ValueError on any malformation (bad magic, torn
    central directory, CRC mismatch)."""
    try:
        with zipfile.ZipFile(io.BytesIO(bytes(buf))) as zf:
            bad = zf.testzip()  # CRC pass over every member
            if bad is not None:
                raise ValueError(f"CRC mismatch in member {bad!r}")
            out = []
            for info in zf.infolist():
                body = zf.read(info.filename)
                out.append(
                    {
                        "name": info.filename,
                        "size": len(body),
                        "body": body,
                    }
                )
            return out
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a ZIP archive: {e}") from e


ZIP_MEMBERS_SCHEMA = (
    "id long, name string, size long, body_h60 long, err string"
)


def zip_members(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "fail",
) -> DataFrame:
    """Explode ZIP payloads to one row per member (CRC-verified)."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine: {on_error}")
    cols = [id_col, payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for m in read_zip(bytes(b)):
                        rows.append(
                            (
                                int(i),
                                m["name"],
                                m["size"],
                                int(
                                    hashlib.md5(m["body"]).hexdigest()[:15],
                                    16,
                                ),
                                None,
                            )
                        )
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the catch-everything path by contract
                    if on_error == "fail":
                        raise
                    rows.append((int(i), None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["id", "name", "size", "body_h60", "err"]
            )

    return df.select(*cols).mapInPandas(batches, ZIP_MEMBERS_SCHEMA)
