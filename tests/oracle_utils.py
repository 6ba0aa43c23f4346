"""Local mirror of the driver's DuckDB differential check: run a Spark
query and its oracle SQL over the same parquet, compare row count,
column names, and order-insensitive values (SURVEY.md §5 item 1)."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

from epl_cas_etl_2026_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm(v) -> str:
    """Normalize a cell to a string for cross-engine comparison
    (everything stringified so mixed-dtype tuples stay sortable)."""
    if v is None:
        return "\x00NULL"
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        v = v.item()  # numpy scalar → python
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"  # pandas surfaces SQL NULL as NaN
        if v.is_integer():
            # Keep float identity visible: the driver's hash distinguishes
            # bigint 1553 from double/HUGEINT-as-float 1553.0, so the local
            # comparator must too (round-3 verdict: %.9g masked exactly the
            # dtype-class mismatches the driver flagged).
            return f"{v:.1f}"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def compare(spark_df, con, sql: str, float_tol: float = 0.0):
    """Return (ok, message). Columns sorted by name, rows sorted, cells
    normalized — the strictest comparison we can run locally."""
    sdf = spark_df.toPandas()
    odf = con.sql(sql).df()

    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    if s_cols != o_cols:
        return False, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    if len(sdf) != len(odf):
        return False, f"rowcount mismatch: spark={len(sdf)} oracle={len(odf)}"

    s_rows = sorted(
        tuple(_norm(v) for v in row)
        for row in sdf[s_cols].itertuples(index=False, name=None)
    )
    o_rows = sorted(
        tuple(_norm(v) for v in row)
        for row in odf[o_cols].itertuples(index=False, name=None)
    )
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        return False, f"value mismatch (first diffs): {diffs}"
    return True, "ok"
