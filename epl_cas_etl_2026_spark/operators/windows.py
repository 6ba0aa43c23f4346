"""Per-key window operators (SURVEY.md §2.5 W4-W6).

Reference shapes: latest supervision per branch (ORDER BY fecha DESC
LIMIT 1 — app.py:846-857), last-4 trend per branch (app.py:938-960),
next period lookup (etl_sync.py:542-547).

Scale note: ``row_number`` over ``partitionBy(key)`` is one shuffle on
the key and a per-partition sort — the canonical distributed top-N; no
driver-side loop, no global sort. Spark plans a running
WindowExec after an exchange; with AQE the exchange coalesces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """W4 — most recent row per key (app.py:846-857). ``order`` must be
    a *total* order (add a unique-id tiebreak) for determinism."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """W5 — top-N rows per key (last-4 trend, app.py:938-960)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def with_next_value(
    df: DataFrame,
    value_col: str,
    order: Sequence[Column],
    keys: Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """W6 — next-value lookup via ``lead`` (next period by fecha_inicio,
    etl_sync.py:542-547)."""
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        if keys
        else Window.orderBy(*order)
    )
    return df.withColumn(out_col or f"next_{value_col}", F.lead(value_col).over(w))
