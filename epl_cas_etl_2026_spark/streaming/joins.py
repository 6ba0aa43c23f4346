"""Stream-stream joins (the hardest Structured Streaming primitive the
engine exposes).

``stream_interval_join`` joins two event streams on a key within a
time interval — the streaming form of the batch as-of/attribution
shape (operators/windows.as_of_join): e.g. every purchase joined to
clicks from the preceding hour. Both sides carry watermarks and the
join condition bounds the time range, so the state store provably
evicts rows older than (watermark + interval) — state is bounded no
matter how long the streams run. Inner joins emit as soon as both
sides arrive; left-outer emits NULL-extended rows only once the
watermark proves no match can still come.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join left events to right events with the same key where
    ``right_ts ∈ [left_ts - lookback, left_ts)`` (strictly before —
    attribution semantics). Both sides watermarked; the interval bound
    is what lets the engine GC join state."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] < lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond, how)
