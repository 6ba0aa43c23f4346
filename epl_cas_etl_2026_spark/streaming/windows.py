"""Structured Streaming operators (SURVEY.md §2.9; Phase 4).

The reference has no true streaming engine — its ETL is the batch
analogue (checkpoint watermark T1, idempotent dedup T2). Here the
event-time primitives are real Structured Streaming:

  * ``stream_tumbling_agg`` / ``stream_sliding_agg`` — windowed
    aggregations with a watermark for late data. Same logic as the
    batch queries in plans/extensions.py (events_tumbling_hourly /
    events_sliding_counts) — one definition of the transformation,
    applied to either a batch or a streaming frame.
  * ``incremental_zenput_stream`` — the streaming wrapper for the ETL:
    ``readStream`` on the landing dir + ``foreachBatch`` running the
    SAME batch transforms (SURVEY.md §7 Phase 3: batch first,
    streaming is a wrapper, not a rewrite).

State stores, checkpointing, and exactly-once file-sink semantics come
from the engine; at scale the watermark bounds state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Window aggregation usable on BOTH batch and streaming frames.

    With ``watermark`` set (streaming), state for windows older than
    max(event time) - watermark is evicted and late rows beyond it are
    dropped — bounded state at any scale."""
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window_len, slide)
        if slide
        else F.window(ts_col, window_len)
    )
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def stream_events_from_dir(
    spark: SparkSession, src_dir: str, schema
) -> DataFrame:
    """File-source stream: picks up new files dropped into ``src_dir``
    (the streaming twin of the REST landing dir — S2/S3)."""
    return spark.readStream.schema(schema).json(src_dir)


def run_stream_to_memory(
    windowed: DataFrame,
    query_name: str,
    output_mode: str = "update",
):
    """Drive a windowed stream into an in-memory sink (test harness;
    production would writeStream to parquet/Delta with a checkpoint
    dir — the T1 watermark made engine-native)."""
    return (
        windowed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )


def incremental_zenput_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    process_batch,
):
    """T1/T5 — readStream on the landing dir; each micro-batch runs the
    SAME batch ETL transforms via foreachBatch. The stream checkpoint
    replaces the reference's sync_checkpoints table."""
    raw = spark.readStream.text(landing_dir)
    return (
        raw.writeStream.foreachBatch(
            lambda batch_df, batch_id: process_batch(batch_df, batch_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """T2 as a TRUE stream: exactly-once-ish dedup on the natural key
    with watermark-bounded state (``dropDuplicatesWithinWatermark``) —
    the state store holds only keys inside the watermark horizon, so
    memory is bounded no matter how long the stream runs. This is the
    streaming twin of the batch anti-join
    (etl/pipeline.dedup_against_sink); re-delivered records inside the
    horizon are dropped, and the watermark contract says later
    re-deliveries cannot arrive."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native session windows on a stream: gap-merged, data-driven
    bounds (`F.session_window`), watermark-bounded state. The batch
    twin is the driver-gated `events_session_windows_native` query —
    one definition of the semantics, two execution modes."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join (J5/J9 on a stream): the static
    dim side is broadcast per micro-batch, so the stream side never
    shuffles and no state store is involved — the streaming twin of
    the batch broadcast FK joins. The dim is re-resolved each batch,
    so slowly-changing dims pick up updates without restarting."""
    return stream.join(F.broadcast(dim), on, how)
