"""Warehouse-maintenance query shapes: exact distinct counts via
mergeable bitmap sketches, and SCD2 (type-2 slowly-changing
dimension) version compression from an event stream.

- Bitmap distinct: Spark's bitmap_construct_agg/bitmap_or_agg over
  (key, bucket) is the EXACT distinct-count materialization that,
  unlike COUNT(DISTINCT), is re-aggregable: per-partition bitmaps
  OR-merge across shards, days, or late-arriving increments without
  re-reading history — the incremental-rollup twin of
  orders_incremental_rollup's mergeable partial aggs, now for
  distincts. 100 TB shape: one groupBy to bucketed bitmaps (each
  bitmap covers 2^15 ids → bounded cell size), one OR-merge groupBy;
  both map-side combined. The DuckDB oracle is plain
  COUNT(DISTINCT) — equality proves the bitmap path exact, not
  approximate.

- SCD2 compression: an event stream has one row per observation; the
  dimension wants one row per STATE CHANGE with a validity interval.
  Change detection is lag() != current per key (keyed window, no
  global partition); intervals come from lead() over the compressed
  stream; durations are exact epoch-microsecond integers (unix_micros/epoch_us — second-level epoch() casts would round vs truncate differently across engines). Reference
  lineage: period-transition T6 and next-row J11 generalized to the
  classic warehouse versioning op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact distinct users per event type via two-level bitmap aggregation.
# ---------------------------------------------------------------------------
@_register(
    "events_bitmap_distinct_rollup",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_bitmap_distinct_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # bitmap_bucket_number/bitmap_bit_position are 1-based: value 0
    # maps to bit position -1, which bitmap_construct_agg silently
    # drops (measured: every count short by exactly the id-0 user).
    # Shift ids by +1 so the 0-based testdata keys are all valid.
    # negative ids would map to negative bit positions, which the
    # bitmap aggregate drops SILENTLY — fail loudly instead (the +1
    # shift only covers id 0)
    uid = (
        "CASE WHEN user_id < 0 THEN raise_error("
        "'bitmap distinct requires non-negative ids') "
        "ELSE user_id + 1 END"
    )
    buckets = (
        events.select(
            "event_type",
            F.expr(f"bitmap_bucket_number({uid})").alias("bucket"),
            F.expr(f"bitmap_bit_position({uid})").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    # Counts are per (type, bucket) and SUMMED across buckets —
    # never bitmap_or_agg across DIFFERENT buckets (bit positions
    # collide between buckets; OR-merging them undercounts — caught
    # by tests/test_warehouse.py on ids spanning 32768 boundaries).
    # bitmap_or_agg's role is merging SAME-bucket bitmaps across
    # shards/increments before the count.
    return (
        buckets.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)"))
            .cast("long")
            .alias("n_users")
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# SCD2 compression: collapse each user's event stream to state-change
# versions with validity intervals; report per-state version stats.
# ---------------------------------------------------------------------------
@_register(
    "events_scd2_compress",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ), versions AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM changes
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(*) - COUNT(valid_to) AS BIGINT) AS n_open,
           CAST(COALESCE(SUM(epoch_us(valid_to)
                              - epoch_us(valid_from)), 0)
                AS BIGINT) AS closed_micros
    FROM versions
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_scd2_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_obs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn(
            "prev_type", F.lag("event_type").over(w_obs)
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w_chg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_chg).alias("valid_to"),
    )
    return (
        versions.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_versions"),
            (F.count(F.lit(1)) - F.count("valid_to"))
            .cast("long")
            .alias("n_open"),
            F.coalesce(
                F.sum(
                    F.unix_micros("valid_to")
                    - F.unix_micros("valid_from")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("closed_micros"),
        )
        .orderBy("event_type")
    )
