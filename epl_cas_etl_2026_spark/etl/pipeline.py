"""Batch-incremental ETL pipeline (SURVEY.md §3.2, §2.9).

Reference flow (etl_sync.py:341-404): checkpoint read → paginated REST
extract → per-row transform/dedup/insert → checkpoint advance → audit.
Spark-native flow: the same semantics as SET operations —

  * dedup on the natural key = ONE left-anti join against the sink
    (replaces a SELECT per record, etl_sync.py:215-217)
  * FK resolution = broadcast join on zenput_location_id (replaces a
    scalar subquery per INSERT, etl_sync.py:240-241)
  * period assignment = broadcast range join with row_number()==1
    tie-break (replaces per-row BETWEEN … LIMIT 1, etl_sync.py:229-233)
  * location recovery = composite-key join on (date, supervisor)
    (etl_sync.py:280-293)
  * append sinks with deterministic surrogate keys via
    xxhash64(natural key) — idempotent under re-delivery.

Everything is parquet-append + left-anti here (no Delta in this
container); each sink function documents the Delta MERGE it would be
at production scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# J6 / T2 — idempotent dedup against the sink.
# ---------------------------------------------------------------------------
def dedup_against_sink(
    new_rows: DataFrame,
    existing: DataFrame | None,
    key: str = "zenput_submission_id",
    order_col: str | None = "fecha_supervision",
) -> DataFrame:
    """Drop rows whose natural key already exists in the sink, and
    in-batch duplicates. One anti-join — the set-wise form of the
    reference's per-row existence SELECT (etl_sync.py:215-217,
    276-278).

    In-batch survivor is DETERMINISTIC: earliest ``order_col`` (then
    the key itself as tie-break) wins, mirroring the reference's
    first-row-processed-wins loop. Pass ``order_col=None`` to fall
    back to arbitrary-survivor ``dropDuplicates`` when no stable
    ordering column exists."""
    if order_col is not None and order_col in new_rows.columns:
        w = Window.partitionBy(key).orderBy(
            F.asc_nulls_last(order_col), F.col(key)
        )
        batch_deduped = (
            new_rows.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        batch_deduped = new_rows.dropDuplicates([key])
    if existing is None:
        return batch_deduped
    return batch_deduped.join(
        existing.select(key).distinct(), key, "left_anti"
    )


# ---------------------------------------------------------------------------
# J5 — FK resolution via broadcast lookup join.
# ---------------------------------------------------------------------------
def resolve_sucursal_fk(
    rows: DataFrame, sucursales: DataFrame
) -> DataFrame:
    """Replace the scalar-subquery lookup (etl_sync.py:240-241) with a
    broadcast left join; unmatched locations keep NULL sucursal_id."""
    lookup = sucursales.select(
        F.col("id").alias("sucursal_id"), "zenput_location_id"
    )
    return rows.join(F.broadcast(lookup), "zenput_location_id", "left")


# ---------------------------------------------------------------------------
# J7 / T4 — period assignment range join.
# ---------------------------------------------------------------------------
def assign_periodo(
    rows: DataFrame,
    periodos: DataFrame,
    ts_col: str = "fecha_supervision",
) -> DataFrame:
    """Assign each row the period whose [fecha_inicio, fecha_fin]
    contains its date (etl_sync.py:229-233). Overlapping periods are
    disambiguated deterministically (earliest fecha_inicio, then id —
    the reference's LIMIT 1 picks an arbitrary one; we pin it).
    Periods dim is tiny → BroadcastNestedLoopJoin; the fact side never
    shuffles for the join itself."""
    p = periodos.select(
        F.col("id").alias("periodo_id"),
        "fecha_inicio",
        "fecha_fin",
    )
    d = F.col(ts_col).cast("date")
    joined = rows.join(
        F.broadcast(p),
        d.between(F.col("fecha_inicio"), F.col("fecha_fin")),
        "left",
    )
    w = Window.partitionBy("zenput_submission_id").orderBy(
        F.asc_nulls_last("fecha_inicio"), F.asc_nulls_last("periodo_id")
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fecha_inicio", "fecha_fin")
    )


# ---------------------------------------------------------------------------
# J8 — composite-key location recovery (security submissions missing
# location borrow it from a same-day same-supervisor operative row).
# ---------------------------------------------------------------------------
def recover_location(
    seguridad: DataFrame, operativas: DataFrame
) -> DataFrame:
    """etl_sync.py:280-293: for rows with NULL zenput_location_id,
    match an operative supervision on (DATE(fecha), supervisor) and
    borrow its location; LIMIT 1 → deterministic row_number pick."""
    donor = operativas.select(
        F.to_date("fecha_supervision").alias("__d"),
        F.col("supervisor").alias("__sup"),
        F.col("zenput_location_id").alias("__donor_loc"),
        F.col("zenput_submission_id").alias("__donor_id"),
    ).filter(F.col("__donor_loc").isNotNull())

    joined = seguridad.join(
        donor,
        (F.to_date(F.col("fecha_supervision")) == F.col("__d"))
        & (F.col("supervisor") == F.col("__sup")),
        "left",
    )
    w = Window.partitionBy("zenput_submission_id").orderBy(
        F.asc_nulls_last("__donor_id")
    )
    picked = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return picked.withColumn(
        "zenput_location_id",
        F.coalesce(F.col("zenput_location_id"), F.col("__donor_loc")),
    ).drop("__d", "__sup", "__donor_loc", "__donor_id", "__rn")


# ---------------------------------------------------------------------------
# S4/S5 — sinks. Parquet-append with anti-join idempotency; at
# production scale these are Delta `MERGE WHEN NOT MATCHED INSERT`.
# ---------------------------------------------------------------------------
def surrogate_id(natural_key) -> F.Column:
    """Deterministic surrogate key (replaces INSERT…RETURNING id,
    etl_sync.py:236-243): xxhash64 of the natural key — stable across
    retries, no driver-side sequence bottleneck at scale."""
    return F.xxhash64(natural_key)


def append_idempotent(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    prune_col: str | None = None,
) -> int:
    """S5 — idempotent append: left-anti against current sink contents
    then append (the parquet stand-in for Delta MERGE NOT MATCHED;
    reference ON CONFLICT DO NOTHING, etl_sync.py:250-254).
    Returns rows actually written.

    Scale note: without pruning, every batch anti-joins the FULL
    distinct sink key set — linear in sink size, which degrades as the
    sink grows. The reference only ever collides within recent
    extracts (etl_sync.py:215-217 checks keys from the current
    watermark window), so when ``prune_col`` names a monotone-ish
    column present in both batch and sink (e.g. fecha_supervision),
    the existing-keys scan is restricted to ``prune_col >= min(batch)``
    — a pushed-down parquet filter (row-group / partition pruning), so
    the anti-join build side stays O(batch window), not O(sink)."""
    to_write = df
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        if prune_col is not None and prune_col in df.columns:
            lo = df.agg(F.min(prune_col).alias("lo")).collect()[0]["lo"]
            if lo is not None:
                existing = existing.filter(F.col(prune_col) >= F.lit(lo))
        existing = existing.select(key).distinct()
        to_write = df.join(existing, key, "left_anti")
    to_write = to_write.cache()
    n = to_write.count()
    if n or not os.path.exists(path):
        # a zero-row first run still materializes the sink (schema-only
        # parquet): downstream readers see an empty TABLE, not a
        # PATH_NOT_FOUND — the contract a warehouse table has from its
        # first load, empty feed or not
        to_write.write.mode("append").parquet(path)
    to_write.unpersist()
    return n


def merge_upsert(
    sink: DataFrame, updates: DataFrame, key: str
) -> DataFrame:
    """Full MERGE semantics (WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED
    THEN INSERT — the reference's ON CONFLICT target state,
    etl_sync.py:250-254) expressed on immutable storage: one
    full-outer join on the key, update rows win column-wise via
    coalesce. The caller overwrites the sink with the result (Delta
    does this transactionally per file group; plain parquet rewrites
    the table — same result, coarser granularity).

    Shuffle profile: one exchange per side on the key — identical to
    what Delta MERGE's join executes underneath. For append-only
    no-update flows use the cheaper ``append_idempotent``.

    Contract: ``updates`` must be unique on ``key`` (like MERGE's
    source relation — duplicate source keys would multiply rows);
    dedup upstream with ``dedup_against_sink``/``dropDuplicates``."""
    cols = sink.columns
    assert set(updates.columns) == set(cols), "merge requires same schema"
    s = sink.alias("s")
    u = updates.alias("u")
    joined = s.join(u, F.col(f"s.{key}") == F.col(f"u.{key}"), "full_outer")
    # ROW-wise pick (UPDATE SET * semantics): a matched update replaces
    # the whole row, including columns it sets to NULL — a column-wise
    # coalesce would silently keep stale sink values there.
    take_update = F.col(f"u.{key}").isNotNull()
    return joined.select(
        *[
            F.when(take_update, F.col(f"u.{c}"))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in cols
        ]
    )


# ---------------------------------------------------------------------------
# T1 — checkpoint high-water mark.
# ---------------------------------------------------------------------------
def read_checkpoint(spark: SparkSession, path: str, formulario: str):
    """sync_checkpoints read (etl_sync.py:356-360): latest watermark
    for a form, None on first sync."""
    if not os.path.exists(path):
        return None
    cp = (
        spark.read.parquet(path)
        .filter(F.col("formulario") == formulario)
        .agg(F.max("ultima_fecha").alias("wm"))
        .collect()[0]["wm"]
    )
    return cp


def advance_checkpoint(
    spark: SparkSession, path: str, formulario: str, new_wm
) -> None:
    """Checkpoint advance (etl_sync.py:383-385) — append-latest-wins;
    readers take max()."""
    from epl_cas_etl_2026_spark.schemas import SYNC_CHECKPOINT_SCHEMA

    row = spark.createDataFrame(
        [(formulario, new_wm)], SYNC_CHECKPOINT_SCHEMA
    )
    row.write.mode("append").parquet(path)


# ---------------------------------------------------------------------------
# T7 — audit log.
# ---------------------------------------------------------------------------
def audit_log(
    spark: SparkSession,
    path: str,
    workflow: str,
    inicio,
    fin,
    registros_nuevos: int,
    estado: str,
) -> None:
    """sync_log row (etl_sync.py:367-372, 387-401). The reference
    writes 'running' then updates; an append-only log records the
    terminal state per run (same audit semantics, no UPDATE needed)."""
    from epl_cas_etl_2026_spark.schemas import SYNC_LOG_SCHEMA

    import zlib

    # Deterministic run id: Python's str hash() is salted per process
    # (PYTHONHASHSEED), which would make audit ids irreproducible
    # across runs; crc32 of the (workflow, inicio) pair is stable
    # everywhere, like xxhash64(natural key) on the data path.
    run_key = f"{workflow}|{inicio}".encode("utf-8")
    run_id = zlib.crc32(run_key) % (2**62)
    row = spark.createDataFrame(
        [
            (
                run_id,
                workflow,
                inicio,
                fin,
                registros_nuevos,
                estado,
            )
        ],
        SYNC_LOG_SCHEMA,
    )
    row.write.mode("append").parquet(path)


# ---------------------------------------------------------------------------
# T3 — backfill repair (--fix-seguridad).
# ---------------------------------------------------------------------------
def repair_scores(
    sink: DataFrame, re_extracted: DataFrame, key: str = "zenput_submission_id"
) -> DataFrame:
    """etl_sync.py:446-498: rows whose calificacion_general is NULL or
    0 take the re-extracted value; everything else unchanged. Batch
    overwrite semantics (Delta: MERGE WHEN MATCHED AND (c IS NULL OR
    c=0) THEN UPDATE)."""
    fresh = re_extracted.select(
        F.col(key),
        F.col("calificacion_general").alias("__fresh_score"),
    )
    needs_fix = F.col("calificacion_general").isNull() | (
        F.col("calificacion_general") == 0
    )
    return (
        sink.join(fresh, key, "left")
        .withColumn(
            "calificacion_general",
            F.when(
                needs_fix & F.col("__fresh_score").isNotNull(),
                F.col("__fresh_score"),
            ).otherwise(F.col("calificacion_general")),
        )
        .drop("__fresh_score")
    )


# ---------------------------------------------------------------------------
# T6 — period transition state machine.
# ---------------------------------------------------------------------------
def period_transition(
    periodos: DataFrame,
    supervisiones: DataFrame,
    sucursales: DataFrame,
) -> DataFrame:
    """etl_sync.py:504-566: when every active branch has a supervision
    in the active period, deactivate it and activate the next period
    by fecha_inicio. Returns the new periodos table (overwrite of an
    ~8-row dim — trivially cheap)."""
    total_branches = sucursales.filter(F.col("activo")).count()
    active = periodos.filter(F.col("activo") == True)  # noqa: E712
    if active.count() == 0:
        return periodos
    active_id = active.collect()[0]["id"]
    covered = (
        supervisiones.filter(F.col("periodo_id") == active_id)
        .select("sucursal_id")
        .distinct()
        .count()
    )
    if covered < total_branches:
        return periodos
    # W6: next period by fecha_inicio via lead() over the dim
    w = Window.orderBy("fecha_inicio")
    with_next = periodos.withColumn("__next_id", F.lead("id").over(w))
    next_row = with_next.filter(F.col("id") == active_id).collect()
    next_id = next_row[0]["__next_id"] if next_row else None
    if next_id is None:
        # reference etl_sync.py:550-553: completed but no later period
        # defined → return WITHOUT transitioning (active stays active).
        return periodos
    return periodos.withColumn(
        "activo",
        F.when(F.col("id") == active_id, F.lit(False))
        .when(F.col("id") == F.lit(next_id), F.lit(True))
        .otherwise(F.col("activo")),
    )


# ---------------------------------------------------------------------------
# Admin mutation (SURVEY.md §3.3): activate exactly one period.
# ---------------------------------------------------------------------------
def set_active_period(periodos: DataFrame, period_id: int) -> DataFrame:
    """app.py:165-183: `UPDATE periodos SET activo=false` then
    `SET activo=true WHERE id=:id`, as one conditional overwrite of the
    ~8-row dim (write back with overwrite mode; trivially cheap)."""
    return periodos.withColumn("activo", F.col("id") == F.lit(period_id))


def update_period_dates(
    periodos: DataFrame, period_id: int, fecha_inicio, fecha_fin
) -> DataFrame:
    """app.py:185-208: edit one period's date range."""
    return periodos.withColumn(
        "fecha_inicio",
        F.when(F.col("id") == period_id, F.lit(fecha_inicio).cast("date")).otherwise(
            F.col("fecha_inicio")
        ),
    ).withColumn(
        "fecha_fin",
        F.when(F.col("id") == period_id, F.lit(fecha_fin).cast("date")).otherwise(
            F.col("fecha_fin")
        ),
    )
