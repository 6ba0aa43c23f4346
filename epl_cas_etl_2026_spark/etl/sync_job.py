"""End-to-end incremental sync job (SURVEY.md §3.2 — the reference's
``run_sync()`` entry point, etl_sync.py:341-404, rebuilt set-wise).

One call = one sync run:

  1. read the checkpoint high-water mark (T1)
  2. read landing JSONL, keep records newer than the watermark
  3. parse nested JSON → typed rows (S9), extract the overall score (F11)
  4. dedup against the sink on the natural key (J6/T2)
  5. resolve the branch FK via broadcast lookup (J5)
  6. recover missing locations from sibling rows (J8) when a donor
     frame is given (the security-form flow)
  7. assign the calendar period via the range join (J7/T4)
  8. append master + exploded detail rows idempotently (S4/S5)
  9. advance the checkpoint, write the audit row (T7); on error the
     audit records 'error' and the exception re-raises so an external
     scheduler alerts (reference etl_sync.py:397-404)

Every step is a set operation over the whole batch — where the
reference paid one Postgres round-trip per record, this pays one Spark
job per sink. At 100 TB of landed JSON, the landing read partitions by
file and everything downstream shuffles only at the dedup anti-join
and detail groupBys.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.etl.pipeline import (
    advance_checkpoint,
    append_idempotent,
    assign_periodo,
    audit_log,
    dedup_against_sink,
    read_checkpoint,
    recover_location,
    resolve_sucursal_fk,
    surrogate_id,
)
from epl_cas_etl_2026_spark.etl.zenput import (
    extract_calificacion_general,
    extract_detail_items,
    parse_submissions,
)


def run_incremental_sync(
    spark: SparkSession,
    landing_dir: str,
    warehouse_dir: str,
    sucursales: DataFrame,
    periodos: DataFrame,
    catalog: DataFrame,
    formulario: str = "operativas",
    donor_master: DataFrame | None = None,
) -> int:
    """Run one incremental sync; returns rows newly loaded.

    ``donor_master`` enables the J8 location-recovery pass (security
    submissions borrowing a location from same-day same-supervisor
    operative rows).
    """
    master_path = os.path.join(warehouse_dir, f"supervisiones_{formulario}")
    detail_path = os.path.join(warehouse_dir, f"detalle_{formulario}")
    ckpt_path = os.path.join(warehouse_dir, "sync_checkpoints")
    audit_path = os.path.join(warehouse_dir, "sync_log")

    inicio = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    try:
        watermark = read_checkpoint(spark, ckpt_path, formulario)

        raw = spark.read.text(landing_dir)
        subs = parse_submissions(raw)
        if watermark is not None:
            subs = subs.filter(F.col("fecha_supervision") > F.lit(watermark))

        scored = subs.join(
            extract_calificacion_general(subs), "zenput_submission_id", "left"
        )

        existing = (
            spark.read.parquet(master_path)
            if os.path.exists(master_path)
            else None
        )
        fresh = dedup_against_sink(scored, existing)

        if donor_master is not None:
            fresh = recover_location(fresh, donor_master)
        fresh = resolve_sucursal_fk(fresh, sucursales)
        fresh = assign_periodo(fresh, periodos)

        # Pin the batch BEFORE mutating the sink. A plain persist() is
        # NOT enough: Spark's append command refreshes the file-status
        # cache for master_path and invalidates every cached plan that
        # reads it — including `fresh`, whose dedup anti-join scans the
        # master sink. The post-append recompute would then see the
        # batch's own keys already in the sink (read-your-own-writes)
        # and silently drop every detail row. localCheckpoint truncates
        # the lineage so downstream stages reuse the materialized batch
        # regardless of sink mutations. At production scale the
        # equivalent is a staging write or Delta MERGE, which snapshots
        # the sink version instead.
        fresh = fresh.localCheckpoint(eager=True)

        master = fresh.select(
            surrogate_id(F.col("zenput_submission_id")).alias("id"),
            "zenput_submission_id",
            "sucursal_id",
            "periodo_id",
            "supervisor",
            "fecha_supervision",
            "calificacion_general",
            F.col("lat_entrega"),
            F.col("lon_entrega"),
        )
        # prune_col: collisions only ever come from the current extract
        # window (etl_sync.py:215-217), so the sink-side key scan is
        # restricted to the batch's date range — a pushed parquet
        # filter keeps the anti-join build side O(batch), not O(sink)
        n_new = append_idempotent(
            spark,
            master,
            master_path,
            "zenput_submission_id",
            prune_col="fecha_supervision",
        )

        details = extract_detail_items(fresh, catalog).select(
            surrogate_id(F.col("zenput_submission_id")).alias("supervision_id"),
            "item_id",
            "porcentaje",
            F.concat_ws(
                "|", "zenput_submission_id", F.col("item_id").cast("string")
            ).alias("__detail_key"),
        )
        append_idempotent(spark, details, detail_path, "__detail_key")

        new_wm = subs.agg(F.max("fecha_supervision")).collect()[0][0]
        if new_wm is not None:
            advance_checkpoint(spark, ckpt_path, formulario, new_wm)

        fin = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        audit_log(spark, audit_path, formulario, inicio, fin, n_new, "success")
        return n_new
    except Exception:
        fin = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        audit_log(spark, audit_path, formulario, inicio, fin, 0, "error")
        raise
