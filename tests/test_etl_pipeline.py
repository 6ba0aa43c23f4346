"""ETL pipeline tests (SURVEY.md §5 item 3): Zenput-shaped JSON
fixtures → extraction, dedup idempotency, period assignment, explode
counts, location imputation, repair, period transition."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.etl.pipeline import (
    append_idempotent,
    assign_periodo,
    dedup_against_sink,
    period_transition,
    recover_location,
    repair_scores,
    resolve_sucursal_fk,
)
from epl_cas_etl_2026_spark.etl.zenput import (
    extract_calificacion_general,
    extract_detail_items,
    parse_submissions,
)
from epl_cas_etl_2026_spark.schemas import (
    CATALOGO_SCHEMA,
    PERIODOS_SCHEMA,
)


def _submission(sid, loc="LOC-001", sup="Ana", date="2026-02-10T14:30:00Z",
                answers=None):
    return {
        "id": sid,
        "smetadata": {
            "location": {"id": loc} if loc else None,
            "created_by": {"display_name": sup},
            "date_submitted": date,
            "lat": 25.68,
            "lon": -100.31,
        },
        "answers": answers
        or [
            {"field_type": "formula", "title": "PORCENTAJE %", "value": "87.5"},
            {"field_type": "formula", "title": "CUARTO FRIO PORCENTAJE %", "value": "92.0"},
            {"field_type": "text", "title": "COMENTARIOS", "value": "ok"},
        ],
    }


@pytest.fixture()
def raw_feed(spark):
    subs = [
        _submission(1),
        _submission(2, answers=[
            # no plain 'PORCENTAJE %' → falls back to CALIFICACION variant
            {"field_type": "formula", "title": "CALIFICACION PORCENTAJE %", "value": "70.0"},
            {"field_type": "formula", "title": "FREIDORAS PORCENTAJE %", "value": "60.0"},
            # duplicate area title: first wins (etl_sync.py:155-156)
            {"field_type": "formula", "title": "FREIDORAS PORCENTAJE %", "value": "10.0"},
            # non-formula must be dropped
            {"field_type": "text", "title": "HORNOS PORCENTAJE %", "value": "99"},
        ]),
        _submission(3, loc=None, sup="Luis", date="2026-02-11T09:00:00Z"),
    ]
    return spark.createDataFrame(
        [(json.dumps(s),) for s in subs], "value string"
    )


def test_parse_and_score_extraction(spark, raw_feed):
    parsed = parse_submissions(raw_feed)
    assert parsed.count() == 3
    scores = {
        r["zenput_submission_id"]: r["calificacion_general"]
        for r in extract_calificacion_general(parsed).collect()
    }
    # F11 priority: 'PORCENTAJE %' first, else 'CALIFICACION PORCENTAJE %'
    assert scores["1"] == 87.5
    assert scores["2"] == 70.0


def test_detail_explode_first_wins(spark, raw_feed):
    parsed = parse_submissions(raw_feed)
    catalog = spark.createDataFrame(
        [(1, "CF", "CUARTO FRIO", 1), (2, "FR", "FREIDORAS", 2), (3, "HO", "HORNOS", 3)],
        CATALOGO_SCHEMA,
    )
    details = extract_detail_items(parsed, catalog)
    rows = {
        (r["zenput_submission_id"], r["codigo"]): r["porcentaje"]
        for r in details.collect()
    }
    assert rows[("1", "CF")] == 92.0
    assert rows[("2", "FR")] == 60.0  # first of the duplicate titles
    assert ("2", "HO") not in rows  # non-formula dropped


def test_dedup_idempotency(spark, raw_feed):
    parsed = parse_submissions(raw_feed)
    first = dedup_against_sink(parsed, None)
    assert first.count() == 3
    # re-delivery of the same feed against the sink → nothing new (T2)
    second = dedup_against_sink(parsed, existing=first)
    assert second.count() == 0
    # in-batch duplicates collapse
    doubled = parsed.unionAll(parsed)
    assert dedup_against_sink(doubled, None).count() == 3


def test_fk_resolution_and_period_assignment(spark, raw_feed):
    parsed = parse_submissions(raw_feed)
    sucursales = spark.createDataFrame(
        [(11, "Sucursal A", "LOC-001"), (12, "Sucursal B", "LOC-002")],
        "id int, nombre string, zenput_location_id string",
    )
    resolved = resolve_sucursal_fk(parsed, sucursales)
    by_id = {r["zenput_submission_id"]: r["sucursal_id"] for r in resolved.collect()}
    assert by_id["1"] == 11
    assert by_id["3"] is None  # missing location → NULL FK

    periodos = spark.createDataFrame(
        [
            (1, "P1", "Periodo 1", dt.date(2026, 1, 1), dt.date(2026, 1, 31), False),
            # overlapping periods — J7 LIMIT-1 trap: earliest inicio wins
            (2, "P2", "Periodo 2", dt.date(2026, 2, 1), dt.date(2026, 2, 28), True),
            (3, "P3", "Periodo 3", dt.date(2026, 2, 10), dt.date(2026, 3, 10), False),
        ],
        PERIODOS_SCHEMA,
    )
    assigned = assign_periodo(resolved, periodos)
    periods = {r["zenput_submission_id"]: r["periodo_id"] for r in assigned.collect()}
    assert periods["1"] == 2  # 2026-02-10 is in P2 and P3 → P2 (earlier inicio)
    assert assigned.count() == 3  # no row duplication from the overlap


def test_location_recovery_composite_key(spark):
    # J8 (etl_sync.py:280-293)
    seguridad = spark.createDataFrame(
        [
            ("s1", None, "Ana", dt.datetime(2026, 2, 10, 16, 0)),
            ("s2", "LOC-009", "Luis", dt.datetime(2026, 2, 11, 10, 0)),
        ],
        "zenput_submission_id string, zenput_location_id string, supervisor string, fecha_supervision timestamp",
    )
    operativas = spark.createDataFrame(
        [
            ("o1", "LOC-001", "Ana", dt.datetime(2026, 2, 10, 9, 0)),
            ("o2", "LOC-002", "Ana", dt.datetime(2026, 2, 10, 11, 0)),
        ],
        "zenput_submission_id string, zenput_location_id string, supervisor string, fecha_supervision timestamp",
    )
    recovered = recover_location(seguridad, operativas)
    locs = {r["zenput_submission_id"]: r["zenput_location_id"] for r in recovered.collect()}
    assert locs["s1"] == "LOC-001"  # deterministic pick (lowest donor id)
    assert locs["s2"] == "LOC-009"  # existing location untouched
    assert recovered.count() == 2


def test_append_idempotent_sink(spark, tmp_path, raw_feed):
    # S5/T2: run the load twice → same sink contents.
    path = str(tmp_path / "sink.parquet")
    parsed = parse_submissions(raw_feed).drop("answers")
    n1 = append_idempotent(spark, parsed, path, "zenput_submission_id")
    n2 = append_idempotent(spark, parsed, path, "zenput_submission_id")
    assert n1 == 3 and n2 == 0
    assert spark.read.parquet(path).count() == 3


def test_repair_scores_null_and_zero(spark):
    # T3 (etl_sync.py:446-498)
    sink = spark.createDataFrame(
        [("a", None), ("b", 0.0), ("c", 88.0)],
        "zenput_submission_id string, calificacion_general double",
    )
    fresh = spark.createDataFrame(
        [("a", 91.0), ("b", 72.0), ("c", 10.0)],
        "zenput_submission_id string, calificacion_general double",
    )
    fixed = {r["zenput_submission_id"]: r["calificacion_general"]
             for r in repair_scores(sink, fresh).collect()}
    assert fixed == {"a": 91.0, "b": 72.0, "c": 88.0}  # c untouched


def test_period_transition(spark):
    # T6 (etl_sync.py:504-566)
    periodos = spark.createDataFrame(
        [
            (1, "P1", "Periodo 1", dt.date(2026, 1, 1), dt.date(2026, 1, 31), True),
            (2, "P2", "Periodo 2", dt.date(2026, 2, 1), dt.date(2026, 2, 28), False),
        ],
        PERIODOS_SCHEMA,
    )
    sucursales = spark.createDataFrame(
        [(1, True), (2, True)], "id int, activo boolean"
    )
    full_coverage = spark.createDataFrame(
        [(1, 1), (2, 1)], "sucursal_id int, periodo_id int"
    )
    out = {r["id"]: r["activo"] for r in
           period_transition(periodos, full_coverage, sucursales).collect()}
    assert out == {1: False, 2: True}

    partial = spark.createDataFrame([(1, 1)], "sucursal_id int, periodo_id int")
    out2 = {r["id"]: r["activo"] for r in
            period_transition(periodos, partial, sucursales).collect()}
    assert out2 == {1: True, 2: False}  # not all covered → no transition


def test_run_incremental_sync_end_to_end(spark, tmp_path):
    """The full run_sync lifecycle (SURVEY.md §3.2): load → re-run is a
    no-op (T2) → late data after the watermark loads incrementally →
    audit rows accumulate."""
    from epl_cas_etl_2026_spark.etl.sync_job import run_incremental_sync

    landing = tmp_path / "landing"
    landing.mkdir()
    wh = str(tmp_path / "wh")
    (landing / "p0.jsonl").write_text(
        "\n".join(json.dumps(_submission(i)) for i in (1, 2)) + "\n"
    )
    sucursales = spark.createDataFrame(
        [(10, "Centro", "1", "NL", "MTY", 1, True, "local", 25.0, -100.0, "LOC-001")],
        schema=__import__("epl_cas_etl_2026_spark.schemas", fromlist=["SUCURSALES_SCHEMA"]).SUCURSALES_SCHEMA,
    )
    periodos = spark.createDataFrame(
        [(1, "P1", "Periodo 1", dt.date(2026, 2, 1), dt.date(2026, 2, 28), True)],
        schema=PERIODOS_SCHEMA,
    )
    catalog = spark.createDataFrame(
        [(1, "CF", "CUARTO FRIO", 1), (2, "FR", "FREIDORAS", 2)],
        schema=CATALOGO_SCHEMA,
    )

    n1 = run_incremental_sync(spark, str(landing), wh, sucursales, periodos, catalog)
    assert n1 == 2
    master = spark.read.parquet(f"{wh}/supervisiones_operativas")
    assert master.count() == 2
    row = master.filter(F.col("zenput_submission_id") == "1").collect()[0]
    assert row["sucursal_id"] == 10 and row["periodo_id"] == 1
    assert row["calificacion_general"] == 87.5

    # idempotency: same landing content → nothing new
    n2 = run_incremental_sync(spark, str(landing), wh, sucursales, periodos, catalog)
    assert n2 == 0
    assert spark.read.parquet(f"{wh}/supervisiones_operativas").count() == 2

    # a later submission arrives → only it loads (watermark filter)
    (landing / "p1.jsonl").write_text(
        json.dumps(_submission(7, date="2026-02-12T10:00:00Z")) + "\n"
    )
    n3 = run_incremental_sync(spark, str(landing), wh, sucursales, periodos, catalog)
    assert n3 == 1
    assert spark.read.parquet(f"{wh}/supervisiones_operativas").count() == 3

    audit = spark.read.parquet(f"{wh}/sync_log")
    assert audit.count() == 3
    assert {r["estado"] for r in audit.collect()} == {"success"}


def test_admin_period_mutations(spark):
    from epl_cas_etl_2026_spark.etl.pipeline import (
        set_active_period,
        update_period_dates,
    )

    periodos = spark.createDataFrame(
        [
            (1, "P1", "Uno", dt.date(2026, 1, 1), dt.date(2026, 1, 31), True),
            (2, "P2", "Dos", dt.date(2026, 2, 1), dt.date(2026, 2, 28), False),
        ],
        schema=PERIODOS_SCHEMA,
    )
    out = {r["id"]: r for r in set_active_period(periodos, 2).collect()}
    assert out[1]["activo"] is False and out[2]["activo"] is True

    edited = {
        r["id"]: r
        for r in update_period_dates(
            periodos, 2, "2026-02-05", "2026-03-05"
        ).collect()
    }
    assert edited[2]["fecha_inicio"] == dt.date(2026, 2, 5)
    assert edited[2]["fecha_fin"] == dt.date(2026, 3, 5)
    assert edited[1]["fecha_inicio"] == dt.date(2026, 1, 1)  # untouched


# ---------------------------------------------------------------------------
# Round-2 semantic pins (ADVICE round 1).
# ---------------------------------------------------------------------------
def test_score_first_answer_wins_over_title_priority(spark):
    # reference etl_sync.py:167-176 iterates answers IN ORDER, checking
    # each against BOTH accepted titles — so a CALIFICACION variant
    # appearing before the plain 'PORCENTAJE %' wins.
    subs = [
        _submission(9, answers=[
            {"field_type": "formula", "title": "CALIFICACION PORCENTAJE %", "value": "55.0"},
            {"field_type": "formula", "title": "PORCENTAJE %", "value": "88.0"},
        ])
    ]
    feed = spark.createDataFrame([(json.dumps(s),) for s in subs], "value string")
    scores = {
        r["zenput_submission_id"]: r["calificacion_general"]
        for r in extract_calificacion_general(parse_submissions(feed)).collect()
    }
    assert scores["9"] == 55.0


def test_null_valued_answer_does_not_suppress_later_valid(spark):
    # reference extract_areas skips value=None (etl_sync.py:150-152)
    # BEFORE first-wins dedup: a null-valued first answer must not
    # shadow a later valid answer for the same code.
    subs = [
        _submission(9, answers=[
            {"field_type": "formula", "title": "FREIDORAS PORCENTAJE %", "value": None},
            {"field_type": "formula", "title": "FREIDORAS PORCENTAJE %", "value": "42.0"},
        ])
    ]
    feed = spark.createDataFrame([(json.dumps(s),) for s in subs], "value string")
    catalog = spark.createDataFrame(
        [(2, "FR", "FREIDORAS", 2)], CATALOGO_SCHEMA
    )
    details = extract_detail_items(parse_submissions(feed), catalog)
    rows = {
        (r["zenput_submission_id"], r["codigo"]): r["porcentaje"]
        for r in details.collect()
    }
    assert rows[("9", "FR")] == 42.0


def test_period_transition_no_next_period(spark):
    # reference etl_sync.py:550-553: active period complete but no
    # later period defined → return WITHOUT transitioning.
    periodos = spark.createDataFrame(
        [
            (1, "P1", "Uno", dt.date(2026, 1, 1), dt.date(2026, 1, 31), False),
            (2, "P2", "Dos", dt.date(2026, 2, 1), dt.date(2026, 2, 28), True),
        ],
        PERIODOS_SCHEMA,
    )
    sucursales = spark.createDataFrame(
        [(1, True), (2, True)], "id int, activo boolean"
    )
    full_coverage = spark.createDataFrame(
        [(1, 2), (2, 2)], "sucursal_id int, periodo_id int"
    )
    out = {r["id"]: r["activo"] for r in period_transition(
        periodos, full_coverage, sucursales
    ).collect()}
    assert out == {1: False, 2: True}  # unchanged — P2 stays active


def test_dedup_deterministic_survivor(spark):
    # in-batch duplicates: earliest fecha_supervision wins (stable),
    # not an arbitrary dropDuplicates pick.
    rows = spark.createDataFrame(
        [
            ("k1", dt.datetime(2026, 2, 11, 10, 0), "late"),
            ("k1", dt.datetime(2026, 2, 10, 9, 0), "early"),
            ("k2", dt.datetime(2026, 2, 12, 8, 0), "only"),
        ],
        "zenput_submission_id string, fecha_supervision timestamp, tag string",
    )
    out = {
        r["zenput_submission_id"]: r["tag"]
        for r in dedup_against_sink(rows, None).collect()
    }
    assert out == {"k1": "early", "k2": "only"}


def test_audit_run_id_deterministic(spark, tmp_path):
    from epl_cas_etl_2026_spark.etl.pipeline import audit_log

    inicio = dt.datetime(2026, 2, 10, 12, 0)
    fin = dt.datetime(2026, 2, 10, 12, 5)
    p1, p2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    audit_log(spark, p1, "operativas", inicio, fin, 10, "success")
    audit_log(spark, p2, "operativas", inicio, fin, 10, "success")
    id1 = spark.read.parquet(p1).collect()[0]["id"]
    id2 = spark.read.parquet(p2).collect()[0]["id"]
    assert id1 == id2  # crc32-based, not salted Python hash()


def test_append_idempotent_prunes_sink_scan(spark, tmp_path):
    from epl_cas_etl_2026_spark.etl.pipeline import append_idempotent

    path = str(tmp_path / "sink")
    batch1 = spark.createDataFrame(
        [("a", dt.datetime(2026, 2, 1)), ("b", dt.datetime(2026, 2, 2))],
        "k string, fecha_supervision timestamp",
    )
    assert append_idempotent(spark, batch1, path, "k", prune_col="fecha_supervision") == 2
    batch2 = spark.createDataFrame(
        [("b", dt.datetime(2026, 2, 2)), ("c", dt.datetime(2026, 2, 3))],
        "k string, fecha_supervision timestamp",
    )
    # plan assertion: the sink scan must carry a pushed-down filter on
    # the prune column so the anti-join build side is O(batch window)
    existing = spark.read.parquet(path).filter(
        F.col("fecha_supervision") >= dt.datetime(2026, 2, 2)
    )
    plan = existing._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "fecha_supervision" in plan
    assert append_idempotent(spark, batch2, path, "k", prune_col="fecha_supervision") == 1
    assert spark.read.parquet(path).count() == 3


def test_merge_upsert_row_semantics(spark):
    from epl_cas_etl_2026_spark.etl.pipeline import merge_upsert

    sink = spark.createDataFrame(
        [("a", 1.0, "keep"), ("b", 2.0, "old")],
        "k string, score double, note string",
    )
    updates = spark.createDataFrame(
        [("b", None, "new"), ("c", 3.0, "ins")],
        "k string, score double, note string",
    )
    out = {r["k"]: (r["score"], r["note"]) for r in merge_upsert(sink, updates, "k").collect()}
    assert out["a"] == (1.0, "keep")        # untouched
    assert out["b"] == (None, "new")        # WHOLE row replaced (null kept)
    assert out["c"] == (3.0, "ins")         # inserted


def test_quality_checks_count_violations(spark):
    from epl_cas_etl_2026_spark.operators.quality import (
        allowed_values_violations,
        check_constraints,
        fk_violations,
        not_null_violations,
        range_violations,
        unique_violations,
    )

    df = spark.createDataFrame(
        [(1, "O", 10.0), (1, "X", -5.0), (2, None, 200.0), (None, "F", 50.0)],
        "id int, status string, amount double",
    )
    row = check_constraints(
        df,
        [
            not_null_violations("id"),
            unique_violations(df, "id"),
            allowed_values_violations("status", ["O", "F"]),
            range_violations("amount", 0, 100),
        ],
    ).collect()[0]
    assert row["id__nulls"] == 1
    assert row["id__dup_rows"] == 2  # 4 rows (1 null excluded by countDistinct... see below
    assert row["status__bad_value"] == 1
    assert row["amount__out_of_range"] == 2

    parent = spark.createDataFrame([(1,)], "pid int")
    orphans = fk_violations(df, "id", parent, "pid").collect()[0]
    assert orphans["id__orphans"] == 1  # id=2 has no parent; nulls skipped


def test_sync_error_path_audits_and_reraises(spark, tmp_path):
    import pytest as _pytest

    from epl_cas_etl_2026_spark.etl.sync_job import run_incremental_sync
    from epl_cas_etl_2026_spark.schemas import CATALOGO_SCHEMA

    wh = str(tmp_path / "wh")
    sucursales = spark.createDataFrame(
        [(1, "S", "L1", True)],
        "id int, nombre string, zenput_location_id string, activo boolean",
    )
    periodos = spark.createDataFrame(
        [(1, "P1", "Uno", dt.date(2026, 1, 1), dt.date(2026, 12, 31), True)],
        PERIODOS_SCHEMA,
    )
    catalog = spark.createDataFrame([(1, "CF", "CUARTO FRIO", 1)], CATALOGO_SCHEMA)
    # nonexistent landing dir → the read fails; the job must still
    # write an 'error' audit row and re-raise for the scheduler
    # (reference etl_sync.py:397-404)
    with _pytest.raises(Exception):
        run_incremental_sync(
            spark, str(tmp_path / "missing"), wh, sucursales, periodos, catalog
        )
    audit = spark.read.parquet(f"{wh}/sync_log").collect()
    assert len(audit) == 1 and audit[0]["estado"] == "error"
    assert audit[0]["registros_nuevos"] == 0


def test_submission_without_answers_survives(spark):
    # reference uses sub.get('answers', []) — a missing/null answers
    # array must not drop the submission from the master load, just
    # leave its score null and emit no detail rows
    sub = {
        "id": 42,
        "smetadata": {
            "location": {"id": "LOC-001"},
            "created_by": {"display_name": "Ana"},
            "date_submitted": "2026-02-10T14:30:00Z",
            "lat": 1.0,
            "lon": 2.0,
        },
        # no "answers" key at all
    }
    feed = spark.createDataFrame([(json.dumps(sub),)], "value string")
    parsed = parse_submissions(feed)
    assert parsed.count() == 1
    scored = extract_calificacion_general(parsed).collect()
    assert scored[0]["calificacion_general"] is None
    catalog = spark.createDataFrame([(1, "CF", "CUARTO FRIO", 1)], CATALOGO_SCHEMA)
    assert extract_detail_items(parsed, catalog).count() == 0


def test_parse_quarantine_routes_malformed_rows(spark):
    from epl_cas_etl_2026_spark.etl.zenput import (
        parse_submissions_with_quarantine,
    )

    good_doc = (
        '{"id": 7, "smetadata": {"location": {"id": "L1"},'
        ' "created_by": {"display_name": "Ana"},'
        ' "date_submitted": "2026-03-01T10:00:00", "lat": 1.0, "lon": 2.0},'
        ' "answers": []}'
    )
    rows = [
        (good_doc,),
        ("{not json at all",),            # syntactically broken
        ('{"answers": []}',),             # valid JSON, no natural key
    ]
    raw = spark.createDataFrame(rows, "value string")
    good, quarantine = parse_submissions_with_quarantine(raw)
    g = good.collect()
    q = quarantine.collect()
    assert [r.zenput_submission_id for r in g] == ["7"]
    assert g[0].supervisor == "Ana"
    assert len(q) == 2 and all(r.raw_json for r in q)


def test_append_idempotent_zero_row_first_run_materializes_sink(spark, tmp_path):
    """An empty first load must still create the sink table (schema-only
    parquet): downstream readers get an empty table, not PATH_NOT_FOUND
    (empty-input sweep, round 4)."""
    from epl_cas_etl_2026_spark.etl.pipeline import append_idempotent

    path = str(tmp_path / "sink")
    empty = spark.createDataFrame([], "k long, v string")
    assert append_idempotent(spark, empty, path, "k") == 0
    out = spark.read.parquet(path)
    assert out.count() == 0 and set(out.columns) == {"k", "v"}
    # and a later non-empty append still works against the empty sink
    rows = spark.createDataFrame([(1, "a")], "k long, v string")
    assert append_idempotent(spark, rows, path, "k") == 1
    assert spark.read.parquet(path).count() == 1
