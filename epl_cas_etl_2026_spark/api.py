"""Reference-endpoint parity layer: every dashboard endpoint of the
reference app (app.py routes, SURVEY.md §3.1) re-expressed as ONE lazy
DataFrame graph over the reconstructed domain schema — the module a
reference user calls after switching engines.

Each function takes ``tables`` (a dict of domain DataFrames — from the
ETL sinks, ``sources.parquet.register_views``, or test fixtures) plus
the endpoint's query parameters, and returns a DataFrame. The
reference's N+1 round-trips, Python-side ranking/pivots, and f-string
SQL assembly (SURVEY §3.1 steps 2-4) collapse into single Catalyst
plans: dynamic parameters become conditional ``.filter`` chaining
(P10), the PLOG re-aggregation becomes a second groupBy over the same
base (A13 — no second query), ranking is a window (W1/W2), and the
heatmap pivot is ``pivot`` (A10).

Semantics preserved from the reference, trap-by-trap:

- outer joins keep zero-supervision groups/branches; period filters
  apply to the FACT side before the join (J2's ON-clause placement);
- ``activo`` dims filter everywhere (P3), ``COALESCE(clasificacion,
  'local')`` default (F8, app.py:719);
- averages are det_avg (decimal-exact, half-up 2dp) so results are
  reproducible across engines and partitionings;
- competition rank with tie gaps and a NULL-scored unranked tail
  (W1/W2, app.py:624-646);
- PLOG groups collapse into one 'PLOG' entity whose average is
  weighted over ALL member supervisions — explicitly not the mean of
  member averages (A13, app.py:65-89);
- the heatmap's per-group overall column IS the unweighted mean of
  its period averages (A11, app.py:1186-1189), and the 'EPL CAS' row
  is the unweighted mean over group averages per period (A12).

Scale: dims broadcast (20/86/29 rows); facts shuffle once per
aggregate grain; every ranking window is post-aggregation
(entity-grained) and guarded by competition_rank's row-count check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.functions.scalars import (
    bucket_counts,
    color_class,
    det_avg,
    pct_of,
    territorio,
)
from epl_cas_etl_2026_spark.operators.ranking import competition_rank
from epl_cas_etl_2026_spark.operators.reshape import pivot_matrix

FACT_TABLES = {
    "operativas": "supervisiones_operativas",
    "seguridad": "supervisiones_seguridad",
}

#: table-preview allowlist (P9, app.py:1310-1315)
PREVIEW_ALLOWLIST = frozenset(
    {
        "periodos_cas",
        "grupos_operativos",
        "sucursales",
        "supervisiones_operativas",
        "supervisiones_seguridad",
        "supervision_areas",
        "catalogo_areas",
        "seguridad_kpis",
        "catalogo_kpis_seguridad",
    }
)


def _fact(tables: dict, tipo: str, periodo_id: int | None) -> DataFrame:
    if tipo not in FACT_TABLES:
        raise ValueError(f"tipo must be one of {sorted(FACT_TABLES)}")
    f = tables[FACT_TABLES[tipo]]
    if periodo_id is not None:
        # filter the FACT side pre-join — the J2 ON-clause trap:
        # a post-join WHERE would drop zero-supervision dim rows
        f = f.filter(F.col("periodo_id") == periodo_id)
    return f


def _active(df: DataFrame) -> DataFrame:
    return df.filter(F.coalesce(F.col("activo"), F.lit(False)))


def ranking_grupos(
    tables: dict,
    tipo: str = "operativas",
    periodo_id: int | None = None,
    territorio_filtro: str | None = None,
) -> DataFrame:
    """GET /api/ranking/grupos/<tipo> (app.py:435-652).

    Columns: entidad, territorio, promedio, supervisiones, sucursales,
    posicion. PLOG-prefixed groups collapse into entity 'PLOG'
    (supervision-weighted — A13); posicion is competition rank with
    gaps, NULL for entities with no scored supervisions (W1/W2);
    ordering promedio DESC NULLS LAST, entidad ASC.
    """
    g = _active(tables["grupos_operativos"]).select(
        F.col("id").alias("grupo_id"),
        F.col("nombre").alias("grupo_nombre"),
        F.when(F.col("nombre").startswith("PLOG "), F.lit("PLOG"))
        .otherwise(F.col("nombre"))
        .alias("entidad"),
        territorio(F.col("nombre")).alias("territorio"),
    )
    if territorio_filtro is not None:
        g = g.filter(F.col("territorio") == territorio_filtro)
    s = _active(tables["sucursales"]).select(
        F.col("id").alias("sucursal_id"),
        F.col("grupo_operativo_id"),
    )
    f = _fact(tables, tipo, periodo_id).select(
        F.col("id").alias("sup_id"),
        F.col("sucursal_id").alias("f_sucursal_id"),
        F.col("calificacion_general"),
    )
    base = g.join(
        s, g.grupo_id == s.grupo_operativo_id, "left"
    ).join(f, s.sucursal_id == f.f_sucursal_id, "left")
    agg = base.groupBy("entidad").agg(
        F.min("territorio").alias("territorio"),
        det_avg(F.col("calificacion_general")).alias("promedio"),
        F.count("sup_id").cast("long").alias("supervisiones"),
        F.countDistinct("sucursal_id").cast("long").alias("sucursales"),
    )
    return competition_rank(
        agg, "promedio", tiebreak=[F.asc("entidad")]
    ).select(
        "entidad",
        "territorio",
        "promedio",
        "supervisiones",
        "sucursales",
        "posicion",
    )


def ranking_sucursales(
    tables: dict,
    tipo: str = "operativas",
    periodo_id: int | None = None,
    grupo_id: int | None = None,
    clasificacion: str | None = None,
) -> DataFrame:
    """GET /api/ranking/sucursales/<tipo> (app.py:666-756): dynamic
    optional filters (P10) over an outer join that preserves branches
    with zero supervisions; clasificacion NULL defaults to 'local'
    (F8, app.py:719)."""
    s = _active(tables["sucursales"]).select(
        F.col("id").alias("sucursal_id"),
        F.col("nombre").alias("sucursal"),
        "grupo_operativo_id",
        F.coalesce(F.col("clasificacion"), F.lit("local")).alias(
            "clasificacion"
        ),
    )
    if grupo_id is not None:
        s = s.filter(F.col("grupo_operativo_id") == grupo_id)
    if clasificacion is not None:
        s = s.filter(F.col("clasificacion") == clasificacion)
    g = _active(tables["grupos_operativos"]).select(
        F.col("id").alias("g_id"), F.col("nombre").alias("grupo")
    )
    f = _fact(tables, tipo, periodo_id).select(
        F.col("id").alias("sup_id"),
        F.col("sucursal_id").alias("f_sucursal_id"),
        "calificacion_general",
    )
    base = s.join(g, s.grupo_operativo_id == g.g_id, "inner").join(
        f, s.sucursal_id == f.f_sucursal_id, "left"
    )
    agg = base.groupBy("sucursal_id", "sucursal", "grupo", "clasificacion").agg(
        det_avg(F.col("calificacion_general")).alias("promedio"),
        F.count("sup_id").cast("long").alias("supervisiones"),
    )
    return competition_rank(
        agg, "promedio", tiebreak=[F.asc("sucursal")]
    ).select(
        "sucursal",
        "grupo",
        "clasificacion",
        "promedio",
        "supervisiones",
        "posicion",
    )


def heatmap_matrix(tables: dict, tipo: str = "operativas") -> DataFrame:
    """GET /api/analisis/heatmap (app.py:1135-1210): (grupo × periodo)
    densified matrix (J4) pivoted wide (A10), per-group overall =
    unweighted mean of period averages (A11), plus an 'EPL CAS' row =
    unweighted mean over group averages per period (A12). Period
    columns are the period codes, ordered by fecha_inicio."""
    g = _active(tables["grupos_operativos"]).select(
        F.col("id").alias("grupo_id"), F.col("nombre").alias("grupo")
    )
    p = tables["periodos_cas"].select(
        F.col("id").alias("periodo_id"),
        F.col("codigo"),
        F.col("fecha_inicio"),
    )
    s = _active(tables["sucursales"]).select(
        F.col("id").alias("sucursal_id"), "grupo_operativo_id"
    )
    f = tables[FACT_TABLES[tipo]].select(
        "sucursal_id", "periodo_id", "calificacion_general"
    )
    cell = (
        f.join(s, "sucursal_id")
        .join(g, s.grupo_operativo_id == g.grupo_id)
        .join(p, "periodo_id")
        .groupBy("grupo", "codigo")
        .agg(det_avg(F.col("calificacion_general")).alias("promedio"))
    )
    # J4 densification: EVERY active group appears, even with zero
    # supervisions anywhere — the reference builds the grid with a
    # CROSS JOIN (app.py:1141-1151) and hangs facts on it; a facts-only
    # matrix would silently drop never-supervised groups
    grid = g.select("grupo").crossJoin(p.select("codigo"))
    dense = grid.join(cell, ["grupo", "codigo"], "left")
    # EPL CAS row: unweighted mean over the group-averages per period
    # (groups WITH data that period — A12; NULL cells don't enter)
    epl = dense.groupBy("codigo").agg(
        det_avg(F.col("promedio")).alias("promedio")
    ).withColumn("grupo", F.lit("EPL CAS"))
    long_df = dense.unionByName(epl.select("grupo", "codigo", "promedio"))
    codes = [
        r.codigo
        for r in p.orderBy("fecha_inicio", "codigo").collect()
    ]
    wide = pivot_matrix(
        long_df, row_key="grupo", col_key="codigo",
        value_col="promedio", col_values=codes,
    )
    # per-group overall = unweighted mean of its period averages (A11);
    # a group with no data in any period keeps a NULL overall
    overall = long_df.groupBy("grupo").agg(
        det_avg(F.col("promedio")).alias("promedio_general")
    )
    return wide.join(overall, "grupo").orderBy("grupo")


def dashboard_stats(
    tables: dict, tipo: str = "operativas", periodo_id: int | None = None
) -> DataFrame:
    """GET /api/dashboard/stats (app.py:345-432): one-row scorecard —
    totals, coverage, deterministic 2dp average, and the 4-bucket
    performance distribution with percent-of-total (A6 + A14)."""
    f = _fact(tables, tipo, periodo_id)
    # lazy 1-row total cross-joined in (no driver-side count action,
    # and the plan snapshots the table at execution, not build, time)
    totals = _active(tables["sucursales"]).agg(
        F.count(F.lit(1)).cast("long").alias("sucursales_total")
    )
    agg = f.agg(
        F.count("id").cast("long").alias("total_supervisiones"),
        det_avg(F.col("calificacion_general")).alias("promedio_general"),
        F.countDistinct("sucursal_id")
        .cast("long")
        .alias("sucursales_supervisadas"),
        *bucket_counts(F.col("calificacion_general")),
    )
    return agg.crossJoin(totals).select(
        "*",
        pct_of(
            F.col("sucursales_supervisadas"),
            F.col("sucursales_total"),
        ).alias("cobertura_pct"),
    )


def map_markers(
    tables: dict, tipo: str = "operativas", periodo_id: int | None = None
) -> DataFrame:
    """GET /api/mapa/sucursales (app.py:1065-1130): branches with
    coordinates (P4 NULL filter), per-branch average + count, color
    class with the NULL guard (F1)."""
    s = (
        _active(tables["sucursales"])
        .filter(
            F.col("latitud").isNotNull() & F.col("longitud").isNotNull()
        )
        .select(
            F.col("id").alias("sucursal_id"),
            F.col("nombre").alias("sucursal"),
            F.col("latitud").alias("lat"),
            F.col("longitud").alias("lng"),
        )
    )
    f = _fact(tables, tipo, periodo_id).select(
        F.col("id").alias("sup_id"),
        F.col("sucursal_id").alias("f_sucursal_id"),
        "calificacion_general",
    )
    agg = (
        s.join(f, s.sucursal_id == f.f_sucursal_id, "left")
        .groupBy("sucursal_id", "sucursal", "lat", "lng")
        .agg(
            det_avg(F.col("calificacion_general")).alias("promedio"),
            F.count("sup_id").cast("long").alias("supervisiones"),
        )
    )
    return agg.select(
        "sucursal",
        "lat",
        "lng",
        "promedio",
        "supervisiones",
        color_class(F.col("promedio")).alias("color"),
    ).orderBy("sucursal")


def alerts(
    tables: dict, tipo: str = "operativas", periodo_id: int | None = None
) -> DataFrame:
    """GET /api/alertas (app.py:1215-1280): critical branches
    (avg < 70) and warning groups (70 <= avg < 80) — the A7 HAVING
    shape, labeled and unioned (U1)."""
    s = _active(tables["sucursales"]).select(
        F.col("id").alias("sucursal_id"),
        F.col("nombre").alias("s_nombre"),
        "grupo_operativo_id",
    )
    g = _active(tables["grupos_operativos"]).select(
        F.col("id").alias("g_id"), F.col("nombre").alias("g_nombre")
    )
    f = _fact(tables, tipo, periodo_id).select(
        "sucursal_id", "calificacion_general"
    )
    branch_avg = (
        f.join(s, "sucursal_id")
        .groupBy("sucursal_id", "s_nombre")
        .agg(det_avg(F.col("calificacion_general")).alias("promedio"))
    )
    critical = branch_avg.filter(F.col("promedio") < 70).select(
        F.lit("critico").alias("nivel"),
        F.col("s_nombre").alias("entidad"),
        F.col("promedio"),
    )
    group_avg = (
        f.join(s, "sucursal_id")
        .join(g, s.grupo_operativo_id == g.g_id)
        .groupBy("g_id", "g_nombre")
        .agg(det_avg(F.col("calificacion_general")).alias("promedio"))
    )
    warning = group_avg.filter(
        (F.col("promedio") >= 70) & (F.col("promedio") < 80)
    ).select(
        F.lit("advertencia").alias("nivel"),
        F.col("g_nombre").alias("entidad"),
        F.col("promedio"),
    )
    return critical.unionByName(warning).orderBy(
        "nivel", "promedio", "entidad"
    )


def branch_latest(
    tables: dict, sucursal_id: int, tipo: str = "operativas"
) -> DataFrame:
    """GET /api/sucursal/<id>/detalle — latest supervision (W4:
    row_number over fecha DESC, id DESC tie-break) with color class."""
    from pyspark.sql import Window

    f = tables[FACT_TABLES[tipo]].filter(
        F.col("sucursal_id") == sucursal_id
    )
    w = Window.partitionBy("sucursal_id").orderBy(
        F.desc("fecha_supervision"), F.desc("id")
    )
    return (
        f.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "id",
            "fecha_supervision",
            "supervisor",
            "calificacion_general",
            color_class(F.col("calificacion_general")).alias("color"),
        )
    )


def branch_trend(
    tables: dict, sucursal_id: int, tipo: str = "operativas", n: int = 4
) -> DataFrame:
    """Trend: last-n supervisions per branch reversed to chronological
    order (W5, app.py:938-960)."""
    from pyspark.sql import Window

    f = tables[FACT_TABLES[tipo]].filter(
        F.col("sucursal_id") == sucursal_id
    )
    w = Window.partitionBy("sucursal_id").orderBy(
        F.desc("fecha_supervision"), F.desc("id")
    )
    return (
        f.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(
            "id",
            "fecha_supervision",
            "calificacion_general",
            F.date_format("fecha_supervision", "dd/MM").alias("label"),
        )
        .orderBy("fecha_supervision", "id")
    )


def branch_areas(
    tables: dict, sucursal_id: int, tipo: str = "operativas"
) -> DataFrame:
    """Area breakdown of the latest supervision, catalog display order
    (J9, app.py:862-868)."""
    latest = branch_latest(tables, sucursal_id, tipo).select(
        F.col("id").alias("supervision_id")
    )
    areas = tables["supervision_areas"]
    cat = tables["catalogo_areas"]
    return (
        latest.join(areas, "supervision_id")
        .join(F.broadcast(cat), areas.area_id == cat.id)
        .select(
            "codigo",
            F.col("nombre").alias("area"),
            "porcentaje",
            "numero",
        )
        .orderBy("numero")
    )


def periodos_with_data(tables: dict, tipo: str = "operativas") -> DataFrame:
    """Periods having supervisions — the reference's GROUP-BY-all-cols
    dedup expressed as a left-semi join (A9, app.py:253-259)."""
    p = tables["periodos_cas"]
    f = tables[FACT_TABLES[tipo]].select("periodo_id")
    return (
        p.join(f, p.id == f.periodo_id, "left_semi")
        .select("id", "codigo", "nombre", "fecha_inicio", "fecha_fin")
        .orderBy(F.desc("fecha_inicio"))
    )


def health(spark: SparkSession) -> DataFrame:
    """GET /api/health (S8, app.py:1287)."""
    return spark.sql("SELECT 1 AS ok")


def preview(tables: dict, table_name: str, n: int = 100) -> DataFrame:
    """Admin table preview behind the P9 allowlist (app.py:1310-1318)."""
    if table_name not in PREVIEW_ALLOWLIST:
        raise ValueError(f"table not allowed: {table_name}")
    return tables[table_name].limit(n)


def set_periodo_activo(tables: dict, periodo_id: int) -> DataFrame:
    """POST /admin/set-periodo (§3.3, app.py:165-183): deactivate all
    periods, activate one — expressed as a single conditional overwrite
    of the 8-row dim (etl.pipeline.set_active_period). The caller
    persists the returned frame to the periodos sink; existence is
    validated here so a bad id fails loudly instead of deactivating
    everything."""
    from epl_cas_etl_2026_spark.etl.pipeline import set_active_period

    p = tables["periodos_cas"]
    if p.filter(F.col("id") == periodo_id).limit(1).count() == 0:
        raise ValueError(f"periodo {periodo_id} does not exist")
    return set_active_period(p, periodo_id)
