"""epl_cas_etl_2026_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system RDG-CONSULTORES/epl-cas-etl-2026 (a
restaurant-supervision ETL + dashboard whose relational semantics live in
PostgreSQL SQL strings + Python glue; see SURVEY.md).

Design principles (SURVEY.md §7):
  * DataFrame / Spark SQL only — declare logical plans, let Catalyst pick
    physical strategies (broadcast joins for dims, hash aggs, top-k).
  * Expression-returning Python functions instead of UDFs so everything
    stays inside whole-stage codegen.
  * Facts partitioned by period / date; dims broadcast; AQE enabled.
  * Every operator also SQL-expressible so a DuckDB oracle can verify it.
"""

__version__ = "0.1.0"

from epl_cas_etl_2026_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
