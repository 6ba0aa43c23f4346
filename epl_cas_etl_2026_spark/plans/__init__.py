"""Query plans: named (spark, sf_dir) -> DataFrame callables plus their
ANSI-SQL oracle twins (run by DuckDB over the same parquet).

``QUERIES`` / ``ORACLES`` aggregate every module's registry; the driver
contract (``__spark_entry__.py``) re-exports them.
"""

from epl_cas_etl_2026_spark.plans import extensions, lifecycle, relational

QUERIES = {**relational.QUERIES, **extensions.QUERIES, **lifecycle.QUERIES}
ORACLES = {**relational.ORACLES, **extensions.ORACLES, **lifecycle.ORACLES}

__all__ = ["QUERIES", "ORACLES"]
