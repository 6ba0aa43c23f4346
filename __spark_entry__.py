"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``epl_cas_etl_2026_spark`` (see SURVEY.md §2
for the operator inventory each query re-expresses).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from epl_cas_etl_2026_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 Phase 0): rank nations by average
    customer balance — left-join-preserved empty dims, groupBy-avg,
    competition rank with NULLS-LAST unranked tail."""
    from epl_cas_etl_2026_spark.plans.relational import rank_nations_by_custbal

    return rank_nations_by_custbal(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops — driver then does a rows-only
    check)."""
    return dict(ORACLES)
