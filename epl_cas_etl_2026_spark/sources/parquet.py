"""Parquet scan sources (SURVEY.md §2.1 S1).

At 100 TB the facts would live partitioned (by period / ship-date) so
partition pruning kicks in; here the driver testdata is one file per
table, and pushdown/pruning still applies at row-group level
(``spark.sql.parquet.filterPushdown``). Loaders are plain
``spark.read.parquet`` — schema comes from the footer; Catalyst prunes
columns (reference hand-writes its column lists — app.py:447-450 — our
equivalent is free via ColumnPruning).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from epl_cas_etl_2026_spark.schemas import TESTDATA_TABLES

# Tables whose parquet footers carry TIMESTAMP(NANOS) columns, which
# Spark's reader rejects by default (PARQUET_TYPE_ILLEGAL). We read
# them as int64 nanos (legacy conf) and truncate to a µs timestamp —
# the exact semantics DuckDB applies when it coerces ns → its µs
# TIMESTAMP, so the oracle comparison stays value-identical.
_NANOS_TS_TABLES = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (S1: full-table scan source)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _NANOS_TS_TABLES.get(name)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in nanos_cols:
            if isinstance(df.schema[c].dataType, LongType):
                # integer DIV keeps full int64 precision (a double
                # division would round above 2^53 ns ≈ 104 days)
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API (S6)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
