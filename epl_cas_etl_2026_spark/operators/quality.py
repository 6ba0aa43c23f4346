"""Data-quality constraint checks (expectations-style) as single-pass
aggregations.

Each check is a Column aggregate producing a VIOLATION COUNT (0 = the
constraint holds), so an arbitrary list of checks over one table runs
as ONE scan + ONE aggregation row — no per-check scans. Referential
integrity is the only check that needs a second input, expressed as a
broadcast-able anti-join count.

At 100 TB this is the cheapest correct shape: all per-row checks share
a single pass (whole-stage codegen folds them into one loop), and the
FK check's anti-join shuffles only the violating side's keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null_violations(col: str) -> Column:
    return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(
        f"{col}__nulls"
    )


def range_violations(col: str, lo, hi) -> Column:
    c = F.col(col)
    return F.sum(
        F.when(c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)), 1).otherwise(0)
    ).alias(f"{col}__out_of_range")


def allowed_values_violations(col: str, allowed: list) -> Column:
    c = F.col(col)
    return F.sum(
        F.when(c.isNotNull() & ~c.isin(allowed), 1).otherwise(0)
    ).alias(f"{col}__bad_value")


def unique_violations(df: DataFrame, col: str) -> Column:
    """COUNT(*) - COUNT(DISTINCT col): number of surplus duplicate
    rows on the would-be key (0 = unique)."""
    return (F.count(F.lit(1)) - F.countDistinct(col)).alias(
        f"{col}__dup_rows"
    )


def check_constraints(df: DataFrame, checks: list[Column]) -> DataFrame:
    """Run every check in ONE aggregation pass; returns a single row
    of violation counts."""
    return df.agg(*checks)


def fk_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential integrity: child keys with no parent row — a
    left-anti join count (parent side broadcasts when small)."""
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(parent_keys, child_key, "left_anti")
        .agg(F.count(F.lit(1)).alias(f"{child_key}__orphans"))
    )
