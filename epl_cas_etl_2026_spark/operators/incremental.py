"""Incremental aggregate maintenance (materialized-rollup updates).

A rollup over an append-only fact stream never needs to re-scan
history if its aggregates are MERGEABLE: keep (sum, count, min, max)
per key as the stored state, aggregate only the new batch, and merge
state ⊎ delta with one union + one groupBy of (existing keys + batch
keys) rows. Derived stats (avg = sum/count) are computed at read.

This is the batch form of what Structured Streaming's state store
does for streaming aggregations — and the reason the engine keeps
exact decimal sums for money columns: decimal sums merge exactly, so
an incrementally-maintained rollup is bit-identical to a full
recompute (proven by the driver-gated ``orders_incremental_rollup``
query, whose oracle recomputes the rollup directly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Snapshot diff — the data-ops primitive behind reconciliation
    and CDC backfills: one full-outer join on the key classifies every
    row as added / removed / changed / unchanged (changed = any
    compare column differs, null-safe). Returns one count row.
    Shuffle profile: one exchange per side on the key."""
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def partial_aggs(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str = "n_rows",
) -> DataFrame:
    """Aggregate a batch into mergeable per-key state: exact decimal
    sums + row count. One shuffle (partial+final hash agg)."""
    aggs = [
        F.sum(F.col(c).cast("decimal(27,6)")).alias(f"sum_{c}")
        for c in sum_cols
    ]
    aggs.append(F.count(F.lit(1)).alias(count_alias))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggs(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_alias: str = "n_rows",
) -> DataFrame:
    """state ⊎ delta: union the two per-key state frames and re-sum.
    Cost is O(|state keys| + |delta keys|) — independent of history
    size. Associative and commutative: merge order never matters."""
    cols = [c for c in state.columns if c not in keys]
    assert state.columns == delta.columns, "state/delta schema mismatch"
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in cols])
    )
