"""Ranking operators (SURVEY.md §2.5 W1-W3, §2.6 O1).

The reference computes ranking in Python after ORDER BY
(app.py:624-638, 729-742): competition rank ("1,1,3" — ties share a
position, the counter still advances, so gaps follow ties), NULLS-LAST
ordering with an *unranked* NULL tail (rows with no score get
posicion = NULL and sort after every ranked row — app.py:456, 640-646),
and intra-group nested rank (app.py:566-586).

Here each is a native window function. Ranking always runs on the
*post-aggregation* frame (entity-level cardinality: 20 groups / 86
branches in the reference), so the single-partition window is applied
to a frame that is already tiny relative to the fact scan — at 100 TB
the expensive part stays the distributed groupBy, not this window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Above this many input rows, an unpartitioned competition_rank —
#: whose WindowExec collapses everything onto ONE task — refuses to
#: run; callers must use two_phase_competition_rank instead. The
#: dashboard shapes rank post-aggregation entities (≤ thousands), so
#: the guard never fires there; it exists to stop a fact-grained frame
#: from silently serializing on a single partition.
MAX_GLOBAL_WINDOW_ROWS = 100_000


def competition_rank(
    df: DataFrame,
    score_col: str,
    rank_col: str = "posicion",
    tiebreak: Sequence[Column] | None = None,
    partition_by: Sequence[str] | None = None,
    max_rows_guard: int | None = MAX_GLOBAL_WINDOW_ROWS,
) -> DataFrame:
    """W1 + W2 — competition rank, NULLS LAST, unranked NULL tail.

    Exactly matches the reference's Python loop (app.py:624-638): equal
    scores share a position, gaps appear after ties (RANK, not
    DENSE_RANK), and NULL scores get ``posicion = NULL`` rather than a
    rank (app.py:640-646 appends them unranked).

    ``tiebreak`` orders *display only* — the reference ranks purely on
    the score (ties share), then orders ties by name (app.py:456).

    With no ``partition_by`` the window is single-partition by design
    (global rank) — safe only post-aggregation. ``max_rows_guard``
    embeds a zero-cost runtime check in the same window pass (an extra
    row_number over the sort the rank already pays for) that fails the
    job if a fact-grained frame ever reaches this operator; those must
    use :func:`two_phase_competition_rank`. Set ``None`` to disable.
    """
    w = Window.orderBy(F.desc_nulls_last(score_col))
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(F.desc_nulls_last(score_col))
    rank_expr = F.when(
        F.col(score_col).isNotNull(), F.rank().over(w).cast("long")
    )
    if partition_by is None and max_rows_guard is not None:
        rank_expr = F.when(
            F.row_number().over(w) > max_rows_guard,
            F.raise_error(
                F.lit(
                    "competition_rank: unpartitioned window exceeded "
                    f"{max_rows_guard} rows and would serialize on one "
                    "task — use two_phase_competition_rank"
                )
            ).cast("long"),
        ).otherwise(rank_expr)
    ranked = df.withColumn(rank_col, rank_expr)
    order = [F.desc_nulls_last(score_col)]
    if tiebreak:
        order.extend(tiebreak)
    return ranked.orderBy(*order)


def two_phase_competition_rank(
    df: DataFrame,
    score_col: str,
    rank_col: str = "posicion",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Scalable GLOBAL competition rank — no single-partition
    WindowExec anywhere.

    Phase 1: ``repartitionByRange`` on the score (descending, NULLS
    LAST) — equal scores co-locate, so ties never straddle partition
    boundaries; each partition then ranks locally with a window
    PARTITIONED by ``spark_partition_id()`` (parallel sort).

    Phase 2: per-partition row counts (one tiny agg, #partitions rows)
    become prefix-sum offsets on the driver and broadcast back; the
    global rank is ``local_rank + offset[pid]``.

    Semantics identical to :func:`competition_rank` with no
    ``partition_by``: RANK tie gaps, NULL scores unranked. The serial
    work is O(#partitions), not O(rows) — this is the path for
    fact-grained frames the guard in :func:`competition_rank` rejects.
    """
    spark = df.sparkSession
    n = num_range_partitions or spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, F.desc_nulls_last(score_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # one materialization so the counts job and the rank job see the
    # same (sampled) range partitioning; lazy — the counts job below is
    # the first action and materializes the checkpoint itself (one job,
    # not a separate eager materialization + a cached count)
    parted = parted.localCheckpoint(eager=False)

    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in range(n):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    offset_df = spark.createDataFrame(offsets, "__pid int, __offset long")

    w = Window.partitionBy("__pid").orderBy(F.desc_nulls_last(score_col))
    return (
        parted.join(F.broadcast(offset_df), "__pid")
        .withColumn(
            rank_col,
            F.when(
                F.col(score_col).isNotNull(),
                (F.rank().over(w) + F.col("__offset")).cast("long"),
            ),
        )
        .drop("__pid", "__offset")
    )


def two_phase_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    rn_col: str = "__rn",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Scalable GLOBAL row_number over a UNIQUE sort key — the
    companion of :func:`two_phase_competition_rank` for the positional
    (non-tie-sharing) half of ranking semantics.

    Phase 1: ``repartitionByRange`` on the sort columns (global order
    across partitions by construction); local row_number with a window
    PARTITIONED by ``spark_partition_id()``. Phase 2: per-partition
    counts → prefix-sum offsets (driver work O(#partitions)) broadcast
    back; global row_number = local + offset.

    The caller must pass a sort key that is unique per row (callers
    here append a unique id as the last column) — with duplicates the
    boundary split between equal keys would be sampling-dependent.
    """
    spark = df.sparkSession
    n = num_range_partitions or spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    # lazy: the counts collect right below materializes the checkpoint
    parted = parted.localCheckpoint(eager=False)
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(n):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    offset_df = spark.createDataFrame(offsets, "__pid int, __offset long")
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        parted.join(F.broadcast(offset_df), "__pid")
        .withColumn(
            rn_col,
            (F.row_number().over(w) + F.col("__offset")).cast("long"),
        )
        .drop("__pid", "__offset")
    )


def two_phase_grouped_row_number(
    df: DataFrame,
    group_col: str,
    order_by: Sequence[Column],
    rn_col: str = "__rn",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Scalable PER-GROUP row_number when the group count is SMALL —
    the straggler case a plain ``Window.partitionBy(group)`` cannot
    survive (5 groups ⇒ 5 reducers own the whole table; at 100 TB
    each sorts 20 TB serially).

    Phase 1: ``repartitionByRange(group, *order)`` — each partition
    holds a contiguous slice of ONE OR MORE groups' sort orders, and
    a group's rows span contiguous partitions; local row_number over
    ``(pid, group)``. Phase 2: per-(pid, group) counts → per-group
    running offsets on the driver (O(#partitions × #groups), small by
    precondition) broadcast back; global per-group row_number =
    local + offset.

    Same unique-sort-key precondition as :func:`two_phase_row_number`.
    """
    spark = df.sparkSession
    n = num_range_partitions or spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(
        n, F.col(group_col), *order_by
    ).withColumn("__pid", F.spark_partition_id())
    # lazy: the counts collect right below materializes the checkpoint
    parted = parted.localCheckpoint(eager=False)
    counts = (
        parted.groupBy("__pid", group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    per_group: dict = {}
    for r in counts:
        per_group.setdefault(r[group_col], []).append(
            (r["__pid"], r["cnt"])
        )
    offsets = []
    for g, lst in per_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            offsets.append((pid, g, acc))
            acc += cnt
    if not offsets:  # empty input: no offsets to join, rank is moot
        return parted.drop("__pid").withColumn(
            rn_col, F.lit(None).cast("long")
        )
    # schema inferred from data so the group column's type carries
    # through (string/int/...); groups must be non-null by precondition
    offset_df = spark.createDataFrame(
        offsets, ["__pid", group_col, "__offset"]
    )
    w = Window.partitionBy("__pid", group_col).orderBy(*order_by)
    return (
        parted.join(F.broadcast(offset_df), ["__pid", group_col])
        .withColumn(
            rn_col,
            (F.row_number().over(w) + F.col("__offset")).cast("long"),
        )
        .drop("__pid", "__offset")
    )


def intra_group_rank(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rank_col: str = "posicion_interna",
) -> DataFrame:
    """W3 — nested rank inside a regrouped aggregation (app.py:566-586),
    same tie rule as :func:`competition_rank`."""
    w = Window.partitionBy(group_col).orderBy(F.desc_nulls_last(score_col))
    return df.withColumn(
        rank_col,
        F.when(F.col(score_col).isNotNull(), F.rank().over(w).cast("long")),
    )
