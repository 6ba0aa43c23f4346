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


def competition_rank(
    df: DataFrame,
    score_col: str,
    rank_col: str = "posicion",
    tiebreak: Sequence[Column] | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """W1 + W2 — competition rank, NULLS LAST, unranked NULL tail.

    Exactly matches the reference's Python loop (app.py:624-638): equal
    scores share a position, gaps appear after ties (RANK, not
    DENSE_RANK), and NULL scores get ``posicion = NULL`` rather than a
    rank (app.py:640-646 appends them unranked).

    ``tiebreak`` orders *display only* — the reference ranks purely on
    the score (ties share), then orders ties by name (app.py:456).
    """
    w = Window.orderBy(F.desc_nulls_last(score_col))
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(F.desc_nulls_last(score_col))
    ranked = df.withColumn(
        rank_col,
        F.when(
            F.col(score_col).isNotNull(), F.rank().over(w).cast("long")
        ),
    )
    order = [F.desc_nulls_last(score_col)]
    if tiebreak:
        order.extend(tiebreak)
    return ranked.orderBy(*order)


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
