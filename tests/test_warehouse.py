"""Warehouse shapes: the bitmap distinct path must agree with exact
distinct on edge ids (0 triggered the 1-based bit-position bug), and
SCD2 compression must collapse runs correctly on a hand-built case."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


def test_bitmap_distinct_includes_id_zero_and_bucket_edges(spark):
    ids = [0, 1, 32767, 32768, 32769, 65536, 0, 1]
    df = spark.createDataFrame(
        [("t", i) for i in ids], "event_type string, user_id long"
    )
    got = (
        df.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id + 1)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id + 1)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        .first()
        .n
    )
    assert got == len(set(ids))


def test_scd2_compresses_runs(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view,view,click,click,view -> 3 versions
        (1, 1, "view", t0),
        (2, 1, "view", t0 + dt.timedelta(seconds=10)),
        (3, 1, "click", t0 + dt.timedelta(seconds=20)),
        (4, 1, "click", t0 + dt.timedelta(seconds=30)),
        (5, 1, "view", t0 + dt.timedelta(seconds=40)),
        # user 2: single event -> 1 open version
        (6, 2, "click", t0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    from pyspark.sql import Window

    w_obs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        df.withColumn("prev", F.lag("event_type").over(w_obs))
        .filter(
            F.col("prev").isNull()
            | (F.col("event_type") != F.col("prev"))
        )
    )
    w_chg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_chg).alias("valid_to"),
    ).collect()
    per_user = {}
    for r in versions:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 3  # view, click, view
    assert len(per_user[2]) == 1
    opens = [r for r in versions if r.valid_to is None]
    assert len(opens) == 2  # one per user (last state)
    v1 = sorted(per_user[1], key=lambda r: r.valid_from)
    assert [r.event_type for r in v1] == ["view", "click", "view"]
    assert v1[0].valid_to == v1[1].valid_from  # contiguous intervals


def test_bitmap_distinct_rejects_negative_ids(spark, tmp_path):
    """Negative ids would silently vanish from the bitmap — the query
    must abort loudly instead (review-found edge)."""
    import os

    import pytest

    from epl_cas_etl_2026_spark.plans.warehouse import (
        events_bitmap_distinct_rollup,
    )

    df = spark.createDataFrame(
        [(1, "t", -1, None, None, None)],
        "event_id long, event_type string, user_id long, ts timestamp, "
        "value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    with pytest.raises(Exception, match="non-negative"):
        events_bitmap_distinct_rollup(spark, d).collect()
