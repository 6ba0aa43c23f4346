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


def test_interval_overlap_blocking_is_lossless(spark, tmp_path):
    """Random bounded-span intervals: the bucket-blocked equi-join must
    find EXACTLY the pairs the quadratic predicate finds — including
    touching endpoints and intervals straddling a bucket boundary."""
    import datetime as dt
    import os
    import random

    from epl_cas_etl_2026_spark.plans.warehouse import (
        orders_interval_overlap_join,
    )

    rng = random.Random(11)
    rows = []
    for k in range(1, 600):
        d = dt.date(1995, 1, 1) + dt.timedelta(days=rng.randrange(400))
        rows.append((k, k % 150, d, 100.0))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, "
        "o_totalprice double",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "orders.parquet"))
    got = {
        (r.a_id, r.b_id, r.overlap_days)
        for r in orders_interval_overlap_join(spark, d).collect()
    }
    # brute-force twin in plain Python
    def iv(mod):
        out = []
        for k, _, day, _ in rows:
            if k % mod == 0:
                s = (day - dt.date(1970, 1, 1)).days
                out.append((k, s, s + (k % 30) + 1))
        return out

    expect = {
        (a, b, min(ae, be) - max(as_, bs) + 1)
        for a, as_, ae in iv(97)
        for b, bs, be in iv(89)
        if as_ <= be and bs <= ae
    }
    assert got == expect and expect  # non-vacuous


def test_cdc_apply_semantics(spark, tmp_path):
    """Delete-last keys vanish; upsert-last keys carry the value of the
    highest-seq row, not any earlier one."""
    import datetime as dt
    import os

    from epl_cas_etl_2026_spark.plans.warehouse import orders_cdc_apply_state

    # key 1: seqs 10 (U), 18 (D) -> deleted; key 2: seqs 11 (U), 24 (U)
    # -> value of 24; key 3: single delete 28 -> absent; key 4: 31 (U)
    rows = [
        (10, 1, dt.date(1995, 1, 1), 1.00),
        (18, 1, dt.date(1995, 1, 2), 2.00),
        (11, 2, dt.date(1995, 1, 3), 3.00),
        (24, 2, dt.date(1995, 1, 4), 4.00),
        (28, 3, dt.date(1995, 1, 5), 5.00),
        (31, 4, dt.date(1995, 1, 6), 6.00),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, "
        "o_totalprice double",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "orders.parquet"))
    got = {
        r.key: (r.last_seq, r.val_cents)
        for r in orders_cdc_apply_state(spark, d).collect()
    }
    assert got == {2: (24, 400), 4: (31, 600)}


def test_join_view_delta_invariants_hold(spark):
    """The delta algebra must reconcile with the direct recompute on
    the real testdata (sf-smoke)."""
    from epl_cas_etl_2026_spark.plans.warehouse import (
        orders_join_view_delta_maintenance,
    )

    r = orders_join_view_delta_maintenance(
        spark, "/root/testdata/sf0.001"
    ).first()
    assert r.counts_match and r.sums_match
    assert r.n_incremental == r.n_direct


def test_zorder_prunes_at_least_as_well_on_2d_box(spark):
    """On the real data the z-layout must scan no more rows than the
    date layout for the 2-D box (the reason z-order exists), and both
    layouts must agree on the matching-row count."""
    from epl_cas_etl_2026_spark.plans.warehouse import (
        orders_zorder_pruning_stats,
    )

    rows = {
        r.layout: r
        for r in orders_zorder_pruning_stats(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    z, d = rows["zorder"], rows["date_sort"]
    assert z.rows_matching == d.rows_matching > 0
    assert z.rows_scanned <= d.rows_scanned
    assert z.rows_scanned >= z.rows_matching  # pruning is sound


def test_sliding_distinct_crosses_bucket_boundaries(spark, tmp_path):
    """events_sliding_distinct_users with user ids spanning several
    32768-id bitmap buckets AND windows where a user is active only
    in earlier days of the window — brute-force recompute in Python.
    Testdata ids are single-bucket, so the per-bucket OR + cross-
    bucket SUM path is exercised only here."""
    import itertools
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from epl_cas_etl_2026_spark.plans.warehouse import (
        events_sliding_distinct_users,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = itertools.count()
    # ids straddling bucket edges; sparse day pattern per user
    ids = [0, 1, 32767, 32768, 65535, 65536, 98304]
    for d in range(10):
        for i, uid in enumerate(ids):
            if (d + i) % 3 == 0:  # sparse, deterministic
                rows.append(
                    (next(eid), t0 + dt.timedelta(days=d, hours=i), uid,
                     "click", 1.0, "{}")
                )
    tbl = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.int64()),
            pa.array([r[1] for r in rows], type=pa.timestamp("us", tz="UTC")),
            pa.array([r[2] for r in rows], type=pa.int64()),
            pa.array([r[3] for r in rows], type=pa.string()),
            pa.array([r[4] for r in rows], type=pa.float64()),
            pa.array([r[5] for r in rows], type=pa.string()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        (r["event_type"], r["day"]): r["n_users_7d"]
        for r in events_sliding_distinct_users(spark, str(tmp_path)).collect()
    }
    # brute force
    by_day: dict = {}
    for _, ts, uid, typ, _, _ in rows:
        by_day.setdefault((typ, ts.date()), set()).add(uid)
    days = sorted({d for _, d in by_day})
    want = {}
    for typ in {t for t, _ in by_day}:
        for d in days:
            if (typ, d) not in by_day:
                continue
            users: set = set()
            for k in range(7):
                users |= by_day.get((typ, d - dt.timedelta(days=k)), set())
            want[(typ, d.isoformat())] = len(users)
    assert got == want
