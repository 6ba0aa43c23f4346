"""Versioned-table commit primitive: snapshot isolation, time travel,
transactional MERGE, vacuum (sources/versioned.py)."""

from __future__ import annotations

import os

import pytest

from epl_cas_etl_2026_spark.sources.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_commit_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert t.latest_version() is None
    t.commit(_df(spark, [(1, "a"), (2, "b")]))
    t.commit(_df(spark, [(1, "a2")]))
    assert t.latest_version() == 1
    assert sorted(map(tuple, t.read(spark).collect())) == [(1, "a2")]
    # time travel: version 0 is intact after the new commit
    assert sorted(map(tuple, t.read(spark, version=0).collect())) == [
        (1, "a"),
        (2, "b"),
    ]
    with pytest.raises(ValueError):
        t.read(spark, version=9)


def test_merge_commit_upserts_transactionally(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a"), (2, "b")]))
    snapshot_before = t.read(spark, version=0)
    v = t.merge_commit(_df(spark, [(2, "B"), (3, "c")]), "k", spark)
    assert v == 1
    assert sorted(map(tuple, t.read(spark).collect())) == [
        (1, "a"),
        (2, "B"),
        (3, "c"),
    ]
    # a reader holding the pre-merge snapshot still sees the old rows
    # (snapshot isolation — the merge never mutated v=0)
    assert sorted(map(tuple, snapshot_before.collect())) == [(1, "a"), (2, "b")]


def test_failed_commit_leaves_pointer_untouched(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]))
    # simulate a crash AFTER the snapshot write, BEFORE the swap: an
    # orphan v=1 directory must not be served, and vacuum removes it
    _df(spark, [(9, "x")]).write.parquet(os.path.join(t.root, "v=1"))
    assert t.latest_version() == 0
    assert sorted(map(tuple, t.read(spark).collect())) == [(1, "a")]
    assert t.vacuum(keep_last=1) == [1]
    assert not os.path.exists(os.path.join(t.root, "v=1"))


def test_vacuum_keeps_recent_versions(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    for i in range(4):
        t.commit(_df(spark, [(i, "x")]))
    assert t.vacuum(keep_last=2) == [0, 1]
    assert sorted(map(tuple, t.read(spark, version=2).collect())) == [(2, "x")]
    assert t.latest_version() == 3
