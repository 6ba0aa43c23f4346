"""Persisted NSW-graph index pair (embedding_nsw_index_build/serve) —
build-once/serve-many semantics on an isolated scratch root.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.plans import extensions as ext


def _write_embeddings(tmp_path, n=40, dim=64):
    import pandas as pd

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, dim)).astype("float32")
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [v.tolist() for v in vecs],
            "label": np.zeros(n, dtype="int32"),
        }
    ).to_parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def test_build_once_serve_many(spark, tmp_path):
    sf = _write_embeddings(tmp_path)
    spark.conf.set("spark.epl.scratch.dir", str(tmp_path / "scratch"))
    try:
        # first touch builds + commits
        vt = ext._nsw_index_ensure(spark, sf)
        v0 = vt.latest_version()
        assert v0 is not None
        # second touch REUSES — no new version committed
        vt2 = ext._nsw_index_ensure(spark, sf)
        assert vt2.latest_version() == v0
        # a different handle object (new-process shape) reads the same
        vt3 = ext._nsw_index_table(spark, sf)
        assert vt3.latest_version() == v0
        rows = vt3.read(spark).count()
        assert rows == 40  # one adjacency row per node (ring guarantees)
        # the full serve gate agrees with the in-query path end to end
        out = ext.embedding_nsw_index_serve(spark, sf).collect()[0]
        assert out["inquery_mismatches"] == 0
        assert out["self_violations"] == 0
        assert out["all_returned_ok"] and out["served_from_index"]
        # serving did not bump the committed version
        assert ext._nsw_index_table(spark, sf).latest_version() == v0
        # an explicit rebuild commits a NEW version (and vacuums to 2)
        ext._nsw_index_build(spark, sf)
        assert ext._nsw_index_table(spark, sf).latest_version() != v0
    finally:
        spark.conf.unset("spark.epl.scratch.dir")
