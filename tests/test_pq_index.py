"""Persisted-index ANN build/serve (round-8): the build-once /
serve-many contract.

The round-7 verdict's last production-shape gap: PQ codebooks and
codes were rebuilt in-query every run. These tests pin the split:

* serve from the persisted artifacts == the in-query path with the
  SAME codebooks (pq_adc_batch_serve is a data-source change, not a
  semantics change);
* a second build commits a NEW version and serving still returns the
  identical result (snapshot determinism: pq_fit is a pure function of
  the table);
* serve-with-no-index auto-builds on first touch, and a FRESH ensure
  call afterwards reuses the commit instead of rebuilding (version
  number unchanged).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["q_id"], r["rank"], r["vec_id"], round(r["exact_dist"], 9))
        for r in df.collect()
    )


def test_serve_from_artifacts_equals_inquery(spark, tmp_path):
    from epl_cas_etl_2026_spark.operators.similarity import (
        pq_adc_batch_serve,
        pq_adc_batch_topk,
        pq_encode,
        pq_fit,
    )
    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    emb = load_table(spark, SF, "embeddings")
    dim, m, k = 64, 8, 16
    codebooks = pq_fit(emb, dim=dim, m=m, k=k, iters=2)
    cb_vt = VersionedTable(str(tmp_path / "cb"))
    codes_vt = VersionedTable(str(tmp_path / "codes"))
    cb_vt.commit(
        spark.createDataFrame(
            [
                (s, j, [float(x) for x in codebooks[s][j]])
                for s in range(m)
                for j in range(k)
            ],
            "sub_id int, code int, centroid array<double>",
        )
    )
    codes_vt.commit(
        pq_encode(emb, codebooks, dim=dim, m=m).select(
            "vec_id", "sub_id", "code"
        )
    )
    qids = [r["vec_id"] for r in emb.filter("vec_id < 8").collect()]
    served = pq_adc_batch_serve(
        emb, cb_vt.read(spark), codes_vt.read(spark), qids,
        dim=dim, m=m, shortlist=30, topk=5,
    )
    inquery = pq_adc_batch_topk(
        emb, codebooks, qids, dim=dim, m=m, shortlist=30, topk=5
    )
    assert _rows(served) == _rows(inquery)


def test_ensure_builds_once_then_reuses(spark, tmp_path, monkeypatch):
    import epl_cas_etl_2026_spark.plans.extensions as ext

    monkeypatch.setattr(
        ext,
        "_pq_index_root",
        lambda _spark, _sf: str(tmp_path / "idx"),
    )
    cb_vt, codes_vt = ext._pq_index_ensure(spark, SF)
    v_cb, v_codes = cb_vt.latest_version(), codes_vt.latest_version()
    assert v_cb is not None and v_codes is not None
    # second ensure: NO rebuild — versions unchanged
    cb_vt2, codes_vt2 = ext._pq_index_ensure(spark, SF)
    assert cb_vt2.latest_version() == v_cb
    assert codes_vt2.latest_version() == v_codes
    # explicit rebuild commits a NEW version; codes content identical
    before = sorted(
        (r["vec_id"], r["sub_id"], r["code"])
        for r in codes_vt.read(spark).collect()
    )
    ext._pq_index_build(spark, SF)
    assert codes_vt.latest_version() == v_codes + 1
    after = sorted(
        (r["vec_id"], r["sub_id"], r["code"])
        for r in codes_vt.read(spark).collect()
    )
    assert before == after


def test_gated_pair_green_shape(spark, tmp_path, monkeypatch):
    import epl_cas_etl_2026_spark.plans.extensions as ext

    monkeypatch.setattr(
        ext,
        "_pq_index_root",
        lambda _spark, _sf: str(tmp_path / "idx2"),
    )
    b = ext.embedding_pq_index_build(spark, SF).collect()[0]
    assert b["committed_ok"] is True
    assert b["reencode_mismatches"] == 0
    assert b["n_codebook_rows"] == 128
    assert b["n_code_rows"] == b["n_points"] * 8
    s = ext.embedding_pq_index_serve(spark, SF).collect()[0]
    assert s["served_from_index"] is True
    assert s["inquery_mismatches"] == 0
    assert s["self_violations"] == 0
    assert s["n_rows"] == s["n_queries"] * 10


def test_serve_plan_is_arrow_free(spark, tmp_path, monkeypatch):
    """The whole point of the persisted index: serving touches no
    Python/Arrow stage (pq_fit and pq_encode are Arrow-batched; the
    serve plan must contain neither — LUT construction is a JVM array
    slice and the corpus side is a parquet scan of the codes table)."""
    import epl_cas_etl_2026_spark.plans.extensions as ext
    from epl_cas_etl_2026_spark.operators.similarity import (
        pq_adc_batch_serve,
    )

    monkeypatch.setattr(
        ext, "_pq_index_root", lambda _s, _f: str(tmp_path / "idx3")
    )
    cb_vt, codes_vt = ext._pq_index_ensure(spark, SF)
    emb = load_table(spark, SF, "embeddings")
    served = pq_adc_batch_serve(
        emb, cb_vt.read(spark), codes_vt.read(spark), [0, 1],
        dim=64, m=8, shortlist=30, topk=5,
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" not in plan
