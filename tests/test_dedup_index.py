"""Persisted MinHash dedup signature index (round-9): the
build-once / serve-many contract for the TEXT dedup family, closing
the last index-persistence asymmetry (PQ and NSW got their persisted
pairs in round 8).

* serve from the persisted signatures == the in-query incremental
  path (near_dup_pairs_incremental is fed a parquet read instead of a
  live recompute — a data-source change, not a semantics change);
* ensure builds on first touch, then REUSES the commit (version
  unchanged) — including from a fresh VersionedTable handle, the
  cross-process shape (the root is derived from the data fingerprint,
  not from any in-process state);
* an explicit rebuild commits a NEW version with identical content
  (minhash_signature_agg is a pure function of the table);
* the serve path never re-shingles the standing corpus: the only
  minhash computation it triggers is over the new batch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6)) for r in df.collect()
    )


def _patch_root(monkeypatch, tmp_path, name):
    import epl_cas_etl_2026_spark.plans.extensions as ext

    monkeypatch.setattr(
        ext, "_dedup_index_root", lambda _s, _f: str(tmp_path / name)
    )
    return ext


def test_serve_from_artifact_equals_inquery(spark, tmp_path, monkeypatch):
    from epl_cas_etl_2026_spark.operators.dedup import (
        minhash_signature_agg,
        near_dup_pairs_incremental,
    )

    ext = _patch_root(monkeypatch, tmp_path, "idx")
    served = ext.docs_dedup_index_serve(spark, SF)
    docs = load_table(spark, SF, "documents")
    is_new = (F.col("doc_id") % 10) == 9
    inquery = near_dup_pairs_incremental(
        docs.filter(is_new),
        minhash_signature_agg(
            docs.filter(~is_new), "doc_id", "text", 16, 3, use_md5=True
        ),
        docs,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        n_hashes=16,
        band_size=4,
        shingle_n=3,
        use_md5=True,
    )
    assert _pairs(served) == _pairs(inquery)


def test_ensure_builds_once_then_reuses(spark, tmp_path, monkeypatch):
    ext = _patch_root(monkeypatch, tmp_path, "idx2")
    vt = ext._dedup_index_ensure(spark, SF)
    v0 = vt.latest_version()
    assert v0 is not None
    # second ensure — and a FRESH handle (the cross-process shape):
    # no rebuild, version unchanged
    vt2 = ext._dedup_index_ensure(spark, SF)
    assert vt2.latest_version() == v0
    fresh_handle = ext._dedup_index_table(spark, SF)
    assert fresh_handle.latest_version() == v0
    # explicit rebuild commits a NEW version; content identical
    before = sorted(map(tuple, vt.read(spark).collect()))
    ext._dedup_index_build(spark, SF)
    assert vt.latest_version() == v0 + 1
    assert sorted(map(tuple, vt.read(spark).collect())) == before


def test_serve_never_reshingles_corpus(spark, tmp_path, monkeypatch):
    """Build once, then serve with the corpus-side signature function
    BOOBY-TRAPPED: the serve path must read the persisted snapshot,
    so hashing the standing corpus again is a test failure."""
    import epl_cas_etl_2026_spark.operators.dedup as dedup_mod

    ext = _patch_root(monkeypatch, tmp_path, "idx3")
    ext._dedup_index_build(spark, SF)

    real_agg = dedup_mod.minhash_signature_agg
    calls: list[int] = []

    def counting_agg(df, id_col, text_col="text", n_hashes=16, shingle_n=3, use_md5=False):
        calls.append(df.count())
        return real_agg(df, id_col, text_col, n_hashes, shingle_n, use_md5)

    monkeypatch.setattr(dedup_mod, "minhash_signature_agg", counting_agg)
    served = ext.docs_dedup_index_serve(spark, SF)
    n_pairs = served.count()
    n_batch = (
        load_table(spark, SF, "documents")
        .filter((F.col("doc_id") % 10) == 9)
        .count()
    )
    # exactly one signature pass, over exactly the new batch
    assert calls == [n_batch], calls
    assert n_pairs >= 0


def test_gated_build_green_shape(spark, tmp_path, monkeypatch):
    ext = _patch_root(monkeypatch, tmp_path, "idx4")
    b = ext.docs_dedup_index_build(spark, SF).collect()[0]
    assert b["committed_ok"] is True
    assert b["reread_mismatches"] == 0
    assert 0 < b["n_sig_rows"] <= b["n_corpus_docs"]


def test_update_folds_batch_and_serve_is_idempotent(spark, tmp_path, monkeypatch):
    """docs_dedup_index_update: disjoint-key merge = pure insert, and
    probing a batch against an index that ALREADY contains the batch's
    signatures returns the identical pair set (band self-pairs are
    excluded by doc != doc and least/greatest dedup)."""
    from epl_cas_etl_2026_spark.operators.dedup import (
        minhash_signature_agg,
        near_dup_pairs_incremental,
    )

    ext = _patch_root(monkeypatch, tmp_path, "idx5")
    row = ext.docs_dedup_index_update(spark, SF).collect()[0]
    assert row["recompute_mismatches"] == 0
    assert row["merged_version"] == 1
    assert row["n_index_after"] == row["n_index_before"] + row["n_batch_sigs"]
    docs = load_table(spark, SF, "documents")
    is_new = (F.col("doc_id") % 10) == 9
    full_sigs = minhash_signature_agg(
        docs, "doc_id", "text", 16, 3, use_md5=True
    )

    def probe(index_sigs):
        return near_dup_pairs_incremental(
            docs.filter(is_new), index_sigs, docs,
            id_col="doc_id", text_col="text", threshold=0.5,
            n_hashes=16, band_size=4, shingle_n=3, use_md5=True,
        )

    corpus_only = minhash_signature_agg(
        docs.filter(~is_new), "doc_id", "text", 16, 3, use_md5=True
    )
    assert _pairs(probe(full_sigs)) == _pairs(probe(corpus_only))
