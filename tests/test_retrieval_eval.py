"""Trap tests + pure-Python recomputation for the hybrid-retrieval
layer (RRF fusion, nDCG/MRR eval). Oracle parity is covered by the
differential sweep; these pin the fusion semantics and the integer
metric tables on hand-built fixtures."""

from __future__ import annotations

import math
import os

from epl_cas_etl_2026_spark.plans.retrieval import (
    _DCG_W,
    _IDCG_P,
    _RRF_K,
    docs_hybrid_rrf_fusion,
    embedding_retrieval_eval_ndcg,
)

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write(spark, tmp_path, table, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{table}.parquet")
    )
    return d


def _vec(*xs):
    return [float(x) for x in xs]


def _rrf_expected(lex_rank: int, sem_rank: int) -> int:
    s = 0.0
    if lex_rank:
        s += 1.0 / (_RRF_K + lex_rank)
    if sem_rank:
        s += 1.0 / (_RRF_K + sem_rank)
    return math.floor(s * 1_000_000 + 0.5)


def test_rrf_sums_both_lists_and_handles_single_list(spark, tmp_path):
    """doc 1 ranks in BOTH lists (two terms summed); doc 3 is
    lexical-only, doc 2's embedding twin sem-only; a doc hitting no
    query term and no embedding never appears."""
    docs = [
        (1, "hash merge batch", "en", "s", 17),
        (2, "plain text only", "en", "s", 15),
        (3, "hash hash", "en", "s", 9),
        (4, "nothing relevant", "en", "s", 16),
    ]
    # vec 0 = query; vec 1 aligned (sem rank 1), vec 2 close (rank 2);
    # vec 4 orthogonal still ranks (depth 50 ≫ 3) — doc 3 has no vector
    emb = [
        (0, _vec(1, 0, 0), 0),
        (1, _vec(1, 0, 0), 0),
        (2, _vec(0.9, 0.1, 0), 0),
        (4, _vec(0, 1, 0), 1),
    ]
    d = _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    _write(spark, tmp_path, "embeddings", emb, _EMB_SCHEMA)
    got = {r["doc_id"]: r.asDict() for r in
           docs_hybrid_rrf_fusion(spark, d).collect()}
    assert 1 in got and got[1]["lex_rank"] > 0 and got[1]["sem_rank"] > 0
    assert got[3]["lex_rank"] > 0 and got[3]["sem_rank"] == 0
    assert got[2]["lex_rank"] == 0 and got[2]["sem_rank"] > 0
    # every emitted fusion score recomputes exactly from its rank pair
    for row in got.values():
        assert row["rrf_micros"] == _rrf_expected(
            row["lex_rank"], row["sem_rank"]
        )
    # fused order: doc 1 (in both lists) beats every single-list doc
    assert got[1]["rrf_micros"] == max(r["rrf_micros"] for r in got.values())


def test_rrf_output_sorted_and_consistent_on_sf(spark, sf_smoke):
    rows = docs_hybrid_rrf_fusion(spark, sf_smoke).collect()
    assert rows, "fusion returned nothing at smoke SF"
    scores = [r["rrf_micros"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["rrf_micros"] == _rrf_expected(r["lex_rank"], r["sem_rank"])
        assert (r["lex_rank"] > 0) or (r["sem_rank"] > 0)


def test_dcg_tables_match_definition():
    for i, w in enumerate(_DCG_W, start=1):
        assert w == math.floor(1_000_000 / math.log2(i + 1) + 0.5)
    assert list(_IDCG_P) == [
        sum(_DCG_W[: m + 1]) for m in range(len(_DCG_W))
    ]
    # the r=3 landmine that forced the table: 1/log2(4) = exactly 0.5
    assert _DCG_W[2] == 500_000


def test_ndcg_perfect_ranking_hits_one_million(spark, tmp_path):
    """Query vec 1 (label 0) with ≥10 same-label vectors strictly
    closer than every other-label vector → DCG = IDCG → nDCG = 1e6,
    RR = 1e6, hits@10 = 10."""
    emb = [(1, _vec(1, 0, 0), 0)]
    for i in range(2, 14):  # 12 relevant, descending cosine
        emb.append((i, _vec(1, 0.01 * i, 0), 0))
    for i in range(20, 24):  # irrelevant, near-orthogonal
        emb.append((i, _vec(0.01, 1, 0), 5))
    d = _write(spark, tmp_path, "embeddings", emb, _EMB_SCHEMA)
    got = {r["query_id"]: r.asDict() for r in
           embedding_retrieval_eval_ndcg(spark, d).collect()}
    row = got[1]
    assert row["n_rel_pool"] == 12
    assert row["hits_at_k"] == 10
    assert row["first_hit_rank"] == 1
    assert row["rr_micros"] == 1_000_000
    assert row["dcg_micros"] == row["idcg_micros"] == _IDCG_P[-1]
    assert row["ndcg_ppm"] == 1_000_000


def test_ndcg_no_relevant_pool_is_all_zero(spark, tmp_path):
    """A query whose label appears nowhere else: n_rel_pool = 0 must
    zero every metric (the div-by-zero guard path)."""
    emb = [
        (1, _vec(1, 0), 9),
        (2, _vec(0.9, 0.1), 0),
        (3, _vec(0.8, 0.2), 0),
    ]
    d = _write(spark, tmp_path, "embeddings", emb, _EMB_SCHEMA)
    got = {r["query_id"]: r.asDict() for r in
           embedding_retrieval_eval_ndcg(spark, d).collect()}
    row = got[1]
    assert row["n_rel_pool"] == 0
    assert row["hits_at_k"] == 0
    assert row["first_hit_rank"] == 0
    assert row["rr_micros"] == 0
    assert row["idcg_micros"] == 0
    assert row["ndcg_ppm"] == 0


def test_ndcg_matches_pure_python(spark, sf_smoke):
    """Recompute every metric from scratch in pure Python over the
    collected cosine ranking (third implementation: python floats +
    sorted(), no Spark, no DuckDB)."""
    import duckdb

    con = duckdb.connect()
    emb = con.execute(
        "SELECT vec_id, embedding::DOUBLE[], label FROM "
        f"'{sf_smoke}/embeddings.parquet'"
    ).fetchall()
    vecs = {v: (e, l) for v, e, l in emb}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    got = {r["query_id"]: r.asDict() for r in
           embedding_retrieval_eval_ndcg(spark, sf_smoke).collect()}
    for qid in (1, 2, 3, 4, 5):
        qv, qlabel = vecs[qid]
        scored = sorted(
            (
                (round(cos(e, qv), 6), -v, v, l)
                for v, (e, l) in vecs.items()
                if v != qid
            ),
            reverse=True,
        )
        n_rel_pool = sum(1 for _, _, _, l in scored if l == qlabel)
        top = scored[:10]
        hits = sum(1 for _, _, _, l in top if l == qlabel)
        first = next(
            (i for i, (_, _, _, l) in enumerate(top, 1) if l == qlabel), 0
        )
        dcg = sum(
            _DCG_W[i - 1]
            for i, (_, _, _, l) in enumerate(top, 1)
            if l == qlabel
        )
        idcg = _IDCG_P[min(n_rel_pool, 10) - 1] if n_rel_pool else 0
        row = got[qid]
        assert row["n_rel_pool"] == n_rel_pool
        assert row["hits_at_k"] == hits
        assert row["first_hit_rank"] == first
        assert row["rr_micros"] == (1_000_000 // first if first else 0)
        assert row["dcg_micros"] == dcg
        assert row["idcg_micros"] == idcg
        assert row["ndcg_ppm"] == (dcg * 1_000_000 // idcg if idcg else 0)


def test_tfidf_top_terms_matches_pure_python(spark, sf_smoke):
    """Recompute per-doc TF-IDF ranks in pure Python (collections +
    math.log) over the probe docs and compare every column."""
    import math
    from collections import Counter

    import duckdb

    from epl_cas_etl_2026_spark.plans.retrieval import (
        _TFIDF_PROBE_DOCS,
        _TFIDF_TOPK,
        docs_tfidf_top_terms,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    n_docs = len({d for d, _ in docs})
    dfc = Counter()
    tfs = {}
    for d, text in docs:
        words = [w for w in text.split(" ") if w]
        dfc.update(set(words))
        if d < _TFIDF_PROBE_DOCS:
            tfs[d] = Counter(words)
    exp = []
    for d in sorted(tfs):
        scored = sorted(
            (
                (-math.floor(tf * math.log(n_docs / dfc[w]) * 1000 + 0.5), w)
                for w, tf in tfs[d].items()
            ),
        )[:_TFIDF_TOPK]
        for rank, (neg, w) in enumerate(scored, 1):
            exp.append((d, rank, w, tfs[d][w], dfc[w], -neg))
    got = [
        (r["doc_id"], r["term_rank"], r["word"], r["tf"], r["df"],
         r["tfidf_millis"])
        for r in docs_tfidf_top_terms(spark, sf_smoke).collect()
    ]
    assert got == exp
