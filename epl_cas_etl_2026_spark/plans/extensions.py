"""Training-data pipeline + streaming-analog query plans with DuckDB
oracle twins: dedup, near-dup LSH, text analysis, embedding similarity,
event-time windows, sessionization, JSON extraction, multimodal
metadata (BASELINE.json north star; SURVEY.md §7 Phase 4).

Determinism notes: all hash-based ops use md5-derived values both
engines compute identically; vector math is double-precision with a
fixed fold order; averages are rounded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    first_fit_pack,
    greedy_pair_merge,
    lang_scores,
    quality_class,
    token_count,
)
from epl_cas_etl_2026_spark.functions.scalars import det_avg, det_avg_sql
from epl_cas_etl_2026_spark.functions.vectors import cosine, dot, to_double
from epl_cas_etl_2026_spark.operators.dedup import (
    exact_dedup_stats,
    near_dup_pairs,
    simhash64,
)
from epl_cas_etl_2026_spark.operators.multimodal import (
    decode_image_meta,
    with_binary_payload,
)
from epl_cas_etl_2026_spark.sources.parquet import load_table, spread_scan

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy).
# ---------------------------------------------------------------------------
@_register(
    "docs_exact_dedup_stats",
    """
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
    FROM documents
    """,
)
def docs_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_stats(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Text analysis: token counts (whitespace + BPE-ish regex), quality.
# ---------------------------------------------------------------------------
@_register(
    "docs_token_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))), 2) AS avg_bpe_tokens,
           ROUND(AVG(length(text)), 2) AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(token_count(t)), 2).alias("avg_tokens"),
            F.round(F.avg(bpe_token_count(t)), 2).alias("avg_bpe_tokens"),
            F.round(F.avg(F.length(t)), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@_register(
    "docs_quality_classes",
    """
    SELECT CASE WHEN len(string_split(text, ' ')) < 5 THEN 'drop'
                WHEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0
                     / nullif(length(text), 0) < 0.8 THEN 'review'
                ELSE 'keep' END AS calidad,
           COUNT(*) AS n,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM documents GROUP BY calidad ORDER BY calidad
    """,
)
def docs_quality_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("calidad", quality_class(F.col("text")))
        .groupBy("calidad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("calidad")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (md5 of normalized text).
# ---------------------------------------------------------------------------
@_register(
    "docs_fingerprint_by_source",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')))) AS n_fingerprints
    FROM documents GROUP BY source ORDER BY source
    """,
)
def docs_fingerprint_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", fingerprint(F.col("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_fingerprints"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# SimHash (md5-hash variant so DuckDB reproduces it bit-for-bit).
# ---------------------------------------------------------------------------
@_register(
    "docs_simhash",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents WHERE doc_id < 50
    ),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM toks
    ),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM hashed, generate_series(0, 59) AS t(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select(
            "doc_id", simhash64(F.col("text"), use_md5=True).alias("simhash")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup over the FULL corpus: 60-bit simhash (Arrow-
# vectorized, md5-token variant both engines reproduce), banded into
# 4×15-bit keys, exact bit_count(xor) verify on candidates only.
# max_hamming=3 < n_bands ⇒ the band join has GUARANTEED 100% recall
# (pigeonhole) — unlike the probabilistic LSH paths, this one is
# exact w.r.t. its hamming threshold. One shuffle on band keys.
# ---------------------------------------------------------------------------
_SIMHASH_SQL = """
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b)
                           ELSE 0 END) AS BIGINT) AS h
      FROM (
        SELECT doc_id, b,
               SUM(CASE WHEN (hh >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        FROM (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hh
          FROM (SELECT doc_id,
                       unnest(list_distinct(string_split(text, ' '))) AS tok
                FROM documents)
        ), generate_series(0, 59) AS t(b)
        GROUP BY doc_id, b
      ) GROUP BY doc_id
"""

# Verified simhash near-dup pairs (hamming <= 3) as a standalone
# SELECT — the pair-generation prefix shared (textually) by the
# docs_simhash_near_dup / docs_near_dup_clusters / docs_dedup_keep_best
# oracles. tools/rehearse_sf1.py builds its ITERATIVE closure oracle
# from this constant at sf1, where the recursive-CTE `reach` closure is
# output-quadratic on near-clique components (round-7 verdict item 5).
_SIMHASH_PAIRS_SQL = f"""
    WITH sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b FROM cand
    JOIN sim sa ON sa.doc_id = id_a
    JOIN sim sb ON sb.doc_id = id_b
    WHERE bit_count(xor(sa.h, sb.h)) <= 3
"""


@_register(
    "docs_simhash_near_dup",
    f"""
    WITH sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa.h, sb.h)) AS INTEGER) AS hamming
    FROM cand
    JOIN sim sa ON sa.doc_id = id_a
    JOIN sim sb ON sb.doc_id = id_b
    WHERE bit_count(xor(sa.h, sb.h)) <= 3
    ORDER BY id_a, id_b
    """,
)
def docs_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return (
        simhash_near_dup_pairs(docs, max_hamming=3)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Duplicate CLUSTERS from near-dup pairs — connected components over
# the simhash pair graph (min-label propagation; the dedup step that
# picks one representative per cluster). Oracle: recursive-CTE
# transitive closure in DuckDB — an independent algorithm arriving at
# the same components.
# ---------------------------------------------------------------------------
@_register(
    "docs_near_dup_clusters",
    f"""
    WITH RECURSIVE sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN sim sa ON sa.doc_id = id_a
      JOIN sim sb ON sb.doc_id = id_b
      WHERE bit_count(xor(sa.h, sb.h)) <= 3
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM sym),
    reach(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, e.d FROM reach r JOIN sym e ON r.b = e.s
    )
    SELECT comp AS component, COUNT(*) AS cluster_size
    FROM (SELECT a, MIN(b) AS comp FROM reach GROUP BY a)
    GROUP BY comp ORDER BY comp
    """,
)
def docs_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import (
        connected_components,
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(docs, max_hamming=3)
    comps = connected_components(pairs, "id_a", "id_b")
    return (
        comps.groupBy(F.col("label").alias("component"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Dedup keep-best — the terminal dedup step: within each near-dup
# cluster keep ONE representative (longest text, ties → lowest id);
# docs in no cluster survive untouched. Output: per-lang corpus
# before/after counts.
# ---------------------------------------------------------------------------
@_register(
    "docs_dedup_keep_best",
    f"""
    WITH RECURSIVE sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN sim sa ON sa.doc_id = id_a
      JOIN sim sb ON sb.doc_id = id_b
      WHERE bit_count(xor(sa.h, sb.h)) <= 3
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM sym),
    reach(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, e.d FROM reach r JOIN sym e ON r.b = e.s
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
    ranked AS (
      SELECT d.doc_id, d.lang,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY length(d.text) DESC, d.doc_id)
               AS rn
      FROM documents d JOIN comp c ON d.doc_id = c.doc_id
    ),
    kept AS (
      SELECT doc_id, lang FROM ranked WHERE rn = 1
      UNION ALL
      SELECT doc_id, lang FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM comp)
    )
    SELECT d.lang,
           COUNT(*) AS n_docs,
           (SELECT COUNT(*) FROM kept k WHERE k.lang = d.lang) AS n_kept
    FROM documents d GROUP BY d.lang ORDER BY d.lang
    """,
)
def docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import (
        connected_components,
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(docs, max_hamming=3)
    comps = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )
    clustered = docs.join(comps, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc(F.length("text")), F.asc("doc_id")
    )
    kept_in_clusters = (
        clustered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang")
    )
    unclustered = docs.join(comps, "doc_id", "left_anti").select(
        "doc_id", "lang"
    )
    kept = kept_in_clusters.unionByName(unclustered)
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_counts = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        totals.join(kept_counts, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection: MinHash signatures → LSH band buckets →
# exact Jaccard verify. No O(n²) pass anywhere.
# ---------------------------------------------------------------------------
_NEARDUP_BODY = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             [array_to_string(w[i:i+2], ' ') FOR i IN range(1, greatest(len(w) - 1, 1))] AS shingles
      FROM toks
    ),
    hp AS (  -- Kirsch-Mitzenmacher pair per shingle: one md5, 16 derived fns
      SELECT doc_id,
             [{'h1': CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT),
               'h2': CAST(('0x' || substr(md5(s), 17, 15)) AS BIGINT) % 72057594037927936}
              FOR s IN shingles] AS pairs
      FROM sh WHERE len(shingles) > 0
    ),
    sigs AS (
      SELECT doc_id,
             [list_min([(p.h1 + j * p.h2) % 4294967291 FOR p IN pairs])
              FOR j IN range(0, 16)] AS sig
      FROM hp
    ),
    banded AS (
      SELECT doc_id, b,
             array_to_string(sig[b*4+1:b*4+4], '-') AS band_key
      FROM sigs, generate_series(0, 3) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.b = c.b AND a.band_key = c.band_key AND a.doc_id < c.doc_id
    ),
    words AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    )
    SELECT id_a, id_b,
           ROUND(len(list_intersect(wa.ws, wb.ws)) * 1.0
                 / nullif(len(list_distinct(wa.ws || wb.ws)), 0), 6) AS jaccard
    FROM cand
    JOIN words wa ON wa.doc_id = id_a
    JOIN words wb ON wb.doc_id = id_b
    WHERE len(list_intersect(wa.ws, wb.ws)) * 1.0
          / nullif(len(list_distinct(wa.ws || wb.ws)), 0) >= 0.5
"""

_NEARDUP_ORACLE = _NEARDUP_BODY + "\n    ORDER BY id_a, id_b\n"

# incremental variant: same banding + verify, pairs restricted to
# those touching the "new batch" (doc_id % 10 = 9 — an arbitrary but
# deterministic 10% membership both engines compute identically)
_NEARDUP_INCR_ORACLE = (
    _NEARDUP_BODY
    + "\n      AND (id_a % 10 = 9 OR id_b % 10 = 9)"
    + "\n    ORDER BY id_a, id_b\n"
)


@_register("docs_near_dup_pairs", _NEARDUP_ORACLE)
def docs_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return near_dup_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        n_hashes=16,
        band_size=4,
        shingle_n=3,
        use_md5=True,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Incremental near-dup — the daily-ingest shape: a new batch (10% of
# docs, membership doc_id % 10 = 9) is checked against the existing
# corpus via its PERSISTED MinHash signature index; only the batch is
# re-shingled/hashed. Oracle = the batch oracle restricted to pairs
# touching the batch (identical banding math), so the incremental path
# is pinned to produce exactly the batch semantics for those pairs.
# ---------------------------------------------------------------------------
@_register("docs_incremental_near_dup", _NEARDUP_INCR_ORACLE)
def docs_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import (
        minhash_signature_agg,
        near_dup_pairs_incremental,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % 10) == 9
    # the signature index would be a stored table in production; built
    # here from the "old" corpus with the same hash params
    index_sigs = minhash_signature_agg(
        docs.filter(~is_new), "doc_id", "text", 16, 3, use_md5=True
    )
    return near_dup_pairs_incremental(
        docs.filter(is_new),
        index_sigs,
        docs,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        n_hashes=16,
        band_size=4,
        shingle_n=3,
        use_md5=True,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# MINHASH ESTIMATOR CALIBRATION (round-10): the near-dup stack's
# correctness gates pin that signatures/banding/verify agree across
# engines; this gate pins the ESTIMATOR'S QUALITY — for every LSH
# candidate pair, the signature-estimated Jaccard (matching components
# / 16) is compared against the exact distinct-3-shingle Jaccard, and
# the calibration curve (per estimated-match-count: pair count, exact
# min/mean-sum/max, summed |error|) goes under the hash gate. This is
# the audit a 100 TB dedup deployment runs before trusting a
# threshold: it shows exactly how many true-Jaccard millis each
# signature bucket spans. All integer (milli quantization via div), no
# float anywhere.
#
# 100 TB shape: signatures are ~128 B/doc; candidates come from the
# banded equi-join (never all-pairs); the exact verify joins the two
# DISTINCT-SHINGLE ARRAYS per candidate pair (the setjoin lesson:
# never re-explode token streams per pair), and shingle arrays are
# built ONLY for docs that appear in some candidate pair (semi-join
# pushdown) — at web scale that is the tiny near-dup-suspect slice,
# not the corpus.
# ---------------------------------------------------------------------------
@_register(
    "docs_minhash_estimate_error",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             [array_to_string(w[i:i+2], ' ')
              FOR i IN range(1, greatest(len(w) - 1, 1))] AS shingles
      FROM toks
    ),
    hp AS (
      SELECT doc_id,
             [{'h1': CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT),
               'h2': CAST(('0x' || substr(md5(s), 17, 15)) AS BIGINT)
                     % 72057594037927936}
              FOR s IN shingles] AS pairs
      FROM sh WHERE len(shingles) > 0
    ),
    sigs AS (
      SELECT doc_id,
             [list_min([(p.h1 + j * p.h2) % 4294967291 FOR p IN pairs])
              FOR j IN range(0, 16)] AS sig
      FROM hp
    ),
    banded AS (
      SELECT doc_id, b,
             array_to_string(sig[b*4+1:b*4+4], '-') AS band_key
      FROM sigs, generate_series(0, 3) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.b = c.b AND a.band_key = c.band_key AND a.doc_id < c.doc_id
    ),
    shd AS (
      SELECT doc_id, list_distinct(shingles) AS s FROM sh
    ),
    perpair AS (
      SELECT
        CAST(len(list_filter(range(0, 16),
                             j -> sa.sig[j+1] = sb.sig[j+1])) AS BIGINT)
          AS est_matches,
        CAST((1000 * len(list_intersect(da.s, db.s)))
             // greatest(len(list_distinct(da.s || db.s)), 1) AS BIGINT)
          AS exact_milli
      FROM cand
      JOIN sigs sa ON sa.doc_id = id_a
      JOIN sigs sb ON sb.doc_id = id_b
      JOIN shd da ON da.doc_id = id_a
      JOIN shd db ON db.doc_id = id_b
    )
    SELECT est_matches,
           CAST((1000 * est_matches) // 16 AS BIGINT) AS est_milli,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(exact_milli) AS BIGINT) AS sum_exact_milli,
           CAST(MIN(exact_milli) AS BIGINT) AS min_exact_milli,
           CAST(MAX(exact_milli) AS BIGINT) AS max_exact_milli,
           CAST(SUM(abs((1000 * est_matches) // 16 - exact_milli))
                AS BIGINT) AS sum_abs_err_milli
    FROM perpair GROUP BY est_matches ORDER BY est_matches
    """,
)
def docs_minhash_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.functions.text import words
    from epl_cas_etl_2026_spark.operators.dedup import (
        minhash_signature_agg,
        shingles_of_words,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # ONE signature pass shared by the banding and the estimator
    # columns (was two: lsh_candidate_pairs re-computed its own
    # internal signature frame — the md5-per-shingle hash scan is the
    # dominant stage of this query, and it ran twice). The banding
    # below is lsh_candidate_pairs(n_hashes=16, band_size=4) verbatim.
    # lazy localCheckpoint, not persist(): the cached-plan path
    # serializes concurrent consumer stages on cache-block locks and
    # blocks AQE on the cached subtree (r11 session-3 measurement on
    # the KMV query: 23-34 s persist vs 1.2 s checkpoint)
    sigs = minhash_signature_agg(
        docs, "doc_id", "text", 16, 3, use_md5=True
    ).localCheckpoint(eager=False)
    band_keys = F.array(
        *[
            F.concat_ws("-", *[F.col(f"h{b * 4 + j}") for j in range(4)])
            for b in range(4)
        ]
    )
    banded = sigs.select(
        F.col("doc_id").alias("doc"),
        F.posexplode(band_keys).alias("band", "band_key"),
    )
    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    cands = cands.localCheckpoint(eager=False)  # 3 consumers below
    sa = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{j}").alias(f"a{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{j}").alias(f"b{j}") for j in range(16)],
    )
    est = F.expr(
        "CAST("
        + " + ".join(
            f"CASE WHEN a{j} = b{j} THEN 1 ELSE 0 END" for j in range(16)
        )
        + " AS BIGINT)"
    )
    # distinct-shingle arrays ONLY for docs in some candidate pair
    touched = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    shd = (
        docs.join(touched, "doc_id", "left_semi")
        .select("doc_id", words(F.col("text")).alias("__w"))
        .select(
            "doc_id",
            F.array_distinct(shingles_of_words(F.col("__w"), 3)).alias("s"),
        )
    )
    da = shd.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    db = shd.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    perpair = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .join(da, "id_a")
        .join(db, "id_b")
        .select(
            est.alias("est_matches"),
            F.expr(
                "CAST((1000 * size(array_intersect(sa, sb)))"
                " div greatest(size(array_union(sa, sb)), 1) AS BIGINT)"
            ).alias("exact_milli"),
        )
    )
    return (
        perpair.groupBy("est_matches")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("exact_milli").cast("long").alias("sum_exact_milli"),
            F.min("exact_milli").cast("long").alias("min_exact_milli"),
            F.max("exact_milli").cast("long").alias("max_exact_milli"),
            F.sum(
                F.abs(
                    F.expr("(1000 * est_matches) div 16")
                    - F.col("exact_milli")
                )
            )
            .cast("long")
            .alias("sum_abs_err_milli"),
        )
        .select(
            "est_matches",
            F.expr("CAST((1000 * est_matches) div 16 AS BIGINT)").alias(
                "est_milli"
            ),
            "n_pairs",
            "sum_exact_milli",
            "min_exact_milli",
            "max_exact_milli",
            "sum_abs_err_milli",
        )
        .orderBy("est_matches")
    )


# ---------------------------------------------------------------------------
# SIMHASH ESTIMATOR CALIBRATION (round-11) — the third leg of the
# estimator-audit family (docs_minhash_estimate_error pins the MinHash
# Jaccard estimator, embedding_lsh_estimate_error the hyperplane-LSH
# cosine estimator): for SimHash, hamming distance d over the P=60
# sign bits estimates cos(pi*d/P) (Charikar SRP, STOC'02), commonly
# used as a proxy for the cosine of the DISTINCT-TOKEN indicator
# vectors the bit votes were built from. That proxy has a known bias —
# the vote vector is not the indicator vector — and THIS gate
# quantifies it: per hamming distance, the table-estimated cosine vs
# the exact indicator cosine |A∩B|/sqrt(|A||B|) in integer millis.
# The d→cos(pi*d/60) mapping is a 61-entry INTEGER LITERAL table
# computed once in Python and injected verbatim into BOTH engines (the
# _LSH_EST_MILLI precedent) — no engine evaluates cos(); the exact
# side uses the proven FLOOR(ROUND(sim,6)*1000+0.5) half-up rule.
#
# 100 TB shape: candidates come from the 4×15-bit band join (never
# all-pairs), and the calibration runs on a DETERMINISTIC 5% SAMPLE of
# the candidate stream ((id_a*31+id_b) % 20 = 0, identical integer
# arithmetic in both engines) applied BEFORE the pair-dedup — an
# estimator audit does not need every pair, and the sample bounds the
# exact-verify join linearly at any corpus size (this self-similar
# corpus yields ~23k raw candidates per 500 docs; unfiltered dedup at
# sf1 would shuffle ~227M pairs, the sampled one ~11M). Exact verify
# joins the two distinct-token ARRAYS per sampled pair (the setjoin
# lesson), built ONLY for docs that appear in some sampled pair
# (semi-join pushdown).
# ---------------------------------------------------------------------------
_SIMHASH_P = 60
_SIMHASH_EST_MILLI = [
    int(math.floor(1000.0 * math.cos(math.pi * d / _SIMHASH_P) + 0.5))
    for d in range(_SIMHASH_P + 1)
]


@_register(
    "docs_simhash_estimate_error",
    f"""
    WITH sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      WHERE (a.doc_id * 31 + c.doc_id) % 20 = 0
    ),
    wl AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
      FROM documents
    ),
    perpair AS (
      SELECT CAST(bit_count(xor(sa.h, sb.h)) AS BIGINT) AS hamming,
             CAST(FLOOR(ROUND(len(list_intersect(wa.s, wb.s))
                              / sqrt(len(wa.s) * len(wb.s)), 6)
                        * 1000 + 0.5) AS BIGINT) AS exact_milli
      FROM cand
      JOIN sim sa ON sa.doc_id = id_a
      JOIN sim sb ON sb.doc_id = id_b
      JOIN wl wa ON wa.doc_id = id_a
      JOIN wl wb ON wb.doc_id = id_b
    ),
    curved AS (
      SELECT hamming, exact_milli,
             ([{', '.join(str(x) for x in _SIMHASH_EST_MILLI)}]
             )[hamming + 1] AS est_cos_milli
      FROM perpair
    )
    SELECT hamming,
           CAST(est_cos_milli AS BIGINT) AS est_cos_milli,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(exact_milli) AS BIGINT) AS sum_exact_milli,
           CAST(MIN(exact_milli) AS BIGINT) AS min_exact_milli,
           CAST(MAX(exact_milli) AS BIGINT) AS max_exact_milli,
           CAST(SUM(ABS(est_cos_milli - exact_milli)) AS BIGINT)
             AS sum_abs_err_milli
    FROM curved GROUP BY hamming, est_cos_milli ORDER BY hamming
    """,
)
def docs_simhash_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.functions.text import words
    from epl_cas_etl_2026_spark.operators.dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sample = ((F.col("id_a") * 31 + F.col("id_b")) % 20) == 0
    pairs = simhash_near_dup_pairs(
        docs, max_hamming=_SIMHASH_P, pair_filter=sample
    )
    pairs = pairs.localCheckpoint(eager=False)  # 3 consumers below
    # distinct-token arrays ONLY for docs in some sampled pair
    touched = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    wl = docs.join(touched, "doc_id", "left_semi").select(
        "doc_id", F.array_distinct(words(F.col("text"))).alias("s")
    )
    wa = wl.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    wb = wl.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    lut = F.array(*[F.lit(int(x)) for x in _SIMHASH_EST_MILLI])
    perpair = (
        pairs.join(wa, "id_a")
        .join(wb, "id_b")
        .select(
            F.col("hamming").cast("long").alias("hamming"),
            F.element_at(lut, (F.col("hamming") + 1).cast("int"))
            .cast("long")
            .alias("est_cos_milli"),
            F.expr(
                "CAST(FLOOR(ROUND(size(array_intersect(sa, sb))"
                " / sqrt(size(sa) * size(sb)), 6) * 1000 + 0.5) AS BIGINT)"
            ).alias("exact_milli"),
        )
    )
    return (
        perpair.groupBy("hamming", "est_cos_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("exact_milli").cast("long").alias("sum_exact_milli"),
            F.min("exact_milli").cast("long").alias("min_exact_milli"),
            F.max("exact_milli").cast("long").alias("max_exact_milli"),
            F.sum(F.abs(F.col("est_cos_milli") - F.col("exact_milli")))
            .cast("long")
            .alias("sum_abs_err_milli"),
        )
        .select(
            "hamming",
            "est_cos_milli",
            "n_pairs",
            "sum_exact_milli",
            "min_exact_milli",
            "max_exact_milli",
            "sum_abs_err_milli",
        )
        .orderBy("hamming")
    )


# ---------------------------------------------------------------------------
# Embedding similarity: brute-force cosine top-k (TakeOrderedAndProject).
# ---------------------------------------------------------------------------
@_register(
    "embedding_topk_cosine",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_dot_product(embedding::DOUBLE[], qv)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qv, qv))), 6) AS sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY sim DESC, vec_id LIMIT 10
    """,
)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        to_double(F.col("embedding")).alias("qv")
    )
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qrow))
    return (
        joined.select(
            "vec_id",
            F.round(
                cosine(to_double(F.col("embedding")), F.col("qv")), 6
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Event-time windows (SURVEY.md §2.9 T4 extension): tumbling & sliding.
# Batch expression here; streaming/windows.py runs the same logic under
# Structured Streaming with a watermark.
# ---------------------------------------------------------------------------
@_register(
    "events_tumbling_hourly",
    f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {det_avg_sql('value')} AS avg_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            det_avg(F.col("value")).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


@_register(
    "events_sliding_counts",
    """
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP)
               - o * (INTERVAL '30 minutes') AS ws,
             event_type
      FROM events, generate_series(0, 1) AS t(o)
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
           event_type, COUNT(*) AS n_events
    FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-hour window sliding every 30 minutes: each event lands in two
    # windows; Spark's window() generates both natively.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Sessionization: 30-minute-gap sessions per user (lag + running sum —
# the batch twin of a streaming session window).
# ---------------------------------------------------------------------------
@_register(
    "events_user_sessions",
    """
    WITH gaps AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts::TIMESTAMP)
                       - epoch_us(LAG(ts::TIMESTAMP) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    )
    SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    gaps = ev.withColumn(
        "is_start",
        F.when(
            prev.isNull() | ((F.unix_micros(F.col("ts")) - prev) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.sum("is_start").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Snapshot diff — reconcile two versions of a table: one full-outer
# join classifies every key as added / removed / changed / unchanged.
# Versions simulated from orders key ranges with a planted "change"
# (status flipped for every 10th overlapping key).
# ---------------------------------------------------------------------------
@_register(
    "orders_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS s FROM orders
      WHERE o_orderkey < 150
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS s
      FROM orders WHERE o_orderkey >= 50 AND o_orderkey < 200
    )
    SELECT CASE WHEN o.k IS NULL THEN 'added'
                WHEN n.k IS NULL THEN 'removed'
                WHEN o.s IS DISTINCT FROM n.s THEN 'changed'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n_rows
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    GROUP BY status ORDER BY status
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.incremental import dataset_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") < 150).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s")
    )
    new = (
        orders.filter(
            (F.col("o_orderkey") >= 50) & (F.col("o_orderkey") < 200)
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 10 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("s"),
        )
    )
    return dataset_diff(old, new, "k", ["s"]).orderBy("status")


# ---------------------------------------------------------------------------
# Incremental rollup maintenance — the stored state is built by
# MERGING two batch-level partial aggregates (pre/post a date split),
# never re-scanning history; the oracle recomputes the rollup
# directly over all rows. Hash-equality here PROVES merge == direct
# (exact decimal sums merge associatively).
# ---------------------------------------------------------------------------
@_register(
    "orders_incremental_rollup",
    """
    SELECT o_orderpriority,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE), 2)
             AS sum_price,
           COUNT(*) AS n_rows
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def orders_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.incremental import (
        merge_aggs,
        partial_aggs,
    )

    orders = load_table(spark, sf_dir, "orders")
    split = "1998-01-01"
    state = partial_aggs(
        orders.filter(F.col("o_orderdate") < split),
        ["o_orderpriority"],
        ["o_totalprice"],
    )
    delta = partial_aggs(
        orders.filter(F.col("o_orderdate") >= split),
        ["o_orderpriority"],
        ["o_totalprice"],
    )
    merged = merge_aggs(state, delta, ["o_orderpriority"])
    return merged.select(
        "o_orderpriority",
        F.round(F.col("sum_o_totalprice").cast("double"), 2).alias("sum_price"),
        F.col("n_rows"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Data-quality constraint report — expectations-style checks as ONE
# scan + one aggregation row per table (operators/quality.py), plus a
# referential-integrity anti-join. The kind of gate a production
# pipeline runs before publishing a table.
# ---------------------------------------------------------------------------
@_register(
    "dq_orders_constraints",
    """
    SELECT * FROM (
      SELECT 'o_custkey__nulls' AS chk,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
      FROM orders
      UNION ALL
      SELECT 'o_orderkey__dup_rows',
             COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
      UNION ALL
      SELECT 'o_orderstatus__bad_value',
             CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice__out_of_range',
             CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                       AND o_totalprice NOT BETWEEN 0 AND 1000000 THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'o_custkey__orphans',
             (SELECT COUNT(*) FROM orders o
              WHERE o.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
    ) ORDER BY chk
    """,
)
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.quality import (
        allowed_values_violations,
        check_constraints,
        fk_violations,
        not_null_violations,
        range_violations,
        unique_violations,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    one_pass = check_constraints(
        orders,
        [
            not_null_violations("o_custkey"),
            unique_violations(orders, "o_orderkey"),
            allowed_values_violations("o_orderstatus", ["O", "F", "P"]),
            range_violations("o_totalprice", 0, 1_000_000),
        ],
    )
    fk = fk_violations(orders, "o_custkey", customer, "c_custkey")
    melted = one_pass.select(
        F.explode(
            F.create_map(
                *[
                    x
                    for c in one_pass.columns
                    for x in (F.lit(c), F.col(c).cast("long"))
                ]
            )
        ).alias("chk", "violations")
    )
    fk_row = fk.select(
        F.lit("o_custkey__orphans").alias("chk"),
        F.col("o_custkey__orphans").cast("long").alias("violations"),
    )
    return melted.unionByName(fk_row).orderBy("chk")


# ---------------------------------------------------------------------------
# Distributed moments: stddev + correlation per group computed from
# EXACT decimal moments (Σx, Σx², Σxy in integer cents), then the
# same closed-form double arithmetic on both engines — immune to the
# engine-specific variance algorithms (Welford vs sum-of-squares)
# that make naive STDDEV/CORR cross-engine unstable. Moments merge
# associatively, so this is also incremental-maintenance-ready.
# ---------------------------------------------------------------------------
@_register(
    "lineitem_moments_stats",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS sq,
             SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS sp,
             SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS HUGEINT)
                 * CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS sqq,
             SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS HUGEINT)
                 * CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS spp,
             SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS HUGEINT)
                 * CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS sqp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(SQRT((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n)
                 / (n - 1)) / 100, 4) AS stddev_qty,
           ROUND(SQRT((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n)
                 / (n - 1)) / 100, 2) AS stddev_price,
           ROUND((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / n)
                 / SQRT((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n)
                        * (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n)),
                 6) AS corr_qty_price
    FROM m ORDER BY l_returnflag
    """,
)
def lineitem_moments_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_scan (r12): six decimal(38) product aggregates over 600k
    # rows on one scan split — interleaved A/B 1.84 → 1.45 s med;
    # no-op at scale.
    li = spread_scan(load_table(spark, sf_dir, "lineitem"))
    qc = F.floor(F.col("l_quantity") * 100 + 0.5).cast("decimal(38,0)")
    pc = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("decimal(38,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qc).alias("sq"),
        F.sum(pc).alias("sp"),
        F.sum(qc * qc).alias("sqq"),
        F.sum(pc * pc).alias("spp"),
        F.sum(qc * pc).alias("sqp"),
    )
    n = F.col("n").cast("double")
    sq, sp = F.col("sq").cast("double"), F.col("sp").cast("double")
    sqq, spp, sqp = (
        F.col("sqq").cast("double"),
        F.col("spp").cast("double"),
        F.col("sqp").cast("double"),
    )
    var_q = (sqq - sq * sq / n) / (n - 1)
    var_p = (spp - sp * sp / n) / (n - 1)
    cov_num = sqp - sq * sp / n
    return m.select(
        "l_returnflag",
        F.col("n"),
        F.round(F.sqrt(var_q) / 100, 4).alias("stddev_qty"),
        F.round(F.sqrt(var_p) / 100, 2).alias("stddev_price"),
        F.round(
            cov_num
            / F.sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)),
            6,
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Exact percentiles per group (sort-based distributed percentile —
# linear interpolation, same formula in both engines). The sketch
# path for 100 TB is approx_percentile (t-digest), engine-specific by
# nature like HLL — the exact twin is the correctness anchor.
# ---------------------------------------------------------------------------
@_register(
    "orders_price_percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def orders_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts — users grouped by first-seen week, pivoted
# on weeks-since-cohort (A10's pivot machinery on event data; the
# standard activation/retention matrix).
# ---------------------------------------------------------------------------
@_register(
    "events_weekly_retention",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(FLOOR(epoch_us(MIN(ts)) / 604800000000) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(FLOOR(epoch_us(e.ts) / 604800000000) AS BIGINT) - f.cohort_week
               AS weeks_since
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week,
           COUNT(DISTINCT CASE WHEN weeks_since = 0 THEN user_id END) AS w0,
           COUNT(DISTINCT CASE WHEN weeks_since = 1 THEN user_id END) AS w1,
           COUNT(DISTINCT CASE WHEN weeks_since = 2 THEN user_id END) AS w2,
           COUNT(DISTINCT CASE WHEN weeks_since = 3 THEN user_id END) AS w3
    FROM activity GROUP BY cohort_week ORDER BY cohort_week
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = (F.floor(F.unix_micros("ts") / 604800000000)).cast("long")
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    aggs = [
        F.countDistinct(
            F.when(F.col("weeks_since") == w, F.col("user_id"))
        ).alias(f"w{w}")
        for w in range(4)
    ]
    return activity.groupBy("cohort_week").agg(*aggs).orderBy("cohort_week")


# ---------------------------------------------------------------------------
# Set operations beyond UNION (engine breadth past the reference's
# surface): INTERSECT and EXCEPT with proper bag→set semantics.
# ---------------------------------------------------------------------------
@_register(
    "events_user_set_ops",
    """
    SELECT * FROM (
      SELECT 'clicked_and_purchased' AS cohort, COUNT(*) AS n_users FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase')
      UNION ALL
      SELECT 'clicked_never_purchased', COUNT(*) FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase')
    ) ORDER BY cohort
    """,
)
def events_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clickers.intersect(buyers).agg(
        F.count(F.lit(1)).alias("n_users")
    ).withColumn("cohort", F.lit("clicked_and_purchased"))
    # subtract = EXCEPT DISTINCT (set semantics) — exceptAll would be
    # bag difference and keep a user with more clicks than purchases
    only = clickers.subtract(buyers).agg(
        F.count(F.lit(1)).alias("n_users")
    ).withColumn("cohort", F.lit("clicked_never_purchased"))
    return both.unionByName(only).select("cohort", "n_users").orderBy("cohort")


# ---------------------------------------------------------------------------
# UNPIVOT (wide → long): the inverse of the A10 pivot, via the native
# melt operator — round-trips the segment matrix back to long form.
# ---------------------------------------------------------------------------
@_register(
    "region_segment_unpivot",
    """
    WITH wide AS (
      SELECT r_name,
             SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BUILDING,
             SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS MACHINERY
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      GROUP BY r_name
    )
    SELECT r_name, seg, CAST(n AS BIGINT) AS n
    FROM wide UNPIVOT (n FOR seg IN (BUILDING, MACHINERY))
    ORDER BY r_name, seg
    """,
)
def region_segment_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    wide = (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.sum(
                F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
            ).alias("BUILDING"),
            F.sum(
                F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)
            ).alias("MACHINERY"),
        )
    )
    return wide.unpivot(
        "r_name", ["BUILDING", "MACHINERY"], "seg", "n"
    ).orderBy("r_name", "seg")


# ---------------------------------------------------------------------------
# Sketch-path percentiles — approx_percentile (mergeable quantile
# sketch): the 100 TB path next to the exact sort-based twin
# (orders_price_percentiles). Like the HLL query, sketch estimates
# are engine-specific → rows-only driver check; the exact twin is the
# correctness anchor, and this query self-reports its error vs exact.
# ---------------------------------------------------------------------------
@_register(
    "orders_price_approx_quantiles",
    """
    SELECT
      CAST(FLOOR(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) * 100
                 + 0.5) AS BIGINT) AS exact_p50_cents,
      CAST(FLOOR(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) * 100
                 + 0.5) AS BIGINT) AS exact_p90_cents,
      TRUE AS p50_within_1pct,
      TRUE AS p90_within_1pct
    FROM orders
    """,
)
def orders_price_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch estimates are engine-specific, so the gated columns are
    engine-independent: the EXACT interpolated percentiles (cent-
    quantized via the cross-engine FLOOR(x*100+0.5) rule; both engines
    use the continuous (n-1)*p convention) plus booleans asserting the
    mergeable quantile sketch (accuracy 1/10000 — the 100 TB path)
    landed within 1% relative of exact. A sketch drifting out of its
    error bound now turns the row red instead of being unobservable."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    approx = F.approx_percentile(
        price, F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    exact_p50 = F.percentile(price, F.lit(0.5))
    exact_p90 = F.percentile(price, F.lit(0.9))
    return orders.agg(
        approx[0].alias("a50"),
        approx[1].alias("a90"),
        exact_p50.alias("e50"),
        exact_p90.alias("e90"),
    ).select(
        F.floor(F.col("e50") * 100 + 0.5).cast("long").alias("exact_p50_cents"),
        F.floor(F.col("e90") * 100 + 0.5).cast("long").alias("exact_p90_cents"),
        (F.abs(F.col("a50") - F.col("e50")) <= 0.01 * F.col("e50")).alias(
            "p50_within_1pct"
        ),
        (F.abs(F.col("a90") - F.col("e90")) <= 0.01 * F.col("e90")).alias(
            "p90_within_1pct"
        ),
    )


# ---------------------------------------------------------------------------
# Funnel conversion — ordered-sequence analytics (signup → click →
# purchase, each step strictly after the previous FIRST occurrence).
# Three stage frames chained by broadcast-size per-user timestamps;
# shuffles only on user_id.
# ---------------------------------------------------------------------------
@_register(
    "events_funnel_conversion",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 'step1_signup' AS step, COUNT(*) AS n_users FROM s1
      UNION ALL SELECT 'step2_click_after_signup', COUNT(*) FROM s2
      UNION ALL SELECT 'step3_purchase_after_click', COUNT(*) FROM s3
    ) ORDER BY step
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None, prev_t: str, out_t: str):
        step = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            step = step.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return step.groupBy("user_id").agg(F.min("ts").alias(out_t))

    s1 = first_after("signup", None, "", "t1")
    s2 = first_after("click", s1, "t1", "t2")
    s3 = first_after("purchase", s2, "t2", "t3")
    counts = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("step1_signup")
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("step2_click_after_signup")
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("step3_purchase_after_click")
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select("step", "n_users").orderBy("step")


# ---------------------------------------------------------------------------
# F10 analogue — JSON navigation on the events props column.
# ---------------------------------------------------------------------------
@_register(
    "events_json_extract",
    f"""
    SELECT CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS BIGINT) AS k_decile,
           COUNT(*) AS n,
           {det_avg_sql('value')} AS avg_value
    FROM events GROUP BY k_decile ORDER BY k_decile
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k_decile", F.floor(k / 10).cast("long"))
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            det_avg(F.col("value")).alias("avg_value"),
        )
        .orderBy("k_decile")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing: binary payload → mapInPandas metadata extraction
# (decode stubbed — see operators/multimodal.py). Oracle recomputes the
# deterministic metadata formulas in SQL.
# ---------------------------------------------------------------------------
@_register(
    "docs_multimodal_meta",
    """
    SELECT doc_id AS id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
           CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height,
           md5(text) AS checksum
    FROM documents WHERE doc_id < 100 ORDER BY id
    """,
)
def docs_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    payload = with_binary_payload(docs, "text", "payload")
    return decode_image_meta(payload, id_col="doc_id").orderBy("id")


# ---------------------------------------------------------------------------
# Multimodal fan-outs, driver-gated: video frame sampling (one row →
# n_frames rows with byte offsets) and audio chunking (one row →
# ceil(len/chunk) rows). Decode is stubbed (no media libs in this
# container) but the fan-out shape, offsets, and partition behavior
# are the real thing — the oracle recomputes every offset.
# ---------------------------------------------------------------------------
@_register(
    "docs_frame_samples",
    """
    SELECT doc_id AS id, f AS frame_index,
           CAST(f * (octet_length(encode(text)) // 4) AS BIGINT) AS byte_offset
    FROM documents, generate_series(0, 3) AS t(f)
    WHERE doc_id < 40
    ORDER BY id, frame_index
    """,
)
def docs_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.multimodal import frame_sample_stub

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    payload = with_binary_payload(docs, "text")
    return frame_sample_stub(payload, n_frames=4).orderBy(
        "id", "frame_index"
    )


@_register(
    "docs_audio_chunks",
    """
    SELECT source,
           CAST(SUM(CEIL(octet_length(encode(text)) / 16.0)) AS BIGINT)
             AS n_chunks,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents GROUP BY source ORDER BY source
    """,
)
def docs_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.multimodal import audio_chunk_stub

    docs = load_table(spark, sf_dir, "documents")
    chunks = audio_chunk_stub(
        with_binary_payload(docs, "text"), chunk_bytes=16
    )
    per_doc = chunks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.first("total_bytes").alias("doc_bytes"),
    )
    docs_src = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source"
    )
    return (
        per_doc.join(docs_src, "id")
        .groupBy("source")
        .agg(
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("doc_bytes").alias("total_bytes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Language-ID (marker/n-gram heuristic): argmax of per-language marker
# hits, first-max-wins on ties (lexicographic language order).
# ---------------------------------------------------------------------------
LANG_MARKERS = {
    "core_ish": ("data", "value", "row", "key"),
    "ops_ish": ("batch", "window", "merge", "agg"),
    "sql_ish": ("query", "join", "filter", "scan"),
}


def _markers_sql(lang: str) -> str:
    toks = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), x -> list_contains([{toks}], x)))"
    )


@_register(
    "docs_language_id",
    f"""
    WITH scored AS (
      SELECT doc_id,
             {_markers_sql('core_ish')} AS s_core,
             {_markers_sql('ops_ish')} AS s_ops,
             {_markers_sql('sql_ish')} AS s_sql
      FROM documents
    )
    SELECT CASE WHEN s_sql > GREATEST(s_core, s_ops) THEN 'sql_ish'
                WHEN s_ops > s_core THEN 'ops_ish'
                ELSE 'core_ish' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored GROUP BY predicted_lang ORDER BY predicted_lang
    """,
)
def docs_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explode → marker filter → conditional agg: tokens that match no
    # marker (the overwhelming majority) are dropped BEFORE the
    # shuffle, and every stage is whole-stage-codegen'd — unlike the
    # higher-order-function argmax (functions/text.lang_scores), which
    # is interpreted per element. Zero-hit docs are restored by a
    # left join on the slim doc_id frame (argmax of all-zero = first
    # language, matching the oracle's CASE ordering).
    docs = load_table(spark, sf_dir, "documents")
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok").isin(all_markers))

    def _hits(lang: str) -> F.Column:
        return F.sum(
            F.when(F.col("tok").isin(*LANG_MARKERS[lang]), 1).otherwise(0)
        )

    scored = toks.groupBy("doc_id").agg(
        _hits("core_ish").alias("s_core"),
        _hits("ops_ish").alias("s_ops"),
        _hits("sql_ish").alias("s_sql"),
    )
    full = (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ("s_core", "s_ops", "s_sql")
            ]
        )
    )
    predicted = (
        F.when(
            F.col("s_sql") > F.greatest("s_core", "s_ops"), F.lit("sql_ish")
        )
        .when(F.col("s_ops") > F.col("s_core"), F.lit("ops_ish"))
        .otherwise(F.lit("core_ish"))
    )
    return (
        full.withColumn("predicted_lang", predicted)
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("predicted_lang")
    )


# ---------------------------------------------------------------------------
# Character n-gram Jaccard near-dup — the exact small-subset baseline
# (brute-force pairs over a bounded id range). The unbounded-scale
# path is the MinHash/LSH pipeline above; this pins its quality.
# ---------------------------------------------------------------------------
@_register(
    "docs_char_ngram_jaccard",
    """
    WITH grams AS (
      SELECT doc_id,
             list_distinct([text[i:i+3] FOR i IN range(1, length(text) - 2)]) AS g
      FROM documents WHERE doc_id < 60
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.g, b.g)) * 1.0
                 / nullif(len(list_distinct(a.g || b.g)), 0), 6) AS jaccard4
    FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.g, b.g)) * 1.0
          / nullif(len(list_distinct(a.g || b.g)), 0) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def docs_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    n = 4
    # Guard: texts shorter than n chars would make sequence(1, len-3)
    # DESCENDING (e.g. [1, 0]) and emit spurious grams where the
    # oracle's range() is empty — same guard as dedup.shingles_of_words.
    seq = F.when(
        F.length("text") >= n,
        F.sequence(F.lit(1), F.length("text") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(seq, lambda i: F.col("text").substr(i, F.lit(n)))
        ).alias("g"),
    )
    a = grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb")).cast("double")
    jac = inter / F.nullif(union, F.lit(0.0))
    return (
        pairs.withColumn("jaccard4", F.round(jac, 6))
        .filter(F.col("jaccard4") >= 0.4)
        .select("id_a", "id_b", "jaccard4")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: BANDED random-hyperplane LSH (the
# embedding analogue of MinHash banding) → exact cosine verify on the
# candidate pairs only. b bands × r sign bits each: a random pair
# collides in a band with prob 2^-r, so the candidate stage is
# ~n²·b/2^r — pick r ≈ log2(n) (and raise b for recall) and it stays
# ~O(n·b) instead of the fixed-bucket ~n²/const. The hyperplane
# matrix is a seeded literal shared verbatim with the DuckDB twin, so
# both engines band identically. Operator: similarity.band_lsh_pairs.
# ---------------------------------------------------------------------------
_LSH_BANDS = 16
_LSH_ROWS = 12  # sign bits per band ≈ log2(n) at the bench scale (n=2k)
_EMB_DIM = 64


def _lsh_planes() -> list[list[float]]:
    from epl_cas_etl_2026_spark.operators.similarity import hyperplanes

    return [
        [round(x, 4) for x in p]
        for p in hyperplanes(_EMB_DIM, _LSH_BANDS * _LSH_ROWS, seed=7)
    ]


def _planes_sql() -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(x) for x in p) + "]" for p in _lsh_planes()
    )
    return "[" + rows + "]"


@_register(
    "embedding_near_dup_cosine",
    f"""
    WITH pl AS (SELECT {_planes_sql()} AS planes),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bits AS (
      SELECT vec_id, v,
             [CASE WHEN list_dot_product(v, p) >= 0 THEN '1' ELSE '0' END
              FOR p IN planes] AS bits
      FROM v, pl
    ),
    banded AS (
      SELECT vec_id, b AS band,
             array_to_string(bits[b*{_LSH_ROWS}+1:b*{_LSH_ROWS}+{_LSH_ROWS}], '') AS key
      FROM bits, generate_series(0, {_LSH_BANDS - 1}) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.vec_id < c.vec_id
    ),
    nb AS (
      SELECT vec_id, [x / sqrt(list_dot_product(v, v)) FOR x IN v] AS nv
      FROM v
    )
    SELECT id_a, id_b, ROUND(list_dot_product(a.nv, c.nv), 6) AS sim
    FROM cand
    JOIN nb a ON a.vec_id = id_a
    JOIN nb c ON c.vec_id = id_b
    WHERE list_dot_product(a.nv, c.nv) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def embedding_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import band_lsh_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return band_lsh_pairs(
        emb,
        planes=_lsh_planes(),
        n_bands=_LSH_BANDS,
        rows_per_band=_LSH_ROWS,
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.4,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# LSH ESTIMATOR CALIBRATION (round-11; the embedding twin of
# docs_minhash_estimate_error, per the r10 verdict item 4): for every
# band_lsh_pairs candidate, the sign-bit-estimated cosine (Goemans-
# Williamson: m agreeing bits out of P planes estimates
# cos(π·(1-m/P))) is compared against the exact cosine in integer
# millis, grouped into the calibration curve a 100 TB deployment
# audits before trusting a similarity threshold. The est-cosine-per-
# match-count mapping is a 193-entry INTEGER LITERAL table computed
# once in Python and injected verbatim into BOTH engines (the _DCG_W
# precedent) — no engine evaluates cos(); the only floats are the
# exact dots, quantized by the proven ROUND(sim,6) → FLOOR(x·1000+0.5)
# half-up rule. Candidates come from the banded equi-join (never
# all-pairs); est_matches is integer bit arithmetic over the band keys
# the banding stage already produced.
# ---------------------------------------------------------------------------
_LSH_P = _LSH_BANDS * _LSH_ROWS
_LSH_EST_MILLI = [
    int(math.floor(1000.0 * math.cos(math.pi * (1.0 - m / _LSH_P)) + 0.5))
    for m in range(_LSH_P + 1)
]


@_register(
    "embedding_lsh_estimate_error",
    f"""
    WITH pl AS (SELECT {_planes_sql()} AS planes),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bits AS (
      SELECT vec_id, v,
             [CASE WHEN list_dot_product(v, p) >= 0 THEN '1' ELSE '0' END
              FOR p IN planes] AS bits
      FROM v, pl
    ),
    banded AS (
      SELECT vec_id, b AS band,
             array_to_string(bits[b*{_LSH_ROWS}+1:b*{_LSH_ROWS}+{_LSH_ROWS}], '') AS key
      FROM bits, generate_series(0, {_LSH_BANDS - 1}) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.vec_id < c.vec_id
    ),
    nb AS (
      SELECT vec_id, bits,
             [x / sqrt(list_dot_product(v, v)) FOR x IN v] AS nv
      FROM bits
    ),
    perpair AS (
      SELECT
        CAST(len(list_filter(range(0, {_LSH_P}),
                             j -> a.bits[j+1] = c.bits[j+1])) AS BIGINT)
          AS est_matches,
        CAST(FLOOR(ROUND(list_dot_product(a.nv, c.nv), 6) * 1000 + 0.5)
             AS BIGINT) AS exact_milli
      FROM cand
      JOIN nb a ON a.vec_id = id_a
      JOIN nb c ON c.vec_id = id_b
    ),
    curved AS (
      SELECT est_matches, exact_milli,
             ([{', '.join(str(x) for x in _LSH_EST_MILLI)}]
             )[est_matches + 1] AS est_cos_milli
      FROM perpair
    )
    SELECT est_matches,
           CAST(est_cos_milli AS BIGINT) AS est_cos_milli,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(exact_milli) AS BIGINT) AS sum_exact_milli,
           CAST(MIN(exact_milli) AS BIGINT) AS min_exact_milli,
           CAST(MAX(exact_milli) AS BIGINT) AS max_exact_milli,
           CAST(SUM(ABS(est_cos_milli - exact_milli)) AS BIGINT)
             AS sum_abs_err_milli
    FROM curved GROUP BY est_matches, est_cos_milli ORDER BY est_matches
    """,
)
def embedding_lsh_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        band_lsh_calibration_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    perpair = band_lsh_calibration_pairs(
        emb,
        planes=_lsh_planes(),
        n_bands=_LSH_BANDS,
        rows_per_band=_LSH_ROWS,
        id_col="vec_id",
        vec_col="embedding",
    )
    lut = F.array(*[F.lit(int(x)) for x in _LSH_EST_MILLI])
    curved = perpair.select(
        "est_matches",
        F.element_at(lut, (F.col("est_matches") + 1).cast("int"))
        .cast("long")
        .alias("est_cos_milli"),
        F.expr(
            "CAST(FLOOR(ROUND(sim, 6) * 1000 + 0.5) AS BIGINT)"
        ).alias("exact_milli"),
    )
    return (
        curved.groupBy("est_matches", "est_cos_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("exact_milli").cast("long").alias("sum_exact_milli"),
            F.min("exact_milli").cast("long").alias("min_exact_milli"),
            F.max("exact_milli").cast("long").alias("max_exact_milli"),
            F.sum(F.abs(F.col("est_cos_milli") - F.col("exact_milli")))
            .cast("long")
            .alias("sum_abs_err_milli"),
        )
        .select(
            "est_matches",
            "est_cos_milli",
            "n_pairs",
            "sum_exact_milli",
            "min_exact_milli",
            "max_exact_milli",
            "sum_abs_err_milli",
        )
        .orderBy("est_matches")
    )


# ---------------------------------------------------------------------------
# Auto-sized banded LSH — gates the OPERATIONAL entry point
# (band_lsh_pairs_auto + lsh_params_for), not just the fixed-(b, r)
# banding above. The (b, r) sizing rule is closed-form, so the DuckDB
# twin recomputes it from COUNT(*) alone: r = max(4, ceil(log2 n)),
# b = min(32, ceil(ln(1-recall)/ln(1-p^r))) with p = 1-acos(s)/pi —
# a cross-engine check of the scale law itself. The emitted pair set
# depends on the random hyperplanes (not SQL-reproducible), so the
# row instead pins precision: every emitted pair's exact cosine
# cleared the threshold (recall stays a property-test concern — it is
# probabilistic by design).
# ---------------------------------------------------------------------------
@_register(
    "embedding_lsh_auto_params",
    """
    WITH c AS (SELECT COUNT(*) AS n FROM embeddings),
    s AS (
      SELECT n,
             GREATEST(4, CAST(CEIL(LOG2(GREATEST(n, 2))) AS BIGINT)) AS r
      FROM c
    ),
    p AS (SELECT n, r, POWER(1.0 - ACOS(0.8) / PI(), r) AS pb FROM s)
    SELECT CAST(n AS BIGINT) AS n_vectors,
           CAST(LEAST(32, GREATEST(1,
                CAST(CEIL(LN(1.0 - 0.9) / LN(1.0 - pb)) AS BIGINT)))
             AS BIGINT) AS n_bands,
           CAST(r AS BIGINT) AS rows_per_band,
           TRUE AS precision_ok
    FROM p
    """,
)
def embedding_lsh_auto_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        band_lsh_pairs_auto,
        lsh_params_for,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    b, r = lsh_params_for(n, target_sim=0.8, target_recall=0.9)
    pairs = band_lsh_pairs_auto(
        emb,
        dim=64,
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.4,
        target_sim=0.8,
        target_recall=0.9,
    )
    return pairs.agg(
        F.lit(n).cast("long").alias("n_vectors"),
        F.lit(b).cast("long").alias("n_bands"),
        F.lit(r).cast("long").alias("rows_per_band"),
        F.coalesce(F.min("sim") >= 0.4 - 1e-6, F.lit(True)).alias(
            "precision_ok"
        ),
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: probe only the query vector's coarse bucket, exact
# cosine inside it (the scale path next to brute-force topk above).
# Coarse quantizer: 6 sign bits of the leading dims — fine for a
# single-query probe (the pairwise case uses band_lsh_pairs above).
# ---------------------------------------------------------------------------
_N_SIGNBITS = 6

_SIGNBITS_SQL = "(" + " + ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
    for i in range(_N_SIGNBITS)
) + ")"


def _signbits_col(vec, n_bits: int = _N_SIGNBITS) -> F.Column:
    key = F.lit(0)
    for i in range(n_bits):
        key = key + F.when(vec[i] >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


@_register(
    "embedding_ann_ivf_signbits",
    f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {_SIGNBITS_SQL} AS bucket
      FROM embeddings
    ),
    q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS sim
    FROM b, q
    WHERE bucket = qb AND vec_id <> 0
    ORDER BY sim DESC, vec_id LIMIT 5
    """,
)
def embedding_ann_ivf_signbits(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    bucketed = emb.withColumn("bucket", _signbits_col(F.col("v")))
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    probed = bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qb")).filter(
        F.col("vec_id") != 0
    )
    return (
        probed.select(
            "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Multi-probe IVF ANN — probe the query's coarse bucket AND all
# hamming-1 neighbor buckets (recall recovers without growing the
# index): candidate set ~ (1 + n_bits)/2^n_bits of the data instead
# of exact-bucket-only. Bucket distance via bit_count(xor).
# ---------------------------------------------------------------------------
@_register(
    "embedding_ann_multiprobe",
    f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {{signbits}} AS bucket
      FROM embeddings
    ),
    q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS sim
    FROM b, q
    WHERE bit_count(xor(bucket, qb)) <= 1 AND vec_id <> 0
    ORDER BY sim DESC, vec_id LIMIT 5
    """.format(signbits="(" + " + ".join(
        f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(6)
    ) + ")"),
)
def embedding_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    bucketed = emb.withColumn("bucket", _signbits_col(F.col("v")))
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    probed = bucketed.join(
        F.broadcast(q),
        F.bit_count(
            F.col("bucket").bitwiseXOR(F.col("qb")).cast("long")
        ) <= 1,
    ).filter(F.col("vec_id") != 0)
    return (
        probed.select(
            "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation — recall@k curve of the multi-probe sign-bit
# index against exact brute force, over a 16-query probe set (vec_ids
# 0..15). The serving-eval operator every ANN deployment needs: ship
# an index change only if recall@{1,5,10} holds. Both rankings use
# the same round-to-6dp cosine and vec_id tie-break, so the WHOLE
# curve — not an invariant subset — is the gated, SQL-twinned output.
#
# recall@k = |ANN top-k ∩ exact top-k| / k, averaged over queries
# (ppm, half-up integer division — exact integers to the end).
#
# 100 TB shape: the exact arm is the brute-force eval baseline and
# scans corpus × |probe set| on purpose (that IS the ground-truth
# cost; probe sets are sampled, corpus-pass-bounded). Per-query top-k
# is TWO-PHASE: per-physical-partition top-10 first (window over
# (qid, spark_partition_id) — result provably partition-layout-
# independent, since any global top-10 row is in its partition's
# top-10), then a global window over ≤ 10·P survivors per query —
# never one reducer holding a whole query's corpus scores.
# ---------------------------------------------------------------------------
_RECALL_KS = (1, 5, 10)


@_register(
    "embedding_ann_recall_curve",
    f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {_SIGNBITS_SQL} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM b
          WHERE vec_id < 16),
    sims AS (
      SELECT qid, vec_id,
             ROUND(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(qv, qv))), 6) AS sim,
             bit_count(xor(bucket, qb)) <= 1 AS probed
      FROM b, q WHERE vec_id <> qid
    ),
    ex AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, vec_id) AS er
           FROM sims),
    an AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, vec_id) AS ar
           FROM sims WHERE probed),
    hits AS (
      SELECT qid, er, ar FROM ex JOIN an USING (qid, vec_id)
      WHERE er <= 10 AND ar <= 10
    ),
    nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM q)
    SELECT k, n_queries,
           CASE WHEN n_queries = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((COALESCE(SUM(CASE WHEN er <= k AND ar <= k
                                              THEN 1 ELSE 0 END), 0)
                           * 1000000 + (n_queries * k) // 2)
                          // (n_queries * k) AS BIGINT)
           END AS recall_ppm
    FROM (VALUES {", ".join(f"(CAST({k} AS BIGINT))" for k in _RECALL_KS)})
         ks(k)
    CROSS JOIN nq
    LEFT JOIN hits ON TRUE
    GROUP BY k, n_queries ORDER BY k
    """,
)
def embedding_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    bucketed = emb.withColumn("bucket", _signbits_col(F.col("v")))
    q = bucketed.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    sims = (
        bucketed.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
            (
                F.bit_count(
                    F.col("bucket").bitwiseXOR(F.col("qb")).cast("long")
                )
                <= 1
            ).alias("probed"),
        )
        .localCheckpoint(eager=False)  # exact + ANN ranking consumers
    )

    def _topk(df: DataFrame, rank_name: str) -> DataFrame:
        # phase 1: per-physical-partition prune (layout-independent:
        # a global top-10 row is always in its own partition's top-10)
        pid = df.withColumn("__pid", F.spark_partition_id())
        w1 = Window.partitionBy("qid", "__pid").orderBy(
            F.desc("sim"), F.asc("vec_id")
        )
        pruned = (
            pid.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= 10)
            .drop("__pid", "__rn")
        )
        # phase 2: global rank over <= 10 * n_partitions survivors
        w2 = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
        return (
            pruned.withColumn(rank_name, F.row_number().over(w2))
            .filter(F.col(rank_name) <= 10)
            .select("qid", "vec_id", rank_name)
        )

    ex = _topk(sims, "er")
    an = _topk(sims.filter(F.col("probed")), "ar")
    hits = ex.join(an, ["qid", "vec_id"])
    nq = q.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    ks = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k).cast("long") for k in _RECALL_KS])
        ).alias("k")
    )
    return (
        ks.crossJoin(F.broadcast(nq))
        .join(F.broadcast(hits), F.lit(True), "left")
        .groupBy("k", "n_queries")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("er") <= F.col("k"))
                        & (F.col("ar") <= F.col("k")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("h")
        )
        .select(
            "k",
            "n_queries",
            F.when(F.col("n_queries") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(h * CAST(1000000 AS BIGINT)"
                    " + (n_queries * k) div 2) div (n_queries * k)"
                )
            )
            .alias("recall_ppm"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Dimension-truncation recall sweep — the embedding-compression
# decision operator (Matryoshka-style): how much of full-dim exact
# top-10 survives if search uses only the first d dims? One row per
# budget d ∈ {8,16,32,64}; the d=64 row is a built-in self-check
# (recall ≡ 1). Same probe set, rounding, tie-break and two-phase
# per-query top-k as embedding_ann_recall_curve; the d axis rides the
# SAME pair scan (exploded, sliced in-plan) — one corpus×probes pass
# for the whole sweep, not one per budget.
# ---------------------------------------------------------------------------
_TRUNC_DS = (8, 16, 32, 64)


@_register(
    "embedding_dim_truncation_recall",
    f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM b WHERE vec_id < 16),
    sims AS (
      SELECT d, qid, vec_id,
             ROUND(list_dot_product(v[1:d], qv[1:d])
                   / NULLIF(sqrt(list_dot_product(v[1:d], v[1:d]))
                            * sqrt(list_dot_product(qv[1:d], qv[1:d])), 0),
                   6) AS sim
      FROM b, q,
           (VALUES {", ".join(f"({d})" for d in _TRUNC_DS)}) ds(d)
      WHERE vec_id <> qid
    ),
    rk AS (SELECT d, qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY d, qid
                                     ORDER BY sim DESC NULLS LAST, vec_id)
                    AS r
           FROM sims),
    ex AS (SELECT qid, vec_id FROM rk WHERE d = 64 AND r <= 10),
    hits AS (
      SELECT rk.d, rk.qid FROM rk JOIN ex USING (qid, vec_id)
      WHERE rk.r <= 10
    ),
    nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM q)
    SELECT CAST(ds.d AS BIGINT) AS d, n_queries,
           CASE WHEN n_queries = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((COALESCE(COUNT(hits.qid), 0) * 1000000
                           + (n_queries * 10) // 2)
                          // (n_queries * 10) AS BIGINT)
           END AS recall_ppm
    FROM (VALUES {", ".join(f"({d})" for d in _TRUNC_DS)}) ds(d)
    CROSS JOIN nq
    LEFT JOIN hits ON hits.d = ds.d
    GROUP BY ds.d, n_queries ORDER BY d
    """,
)
def embedding_dim_truncation_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    q = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    ds = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d).cast("int") for d in _TRUNC_DS])
        ).alias("d")
    )
    # One pass over the pair scan for the WHOLE d-sweep (was: the pair
    # scan ×4 via a crossJoin with the budget axis, each row slicing
    # and re-multiplying its own d-prefix): the three elementwise
    # product arrays (v·q, v·v, q·q — the only O(dim) multiply work)
    # are computed ONCE per pair inside a Generate barrier (explode of
    # a 1-element array, which CollapseProject cannot inline back into
    # the consumers), and each budget's dot/norms are then prefix
    # folds over slices of those arrays. aggregate(slice(zip_with(a,b),
    # 1, d)) is the same sequence of multiplies and left-fold adds as
    # aggregate(zip_with(slice(a), slice(b))) — sims are bit-identical
    # to the previous form, so the oracle hash is unchanged.
    prods = F.struct(
        F.zip_with("v", "qv", lambda a, b: a * b).alias("pq"),
        F.transform("v", lambda a: a * a).alias("vv"),
        F.transform("qv", lambda a: a * a).alias("qq"),
    )
    pairz = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.explode(F.array(prods)).alias("z"))
    )

    def _pref(arr, d):
        return F.aggregate(
            F.slice(arr, 1, d), F.lit(0.0), lambda acc, x: acc + x
        )

    sims = pairz.select(
        "qid",
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        F.round(
                            _pref(F.col("z.pq"), d)
                            / F.nullif(
                                F.sqrt(_pref(F.col("z.vv"), d))
                                * F.sqrt(_pref(F.col("z.qq"), d)),
                                F.lit(0.0),
                            ),
                            6,
                        ).alias("sim"),
                    )
                    for d in _TRUNC_DS
                ]
            )
        ).alias("s"),
    ).select(F.col("s.d").alias("d"), "qid", "vec_id", F.col("s.sim").alias("sim"))

    def _trunc_topk(df: DataFrame) -> DataFrame:
        pid = df.withColumn("__pid", F.spark_partition_id())
        w1 = Window.partitionBy("d", "qid", "__pid").orderBy(
            F.desc_nulls_last("sim"), F.asc("vec_id")
        )
        pruned = (
            pid.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= 10)
            .drop("__pid", "__rn")
        )
        w2 = Window.partitionBy("d", "qid").orderBy(
            F.desc_nulls_last("sim"), F.asc("vec_id")
        )
        return (
            pruned.withColumn("r", F.row_number().over(w2))
            .filter(F.col("r") <= 10)
            .select("d", "qid", "vec_id")
        )

    # NO materialization (r12 A/B, verdict item 1): dropping the r11
    # lazy localCheckpoint measured 2.52/2.62 s (min/med) interleaved
    # vs 2.75/4.44 s with it and 2.62/2.80 s with persist — the two
    # consumers (ex + hits) duplicate the window subtree in the static
    # plan, but runtime exchange reuse + AQE staying free to plan the
    # final join beat both materialization variants here.
    rk = _trunc_topk(sims)
    ex = rk.filter(F.col("d") == 64).select("qid", "vec_id")
    hits = rk.join(ex, ["qid", "vec_id"]).select("d", "qid")
    nq = q.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        ds.select(F.col("d").cast("long").alias("d"))
        .crossJoin(F.broadcast(nq))
        .join(
            F.broadcast(hits.withColumnRenamed("d", "hd")),
            F.col("hd") == F.col("d"),
            "left",
        )
        .groupBy("d", "n_queries")
        .agg(F.count("qid").alias("h"))
        .select(
            "d",
            "n_queries",
            F.when(F.col("n_queries") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(h * CAST(1000000 AS BIGINT)"
                    " + (n_queries * 10) div 2) div (n_queries * 10)"
                )
            )
            .alias("recall_ppm"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Stopword ratio — share of function words per doc (with length and
# repetition, the classic fluency signal: natural prose has a stable
# stopword share, keyword spam and tables don't). Same explode →
# filter → conditional-agg shape as language-ID.
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@_register(
    "docs_stopword_stats",
    f"""
    WITH r AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '),
                             x -> list_contains([{_STOPWORDS_SQL}], x))) * 1.0
               / nullif(len(string_split(text, ' ')), 0) AS ratio
      FROM documents
    )
    SELECT lang,
           ROUND(AVG(ratio), 4) AS avg_stopword_ratio,
           CAST(SUM(CASE WHEN ratio < 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_stopword
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def docs_stopword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS))
    )
    ratio = n_stop * 1.0 / F.nullif(F.size(toks).cast("double"), F.lit(0.0))
    return (
        docs.withColumn("ratio", ratio)
        .groupBy("lang")
        .agg(
            F.round(F.avg("ratio"), 4).alias("avg_stopword_ratio"),
            F.sum(F.when(F.col("ratio") < 0.05, 1).otherwise(0)).alias(
                "n_low_stopword"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Repetition ratio — distinct-token share per doc (the boilerplate /
# degenerate-text signal pretraining filters use): per-lang average
# and count of highly repetitive docs.
# ---------------------------------------------------------------------------
@_register(
    "docs_repetition_ratio",
    """
    WITH r AS (
      SELECT lang,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / nullif(len(string_split(text, ' ')), 0) AS ratio
      FROM documents
    )
    SELECT lang,
           ROUND(AVG(ratio), 4) AS avg_distinct_ratio,
           CAST(SUM(CASE WHEN ratio < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitive
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def docs_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ratio = F.size(F.array_distinct(toks)) * 1.0 / F.nullif(
        F.size(toks).cast("double"), F.lit(0.0)
    )
    return (
        docs.withColumn("ratio", ratio)
        .groupBy("lang")
        .agg(
            F.round(F.avg("ratio"), 4).alias("avg_distinct_ratio"),
            F.sum(F.when(F.col("ratio") < 0.5, 1).otherwise(0)).alias(
                "n_repetitive"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# TRUE IVF ANN — learned coarse quantizer: k-means centroids cluster
# the embeddings, the query probes only its nearest centroid's
# inverted list, exact cosine inside it. This is the production IVF
# shape (faiss-style); the sign-bit variants above are the
# quantizer-free alternatives. K-means is iterative (no closed-form
# SQL twin), so — like its siblings embedding_kmeans_clusters /
# embedding_pq_codes_invariants — the GATED output is the invariant
# set any correct build satisfies and the oracle CAN restate:
# complete coverage, the assignment argmin re-verified through an
# INDEPENDENT code path (JVM least-of-zip_with distances vs the
# Arrow/numpy argmin), cosine bounds on the served top-5, and the
# top-5 fill check. Disagreement anywhere → a violation count > 0 →
# hash red. Recall-vs-brute-force is property-tested in
# tests/test_analytics_props.py (a hard recall bound in the gate
# would break on a testdata regeneration without a code bug — the
# events_mg_topk lesson).
# ---------------------------------------------------------------------------
@_register(
    "embedding_ann_ivf_kmeans",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_assigned,
           CAST(8 AS BIGINT) AS n_clusters,
           CAST(0 AS BIGINT) AS argmin_violations,
           CAST(0 AS BIGINT) AS sim_range_violations,
           true AS returned_ok
    FROM embeddings
    """,
)
def embedding_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    # coarse quantizer: k=8 centroids, 2 Lloyd iterations
    assigned, centroids = kmeans_fit(
        emb, k=8, iters=2, return_centroids=True
    )
    # pin: consumed by the argmin re-verify AND the serve-side list
    # join — without this the Arrow argmin UDF re-runs per consumer
    assigned = assigned.localCheckpoint(eager=False)
    # invariant 1: coverage + argmin, re-verified JVM-side (the exact
    # pattern of embedding_kmeans_clusters at k=8)
    v = to_double(F.col("embedding"))
    dists = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    checked = assigned.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select("vec_id", "sq_dist", F.least(*dists).alias("best_expr"))
    inv_assign = checked.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.count_distinct("vec_id").cast("long").alias("n_assigned"),
        F.sum(
            F.when(F.col("sq_dist") > F.col("best_expr") + 1e-6, 1).otherwise(0)
        )
        .cast("long")
        .alias("argmin_violations"),
    )
    # invariant 2: the serve — probe the query's own list, exact
    # cosine top-5 inside it; sims must be valid cosines and the
    # result must fill min(5, |list| - 1) rows
    lists = emb.join(assigned.select("vec_id", "cluster"), "vec_id")
    q = lists.filter(F.col("vec_id") == 0).select(
        to_double(F.col("embedding")).alias("qv"),
        F.col("cluster").alias("qc"),
    )
    probed = lists.join(
        F.broadcast(q), F.col("cluster") == F.col("qc")
    ).filter(F.col("vec_id") != 0)
    top5 = probed.select(
        "vec_id",
        F.round(cosine(to_double(F.col("embedding")), F.col("qv")), 6).alias(
            "sim"
        ),
    ).orderBy(F.desc("sim"), F.asc("vec_id")).limit(5)
    inv_serve = top5.agg(
        F.count(F.lit(1)).cast("long").alias("n_returned"),
        F.coalesce(
            F.sum(F.when(F.abs(F.col("sim")) > 1.0 + 1e-9, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("sim_range_violations"),
    )
    n_cand = probed.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    return (
        inv_assign.crossJoin(inv_serve)
        .crossJoin(n_cand)
        .select(
            "n_points",
            "n_assigned",
            F.lit(8).cast("long").alias("n_clusters"),
            "argmin_violations",
            "sim_range_violations",
            (F.col("n_returned") == F.least(F.lit(5), F.col("n_cand"))).alias(
                "returned_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ END-TO-END — the two halves composed into the production ANN
# serving path (operators/similarity.ivfpq_topk; Jégou et al. 2011):
# learned coarse quantizer → inverted lists → PQ-encoded RESIDUALS per
# list → probed-list ADC scan via per-list lookup tables → exact
# re-rank. Training is iterative, so the gate checks the invariant
# set: coverage, probe discipline (every served row came from a probed
# list), the ADC distances re-derived through an INDEPENDENT path
# (raw codebook entries + query residual arrays via zip_with, vs the
# serving path's broadcast LUT join), and the top-k fill. Recall vs
# brute force is property-tested (tests/test_analytics_props.py).
# ---------------------------------------------------------------------------
@_register(
    "embedding_ivfpq_topk",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_assigned,
           CAST(8 AS BIGINT) AS n_lists,
           CAST(2 AS BIGINT) AS nprobe,
           CAST(0 AS BIGINT) AS probe_violations,
           CAST(0 AS BIGINT) AS adc_lut_violations,
           true AS returned_ok
    FROM embeddings
    """,
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import ivfpq_topk

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    dim, m, k_codes, n_clusters, nprobe, topk = 64, 8, 16, 8, 2, 10
    dsub = dim // m
    out, assigned, centroids, codebooks, probed, codes = ivfpq_topk(
        emb,
        dim=dim,
        m=m,
        k_codes=k_codes,
        n_clusters=n_clusters,
        nprobe=nprobe,
        query_id=0,
        shortlist=50,
        topk=topk,
        return_debug=True,
    )
    out = out.localCheckpoint(eager=False)  # 3 consumers below
    # coverage over the inverted lists
    cov = assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.count_distinct("vec_id").cast("long").alias("n_assigned"),
    )
    # probe discipline: served rows only from probed lists
    probe_v = out.agg(
        F.coalesce(
            F.sum(F.when(~F.col("cluster").isin(probed), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("probe_violations"),
        F.count(F.lit(1)).cast("long").alias("n_returned"),
    )
    # independent ADC re-derivation: raw codebook entries + query
    # residual subvectors, zip_with/aggregate per (id, sub) row — no
    # LUT anywhere in this path
    qv = np.asarray(
        emb.filter(F.col("vec_id") == 0)
        .select(to_double(F.col("embedding")).alias("v"))
        .collect()[0]["v"],
        dtype=np.float64,
    )
    C = np.asarray(centroids, dtype=np.float64)
    cbdf = spark.createDataFrame(
        [
            (s, j, [float(x) for x in codebooks[s][j]])
            for s in range(m)
            for j in range(k_codes)
        ],
        "sub_id int, code int, centroid array<double>",
    )
    qres = spark.createDataFrame(
        [
            (
                c,
                s,
                [float(x) for x in (qv - C[c])[s * dsub : (s + 1) * dsub]],
            )
            for c in probed
            for s in range(m)
        ],
        "cluster int, sub_id int, qsub array<double>",
    )
    sub_d = F.aggregate(
        F.zip_with(
            F.col("qsub"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    adc2 = (
        out.select("vec_id", "cluster", "adc_dist")
        .join(codes.select("vec_id", "sub_id", "code"), "vec_id")
        .join(F.broadcast(cbdf), ["sub_id", "code"])
        .join(F.broadcast(qres), ["cluster", "sub_id"])
        .select("vec_id", "adc_dist", sub_d.alias("d"))
        .groupBy("vec_id", "adc_dist")
        .agg(F.sum("d").alias("adc_re"))
    )
    lut_v = adc2.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("adc_re") - F.col("adc_dist")) > 1e-6, 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("adc_lut_violations")
    )
    n_members = assigned.filter(
        F.col("cluster").isin(probed) & (F.col("vec_id") != 0)
    ).agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    return (
        cov.crossJoin(probe_v)
        .crossJoin(lut_v)
        .crossJoin(n_members)
        .select(
            "n_points",
            "n_assigned",
            F.lit(n_clusters).cast("long").alias("n_lists"),
            F.lit(nprobe).cast("long").alias("nprobe"),
            "probe_violations",
            "adc_lut_violations",
            (
                F.col("n_returned")
                == F.least(F.lit(topk).cast("long"), F.col("n_members"))
            ).alias("returned_ok"),
        )
    )


# ---------------------------------------------------------------------------
# GRAPH ANN (NSW-style beam search; the last mainstream ANN family —
# IVF/LSH/PQ all exist above): distributed M-NN graph build
# (banded-LSH candidates → per-node top-M, plus a deterministic ring
# edge for connectivity) and a best-first beam search whose per-hop
# work is two IN-list-pruned jobs (operators/similarity.knn_graph /
# graph_beam_search_topk). The build is iterative-free but the search
# is driver-coordinated, so — like the k-means/PQ/IVF family — the
# gate checks STRUCTURAL invariants any correct build satisfies:
# every node present (ring guarantees degree ≥ 1), top-M degree cap,
# no self-loops, no dangling neighbor ids, and the beam's top-k fill.
# Recall vs brute force and the exact-cosine agreement of served sims
# are property-tested (tests/test_analytics_props.py).
# ---------------------------------------------------------------------------
@_register(
    "embedding_graph_ann_topk",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(8 AS BIGINT) AS m_neighbors,
           CAST(0 AS BIGINT) AS degree_violations,
           CAST(0 AS BIGINT) AS self_loop_violations,
           CAST(0 AS BIGINT) AS dangling_violations,
           true AS returned_ok
    FROM embeddings
    """,
)
def embedding_graph_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        graph_beam_search_topk,
        knn_graph,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m_nb, k = 8, 10
    graph = knn_graph(emb, dim=64, m_neighbors=m_nb).localCheckpoint(
        eager=False
    )
    qrows = (
        emb.filter(F.col("vec_id") == 0)
        .select(to_double(F.col("embedding")).alias("v"))
        .collect()
    )
    if not qrows:
        # same by-design guard convention as kmeans_fit/pq_fit:
        # empty/queryless input fails loudly, not with an IndexError
        raise ValueError(
            "graph_beam_search needs a query row with vec_id 0; found none"
        )
    qv = [float(x) for x in qrows[0]["v"]]
    out, n_visited, _hops = graph_beam_search_topk(
        emb, graph, qv, k=k, ef=48, max_hops=8,
        entry_ids=(0,), exclude_ids=(0,),
    )
    n_returned = out.count()
    struct_inv = graph.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(
            F.when(F.size("neighbors") > m_nb, 1).otherwise(0)
        ).cast("long").alias("degree_violations"),
        F.sum(
            F.size(
                F.filter("neighbors", lambda e: e["nb"] == F.col("vec_id"))
            )
        ).cast("long").alias("self_loop_violations"),
    )
    # dangling check: every neighbor id must be a real vector id
    dangling = (
        graph.select(F.explode("neighbors").alias("e"))
        .select(F.col("e.nb").alias("vec_id"))
        .distinct()
        .join(emb.select("vec_id"), "vec_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("dangling_violations"))
    )
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        n_pts.crossJoin(struct_inv)
        .crossJoin(dangling)
        .select(
            "n_points",
            "n_nodes",
            F.lit(m_nb).cast("long").alias("m_neighbors"),
            "degree_violations",
            "self_loop_violations",
            "dangling_violations",
            F.lit(
                n_returned == min(k, max(n_visited - 1, 0))
            ).alias("returned_ok"),
        )
    )


# ---------------------------------------------------------------------------
# BATCH PQ-ADC SERVING (round-7; operators/similarity.pq_adc_batch_topk):
# the production form of the ADC scan — 16 query vectors scored in ONE
# plan, per-query LUTs computed in-plan (query subvectors x broadcast
# codebook frame) instead of as 16 driver-side numpy folds. Gate
# invariants: output cardinality (every query filled to min(topk, n-1)
# — stated arithmetically by the oracle from COUNT(*)), the ADC sums
# re-derived through an INDEPENDENT path (driver-side numpy LUT
# literals, the single-query serving approach, joined back per
# (q_id, sub_id, code)), per-query exact-distance rank monotonicity,
# and self-exclusion. Per-query equivalence to pq_adc_topk is pinned
# by tests/test_analytics_props.py::test_pq_batch_matches_single.
# ---------------------------------------------------------------------------
@_register(
    "embedding_pq_batch_topk",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(LEAST(16, COUNT(*)) AS BIGINT) AS n_queries,
           CAST(LEAST(16, COUNT(*)) * LEAST(10, COUNT(*) - 1) AS BIGINT)
             AS n_rows,
           CAST(0 AS BIGINT) AS adc_lut_violations,
           CAST(0 AS BIGINT) AS order_violations,
           CAST(0 AS BIGINT) AS self_violations
    FROM embeddings
    """,
)
def embedding_pq_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        pq_adc_batch_topk,
        pq_encode,
        pq_fit,
    )

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    dim, m, k_codes, shortlist, topk, n_q = 64, 8, 16, 50, 10, 16
    dsub = dim // m
    codebooks = pq_fit(emb, dim=dim, m=m, k=k_codes, iters=2)
    qrows = (
        emb.filter(F.col("vec_id") < n_q)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    qids = [r["vec_id"] for r in qrows]
    out = pq_adc_batch_topk(
        emb, codebooks, qids, dim=dim, m=m, shortlist=shortlist, topk=topk
    ).localCheckpoint(eager=False)  # consumed by 4 invariant subtrees
    counts = out.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("q_id").cast("long").alias("n_queries"),
        F.coalesce(
            F.sum(F.when(F.col("q_id") == F.col("vec_id"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("self_violations"),
    )
    # independent ADC re-derivation: driver-side numpy LUTs (the
    # single-query pq_adc_topk path), joined back per (q, sub, code)
    C = np.asarray(codebooks, dtype=np.float64)  # m x k x dsub
    lut2_rows = []
    for r in qrows:
        qv = np.asarray(r["v"], dtype=np.float64)
        for s in range(m):
            qs = qv[s * dsub : (s + 1) * dsub]
            for j in range(k_codes):
                lut2_rows.append(
                    (r["vec_id"], s, j, float(((qs - C[s][j]) ** 2).sum()))
                )
    lut2 = spark.createDataFrame(
        lut2_rows, "q_id long, sub_id int, code int, t2 double"
    )
    codes = pq_encode(emb, codebooks, dim=dim, m=m)
    adc2 = (
        out.select("q_id", "vec_id", "adc_dist")
        .join(codes.select("vec_id", "sub_id", "code"), "vec_id")
        .join(F.broadcast(lut2), ["q_id", "sub_id", "code"])
        .groupBy("q_id", "vec_id", "adc_dist")
        .agg(F.sum("t2").alias("adc_re"))
    )
    lut_v = adc2.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("adc_re") - F.col("adc_dist")) > 1e-6, 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("adc_lut_violations")
    )
    # rank monotonicity per query: exact_dist must be non-decreasing
    w = Window.partitionBy("q_id").orderBy("rank")
    order_v = (
        out.withColumn("__prev", F.lag("exact_dist").over(w))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("exact_dist") < F.col("__prev") - 1e-12, 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("order_violations")
        )
    )
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        n_pts.crossJoin(counts)
        .crossJoin(lut_v)
        .crossJoin(order_v)
        .select(
            "n_points",
            "n_queries",
            "n_rows",
            "adc_lut_violations",
            "order_violations",
            "self_violations",
        )
    )


# ---------------------------------------------------------------------------
# BATCH GRAPH-ANN SERVING (round-7;
# operators/similarity.graph_beam_search_batch): the NSW beam search
# for 16 queries in lockstep — per hop TWO pruned Spark jobs serve
# every query (union-frontier adjacency probe + union scoring of
# newly discovered (q, id) pairs) instead of 2 jobs per hop PER
# query. Gate invariants: per-query fill (n_returned ==
# min(k, |visited_q \ {own id}|), AND-folded), sim range, per-query
# rank monotonicity, self-exclusion, and — the strongest — exact
# row-level agreement with the SINGLE-query beam search re-run inside
# the gate for a 2-query sample (first + last), so batch==single is
# hash-gated, not just property-tested.
# ---------------------------------------------------------------------------
@_register(
    "embedding_graph_batch_topk",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(LEAST(16, COUNT(*)) AS BIGINT) AS n_queries,
           CAST(0 AS BIGINT) AS sim_range_violations,
           CAST(0 AS BIGINT) AS order_violations,
           CAST(0 AS BIGINT) AS self_violations,
           CAST(0 AS BIGINT) AS single_query_mismatches,
           true AS all_returned_ok
    FROM embeddings
    """,
)
def embedding_graph_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        graph_beam_search_batch,
        graph_beam_search_topk,
        knn_graph,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m_nb, k, ef, max_hops, n_q = 8, 10, 48, 8, 16
    graph = knn_graph(emb, dim=64, m_neighbors=m_nb).localCheckpoint(
        eager=False
    )
    qrows = (
        emb.filter(F.col("vec_id") < n_q)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    if not qrows:
        raise ValueError(
            "graph_beam_search_batch needs query rows vec_id 0..15; none found"
        )
    qvecs = {r["vec_id"]: [float(x) for x in r["v"]] for r in qrows}
    out, stats, _hops = graph_beam_search_batch(
        emb, graph, qvecs, k=k, ef=ef, max_hops=max_hops, entry_ids=(0,)
    )
    out = out.localCheckpoint(eager=False)
    # per-query fill check, driver-side fold over bounded state
    returned = {
        r["q_id"]: r["n"]
        for r in out.groupBy("q_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    all_ok = all(
        returned.get(q, 0)
        == min(k, s["n_visited"] - (1 if s["own_visited"] else 0))
        for q, s in stats.items()
    )
    # batch == single for a 2-query sample, hash-gated
    mismatches = 0
    for q in (qrows[0]["vec_id"], qrows[-1]["vec_id"]):
        single, _nv, _h = graph_beam_search_topk(
            emb,
            graph,
            qvecs[q],
            k=k,
            ef=ef,
            max_hops=max_hops,
            entry_ids=(0,),
            exclude_ids=(q,),
        )
        srows = [(r["vec_id"], r["sim"]) for r in single.collect()]
        brows = [
            (r["vec_id"], r["sim"])
            for r in out.filter(F.col("q_id") == q)
            .orderBy("rank")
            .select("vec_id", "sim")
            .collect()
        ]
        mismatches += sum(1 for a, b in zip(srows, brows) if a != b)
        mismatches += abs(len(srows) - len(brows))
    w = Window.partitionBy("q_id").orderBy("rank")
    inv = (
        out.withColumn("__prev", F.lag("sim").over(w))
        .agg(
            F.coalesce(
                F.sum(F.when(F.abs(F.col("sim")) > 1.0 + 1e-9, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("sim_range_violations"),
            F.coalesce(
                F.sum(
                    F.when(F.col("sim") > F.col("__prev") + 1e-12, 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("order_violations"),
            F.coalesce(
                F.sum(F.when(F.col("q_id") == F.col("vec_id"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("self_violations"),
            F.count_distinct("q_id").cast("long").alias("n_queries"),
        )
    )
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        n_pts.crossJoin(inv)
        .select(
            "n_points",
            "n_queries",
            "sim_range_violations",
            "order_violations",
            "self_violations",
            F.lit(mismatches).cast("long").alias("single_query_mismatches"),
            F.lit(bool(all_ok)).alias("all_returned_ok"),
        )
    )


# ---------------------------------------------------------------------------
# F11 — priority-ordered JSON field extraction (etl_sync.py:160-177:
# first matching title wins) re-expressed as a coalesce chain over the
# events props document.
# ---------------------------------------------------------------------------
@_register(
    "events_priority_json",
    """
    SELECT COALESCE(CAST(json_extract_string(props, '$.primary_score') AS INTEGER),
                    CAST(json_extract_string(props, '$.k') AS INTEGER)) AS score,
           COUNT(*) AS n
    FROM events
    GROUP BY score ORDER BY score
    """,
)
def events_priority_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    score = F.coalesce(
        F.get_json_object("props", "$.primary_score").cast("int"),
        F.get_json_object("props", "$.k").cast("int"),
    )
    return (
        ev.withColumn("score", score)
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("score")
    )


# ---------------------------------------------------------------------------
# Approximate distinct counting — the 100 TB-scale substitute for exact
# COUNT(DISTINCT) (A3): HyperLogLog++ sketches merge associatively, so
# the count needs no global shuffle of the key column. No oracle entry:
# sketch estimates are engine-specific by nature (driver records the
# weaker rows-only check); the exact twin `orders_multi_distinct`
# pins correctness.
# ---------------------------------------------------------------------------
@_register(
    "orders_approx_distinct",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS approx_within_5pct
    FROM orders
    """,
)
def orders_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL estimate itself is engine-specific, so the gated columns
    are the exact count (oracle-recomputed) plus a boolean asserting
    the rsd=0.01 sketch landed within 5% of exact — a sketch gone bad
    turns the row red instead of hiding behind a rows-only check."""
    orders = load_table(spark, sf_dir, "orders")
    # Two SEPARATE aggregations, then a 1×1 cross join: combining
    # approx_count_distinct(rsd=0.01) with count(DISTINCT) in one agg
    # makes Spark plan a per-distinct-key partial aggregation that
    # carries the ~13 KB HLL sketch PER KEY (100k keys × 13 KB through
    # the shuffle — observed 4× slowdown). Split, the sketch exists
    # once per partition and the exact distinct shuffles bare keys.
    sketch = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias(
            "approx_customers"
        ),
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_customers"))
    return sketch.crossJoin(exact).select(
        "n_orders",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Native session windows (F.session_window — gap-merged, data-driven
# window bounds). The lag-gap island twin above (events_user_sessions)
# is the hand-rolled form; this is the engine-native operator, usable
# unchanged under Structured Streaming with a watermark. Oracle
# reproduces the merge with the lag/cumsum island algorithm (a session
# breaks when the gap is >= 30 min — session_window bounds are
# half-open [ts, ts+gap)).
# ---------------------------------------------------------------------------
@_register(
    "events_session_windows_native",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    islands AS (
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS sev FROM islands
      GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(sev) AS BIGINT) AS n_events,
           CAST(MAX(sev) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
)
def events_session_windows_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("sev"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("sev").alias("n_events"),
            F.max("sev").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# As-of join (an operator Spark lacks natively; operators/windows.py
# builds it as union → one sort per key → last-non-null carry-forward,
# no range explosion). Use case: attribution — every purchase event
# linked to the user's latest strictly-prior click. The oracle is
# DuckDB's NATIVE ASOF JOIN — a fully independent implementation.
# ---------------------------------------------------------------------------
@_register(
    "purchase_attribution_asof",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS click_ts, MAX(event_id) AS click_event_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, c.click_event_id,
           CAST((epoch_us(p.ts) - epoch_us(c.click_ts) + 500) // 1000
                AS BIGINT) AS millis_since_click
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts > c.click_ts
    ORDER BY p.event_id
    """,
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.windows import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedup ties on (user, ts) for a deterministic pick (max event_id)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = as_of_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id", "click_ts"],
        strict=True,
    )
    # exact integer half-up millis — ROUND(double, 3) on a µs diff is
    # engine-flippable exactly at .xxx5 boundaries (hit at sf1: Spark
    # rounds the shortest decimal repr, DuckDB the binary value)
    return joined.select(
        "event_id",
        "user_id",
        "click_event_id",
        F.expr(
            "(unix_micros(ts) - unix_micros(click_ts) + 500)"
            " div CAST(1000 AS BIGINT)"
        ).alias("millis_since_click"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# BOUNDED-staleness attribution — the production attribution window:
# a purchase is credited to the user's latest prior click ONLY if the
# click is at most 24 h old; staler matches are dropped to NULL (no
# credit), exactly like a marketing attribution window or a feature-
# freshness SLA in a feature store. Same single union+sort as-of
# exchange; the bound is a post-join predicate on the exact integer
# µs difference, NOT a range join — the match is still "latest prior",
# then tested, which is NOT expressible as a plain range join (a
# range join would credit an older in-window click when the latest
# one is out-of-window... there is none; but it would return MULTIPLE
# in-window clicks — the as-of pick must happen first).
# ---------------------------------------------------------------------------
_ATTR_WINDOW_MS = 24 * 3600 * 1000


@_register(
    "purchase_attribution_bounded_asof",
    f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS click_ts, MAX(event_id) AS click_event_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    j AS (
      SELECT p.event_id, p.user_id, c.click_event_id,
             CAST((epoch_us(p.ts) - epoch_us(c.click_ts) + 500) // 1000
                  AS BIGINT) AS ms
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts > c.click_ts
    )
    SELECT event_id, user_id,
           CASE WHEN ms <= {_ATTR_WINDOW_MS} THEN click_event_id END
             AS click_event_id,
           CASE WHEN ms <= {_ATTR_WINDOW_MS} THEN ms END
             AS millis_since_click
    FROM j ORDER BY event_id
    """,
)
def purchase_attribution_bounded_asof(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.windows import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = as_of_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id", "click_ts"],
        strict=True,
    ).withColumn(
        "ms",
        F.expr(
            "(unix_micros(ts) - unix_micros(click_ts) + 500)"
            " div CAST(1000 AS BIGINT)"
        ),
    )
    in_window = F.col("ms") <= _ATTR_WINDOW_MS
    return joined.select(
        "event_id",
        "user_id",
        F.when(in_window, F.col("click_event_id")).alias("click_event_id"),
        F.when(in_window, F.col("ms")).alias("millis_since_click"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Forward as-of join — time-to-convert: for every click, the NEXT
# purchase by the same user (mirror of the backward attribution join
# above; same single union+sort exchange, time traversed descending).
# DuckDB's native ASOF with a < inequality is the oracle twin.
# ---------------------------------------------------------------------------
@_register(
    "click_to_purchase_asof",
    """
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_event_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id, p.purchase_event_id,
           CAST((epoch_us(p.purchase_ts) - epoch_us(c.ts) + 500) // 1000
                AS BIGINT) AS millis_to_purchase
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts < p.purchase_ts
    ORDER BY c.event_id
    """,
)
def click_to_purchase_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.windows import as_of_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    joined = as_of_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        right_payload=["purchase_event_id", "purchase_ts"],
        strict=True,
        direction="forward",
    )
    # exact integer half-up millis (see purchase_attribution_asof)
    return joined.select(
        "event_id",
        "user_id",
        "purchase_event_id",
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(ts) + 500)"
            " div CAST(1000 AS BIGINT)"
        ).alias("millis_to_purchase"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# CUBE — all four grouping combinations in one pass (next to the
# ROLLUP query in relational.py; replaces a 4-query dashboard fan-out).
# ---------------------------------------------------------------------------
@_register(
    "orders_status_priority_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def orders_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check — a training-corpus must-have: which
# train docs exactly match a held-out benchmark set (fingerprint
# equality)? Benchmark = every 97th doc (synthetic stand-in for an
# external eval suite); broadcast its fingerprint set, left-semi join.
# ---------------------------------------------------------------------------
@_register(
    "docs_contamination_check",
    """
    WITH fp AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    bench AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 97 = 0)
    SELECT source,
           COUNT(*) AS n_train_docs,
           COUNT(*) FILTER (WHERE fp IN (SELECT fp FROM bench))
             AS n_contaminated
    FROM fp WHERE doc_id % 97 <> 0
    GROUP BY source ORDER BY source
    """,
)
def docs_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fp", fingerprint(F.col("text"))
    )
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select("fp")
        .distinct()
        .withColumn("__contaminated", F.lit(1))
    )
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "fp", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("__contaminated").alias("n_contaminated"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Boilerplate detection — most frequent word-5-grams across the corpus
# (the repeated-template signal pretraining pipelines scrub). Shingles
# stay inside the row until the frequency groupBy; only grams leave.
# ---------------------------------------------------------------------------
@_register(
    "docs_top_boilerplate_ngrams",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT unnest([array_to_string(w[i:i+4], ' ')
                     FOR i IN range(1, greatest(len(w) - 3, 1))]) AS gram
      FROM toks
    )
    SELECT gram, COUNT(*) AS n_occurrences
    FROM grams GROUP BY gram
    ORDER BY n_occurrences DESC, gram LIMIT 10
    """,
)
def docs_top_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import shingles_of_words

    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("w")
    )
    grams = docs.select(
        F.explode(shingles_of_words(F.col("w"), n=5)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Window FRAME spec — 7-row moving sum per user (ROWS BETWEEN 6
# PRECEDING AND CURRENT ROW). The rolling stat is kept in exact
# integer cents (FLOOR(value·100+0.5)) so sliding-window
# implementations (running-sum subtraction vs recompute) can't drift
# apart across engines.
# ---------------------------------------------------------------------------
@_register(
    "events_user_moving_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS mov7_sum_cents
    FROM events
    ORDER BY user_id, event_id
    """,
)
def events_user_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.sum(cents).over(w).alias("mov7_sum_cents"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Int8 symmetric quantization of the embedding column — the standard
# 4× storage compression of a vector store (scale = 127/max|x| per
# vector, q = clamp(round(x·scale))) — with reconstruction-error
# audit stats per embedding model version. Everything is elementwise
# IEEE arithmetic (identical in both engines: no reassociation, no
# libm beyond abs/floor) and errors quantize to integer micros, so
# the gate compares exact integers. Scale shape: a pure map over the
# vectors (no shuffle) + one scalar-sized final aggregate.
# ---------------------------------------------------------------------------
@_register(
    "embedding_quantization_error",
    """
    WITH q AS (
      SELECT vec_id,
             [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
             127.0 / GREATEST(list_max([abs(CAST(x AS DOUBLE))
                                        FOR x IN embedding]), 1e-12) AS s
      FROM embeddings
    ),
    err AS (
      SELECT vec_id,
             [CAST(FLOOR(abs(
                  LEAST(127, GREATEST(-127, FLOOR(x * s + 0.5))) / s - x
              ) * 1000000 + 0.5) AS BIGINT) FOR x IN v] AS e
      FROM q
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(list_sum(e)) AS BIGINT) AS sum_err_micros,
           CAST(MAX(list_max(e)) AS BIGINT) AS max_err_micros
    FROM err
    """,
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    s = F.lit(127.0) / F.greatest(
        F.array_max(F.transform(v, F.abs)), F.lit(1e-12)
    )
    # q/s - x per element, |err| in integer micros; FLOOR(x+0.5) is the
    # cross-engine rounding rule (ROUND differs on half-way negatives)
    e = F.transform(
        v,
        lambda x: F.floor(
            F.abs(
                F.least(
                    F.lit(127.0), F.greatest(F.lit(-127.0), F.floor(x * s + 0.5))
                )
                / s
                - x
            )
            * 1000000
            + 0.5
        ).cast("long"),
    )
    per_vec = emb.select(
        F.aggregate(e, F.lit(0).cast("long"), lambda a, x: a + x).alias("se"),
        F.array_max(e).alias("me"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("se").cast("long").alias("sum_err_micros"),
        F.max("me").cast("long").alias("max_err_micros"),
    )


# ---------------------------------------------------------------------------
# Embedding centroid aggregation — the k-means inner step as one
# distributed pass: explode (vector, dim) pairs, aggregate per
# (cluster, dim). Stats stay in EXACT integer micro-units (sum of
# round(x·1e6)) so the cross-engine hash can't wobble on float
# summation order; the float centroid is sum_micro / n / 1e6.
# Restricted to the first 8 dims to keep the gate's output compact.
# ---------------------------------------------------------------------------
@_register(
    "embedding_cluster_centroids",
    """
    SELECT vec_id % 4 AS cluster, d AS dim,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(FLOOR(CAST(embedding[d] AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT)) AS BIGINT) AS sum_micro
    FROM embeddings, generate_series(1, 8) AS t(d)
    GROUP BY cluster, dim ORDER BY cluster, dim
    """,
)
def embedding_cluster_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = emb.select(
        (F.col("vec_id") % 4).alias("cluster"),
        F.posexplode(F.slice(to_double(F.col("embedding")), 1, 8)).alias(
            "pos", "x"
        ),
    )
    return (
        pairs.select(
            "cluster",
            (F.col("pos") + 1).cast("long").alias("dim"),
            # FLOOR(x+0.5), not ROUND: engines disagree on round-half
            # tie rules for doubles; this formula is identical in both
            F.floor(F.col("x") * 1000000 + 0.5).cast("long").alias("micro"),
        )
        .groupBy("cluster", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("micro").alias("sum_micro"),
        )
        .orderBy("cluster", "dim")
    )


# ---------------------------------------------------------------------------
# K-means over embeddings — the one genuinely ITERATIVE algorithm in
# the surface (rows-only driver check: no closed-form SQL twin).
# Scale shape: per iteration ONE pass over the data — centroids
# broadcast inside an Arrow-batched argmin, then a (cluster, dim)
# aggregation recomputes means; only k×dim floats ever reach the
# driver. Deterministic: init = vectors 0..k-1, ties → lowest cluster.
# ---------------------------------------------------------------------------
@_register(
    "embedding_kmeans_clusters",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_assigned,
           CAST(4 AS BIGINT) AS n_clusters,
           CAST(0 AS BIGINT) AS argmin_violations
    FROM embeddings
    """,
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means is iterative — no single SQL statement reproduces the
    centroids — so the gated output is the invariant set any correct
    run satisfies, which the oracle CAN recompute: every vector gets
    exactly one assignment (n_points / n_assigned vs COUNT(*)), and
    the assignment is the argmin over the final centroids, re-checked
    through an INDEPENDENT code path — a Catalyst aggregate/zip_with
    distance expression (JVM) against the Arrow-batched numpy
    assignment (similarity.py:_assign_udf). Cross-implementation
    disagreement shows up as argmin_violations > 0 → hash red.
    Raw per-cluster stats stay available via embedding_cluster_centroids."""
    from epl_cas_etl_2026_spark.operators.similarity import kmeans_fit, to_double

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_fit(emb, k=4, iters=3, return_centroids=True)
    v = to_double(F.col("embedding"))
    dists = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    checked = assigned.join(emb.select("vec_id", "embedding"), "vec_id").select(
        "vec_id",
        "sq_dist",
        F.least(*dists).alias("best_expr"),
    )
    return checked.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count_distinct("vec_id").alias("n_assigned"),
        F.lit(4).cast("long").alias("n_clusters"),
        F.sum(
            # the UDF's chosen distance must equal the expression-side
            # minimum up to float reassociation noise
            F.when(F.col("sq_dist") > F.col("best_expr") + 1e-6, 1).otherwise(0)
        ).cast("long").alias("argmin_violations"),
    )


# ---------------------------------------------------------------------------
# Sequence packing — assign docs to fixed-capacity context windows by
# cumulative token count (deterministic doc_id order): bin id =
# floor(cumsum_before / capacity). One window cumsum, no driver loop;
# the streaming-friendly stand-in for greedy first-fit packing (whose
# strict sequential dependence doesn't distribute). Reports packing
# efficiency: bins, fill, docs per bin.
# ---------------------------------------------------------------------------
@_register(
    "docs_pack_sequences",
    """
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
                  / 2048) AS BIGINT) AS bin
      FROM toks
    ),
    bins AS (
      SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
      FROM packed GROUP BY bin
    )
    SELECT COUNT(*) AS n_bins,
           CAST(MIN(n_docs) AS BIGINT) AS min_docs_per_bin,
           CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_bin,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens
    FROM bins
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.windows import two_phase_cumsum

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    # distributed global cumsum (range partition + local window +
    # prefix offsets) — NO single-partition window in the plan
    packed = two_phase_cumsum(toks, "doc_id", "n_tok").withColumn(
        "bin",
        F.floor((F.col("cumsum") - F.col("n_tok")) / 2048).cast("long"),
    )
    bins = packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
    )
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.min("n_docs").cast("long").alias("min_docs_per_bin"),
        F.max("n_docs").cast("long").alias("max_docs_per_bin"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Long-document chunking with overlap — token windows of size W with
# stride W-O (the context-window chunker): one row → ceil fan-out via
# a guarded sequence, chunk token counts exact.
# ---------------------------------------------------------------------------
@_register(
    "docs_chunk_with_overlap",
    """
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    chunks AS (
      SELECT doc_id, n_tok, c AS chunk_index,
             LEAST(64, n_tok - c * 48) AS chunk_tokens
      FROM toks, generate_series(0, 1000) AS t(c)
      WHERE c * 48 < n_tok AND (c = 0 OR c * 48 + 16 < n_tok)
    )
    SELECT COUNT(*) AS n_chunks,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(chunk_tokens) AS BIGINT) AS total_chunk_tokens,
           CAST(MAX(chunk_index) + 1 AS BIGINT) AS max_chunks_per_doc
    FROM chunks
    """,
)
def docs_chunk_with_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    window_tokens, overlap = 64, 16
    stride = window_tokens - overlap
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    # chunk c starts at c*stride; emit while the start is inside the
    # doc AND (first chunk, or the chunk adds > overlap new tokens)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n_tok") - F.lit(overlap)) / F.lit(stride)).cast("int"),
    )
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = toks.select(
        "doc_id",
        "n_tok",
        F.explode(idx).alias("chunk_index"),
    ).withColumn(
        "chunk_tokens",
        F.least(
            F.lit(window_tokens),
            F.col("n_tok") - F.col("chunk_index") * stride,
        ),
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("chunk_tokens").cast("long").alias("total_chunk_tokens"),
        (F.max("chunk_index") + 1).cast("long").alias("max_chunks_per_doc"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling / train-val-test splitting — the scalable
# substitute for random sampling in a training-data pipeline: the split
# is a pure function of the id (md5 mod 100), so it is reproducible
# across engines, runs, and re-partitioning, and needs no shuffle or
# stored split table.
# ---------------------------------------------------------------------------
def _hash_pct_sql(col: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) % 100"


def _hash_pct_col(c) -> F.Column:
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long") % 100


@_register(
    "docs_train_val_test_split",
    f"""
    SELECT CASE WHEN {_hash_pct_sql('doc_id')} < 80 THEN 'train'
                WHEN {_hash_pct_sql('doc_id')} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents GROUP BY split ORDER BY split
    """,
)
def docs_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pct = _hash_pct_col(F.col("doc_id"))
    split = (
        F.when(pct < 80, F.lit("train"))
        .when(pct < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@_register(
    "docs_stratified_sample",
    f"""
    WITH rates(lang, rate) AS (VALUES ('en', 10), ('es', 50), ('de', 50),
                                      ('fr', 50), ('zh', 50))
    SELECT d.lang, COUNT(*) AS n_sampled
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_hash_pct_sql('d.doc_id')} < r.rate
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-stratum sampling rates (downsample the dominant language) —
    # the mixture-weighting move of LLM data pipelines. Broadcast the
    # rate table; the filter is embarrassingly parallel.
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", 10), ("es", 50), ("de", 50), ("fr", 50), ("zh", 50)],
        "lang string, rate int",
    )
    pct = _hash_pct_col(F.col("doc_id"))
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(pct < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Capstone composite: the full clean-corpus pipeline in ONE lazy plan —
# exact dedup (keep lowest doc_id per text) → quality gate → language
# mix → deterministic split. This is the shape a 100 TB pretraining
# corpus build takes: every stage is a set operation, the only
# shuffles are the dedup groupBy and the final count.
# ---------------------------------------------------------------------------
@_register(
    "docs_clean_corpus_pipeline",
    f"""
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    deduped AS (
      SELECT d.* FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    ),
    gated AS (
      SELECT * FROM deduped
      WHERE len(string_split(text, ' ')) >= 5
        AND length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0
            / nullif(length(text), 0) >= 0.8
    )
    SELECT CASE WHEN {_hash_pct_sql('doc_id')} < 80 THEN 'train'
                WHEN {_hash_pct_sql('doc_id')} < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM gated GROUP BY split, lang ORDER BY split, lang
    """,
)
def docs_clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import keep_first_exact

    docs = load_table(spark, sf_dir, "documents")
    deduped = keep_first_exact(docs, "doc_id")
    gated = deduped.filter(quality_class(F.col("text")) == "keep")
    pct = _hash_pct_col(F.col("doc_id"))
    split = (
        F.when(pct < 80, F.lit("train"))
        .when(pct < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        gated.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# Source-mixture weighting: the data-mixing step of a pretraining
# corpus build — given a total token budget (half the corpus here),
# give each source an equal token share and derive the per-source
# sampling rate that hits it. One shuffle (groupBy source); the
# global-total window runs over the tiny post-agg frame (n_sources
# rows). Rates are computed from exact integer token counts with one
# double division, identical in both engines.
# ---------------------------------------------------------------------------
@_register(
    "docs_mixture_weights",
    """
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT *,
             SUM(tokens) OVER () AS total_tokens,
             COUNT(*) OVER () AS n_sources
      FROM per_src
    )
    SELECT source, n_docs, tokens,
           ROUND(LEAST(1.0, (CAST(total_tokens AS DOUBLE) * 0.5 / n_sources)
                            / CAST(tokens AS DOUBLE)), 6) AS sample_rate,
           CAST(FLOOR(CAST(tokens AS DOUBLE)
                * ROUND(LEAST(1.0, (CAST(total_tokens AS DOUBLE) * 0.5
                                    / n_sources)
                              / CAST(tokens AS DOUBLE)), 6)) AS BIGINT)
             AS expected_tokens
    FROM tot ORDER BY source
    """,
)
def docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("tokens"),
    )
    w = Window.partitionBy()  # post-agg: n_sources rows
    tot = per_src.withColumn(
        "total_tokens", F.sum("tokens").over(w)
    ).withColumn("n_sources", F.count(F.lit(1)).over(w))
    target = F.col("total_tokens").cast("double") * 0.5 / F.col("n_sources")
    rate = F.round(
        F.least(F.lit(1.0), target / F.col("tokens").cast("double")), 6
    )
    return (
        tot.select(
            "source",
            "n_docs",
            "tokens",
            rate.alias("sample_rate"),
            F.floor(F.col("tokens").cast("double") * rate)
            .cast("long")
            .alias("expected_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic fixed-k-per-stratum sample: the "inspect 5 docs per
# source" audit query. Ordering by md5(doc_id) is a seeded shuffle
# both engines reproduce bit-identically; row_number runs per-source
# (parallel windows), never global. Complements the rate-based
# docs_stratified_sample.
# ---------------------------------------------------------------------------
@_register(
    "docs_per_source_sample",
    """
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents
    )
    SELECT source, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sample_chars
    FROM ranked WHERE rn <= 5
    GROUP BY source ORDER BY source
    """,
)
def docs_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sample_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Per-user z-score outliers — anomaly flagging over event values.
# Population moments per user via ONE window shuffle (no join-back
# pass); the outlier test |v-mean| > 2*sigma is evaluated as the
# integer inequality (q*n - S)^2 > 4*(n*Sxx - S^2) on milli-quantized
# values, so both engines compare EXACT integers — no sqrt, no
# float-variance drift (same discipline as lineitem_moments_stats).
# Bounds: terms peak at ~(q_max*n)^2 — with milli-quantized values
# <=1e6 the 38-digit decimal holds to ~1e13 rows per key; beyond
# that, drop quantization to centi (x100) or split the key.
# ---------------------------------------------------------------------------
@_register(
    "events_user_zscore_outliers",
    """
    WITH q AS (
      SELECT user_id,
             CAST(FLOOR(CAST(value AS DOUBLE) * 1000 + 0.5) AS HUGEINT) AS qv
      FROM events
    ),
    m AS (
      SELECT user_id, qv,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             SUM(qv) OVER (PARTITION BY user_id) AS s,
             SUM(qv * qv) OVER (PARTITION BY user_id) AS sxx
      FROM q
    )
    SELECT user_id, MAX(n) AS n_events,
           CAST(SUM(CASE WHEN (qv * n - s) * (qv * n - s)
                              > 4 * (n * sxx - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM m GROUP BY user_id
    HAVING n_outliers > 0
    ORDER BY user_id
    """,
)
def events_user_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 1000 + 0.5).cast("decimal(38,0)")
    w = Window.partitionBy("user_id")
    m = ev.select("user_id", qv.alias("qv")).select(
        "user_id",
        "qv",
        F.count(F.lit(1)).over(w).cast("decimal(38,0)").alias("n"),
        F.sum("qv").over(w).alias("s"),
        F.sum(F.col("qv") * F.col("qv")).over(w).alias("sxx"),
    )
    dev = F.col("qv") * F.col("n") - F.col("s")
    var4 = (
        F.lit(4).cast("decimal(38,0)")
        * (F.col("n") * F.col("sxx") - F.col("s") * F.col("s"))
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.sum(F.when(dev * dev > var4, 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
        .filter(F.col("n_outliers") > 0)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id — the report that wants EXACTLY the
# two marginals + grand total, not the full cube (at scale this is a
# single pass emitting 3 aggregation streams, vs 4 for CUBE — the
# planner expands only the named sets). grouping_id() labels which
# set each row came from, disambiguating real NULL keys from subtotal
# rows. SQL-surface query (DataFrame API exposes cube/rollup only).
# ---------------------------------------------------------------------------
@_register(
    "orders_grouping_sets_marginals",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS INTEGER) AS gid,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def orders_grouping_sets_marginals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.sources.parquet import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT)
                 AS gid,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Decile binning via ntile — the remaining rank-family window surface
# (rank/dense/row_number/lag/lead/ntile). Runs per-segment (parallel
# windows, never global); the ORDER BY carries c_custkey as a
# tiebreak because ntile on a non-total order is engine-dependent at
# equal keys. min/max per bin are exact — no float-sum drift.
# ---------------------------------------------------------------------------
@_register(
    "customer_acctbal_deciles",
    """
    WITH binned AS (
      SELECT c_mktsegment, c_acctbal,
             NTILE(10) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT c_mktsegment, decile,
           COUNT(*) AS n_customers,
           ROUND(MIN(c_acctbal), 2) AS lo,
           ROUND(MAX(c_acctbal), 2) AS hi
    FROM binned
    GROUP BY c_mktsegment, decile
    ORDER BY c_mktsegment, decile
    """,
)
def customer_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("c_mktsegment", "decile")
    )


# ---------------------------------------------------------------------------
# Span-level dedup (word 8-gram): the scalable approximation of
# suffix-array span dedup for training corpora — a span is "duplicated"
# iff its 8-gram occurs in more than one distinct document. Reported as
# per-source span counts + integer-exact per-mille duplicated ratio.
# Shuffle profile at 100 TB: explode stays in the scan stage; ONE
# shuffle on gram for the distinct-doc count; the gram⋈gram join reuses
# that same hash partitioning (no second exchange on the big side under
# AQE); the final per-source rollup is map-side-combined and tiny.
# ---------------------------------------------------------------------------
@_register(
    "docs_span_dedup_stats",
    """
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest([array_to_string(w[i:i+7], ' ')
                     FOR i IN range(1, greatest(len(w) - 6, 1))]) AS gram
      FROM toks
    ),
    gd AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram
    )
    SELECT source,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_spans,
           CAST((2000 * SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS dup_permille
    FROM grams JOIN gd USING (gram)
    GROUP BY source ORDER BY source
    """,
)
def docs_span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import shingles_of_words

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    )
    # ONE gram-keyed exchange (was two full gram-string shuffles + a
    # double explode: groupBy(gram) for the doc counts AND a join of
    # the whole gram stream back onto them). The raw gram stream is
    # hash-partitioned by gram once; the (gram, source) aggregation,
    # the per-gram doc-count window, and nothing else touch the heavy
    # 8-word strings again — the final per-source rollup shuffles a
    # handful of rows. nd is recovered as sum over sources of
    # per-(gram, source) distinct docs, identical because every doc_id
    # carries exactly one source. Interleaved A/B at sf0.1:
    # 1.81 -> 1.01 s (same host window).
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(shingles_of_words(F.col("w"), n=8)).alias("gram"),
    ).repartition("gram")
    gstats = grams.groupBy("gram", "source").agg(
        F.count(F.lit(1)).alias("c"),
        F.count_distinct("doc_id").alias("ndd"),
    )
    gs = gstats.withColumn(
        "nd", F.sum("ndd").over(Window.partitionBy("gram"))
    )
    return (
        gs.groupBy("source")
        .agg(
            F.sum("c").alias("n_spans"),
            F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0)).alias(
                "dup_spans"
            ),
            # integer half-up per-mille: no float division, no .5-boundary
            # drift between engines
            F.expr(
                "CAST((2000 * SUM(CASE WHEN nd > 1 THEN c ELSE 0 END)"
                " + SUM(c)) DIV (2 * SUM(c)) AS BIGINT)"
            ).alias("dup_permille"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal: pooled per-language Shannon entropy
# of the character distribution (low entropy ⇒ repetitive/boilerplate
# corpora; a standard cheap perplexity proxy). Two shuffles, both on
# tiny keys: (lang, char) counts — ≤ |alphabet| rows per lang after the
# map-side combine — then the ≤40-term entropy sum per lang.
# ---------------------------------------------------------------------------
@_register(
    "docs_char_entropy",
    """
    WITH ch AS (
      SELECT lang, unnest(string_split(text, '')) AS c FROM documents
    ),
    cc AS (SELECT lang, c, COUNT(*) AS cnt FROM ch GROUP BY lang, c),
    tot AS (SELECT lang, SUM(cnt) AS n FROM cc GROUP BY lang)
    SELECT cc.lang,
           CAST(MAX(n) AS BIGINT) AS n_chars,
           COUNT(*) AS alphabet_size,
           ROUND(-SUM((cnt * 1.0 / n) * log2(cnt * 1.0 / n)), 6)
             AS char_entropy_bits
    FROM cc JOIN tot ON cc.lang = tot.lang
    GROUP BY cc.lang ORDER BY cc.lang
    """,
)
def docs_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "lang", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    cc = chars.groupBy("lang", "c").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cc.groupBy("lang").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return (
        cc.join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_chars"),
            F.count(F.lit(1)).alias("alphabet_size"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("char_entropy_bits"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal scoring — the perplexity-style quality filter of
# a corpus build: fit the corpus unigram distribution, score every doc
# by mean -log2 p(word), aggregate per source. Gibberish (rare-word
# soup) scores high, boilerplate scores low. Two real shuffles at any
# scale: groupBy(word) for the LM (map-side combined) and groupBy(doc)
# for the per-doc mean; the vocab joins back as a broadcast. Per-doc
# means are quantized to integer millibits (FLOOR(x*1000+0.5) — the
# cross-engine float rule) so every output column is integer-exact.
# ---------------------------------------------------------------------------
@_register(
    "docs_unigram_surprisal",
    """
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    vocab AS (SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    perdoc AS (
      SELECT doc_id, source,
             CAST(FLOOR((-SUM(log2(cnt * 1.0 / total)) / COUNT(*)) * 1000
                        + 0.5) AS BIGINT) AS q
      FROM toks JOIN vocab USING (word), tot
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q) AS BIGINT) AS sum_millibits,
           CAST(MIN(q) AS BIGINT) AS min_millibits,
           CAST(MAX(q) AS BIGINT) AS max_millibits
    FROM perdoc GROUP BY source ORDER BY source
    """,
)
def docs_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus total as a proper partial-agg scalar (a SUM() OVER ()
    # window here would single-partition the vocab — fine for a toy
    # alphabet, wrong at a 10M-word real vocabulary)
    total = vocab.agg(F.sum("cnt").alias("total"))
    surp = -F.log2(F.col("cnt").cast("double") / F.col("total"))
    perdoc = (
        toks.join(F.broadcast(vocab), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(
            F.floor((F.sum(surp) / F.count(F.lit(1))) * 1000 + 0.5)
            .cast("long")
            .alias("q")
        )
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q").cast("long").alias("sum_millibits"),
            F.min("q").cast("long").alias("min_millibits"),
            F.max("q").cast("long").alias("max_millibits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary induction (tokenizer-training step 0): global word
# frequency table, top-20 with stable rank. At 100 TB this is one
# map-side-combined groupBy on word + TakeOrderedAndProject — the exact
# shape BPE/unigram trainers run first over a corpus.
# ---------------------------------------------------------------------------
@_register(
    "docs_vocab_topk",
    """
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (
      SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY word
    )
    SELECT word, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT)
             AS vocab_rank
    FROM c ORDER BY n DESC, word LIMIT 20
    """,
)
def docs_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )
    # rank assigned AFTER the top-k cut: the single-partition window
    # only ever sees 20 rows (TakeOrderedAndProject upstream), never
    # the full vocabulary.
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return counts.withColumn(
        "vocab_rank", F.row_number().over(w).cast("long")
    ).orderBy("vocab_rank")


# ---------------------------------------------------------------------------
# Embedding duplicate CLUSTERS: connected components over the
# banded-hyperplane-LSH near-dup pairs (the embedding counterpart of
# docs_dedup_keep_best's simhash clusters) — the dedup step that picks
# one representative per group of near-identical embeddings before
# training. Distributed min-label propagation; the oracle reproduces
# the identical banding + exact-cosine pairs, then closes them with a
# recursive CTE.
# ---------------------------------------------------------------------------
def _register_embedding_dup_clusters() -> None:
    inner = ORACLES["embedding_near_dup_cosine"]
    oracle = f"""
    WITH RECURSIVE p AS ({inner}),
    sym AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
    nodes AS (SELECT DISTINCT s AS n FROM sym),
    reach(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, e.d FROM reach r JOIN sym e ON r.b = e.s
    ),
    comp AS (SELECT a AS vec_id, MIN(b) AS component FROM reach GROUP BY a)
    SELECT component, COUNT(*) AS n_members
    FROM comp GROUP BY component ORDER BY component
    """

    @_register("embedding_dup_clusters", oracle)
    def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
        from epl_cas_etl_2026_spark.operators.dedup import connected_components
        from epl_cas_etl_2026_spark.operators.similarity import band_lsh_pairs

        emb = load_table(spark, sf_dir, "embeddings")
        pairs = band_lsh_pairs(
            emb,
            planes=_lsh_planes(),
            n_bands=_LSH_BANDS,
            rows_per_band=_LSH_ROWS,
            id_col="vec_id",
            vec_col="embedding",
            threshold=0.4,
        )
        comps = connected_components(pairs, "id_a", "id_b")
        return (
            comps.groupBy(F.col("label").alias("component"))
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("component")
        )


_register_embedding_dup_clusters()


# ---------------------------------------------------------------------------
# Deterministic corpus sharding (the training-shuffle primitive):
# shard = md5(doc_id) mod N — a pure per-row expression, so shard
# assignment is reproducible across engines/runs and needs NO global
# sort; the only shuffle is the per-shard stat rollup (at 100 TB the
# write itself would be partitionBy(shard), embarrassingly parallel).
# The hex→int step uses instr/substr arithmetic both engines evaluate
# identically (no engine-specific hex-parse builtin required).
# ---------------------------------------------------------------------------
_SHARD_N = 8
# first 4 hex chars of md5 → 16-bit int, identical SQL in both engines
_HEX16 = (
    "((instr('0123456789abcdef', substr({m}, 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr({m}, 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr({m}, 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr({m}, 4, 1)) - 1))"
)


@_register(
    "docs_shard_assignment",
    f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             CAST({_HEX16.format(m="md5(CAST(doc_id AS VARCHAR))")} % {_SHARD_N}
                  AS BIGINT) AS shard
      FROM documents
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM s GROUP BY shard ORDER BY shard
    """,
)
def docs_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = F.expr(
        f"CAST({_HEX16.format(m='md5(CAST(doc_id AS STRING))')} % {_SHARD_N}"
        " AS BIGINT)"
    )
    return (
        docs.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Relative-standing windows (W-family breadth): percent_rank and
# cume_dist per market segment — the distributional twins of ntile
# deciles. Per-partition windows only (segment-keyed), never global.
# Doubles are exact here: both expressions are ratios of small
# integers (rank arithmetic), so 6-dp rounding is engine-stable.
# ---------------------------------------------------------------------------
@_register(
    "customer_balance_standing",
    """
    WITH w AS (
      SELECT c_mktsegment, c_custkey,
             PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) AS pr,
             CUME_DIST() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS cd
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(AVG(pr), 6) AS mean_percent_rank,
           ROUND(MAX(cd), 6) AS max_cume_dist,
           CAST(SUM(CASE WHEN cd <= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
             AS bottom_quartile_n
    FROM w GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def customer_balance_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    standing = cust.select(
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        standing.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("pr"), 6).alias("mean_percent_rank"),
            F.round(F.max("cd"), 6).alias("max_cume_dist"),
            F.sum(F.when(F.col("cd") <= 0.25, 1).otherwise(0))
            .cast("long")
            .alias("bottom_quartile_n"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column profiling (data-catalog stats): one scan
# computes per-column null count / distinct count / min / max, then the
# single aggregate row is stacked into (column, stat) rows — the
# engine-side equivalent of ANALYZE TABLE ... COMPUTE STATISTICS FOR
# COLUMNS, and the first step of any corpus intake audit. Values are
# stringified so heterogeneous columns share one schema.
# ---------------------------------------------------------------------------
@_register(
    "docs_column_profile",
    """
    WITH a AS (
      SELECT
        COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS lang_nulls,
        COUNT(DISTINCT lang) AS lang_distinct,
        CAST(MIN(lang) AS VARCHAR) AS lang_min,
        CAST(MAX(lang) AS VARCHAR) AS lang_max,
        CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS source_nulls,
        COUNT(DISTINCT source) AS source_distinct,
        CAST(MIN(source) AS VARCHAR) AS source_min,
        CAST(MAX(source) AS VARCHAR) AS source_max,
        CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_chars_nulls,
        COUNT(DISTINCT n_chars) AS n_chars_distinct,
        CAST(MIN(n_chars) AS VARCHAR) AS n_chars_min,
        CAST(MAX(n_chars) AS VARCHAR) AS n_chars_max
      FROM documents
    )
    SELECT 'lang' AS col, n_rows, lang_nulls AS n_nulls,
           lang_distinct AS n_distinct, lang_min AS min_value,
           lang_max AS max_value FROM a
    UNION ALL
    SELECT 'n_chars', n_rows, n_chars_nulls, n_chars_distinct,
           n_chars_min, n_chars_max FROM a
    UNION ALL
    SELECT 'source', n_rows, source_nulls, source_distinct,
           source_min, source_max FROM a
    ORDER BY col
    """,
)
def docs_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    profiled = ["lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in profiled:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}_min"),
            F.max(F.col(c)).cast("string").alias(f"{c}_max"),
        ]
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_nulls, {c}_distinct, {c}_min, {c}_max" for c in profiled
    )
    return one.select(
        F.expr(
            f"stack({len(profiled)}, {stack_args})"
            " as (col, n_nulls, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select(
        "col", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    ).orderBy("col")


# ---------------------------------------------------------------------------
# Rank-DISTRIBUTION window functions — ntile/percent_rank/cume_dist in
# one keyed window pass (reference analogue: the ranking endpoints'
# competition_rank, app.py:505-530, generalized to the three
# distribution forms Spark/ANSI define). Ordering is made total by the
# (cents, custkey) tiebreak: ntile SPLITS peer groups by physical row
# order, so an ambiguous sort would be nondeterministic across engines
# AND across runs. percent_rank/cume_dist are emitted as
# FLOOR(x*1e6+0.5) parts-per-million — both engines compute the same
# (rank-1)/(n-1) / rank/n IEEE doubles, the scaled floor just keeps
# the hash compare integer-exact.
#
# 100 TB note: the window partitions by c_mktsegment (5 giant groups);
# per-group exact sorts at that scale go through the two-phase
# global-rank decomposition (operators/ranking.py,
# orders_global_rank_two_phase) — same outputs, no per-group
# single-reducer sort. This query pins the SEMANTICS on the window
# form; the scale path is already gated separately.
# ---------------------------------------------------------------------------
@_register(
    "customer_balance_distribution_ranks",
    """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT)
               AS bal_cents
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, bal_cents,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) AS BIGINT)
             AS pr_ppm,
           CAST(FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) AS BIGINT)
             AS cd_ppm
    FROM c
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal_cents, c_custkey)
    ORDER BY c_mktsegment, bal_cents, c_custkey
    """,
)
def customer_balance_distribution_ranks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("bal_cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("bal_cents", "c_custkey")
    ppm = lambda col: F.floor(col * 1000000 + 0.5).cast("long")  # noqa: E731
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "bal_cents",
        F.ntile(4).over(w).alias("quartile"),
        ppm(F.percent_rank().over(w)).alias("pr_ppm"),
        ppm(F.cume_dist().over(w)).alias("cd_ppm"),
    ).orderBy("c_mktsegment", "bal_cents", "c_custkey")


# ---------------------------------------------------------------------------
# RANGE frame (value-based window) — per customer, the rolling count
# and spend over the trailing 30 DAYS ending at each order, computed
# with RANGE BETWEEN 30 PRECEDING AND CURRENT ROW over an integer
# day ordinal. Distinct operator from the ROWS frame
# (events_user_moving_sum): the frame edge is a VALUE offset, so
# same-day peer rows all enter every peer's frame (tie handling is
# defined by the standard, not by physical order) and gaps in the
# date axis shrink the frame — semantics ROWS cannot express. The
# day ordinal (days since 1970-01-01) sidesteps engine-specific
# INTERVAL frame syntax; both engines range over the same integers.
# 100 TB: keyed window per customer — partition-parallel, no global
# sort; cents arithmetic keeps the hash integer-exact.
# ---------------------------------------------------------------------------
@_register(
    "orders_trailing_30d_range_frame",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
               AS day_ord,
             CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT)
               AS price_cents
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
           CAST(SUM(price_cents) OVER w AS BIGINT) AS spend_30d_cents
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day_ord
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def orders_trailing_30d_range_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_ord"),
        F.floor(F.col("o_totalprice").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_ord")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.sum("price_cents").over(w).alias("spend_30d_cents"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split — the cluster-aware upgrade of
# docs_train_val_test_split: near-duplicate documents must NEVER
# straddle a split boundary (a train/val near-dup pair leaks training
# text into evaluation), so the split key is the near-dup CLUSTER
# representative (connected-component min label; singletons key on
# their own id), not the doc id. The output carries the
# straddling-pair count — 0 by construction — so the cross-engine gate
# PROVES the leakage property, not just the distribution counts.
# Oracle: recursive-CTE closure recomputes components independently.
# 100 TB: pairs/labels are slim id-frames; the straddle audit is two
# id-keyed joins; split assignment is a pure hash of the label — no
# shuffle beyond what the CC step already did.
# ---------------------------------------------------------------------------
@_register(
    "docs_leakage_safe_split",
    f"""
    WITH RECURSIVE sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN sim sa ON sa.doc_id = id_a
      JOIN sim sb ON sb.doc_id = id_b
      WHERE bit_count(xor(sa.h, sb.h)) <= 3
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT s AS n FROM sym),
    reach(a, b) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.a, e.d FROM reach r JOIN sym e ON r.b = e.s
    ),
    comp AS (SELECT a AS node, MIN(b) AS label FROM reach GROUP BY a),
    assign AS (
      SELECT d.doc_id,
             comp.node IS NOT NULL AS is_dup,
             CASE WHEN {_hash_pct_sql('COALESCE(comp.label, d.doc_id)')} < 80
                    THEN 'train'
                  WHEN {_hash_pct_sql('COALESCE(comp.label, d.doc_id)')} < 90
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    ),
    straddle AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS straddling_pairs
      FROM pairs
      JOIN assign x ON pairs.id_a = x.doc_id
      JOIN assign y ON pairs.id_b = y.doc_id
      WHERE x.split <> y.split
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           straddling_pairs
    FROM assign, straddle
    GROUP BY split, straddling_pairs
    ORDER BY split
    """,
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import (
        connected_components,
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(docs, max_hamming=3).select("id_a", "id_b")
    pairs = pairs.localCheckpoint(eager=False)  # pin: reused twice below
    comps = connected_components(pairs, "id_a", "id_b")
    rep = F.coalesce(F.col("label"), F.col("doc_id"))
    assign = (
        docs.select("doc_id")
        .join(comps, docs["doc_id"] == comps["node"], "left")
        .select(
            "doc_id",
            F.col("node").isNotNull().alias("is_dup"),
            F.when(_hash_pct_col(rep) < 80, F.lit("train"))
            .when(_hash_pct_col(rep) < 90, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        # pin: three consumers (per-split rollup + both straddle-join
        # sides) — without this the docs⋈labels join and double md5
        # re-execute per consumer
        .localCheckpoint(eager=False)
    )
    straddle = (
        pairs.join(
            assign.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            assign.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).alias("straddling_pairs"))
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_docs"),
        )
        .crossJoin(straddle)
        .select("split", "n_docs", "n_dup_docs", "straddling_pairs")
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# PMI collocations — corpus association mining (the classic
# collocation-extraction step; complements docs_vocab_topk's raw
# frequencies and docs_unigram_surprisal's LM scoring with a
# SECOND-ORDER statistic). Bigrams come from adjacent-token zips
# inside the scan stage; PMI = log2(p(xy) / (p(x)p(y))) evaluated
# with the IDENTICAL double-division shape on both engines, then
# millibit-quantized. Support floor c12 >= 5 kills hapax noise.
# 100 TB: one map-side-combined groupBy per n-gram order, equi-joins
# on word for the marginals, scalars broadcast, top-20 via
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@_register(
    "docs_pmi_collocations",
    """
    WITH toks AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ),
    uni AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(w) AS word FROM toks)
      WHERE word <> '' GROUP BY word
    ),
    bg AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM (SELECT u.p[1] AS w1, u.p[2] AS w2
            FROM (SELECT unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
                  FROM toks) u)
      WHERE w1 <> '' AND w2 <> ''
      GROUP BY w1, w2
    ),
    tot AS (
      SELECT (SELECT SUM(c) FROM uni) AS n_uni,
             (SELECT SUM(c12) FROM bg) AS n_bg
    )
    SELECT w1, w2, c12,
           CAST(FLOOR(log2((CAST(c12 AS DOUBLE) / n_bg)
                           / ((CAST(u1.c AS DOUBLE) / n_uni)
                              * (CAST(u2.c AS DOUBLE) / n_uni)))
                      * 1000 + 0.5) AS BIGINT) AS pmi_millibits
    FROM bg
    JOIN uni u1 ON bg.w1 = u1.word
    JOIN uni u2 ON bg.w2 = u2.word
    CROSS JOIN tot
    WHERE c12 >= 5
    ORDER BY pmi_millibits DESC, w1, w2 LIMIT 20
    """,
)
def docs_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), " ").alias("w"))
    uni = (
        toks.select(F.explode("w").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, greatest(size(w) - 1, 0))").alias("w1"),
                    F.expr("slice(w, 2, greatest(size(w) - 1, 0))").alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    # totals over the UNfiltered tables (the support floor prunes
    # candidates, it must not change the probability denominators)
    tot = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bg.agg(F.sum("c12").alias("n_bg"))
    )
    bg = bg.filter(F.col("c12") >= 5)
    # the identical double-division shape as the oracle: ulp-parity
    ratio = (F.col("c12").cast("double") / F.col("n_bg")) / (
        (F.col("u1c").cast("double") / F.col("n_uni"))
        * (F.col("u2c").cast("double") / F.col("n_uni"))
    )
    return (
        bg.join(uni.select(F.col("word").alias("w1"), F.col("c").alias("u1c")), "w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("c").alias("u2c")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            F.floor(F.log2(ratio) * 1000 + 0.5)
            .cast("long")
            .alias("pmi_millibits"),
        )
        .orderBy(F.desc("pmi_millibits"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Closed-form distributed OLS — univariate linear regression of order
# line value (whole dollars) on quantity, per return flag, via the
# normal equations: ONE scan producing exact integer moments
# (n, Sx, Sy, Sxx, Sxy, Syy; map-side combined), then slope /
# intercept / r² from the moments in IEEE doubles with the identical
# expression shape on both engines. This is the 100 TB regression
# recipe — no gradient iterations, no driver-side math beyond the
# 6-number fold; Spark's regr_slope/regr_intercept aggregates are
# deliberately avoided because their streaming-float merge order is
# partition-dependent (non-reproducible across engines AND runs).
# Overflow safety WITHOUT decimal aggregation (measured 3× slower than
# long sums): only Σy² can wrap int64 (near 8e8 rows/group at dollar
# scale), so y² alone is SPLIT-SUMMED as (div 2^20, mod 2^20) long
# pairs — the hot aggregation stays in codegen-friendly longs to
# ~1e12 rows/group — and the exact value is reassembled in decimal on
# the 3 output rows. DuckDB's SUM promotes to HUGEINT natively, and
# equal exact integers cast to identical doubles, so the formula (pure
# doubles, identical shape) hash-matches.
# ---------------------------------------------------------------------------
@_register(
    "lineitem_ols_price_on_qty",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(q) AS sx, SUM(y) AS sy, SUM(q * q) AS sxx,
             SUM(q * y) AS sxy, SUM(y * y) AS syy
      FROM (SELECT l_returnflag,
                   CAST(FLOOR(CAST(l_quantity AS DOUBLE) + 0.5) AS BIGINT)
                     AS q,
                   CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) + 0.5)
                        AS BIGINT) AS y
            FROM lineitem)
      GROUP BY l_returnflag
    ), d AS (
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sx,
             CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
             CAST(sxy AS DOUBLE) AS sxy, CAST(syy AS DOUBLE) AS syy
      FROM m
    )
    SELECT l_returnflag, n,
           CAST(FLOOR((nd * sxy - sx * sy) / (nd * sxx - sx * sx)
                      * 1000000 + 0.5) AS BIGINT) AS slope_micro,
           CAST(FLOOR((sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
                            * sx) / nd * 1000 + 0.5) AS BIGINT)
             AS intercept_milli,
           CAST(FLOOR((nd * sxy - sx * sy) * (nd * sxy - sx * sy)
                      / ((nd * sxx - sx * sx) * (nd * syy - sy * sy))
                      * 1000000 + 0.5) AS BIGINT) AS r2_ppm
    FROM d ORDER BY l_returnflag
    """,
)
def lineitem_ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity").cast("double") + 0.5)
        .cast("long")
        .alias("q"),
        F.floor(F.col("l_extendedprice").cast("double") + 0.5)
        .cast("long")
        .alias("y"),
    )
    y2 = F.col("y") * F.col("y")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("q") * F.col("q")).alias("sxx"),
        F.sum(F.col("q") * F.col("y")).alias("sxy"),
        F.sum(F.expr("(y * y) div 1048576")).alias("syy_hi"),
        F.sum(y2 % 1048576).alias("syy_lo"),
    )
    # per-row hi ≤ y²/2^20 ≈ 1e4, lo < 2^20 → both long sums safe past
    # 1e12 rows/group; reassemble hi·2^20 + lo exactly in decimal on
    # the k output rows, then one cast to double
    syy_exact = (
        F.col("syy_hi").cast("decimal(38,0)") * 1048576
        + F.col("syy_lo").cast("decimal(38,0)")
    )
    d = m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("n").cast("double").alias("nd"),
        *[
            F.col(c).cast("double").alias(c)
            for c in ("sx", "sy", "sxx", "sxy")
        ],
        syy_exact.cast("double").alias("syy"),
    )
    nd = F.col("nd")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return d.select(
        "l_returnflag",
        "n",
        F.floor(slope * 1000000 + 0.5).cast("long").alias("slope_micro"),
        F.floor((F.col("sy") - slope * F.col("sx")) / nd * 1000 + 0.5)
        .cast("long")
        .alias("intercept_milli"),
        F.floor(cov_n * cov_n / (var_x * var_y) * 1000000 + 0.5)
        .cast("long")
        .alias("r2_ppm"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Quality-weighted importance resampling — the soft-filtering step of
# modern pretraining pipelines (keep all high-quality text, a fixed
# fraction of mid-quality, none of the junk) made DETERMINISTIC: a doc
# survives iff hash_pct(doc_id) < acceptance(quality class). Pure
# function of the id → reproducible across engines, runs, and
# repartitioning, and composable with the split/shard queries (same
# md5 family, different field). One scan, per-source counts map-side
# combined.
# ---------------------------------------------------------------------------
@_register(
    "docs_quality_resample_stats",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             CASE WHEN len(string_split(text, ' ')) < 5 THEN 'drop'
                  WHEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                       * 1.0 / nullif(length(text), 0) < 0.8 THEN 'review'
                  ELSE 'keep' END AS calidad
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN calidad = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep_class,
           CAST(SUM(CASE WHEN calidad = 'review' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_review_class,
           CAST(SUM(CASE WHEN {_hash_pct_sql('doc_id')} <
                           CASE calidad WHEN 'keep' THEN 100
                                        WHEN 'review' THEN 30
                                        ELSE 0 END
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM q GROUP BY source ORDER BY source
    """,
)
def docs_quality_resample_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    calidad = quality_class(F.col("text"))
    accept = (
        F.when(calidad == "keep", F.lit(100))
        .when(calidad == "review", F.lit(30))
        .otherwise(F.lit(0))
    )
    sampled = (_hash_pct_col(F.col("doc_id")) < accept).cast("long")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((calidad == "keep").cast("long")).alias("n_keep_class"),
            F.sum((calidad == "review").cast("long")).alias("n_review_class"),
            F.sum(sampled).alias("n_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Robust outlier detection via MAD (median absolute deviation) — the
# robust-statistics twin of the z-score query: median and MAD shrug
# off the heavy tail that drags mean/stddev. Two grouped exact-median
# passes (cents → med; |cents − med| → MAD) with the tiny per-group
# stats broadcast back between them; the outlier predicate
# |x − med| > 3·MAD. Everything stays DYADIC-exact cross-engine:
# cents are ints, an interpolated median of ints is a half-integer,
# the MAD of half-integers a quarter-integer — so med·2 and MAD·4 are
# emitted as exact BIGINTs and the 3·MAD comparison never rounds.
# 100 TB: exact grouped medians sort within groups; the documented
# scale path swaps in approx_percentile with identical plumbing.
# ---------------------------------------------------------------------------
@_register(
    "events_robust_outliers_mad",
    """
    WITH e AS (
      SELECT event_type,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
               AS cents
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med
      FROM e GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, ABS(e.cents - med.med) AS dev, med.med
      FROM e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(ANY_VALUE(dev.med) * 2 + 0.5) AS BIGINT) AS med_x2,
           CAST(FLOOR(ANY_VALUE(mad.mad) * 4 + 0.5) AS BIGINT) AS mad_x4,
           CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    ORDER BY dev.event_type
    """,
)
def events_robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("cents") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.any_value("med") * 2 + 0.5).cast("long").alias("med_x2"),
            F.floor(F.any_value("mad") * 4 + 0.5).cast("long").alias("mad_x4"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# EWMA over a 16-event trailing window, per user — exponentially
# weighted moving average with decay 1/2, the time-series smoother
# whose recursive definition (s_t = αx_t + (1−α)s_{t−1}) looks
# un-SQL-able but unrolls into a weighted window sum. The trick that
# makes it CROSS-ENGINE EXACT: α = 1/2 makes every weight a power of
# two, so each product cents·2^(i−k) is a dyadic rational well inside
# a double's 53-bit mantissa and every addition is EXACT — the sum is
# order-independent, immune to the float-merge nondeterminism that
# rules out regr_*/avg-style streaming aggregates. Weights are
# applied positionally (transform with index over the frame's
# collect_list) — newest element weight 1, each older element halved;
# normalized by Σ = 2 − 2^(1−k).
# 100 TB: keyed window, 16-element arrays, no global sort.
# ---------------------------------------------------------------------------
@_register(
    "events_user_ewma_dyadic",
    """
    WITH arr AS (
      SELECT event_id, user_id,
             list(CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    SELECT event_id, user_id,
           CAST(FLOOR(list_sum(list_transform(range(1, len(l) + 1),
                                              i -> l[i] * power(2, i - len(l))))
                      / (2 - power(2, 1 - len(l))) * 1000 + 0.5) AS BIGINT)
             AS ewma_milli
    FROM arr ORDER BY user_id, event_id
    """,
)
def events_user_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    num = F.expr(
        "aggregate(transform(l, (x, i) -> x * pow(2D, i + 1 - size(l))),"
        " 0D, (a, v) -> a + v)"
    )
    denom = F.expr("2D - pow(2D, 1 - size(l))")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.collect_list("cents").over(w).alias("l"),
        )
        .select(
            "event_id",
            "user_id",
            F.floor(num / denom * 1000 + 0.5).cast("long").alias("ewma_milli"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend (double exponential) smoothing over a 16-event
# trailing window, per user — the level+trend forecaster whose TWO
# coupled recurrences (l_t = αx_t + (1−α)(l_{t−1}+b_{t−1});
# b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}) make it strictly harder than
# the EWMA above: the state is a 2-vector and the recurrence a 2×2
# linear map, so no single weighted-window formula parameterized by
# length alone exists. What DOES exist: for a FIXED window length ℓ
# and fixed α=β=1/2, the one-step forecast l_ℓ+b_ℓ is a linear
# combination of x_1..x_ℓ whose coefficients are EXACT DYADIC
# rationals (denominator ≤ 2^30, numerator < 2^23 — verified at
# module import), so every product and partial sum of cent-scale
# integers is exactly representable in a double and the whole fold is
# order-independent and bit-identical cross-engine. The 16×16
# lower-triangular coefficient matrix is computed ONCE from the
# recurrence with Fraction arithmetic (_holt_weights) and embedded as
# the SAME literal array in both the Spark plan and the SQL oracle —
# the engines share data, not a float code path.
# 100 TB: keyed window, 16-element arrays, one shuffle on user_id,
# no global sort; the coefficient table is 256 literal doubles.
# ---------------------------------------------------------------------------
def _holt_weights(max_len: int = 16) -> list:
    """Forecast coefficients w[ℓ−1][i] of x_{i+1} in (l_ℓ + b_ℓ) for
    Holt α=β=1/2, init l_1=x_1, b_1=0. Exact dyadic by construction;
    asserts every value round-trips through a double exactly."""
    from fractions import Fraction as Fr

    out = []
    for ln in range(1, max_len + 1):
        lv = [Fr(0)] * ln
        bv = [Fr(0)] * ln
        lv[0] = Fr(1)
        for t in range(1, ln):
            nl = [(a + b) / 2 for a, b in zip(lv, bv)]
            nl[t] += Fr(1, 2)
            nb = [(n - a) / 2 + b / 2 for n, a, b in zip(nl, lv, bv)]
            lv, bv = nl, nb
        f = [a + b for a, b in zip(lv, bv)]
        assert all(
            c.denominator <= (1 << 30)
            and (c.denominator & (c.denominator - 1)) == 0
            and abs(c.numerator) < (1 << 23)
            and Fr(float(c)) == c
            for c in f
        )
        out.append([float(c) for c in f])
    return out


_HOLT_W = _holt_weights()
_HOLT_W_SQL = "[" + ", ".join(
    "[" + ", ".join(repr(c) for c in row) + "]" for row in _HOLT_W
) + "]"


@_register(
    "events_user_holt_dyadic",
    f"""
    WITH arr AS (
      SELECT event_id, user_id,
             list(CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    SELECT event_id, user_id,
           CAST(FLOOR(list_sum(list_transform(range(1, len(l) + 1),
                                i -> l[i] * ({_HOLT_W_SQL})[len(l)][i]))
                      * 10 + 0.5) AS BIGINT) AS holt_milli
    FROM arr ORDER BY user_id, event_id
    """,
)
def events_user_holt_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    wlit = F.array(*[
        F.array(*[F.lit(c) for c in row]) for row in _HOLT_W
    ])
    # positional dot product of the trailing window against the
    # length-matched coefficient row; every term dyadic-exact
    forecast = F.expr(
        "aggregate(transform(l, (x, i) -> x * element_at(wrow, i + 1)),"
        " 0D, (a, v) -> a + v)"
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.collect_list("cents").over(w).alias("l"),
        )
        .withColumn("wrow", F.element_at(wlit, F.size("l")))
        .select(
            "event_id",
            "user_id",
            F.floor(forecast * 10 + 0.5).cast("long").alias("holt_milli"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# SimHash banding-parameter sweep — the dedup-index twin of the ANN
# recall curve: how do candidate volume, precision and recall move as
# the 60-bit hash is split into fewer, wider bands? Ground truth =
# ALL hamming≤3 pairs, which the 4×15 config catches EXACTLY (with 4
# bands, ≤3 flipped bits leave some band untouched — pigeonhole), so
# the (4,15) row is a built-in recall ≡ 1.0 self-check and the sweep
# needs no brute-force pass. 1×60 = exact-hash-only (high precision,
# low recall), 2×30 guarantees hamming≤1 only. This is the table an
# index operator reads before picking banding for a new corpus.
#
# 100 TB: each config is one band-key shuffle (the near-dup plan),
# never all-pairs; the three configs share the per-doc hash scan.
# ---------------------------------------------------------------------------
_SWEEP_CONFIGS = ((1, 60), (2, 30), (4, 15))
_SWEEP_HAM = 3


def _sweep_cfg_sql(nb: int, bb: int) -> str:
    mask = (1 << bb) - 1
    return f"""
      SELECT {nb} AS n_bands, {bb} AS band_bits,
             CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN hamming <= {_SWEEP_HAM} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM (
        SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
               bit_count(xor(sa.h, sb.h)) AS hamming
        FROM (SELECT doc_id, k AS band, (h >> (k * {bb})) & {mask} AS key
              FROM sim, generate_series(0, {nb - 1}) AS t(k)) a
        JOIN (SELECT doc_id, k AS band, (h >> (k * {bb})) & {mask} AS key
              FROM sim, generate_series(0, {nb - 1}) AS t(k)) c
          ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
        JOIN sim sa ON sa.doc_id = a.doc_id
        JOIN sim sb ON sb.doc_id = c.doc_id
      )
    """


@_register(
    "docs_simhash_band_sweep",
    f"""
    WITH sim AS ({_SIMHASH_SQL}),
    cfg AS (
      {" UNION ALL ".join(_sweep_cfg_sql(nb, bb)
                          for nb, bb in _SWEEP_CONFIGS)}
    ),
    truth AS (
      SELECT n_hit AS n_truth FROM cfg WHERE n_bands = 4
    )
    SELECT n_bands, band_bits, n_candidates, n_truth, n_hit,
           CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((n_hit * 1000000 + n_candidates // 2)
                          // n_candidates AS BIGINT) END AS precision_ppm,
           CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((n_hit * 1000000 + n_truth // 2)
                          // n_truth AS BIGINT) END AS recall_ppm
    FROM cfg CROSS JOIN truth ORDER BY n_bands
    """,
)
def docs_simhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import (
        simhash60_udf,
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # hash the corpus ONCE — the Arrow simhash UDF is the expensive
    # stage; the three banding configs share it (was 3 hash passes)
    sc = docs.sparkSession.sparkContext
    target = min(32, sc.defaultParallelism)
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    hashed = docs.select(
        "doc_id", simhash60_udf()(F.col("text")).alias("h")
    ).localCheckpoint(eager=False)  # not persist(): see the KMV note
    stats = []
    for nb, bb in _SWEEP_CONFIGS:
        cand = simhash_near_dup_pairs(
            None, max_hamming=64, n_bands=nb, band_bits=bb,
            prehashed=hashed,
        )
        stats.append(
            cand.agg(
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.sum(
                    (F.col("hamming") <= _SWEEP_HAM).cast("long")
                )
                .cast("long")
                .alias("n_hit"),
            ).select(
                F.lit(nb).cast("long").alias("n_bands"),
                F.lit(bb).cast("long").alias("band_bits"),
                "n_candidates",
                "n_hit",
            )
        )
    cfg = stats[0]
    for s in stats[1:]:
        cfg = cfg.unionByName(s)
    truth = (
        cfg.filter(F.col("n_bands") == 4)
        .select(F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_truth"))
    )
    return (
        cfg.crossJoin(F.broadcast(truth))
        .select(
            "n_bands",
            "band_bits",
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias(
                "n_candidates"
            ),
            "n_truth",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        )
        .select(
            "n_bands",
            "band_bits",
            "n_candidates",
            "n_truth",
            "n_hit",
            F.when(F.col("n_candidates") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(n_hit * CAST(1000000 AS BIGINT)"
                    " + n_candidates div 2) div n_candidates"
                )
            )
            .alias("precision_ppm"),
            F.when(F.col("n_truth") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(n_hit * CAST(1000000 AS BIGINT)"
                    " + n_truth div 2) div n_truth"
                )
            )
            .alias("recall_ppm"),
        )
        .orderBy("n_bands")
    )


# ---------------------------------------------------------------------------
# Rolling MEDIAN over a 15-event trailing window, per user — the
# robust twin of the moving average (one fat-finger spike moves a
# mean for 15 events, a median for none). No native frame-median
# exists in either engine; both sides sort the frame's collect_list
# and index the middle — lower median (element ⌈k/2⌉ of the sorted
# window, exact integer cents) so the result is a VALUE FROM THE
# DATA, not an interpolated float (cross-engine exact by
# construction). 100 TB: keyed window, 15-element arrays, one
# shuffle on user_id.
# ---------------------------------------------------------------------------
@_register(
    "events_user_rolling_median",
    """
    WITH arr AS (
      SELECT event_id, user_id,
             list(CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    SELECT event_id, user_id,
           list_sort(l)[(len(l) + 1) // 2] AS median_cents
    FROM arr ORDER BY user_id, event_id
    """,
)
def events_user_rolling_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.collect_list("cents").over(w).alias("l"),
        )
        .select(
            "event_id",
            "user_id",
            F.expr(
                "element_at(array_sort(l),"
                " CAST((size(l) + 1) div 2 AS INT))"
            ).alias("median_cents"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# String-parsing surface — regexp_extract + split_part as SCAN-STAGE
# expressions (reference analogue: the catalog-normalization string
# pipeline, etl_sync.py's nombre cleanup, generalized to structured
# identifier parsing). Brand numbers come out of 'Brand#NN' by regex
# group capture; priority ranks out of 'N-LABEL' by delimiter
# position; both engines share the regex dialect for this class and
# 1-based group/field indexing. Parsing happens BEFORE the groupBy,
# inside whole-stage codegen — the classic ELT normalize-then-
# aggregate, zero extra passes.
# ---------------------------------------------------------------------------
@_register(
    "parts_string_parse_stats",
    """
    SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT)
             AS brand_num,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT split_part(p_name, ' ', 1)) AS BIGINT)
             AS n_name_heads,
           CAST(SUM(CAST(FLOOR(CAST(p_retailprice AS DOUBLE) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS sum_retail_cents
    FROM part
    GROUP BY brand_num ORDER BY brand_num
    """,
)
def parts_string_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1)
            .cast("long")
            .alias("brand_num"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("head"),
            F.floor(F.col("p_retailprice").cast("double") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("brand_num")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count_distinct(F.col("head")).alias("n_name_heads"),
            F.sum("cents").alias("sum_retail_cents"),
        )
        .orderBy("brand_num")
    )


# ---------------------------------------------------------------------------
# Triangle count + global clustering coefficient over the near-dup
# graph — the canonical distributed-graph aggregate (wedge-closure
# rate tells you whether near-dup pairs form coherent duplicate
# CLIQUES or noisy hub stars — a dedup-quality diagnostic). Edges are
# the simhash pair list (already id_a < id_b); triangles are the
# ordered 2-path ⋈ closing-edge equi-join (a<b<c counts each triangle
# exactly once); wedges come from the degree table as Σ d·(d−1)/2.
# Coefficient = 3·triangles/wedges in ppm. 100 TB note: the 2-path
# join fans out quadratically on hub vertices — the standard fix
# (orient edges by DEGREE, join only low→high) is a drop-in once hubs
# appear; on near-dup graphs band-capping (DF_CAP-style) already
# bounds degrees upstream.
# ---------------------------------------------------------------------------
@_register(
    "docs_near_dup_triangles",
    f"""
    WITH sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ),
    e AS (
      SELECT id_a AS a, id_b AS b FROM cand
      JOIN sim sa ON sa.doc_id = id_a
      JOIN sim sb ON sb.doc_id = id_b
      WHERE bit_count(xor(sa.h, sb.h)) <= 3
    ),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
      GROUP BY v
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
        ON e3.a = e1.a AND e3.b = e2.b
    ),
    wed AS (
      SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges,
             CAST(COUNT(*) AS BIGINT) AS n_vertices,
             CAST(MAX(d) AS BIGINT) AS max_degree
      FROM deg
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           n_vertices, max_degree, n_triangles, n_wedges,
           CAST(FLOOR(3.0 * n_triangles / n_wedges * 1000000 + 0.5)
                AS BIGINT) AS clustering_ppm
    FROM tri, wed
    """,
)
def docs_near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    e = (
        simhash_near_dup_pairs(docs, max_hamming=3)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .localCheckpoint(eager=False)  # pin: consumed by 4 subtrees
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
        F.count(F.lit(1)).alias("n_vertices"),
        F.max("d").alias("max_degree"),
    )
    # Degree-ordered orientation (Suri & Vassilvitskii's MR-friendly
    # scheme): point every edge from its (degree, id)-smaller endpoint
    # to the larger, enumerate wedges only between OUT-neighbors, and
    # close with an oriented edge. Out-degree is bounded by O(√m), so
    # the wedge fan-out is hub-proof — Σ outdeg² instead of Σ deg².
    # The count is identical to the oracle's id-ordered enumeration
    # (each triangle has exactly one minimum vertex under the total
    # (degree, id) order).
    ed = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    x, y = o.alias("x"), o.alias("y")
    lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    tri = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & lt)
        .join(
            o.alias("z"),
            (F.col("z.u") == F.col("x.v")) & (F.col("z.v") == F.col("y.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    edges_n = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        edges_n.crossJoin(wed)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_vertices",
            "max_degree",
            "n_triangles",
            "n_wedges",
            F.floor(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges") * 1000000
                + 0.5
            )
            .cast("long")
            .alias("clustering_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# DOULION approximate triangle count (Tsourakakis et al., KDD 2009 —
# public method): sparsify the near-dup graph by keeping each edge
# with probability p = 1/10, count triangles on the SAMPLED graph
# with the same degree-ordered orientation as the exact query above,
# and scale by 1/p³. This is the single-box answer for the one
# artifact the exact query cannot deliver at sf1 (74.9 G wedges,
# SCALE_sf1.json): sampling cuts wedge work by p² and triangle work
# by p³, so the sf1 run fits one machine with a stated-variance
# estimate (Var[T̂] ≤ T/p³ + 2·(paths-through-shared-edge)/p; the
# estimator is unbiased: each triangle survives with exactly p³).
#
# The sampling coin is DETERMINISTIC — keep (a,b) iff the md5-derived
# 32-bit uniform of "a|b|seed" lands in the 1-in-10 residue class —
# because a reproducible sparsifier is what makes the whole ESTIMATE
# (not just invariants) cross-engine gateable: DuckDB replays the
# identical coin, the identical sampled graph, the identical count.
# md5 (the repo's established cross-engine RNG, cf. events_dp_histogram
# and the weighted samplers) and NOT a linear multiply-mod hash: the
# three edges of one triangle are three linear forms over its vertex
# ids, and a linear coin's survivals are CORRELATED on structured id
# sets (measured +64% triangle bias on a planted-clique grid), while a
# PRF-grade coin gives the independent p**3 survival DOULION's
# unbiasedness proof needs (test_doulion_accuracy_on_planted_cliques
# pins exactly this). A production run that wants fresh randomness
# swaps the seed string per run; the estimator algebra is unchanged.
# Estimator-accuracy bounds live in tests/test_analytics_props.py on a
# SEEDED planted-clique graph (testdata-regeneration safety), not in
# the gated row.
# ---------------------------------------------------------------------------
_DLN_SEED = "dln-seed-1"
_DLN_DEN = 10  # keep 1-in-10 edges: p = 1/10, 1/p^3 = 1000


@_register(
    "docs_near_dup_triangles_doulion",
    f"""
    WITH sim AS ({_SIMHASH_SQL}),
    banded AS (
      SELECT doc_id, k AS band, (h >> (k * 15)) & 32767 AS key
      FROM sim, generate_series(0, 3) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ),
    e0 AS (
      SELECT id_a AS a, id_b AS b FROM cand
      JOIN sim sa ON sa.doc_id = id_a
      JOIN sim sb ON sb.doc_id = id_b
      WHERE bit_count(xor(sa.h, sb.h)) <= 3
    ),
    e AS (
      SELECT a, b FROM e0
      WHERE CAST(('0x' || substr(md5(a || '|' || b || '|{_DLN_SEED}'),
                                 1, 8)) AS BIGINT) % {_DLN_DEN} = 0
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tri_sampled
      FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
        ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges_full,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges_sampled,
           CAST({_DLN_DEN} AS BIGINT) AS inv_p,
           n_tri_sampled,
           CAST(n_tri_sampled * {_DLN_DEN ** 3} AS BIGINT) AS est_triangles
    FROM tri
    """,
)
def docs_near_dup_triangles_doulion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    e0 = (
        simhash_near_dup_pairs(docs, max_hamming=3)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .localCheckpoint(eager=False)  # pin: full-count + sample branches
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("a"), F.col("b"), F.lit(_DLN_SEED)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _DLN_DEN
        == 0
    )
    e = e0.filter(coin).localCheckpoint(eager=False)
    # degree-ordered orientation on the SAMPLED graph — same hub-proof
    # enumeration as docs_near_dup_triangles (Suri & Vassilvitskii),
    # Σ outdeg² ≤ O(m^1.5) work instead of Σ deg² wedges
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    x, y = o.alias("x"), o.alias("y")
    lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    tri = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & lt)
        .join(
            o.alias("z"),
            (F.col("z.u") == F.col("x.v")) & (F.col("z.v") == F.col("y.v")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri_sampled"))
    )
    return (
        e0.agg(F.count(F.lit(1)).cast("long").alias("n_edges_full"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges_sampled")))
        .crossJoin(tri)
        .select(
            "n_edges_full",
            "n_edges_sampled",
            F.lit(_DLN_DEN).cast("long").alias("inv_p"),
            "n_tri_sampled",
            (F.col("n_tri_sampled") * F.lit(_DLN_DEN**3))
            .cast("long")
            .alias("est_triangles"),
        )
    )


# ---------------------------------------------------------------------------
# Product-quantization index build (operators/similarity.pq_fit /
# pq_encode — Jégou et al. 2011) under the k-means-style invariant
# gate: PQ training is iterative (no closed-form SQL twin), so the
# gated output is the invariant set any correct build satisfies and
# the oracle CAN restate: complete coverage (every vector gets m
# sub-codes), codes in range, and — the real check — every assigned
# code is the argmin over its subspace's codebook, re-verified through
# an INDEPENDENT code path (broadcast-joined JVM zip_with distances vs
# the Arrow/numpy assignment). Disagreement → violations > 0 → hash
# red. The ADC top-k serving path (pq_adc_topk) is exercised by
# tests/test_analytics_props.py's recall check.
# ---------------------------------------------------------------------------
@_register(
    "embedding_pq_codes_invariants",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) * 8 AS BIGINT) AS n_sub_rows,
           CAST(8 AS BIGINT) AS m_subspaces,
           CAST(16 AS BIGINT) AS k_codes,
           CAST(0 AS BIGINT) AS code_range_violations,
           CAST(0 AS BIGINT) AS argmin_violations
    FROM embeddings
    """,
)
def embedding_pq_codes_invariants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import pq_encode, pq_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_fit(emb, dim=64, m=8, k=16, iters=2)
    codes = pq_encode(emb, cb, dim=64, m=8)
    cb_rows = [
        (s, j, [float(x) for x in cb[s][j]])
        for s in range(8)
        for j in range(16)
    ]
    cbdf = spark.createDataFrame(
        cb_rows, "sub_id int, cand_code int, centroid array<double>"
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("subvec"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        codes.join(F.broadcast(cbdf), "sub_id")
        .select("vec_id", "sub_id", "code", "sq_dist", dist.alias("d"))
        .groupBy("vec_id", "sub_id", "code", "sq_dist")
        .agg(F.min("d").alias("best_expr"))
    )
    return best.agg(
        F.count_distinct("vec_id").alias("n_points"),
        F.count(F.lit(1)).alias("n_sub_rows"),
        F.lit(8).cast("long").alias("m_subspaces"),
        F.lit(16).cast("long").alias("k_codes"),
        F.sum(
            F.when((F.col("code") < 0) | (F.col("code") >= 16), 1).otherwise(0)
        )
        .cast("long")
        .alias("code_range_violations"),
        F.sum(
            F.when(F.col("sq_dist") > F.col("best_expr") + 1e-6, 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("argmin_violations"),
    )


# ---------------------------------------------------------------------------
# BPE merge step — tokenizer training step 1 (docs_vocab_topk is step
# 0): find the most frequent adjacent token pair, apply the merge
# corpus-wide with GREEDY left-to-right semantics (the BPE rule: after
# 'a a a' merges (a,a) you hold ['a_a','a'], not two overlapping
# merges), and report the post-merge vocabulary and the NEXT merge
# candidate. The greedy scan is sequential per document — expressed as
# a fold (Spark aggregate / DuckDB list_reduce) over the token array,
# accumulator = the rewritten prefix; merges can't cross document
# boundaries so the fold parallelizes perfectly across docs. Pair
# selection ties break (count DESC, w1, w2) so both engines pick the
# same merge. DuckDB 1.0 pitfall baked into the oracle shape: lambda
# STRUCT accumulators lose state (field access on the accumulated
# struct returns the first-step value), so the accumulator is the bare
# VARCHAR[] prefix — no struct.
# 100 TB: two bigram groupBys (map-side combined) + one broadcast
# 1-row join + one per-row fold — a full BPE training run repeats
# this step with the merged stream cached, vocab-size times.
# ---------------------------------------------------------------------------
@_register(
    "docs_bpe_merge_step",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    bg AS (
      SELECT u.p[1] AS w1, u.p[2] AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
            FROM toks) u
      GROUP BY w1, w2
    ),
    top AS (
      SELECT w1, w2, c, w1 || '_' || w2 AS m
      FROM bg ORDER BY c DESC, w1, w2 LIMIT 1
    ),
    merged AS (
      SELECT doc_id,
             CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE list_reduce(list_transform(w, x -> [x]),
                    (acc, x) -> CASE WHEN len(acc) > 0
                                      AND acc[len(acc)] = top.w1
                                      AND x[1] = top.w2
                                THEN acc[1:len(acc) - 1] || [top.m]
                                ELSE acc || x END)
             END AS w
      FROM toks CROSS JOIN top
    ),
    bg2 AS (
      SELECT u.p[1] AS w1, u.p[2] AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
            FROM merged) u
      GROUP BY w1, w2
    ),
    nxt AS (SELECT w1 AS next_w1, w2 AS next_w2, c AS next_count
            FROM bg2 ORDER BY c DESC, w1, w2 LIMIT 1),
    vb AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab_before
           FROM (SELECT unnest(w) AS word FROM toks)),
    va AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab_after
           FROM (SELECT unnest(w) AS word FROM merged))
    SELECT top.w1, top.w2, top.c AS count_before,
           vocab_before, vocab_after, next_w1, next_w2, next_count
    FROM top, vb, va, nxt
    """,
)
def docs_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("w"),
    )

    def bigram_counts(frame):
        pairs = frame.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, greatest(size(w) - 1, 0))").alias("a"),
                    F.expr("slice(w, 2, greatest(size(w) - 1, 0))").alias("b"),
                )
            ).alias("p")
        ).select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
        return pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))

    top = (
        bigram_counts(toks)
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(1)
        .select(
            "w1",
            "w2",
            "c",
            F.concat_ws("_", F.col("w1"), F.col("w2")).alias("m"),
        )
    )
    merged = toks.crossJoin(F.broadcast(top)).select(
        "doc_id",
        greedy_pair_merge(
            F.col("w"), F.col("w1"), F.col("w2"), F.col("m")
        ).alias("w"),
    )
    nxt = (
        bigram_counts(merged)
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(1)
        .select(
            F.col("w1").alias("next_w1"),
            F.col("w2").alias("next_w2"),
            F.col("c").alias("next_count"),
        )
    )
    vb = (
        toks.select(F.explode("w").alias("word"))
        .agg(F.count_distinct("word").alias("vocab_before"))
    )
    va = (
        merged.select(F.explode("w").alias("word"))
        .agg(F.count_distinct("word").alias("vocab_after"))
    )
    return (
        top.select("w1", "w2", F.col("c").alias("count_before"))
        .crossJoin(vb)
        .crossJoin(va)
        .crossJoin(nxt)
    )


# ---------------------------------------------------------------------------
# First-fit-decreasing sequence packing — the quality upgrade of
# docs_pack_sequences' cumsum binning: FFD guarantees ≤ 11/9·OPT + 1
# bins (classic bin-packing bound) where order-of-arrival binning has
# no bound at all. Packing is sequential by nature, so the corpus is
# sharded (deterministic doc_id mod) and FFD runs as a per-shard FOLD
# over the size-descending item list (accumulator = bin loads; "first
# bin that fits" = array_position over a predicate transform). Equal
# sizes are interchangeable in the fold, so the size-desc sort alone
# makes the result deterministic. Reports bins vs the ceil(total/C)
# lower bound and the fill ratio — the packing-efficiency evidence.
# 100 TB: shard count scales freely; each shard's fold is O(docs ×
# bins) on a few-hundred-element array, embarrassingly parallel.
# ---------------------------------------------------------------------------
_FFD_CAP = 2048


@_register(
    "docs_pack_ffd_stats",
    f"""
    WITH t AS (
      SELECT doc_id % 8 AS shard,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tok
      FROM documents
    ),
    per AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             list(CAST(n_tok AS BIGINT) ORDER BY n_tok DESC) AS items
      FROM t GROUP BY shard
    ),
    packed AS (
      SELECT shard, n_docs, total_tokens,
             list_reduce(list_transform(items, x -> [x]),
               (acc, x) -> CASE
                 WHEN COALESCE(list_position(
                        list_transform(acc, v -> v + x[1] <= {_FFD_CAP}),
                        true), 0) = 0
                   THEN acc || x
                 ELSE list_transform(range(1, len(acc) + 1), i ->
                   CASE WHEN i = list_position(
                          list_transform(acc, v -> v + x[1] <= {_FFD_CAP}),
                          true)
                        THEN acc[i] + x[1] ELSE acc[i] END)
               END) AS bins
      FROM per
    )
    SELECT shard, n_docs, total_tokens,
           CAST(len(bins) AS BIGINT) AS n_bins_ffd,
           CAST(CEIL(total_tokens * 1.0 / {_FFD_CAP}) AS BIGINT)
             AS lower_bound,
           CAST(FLOOR(total_tokens * 1.0 / (len(bins) * {_FFD_CAP})
                      * 1000000 + 0.5) AS BIGINT) AS fill_ppm
    FROM packed ORDER BY shard
    """,
)
def docs_pack_ffd_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tok"),
    )
    per = t.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.reverse(F.array_sort(F.collect_list("n_tok"))).alias("items"),
    )

    bins = first_fit_pack(F.col("items"), _FFD_CAP)
    return per.select(
        "shard",
        "n_docs",
        "total_tokens",
        F.size(bins).cast("long").alias("n_bins_ffd"),
        F.ceil(F.col("total_tokens") / F.lit(float(_FFD_CAP)))
        .cast("long")
        .alias("lower_bound"),
        F.floor(
            F.col("total_tokens")
            / (F.size(bins) * F.lit(_FFD_CAP))
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("fill_ppm"),
    ).orderBy("shard")


# ---------------------------------------------------------------------------
# JSONL source round-trip — the "another source format" surface: write
# the documents table as line-delimited JSON, read it back through
# Spark's JSON source with an EXPLICIT schema (schema inference is a
# full extra pass at 100 TB — never rely on it) plus PERMISSIVE
# corrupt-record capture (two planted garbage lines land in
# _corrupt_rec instead of failing the job — the dead-letter pattern).
# The cross-field checksum Σ doc_id·n_chars proves field PAIRING
# survived serialization, not just row counts; the oracle recomputes
# everything from the original parquet.
# ---------------------------------------------------------------------------
@_register(
    "docs_jsonl_roundtrip_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(2 AS BIGINT) AS n_corrupt,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(doc_id * n_chars) AS BIGINT) AS pair_checksum,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    """,
)
def docs_jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    tmp = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        out = os.path.join(tmp, "docs_jsonl")
        docs.write.mode("overwrite").json(out)
        with open(os.path.join(out, "part-corrupt.json"), "w") as f:
            f.write('{"doc_id": broken\nnot json at all}\n')
        back = spark.read.schema(
            "doc_id long, lang string, n_chars long, text string, "
            "_corrupt_rec string"
        ).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_rec"
        ).json(out)
        stats = back.agg(
            F.sum(F.when(F.col("_corrupt_rec").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_rows"),
            F.sum(F.when(F.col("_corrupt_rec").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_corrupt"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum(F.col("doc_id") * F.col("n_chars")).alias("pair_checksum"),
            F.count_distinct("lang").alias("n_langs"),
        )
        rows = stats.collect()
        schema = stats.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Two-proportion z-test — experiment analysis over the events stream:
# variant = user_id parity (deterministic assignment), conversion =
# value ≥ 50. One scan to four exact integers (n, conversions per
# arm), then the pooled two-proportion z statistic evaluated with the
# IDENTICAL double expression shape on both engines and milli-scaled.
# The A/B readout every experimentation platform computes — here as a
# single map-side-combined aggregate instead of a metrics service.
# 100 TB: the scan is the whole cost; the statistic folds from 4
# numbers.
# ---------------------------------------------------------------------------
@_register(
    "events_ab_conversion_ztest",
    """
    WITH arms AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN user_id % 2 = 0 AND value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN user_id % 2 = 1 AND value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      FROM events
    )
    SELECT n_a, c_a, n_b, c_b,
           CASE WHEN n_a = 0 OR n_b = 0 OR c_a + c_b = 0
                     OR c_a + c_b = n_a + n_b THEN NULL
                ELSE CAST(FLOOR((CAST(c_a AS DOUBLE) / n_a
                                 - CAST(c_b AS DOUBLE) / n_b)
                      / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                             * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                             * (1.0 / n_a + 1.0 / n_b))
                      * 1000 + 0.5) AS BIGINT) END AS z_milli,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE CAST(FLOOR((CAST(c_a AS DOUBLE) / n_a
                                 - CAST(c_b AS DOUBLE) / n_b)
                      * 1000000 + 0.5) AS BIGINT) END AS lift_ppm
    FROM arms
    """,
)
def events_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm_a = (F.col("user_id") % 2 == 0).cast("long")
    conv = (F.col("value") >= 50).cast("long")
    arms = ev.agg(
        F.sum(arm_a).alias("n_a"),
        F.sum(arm_a * conv).alias("c_a"),
        F.sum(1 - arm_a).alias("n_b"),
        F.sum((1 - arm_a) * conv).alias("c_b"),
    )
    pa_, pb = (
        F.col("c_a").cast("double") / F.col("n_a"),
        F.col("c_b").cast("double") / F.col("n_b"),
    )
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (pa_ - pb) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    conv = F.col("c_a") + F.col("c_b")
    tot = F.col("n_a") + F.col("n_b")
    # degenerate designs (empty arm, 0% or 100% pooled conversion)
    # yield NULL, not an Infinity/NaN cast that crashes or diverges
    arm_ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return arms.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.when(
            arm_ok & (conv > 0) & (conv < tot),
            F.floor(z * 1000 + 0.5).cast("long"),
        ).alias("z_milli"),
        F.when(
            arm_ok, F.floor((pa_ - pb) * 1000000 + 0.5).cast("long")
        ).alias("lift_ppm"),
    )


# ---------------------------------------------------------------------------
# Chi-squared independence test (event_type × variant) — the
# categorical companion of the z-test. The statistic is a SUM of
# per-cell float terms, and a naive SUM() over cells would be
# partition-order-dependent — so the cells are collected into ONE
# SORTED array and folded in (event_type, variant) order on both
# engines: the deterministic-float-reduction pattern (sorted-array
# fold) that makes cross-engine hashes possible for float sums that
# don't telescope into exact integers. Cell counts/marginals stay
# exact BIGINTs (o·N fits int64 to ~3e9 rows; past that, lift the
# diff into DOUBLE or decimal). The cell list is tiny (|types|·2) —
# the one-row fold costs nothing; the scan is the whole cost.
# ---------------------------------------------------------------------------
@_register(
    "events_chi2_type_variant",
    """
    WITH c AS (
      SELECT event_type, user_id % 2 AS variant,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY event_type, variant
    ),
    t AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
          FROM c GROUP BY event_type),
    v AS (SELECT variant, CAST(SUM(o) AS BIGINT) AS ct
          FROM c GROUP BY variant),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
    cells AS (
      SELECT c.event_type, c.variant, o, rt, ct, n
      FROM c JOIN t USING (event_type) JOIN v USING (variant)
      CROSS JOIN tot
    ),
    arr AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             list({'o': o, 'rt': rt, 'ct': ct, 'n': n}
                  ORDER BY event_type, variant) AS l
      FROM cells
    )
    SELECT n_cells, CAST((n_types - 1) * 1 AS BIGINT) AS dof,
           CAST(FLOOR(list_reduce(
                  list_transform(l, x ->
                    CAST(x.o * x.n - x.rt * x.ct AS DOUBLE)
                    * CAST(x.o * x.n - x.rt * x.ct AS DOUBLE)
                    / (CAST(x.n AS DOUBLE) * x.rt * x.ct)),
                  (a, b) -> a + b) * 1000 + 0.5) AS BIGINT) AS chi2_milli
    FROM arr
    """,
)
def events_chi2_type_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("variant")
    ).agg(F.count(F.lit(1)).alias("o"))
    t = c.groupBy("event_type").agg(F.sum("o").alias("rt"))
    v = c.groupBy("variant").agg(F.sum("o").alias("ct"))
    tot = c.agg(F.sum("o").alias("n"))
    cells = (
        c.join(F.broadcast(t), "event_type")
        .join(F.broadcast(v), "variant")
        .crossJoin(F.broadcast(tot))
    )
    arr = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("event_type").alias("n_types"),
        F.array_sort(
            F.collect_list(
                F.struct("event_type", "variant", "o", "rt", "ct", "n")
            )
        ).alias("l"),
    )

    def term(x):
        d = (x["o"] * x["n"] - x["rt"] * x["ct"]).cast("double")
        return d * d / (x["n"].cast("double") * x["rt"] * x["ct"])

    chi2 = F.aggregate(
        F.transform(F.col("l"), term), F.lit(0.0), lambda a, b: a + b
    )
    return arr.select(
        "n_cells",
        ((F.col("n_types") - 1) * 1).cast("long").alias("dof"),
        F.floor(chi2 * 1000 + 0.5).cast("long").alias("chi2_milli"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U — the rank-based (nonparametric) companion of the
# z-test, and a query whose every output is an EXACT INTEGER: with
# average ranks doubled (2·avg_rank = 2·min_rank + tie_count − 1),
# the rank sum and U statistic never touch a float, so no
# quantization is needed at all. The global value rank comes from
# two_phase_competition_rank (range-partition + local rank + prefix
# offsets — no single-partition window), making this the 100 TB form
# of a test usually written with one big ORDER BY; tie counts ride a
# keyed window on the value.
# ---------------------------------------------------------------------------
@_register(
    "events_mannwhitney_value",
    """
    WITH e AS (
      SELECT user_id % 2 AS variant,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
               AS cents
      FROM events
    ),
    r AS (
      SELECT variant,
             CAST(RANK() OVER (ORDER BY cents) AS BIGINT) AS rnk,
             CAST(COUNT(*) OVER (PARTITION BY cents) AS BIGINT) AS tie
      FROM e
    )
    SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           CAST(SUM(CASE WHEN variant = 0 THEN 2 * rnk + tie - 1
                         ELSE 0 END) AS BIGINT) AS rank_sum_a_x2,
           CAST(SUM(CASE WHEN variant = 0 THEN 2 * rnk + tie - 1
                         ELSE 0 END)
                - SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                  * (SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) + 1)
                AS BIGINT) AS u_a_x2
    FROM r
    """,
)
def events_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.ranking import (
        two_phase_competition_rank,
    )

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("variant"),
        F.floor(F.col("value").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    # ascending value rank via the descending two-phase ranker on the
    # negated value (competition/min-rank semantics match RANK())
    ranked = two_phase_competition_rank(
        ev.withColumn("neg", -F.col("cents")), "neg", rank_col="rnk"
    )
    tie_w = Window.partitionBy("cents")
    r = ranked.select(
        "variant",
        F.col("rnk").cast("long").alias("rnk"),
        F.count(F.lit(1)).over(tie_w).cast("long").alias("tie"),
    )
    is_a = (F.col("variant") == 0).cast("long")
    ra2 = F.sum(is_a * (2 * F.col("rnk") + F.col("tie") - 1))
    na = F.sum(is_a)
    return r.agg(
        na.cast("long").alias("n_a"),
        F.sum(1 - is_a).cast("long").alias("n_b"),
        ra2.cast("long").alias("rank_sum_a_x2"),
        (ra2 - na * (na + 1)).cast("long").alias("u_a_x2"),
    )


# ---------------------------------------------------------------------------
# CUSUM change detection — the sequential drift monitor
# (s_t = max(0, s_{t−1} + x_t − k); alarm and reset at s ≥ h) that,
# like EWMA, looks un-SQL-able but runs as a per-key FOLD over the
# time-ordered value list: accumulator [s, alarms], both exact
# integer cents, so the recursion never touches a float. DuckDB's
# list_reduce has no explicit init (it seeds from the first element),
# so the oracle PREPENDS the [0, 0] init as a sentinel element — the
# cross-engine trick for seeding a typed accumulator. Per-user fold =
# embarrassingly parallel; reference constants k=50.00, h=200.00.
# ---------------------------------------------------------------------------
@_register(
    "events_cusum_drift_alarms",
    """
    WITH e AS (
      SELECT user_id,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
               AS cents
      FROM events
    ),
    per AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             list(cents ORDER BY cents) AS items
      FROM e GROUP BY user_id
    ),
    folded AS (
      SELECT user_id, n_events,
             list_reduce([[CAST(0 AS BIGINT), 0]]
                         || list_transform(items, x -> [x]),
               (acc, x) -> CASE
                 WHEN greatest(0, acc[1] + x[1] - 5000) >= 20000
                   THEN [CAST(0 AS BIGINT), acc[2] + 1]
                 ELSE [greatest(0, acc[1] + x[1] - 5000), acc[2]]
               END) AS r
      FROM per
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(r[2]) AS BIGINT) AS n_alarms,
           CAST(SUM(CASE WHEN r[2] > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_alarmed,
           CAST(MAX(r[1]) AS BIGINT) AS max_final_s
    FROM folded
    """,
)
def events_cusum_drift_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fold order: cents ASC (deterministic total order not needed —
    # CUSUM over a fixed reference k only needs SOME agreed order, and
    # value order is reproducible without a (ts, event_id) tiebreak
    # because equal cents are interchangeable in the recursion)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(F.collect_list("cents")).alias("items"),
    )
    step = lambda acc, x: F.when(  # noqa: E731
        F.greatest(F.lit(0).cast("long"), acc[0] + x - 5000) >= 20000,
        F.array(F.lit(0).cast("long"), acc[1] + 1),
    ).otherwise(
        F.array(
            F.greatest(F.lit(0).cast("long"), acc[0] + x - 5000), acc[1]
        )
    )
    folded = per.select(
        "user_id",
        "n_events",
        F.aggregate(
            F.col("items"),
            F.array(F.lit(0).cast("long"), F.lit(0).cast("long")),
            step,
        ).alias("r"),
    )
    return folded.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum(F.element_at("r", 2)).cast("long").alias("n_alarms"),
        F.sum(
            F.when(F.element_at("r", 2) > 0, 1).otherwise(0)
        ).cast("long").alias("n_users_alarmed"),
        F.max(F.element_at("r", 1)).cast("long").alias("max_final_s"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest — forecasting EVALUATION as a
# query: forecast(hour) = actual(hour − 24h) per event type, scored
# by WAPE (Σ|actual−forecast| / Σactual — the integer-sum-friendly
# accuracy metric; per-hour MAPE would divide per row and lose
# exactness). The t↔t−24h alignment is an equi-join on the shifted
# hour timestamp — robust to gaps, unlike lag(24) over a dense-hour
# assumption. Both sums are exact BIGINTs; the single division is
# ppm-floored. 100 TB: one hourly rollup (map-side combined) + one
# self-equi-join on (type, hour).
# ---------------------------------------------------------------------------
@_register(
    "events_seasonal_naive_backtest",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, hr
    )
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours_scored,
           CAST(SUM(a.n) AS BIGINT) AS actual_total,
           CAST(SUM(ABS(a.n - f.n)) AS BIGINT) AS abs_err_total,
           CAST(FLOOR(CAST(SUM(ABS(a.n - f.n)) AS DOUBLE)
                      / SUM(a.n) * 1000000 + 0.5) AS BIGINT) AS wape_ppm
    FROM h a JOIN h f
      ON a.event_type = f.event_type
     AND f.hr = a.hr - INTERVAL 24 HOURS
    GROUP BY a.event_type ORDER BY a.event_type
    """,
)
def events_seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, f = h.alias("a"), h.alias("f")
    joined = a.join(
        f,
        (F.col("a.event_type") == F.col("f.event_type"))
        & (
            F.col("f.hr")
            == F.col("a.hr") - F.expr("INTERVAL 24 HOURS")
        ),
    )
    abs_err = F.sum(F.abs(F.col("a.n") - F.col("f.n")))
    return (
        joined.groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_hours_scored"),
            F.sum("a.n").cast("long").alias("actual_total"),
            abs_err.cast("long").alias("abs_err_total"),
            F.floor(
                abs_err.cast("double") / F.sum("a.n") * 1000000 + 0.5
            )
            .cast("long")
            .alias("wape_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — the eval-set n-gram overlap scrub every
# pretraining pipeline runs before training (the GPT-3 appendix-C
# "13-gram decontamination" shape; word-3-grams here because the
# synthetic fixed-vocab corpus needs the shorter gram for signal —
# production would use 8-13). The "benchmark" is a deterministic
# held-out slice (doc_id % 97 == 0 — the driver-regeneration-proof
# analogue of a test-set table); a corpus doc is contaminated iff it
# shares ANY gram with it.
#
# Scale shape (100 TB): benchmark suites are tiny (MMLU+friends ≈ a
# few hundred MB of grams), so the gram set BROADCASTS and corpus
# grams never shuffle — explode stays inside the scan stage, the
# semi-join is map-side, and the only exchange carries the matched
# doc_ids (slim longs, already mostly-unique) into a distinct +
# per-source rollup. No full-data shuffle anywhere.
# ---------------------------------------------------------------------------
@_register(
    "docs_benchmark_decontaminate",
    """
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT DISTINCT unnest([array_to_string(w[i:i+2], ' ')
                              FOR i IN range(1, greatest(len(w) - 1, 1))]) AS gram
      FROM toks WHERE doc_id % 97 = 0
    ),
    cg AS (
      SELECT doc_id, source, unnest([array_to_string(w[i:i+2], ' ')
                                     FOR i IN range(1, greatest(len(w) - 1, 1))]) AS gram
      FROM toks WHERE doc_id % 97 <> 0
    ),
    cont AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram))
    SELECT t.source,
           COUNT(*) AS n_docs,
           COUNT(c.doc_id) AS n_contaminated,
           COUNT(*) - COUNT(c.doc_id) AS n_clean
    FROM toks t LEFT JOIN cont c ON t.doc_id = c.doc_id
    WHERE t.doc_id % 97 <> 0
    GROUP BY t.source ORDER BY t.source
    """,
)
def docs_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import shingles_of_words

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    )

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(shingles_of_words(F.col("w"), n=3)).alias("gram"),
        )

    bench_grams = (
        grams(toks.filter(F.col("doc_id") % 97 == 0)).select("gram").distinct()
    )
    corpus = toks.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        grams(corpus)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        corpus.join(
            contaminated.withColumn("hit", F.lit(1)), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("hit").alias("n_contaminated"),
            (F.count(F.lit(1)) - F.count("hit")).alias("n_clean"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
# "Weighted random sampling with a reservoir"): assign each row the
# key u^(1/w) — equivalently ln(u)/w, monotone-identical — and keep
# the k largest keys; the result is a true weighted
# without-replacement sample in ONE distributed pass. u is the
# md5-derived 32-bit uniform shifted to (0,1) by +0.5/2^32 — both the
# shift and the power-of-two division are float-EXACT, so u is
# bit-identical across engines and runs (reproducible sampling, the
# property a training pipeline actually needs; only ln() is libm, and
# adjacent key gaps are ~1e-4 vs 1-ulp error ~1e-16, so the k-th
# boundary cannot flip).
#
# Scale shape (100 TB): orderBy+limit compiles to
# TakeOrderedAndProject — per-partition top-k heaps and a P×k driver
# merge; NO global sort, NO shuffle of the fact. This replaces the
# rejection/replacement samplers that need a total-weight pre-pass.
# ---------------------------------------------------------------------------
_ES_K = 100


@_register(
    "orders_weighted_sample_noreplace",
    f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                      AS BIGINT) + 0.5) / 4294967296.0)
               / CAST(o_totalprice AS DOUBLE) AS es_key
      FROM orders
    ),
    top AS (
      SELECT * FROM keyed ORDER BY es_key DESC, o_orderkey LIMIT {_ES_K}
    )
    SELECT o_orderkey, o_totalprice FROM top ORDER BY o_orderkey
    """,
)
def orders_weighted_sample_noreplace(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h32 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(float(2**32))
    es_key = F.log(u) / F.col("o_totalprice").cast("double")
    return (
        orders.select("o_orderkey", "o_totalprice", es_key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("o_orderkey"))
        .limit(_ES_K)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# STRATIFIED weighted sampling without replacement — the groupwise form
# of the E-S sampler above and the actual data-mixing primitive of a
# corpus build ("k docs per language, longer docs more likely"): per
# language, keep the _ES_STRAT_K largest ln(u)/n_chars keys.
#
# Scale shape (100 TB): the naive per-group window shuffles the WHOLE
# corpus by lang (en alone is 40% — a guaranteed straggler). Instead
# the key is computed in codegen, then per-PARTITION per-group top-k
# partials (Arrow mapInPandas, k·L state — top-k is a semilattice like
# the KMV minima) shrink the shuffle to ≤ partitions·langs·k rows; the
# final window runs on that dim-sized frame. No full-data exchange.
# ---------------------------------------------------------------------------
_ES_STRAT_K = 20


def _es_partition_topk(iterator):
    """Per-partition per-lang top-k rows by (es_key DESC, doc_id ASC);
    float arithmetic happens in Spark codegen BEFORE this — here we
    only compare already-computed doubles, identically to the final
    window."""
    import numpy as np
    import pandas as pd

    state: dict = {}
    for pdf in iterator:
        # dropna=False: the DuckDB twin's PARTITION BY lang keeps a
        # NULL-lang stratum; pandas' default would silently drop it
        for lang, grp in pdf.groupby("lang", dropna=False):
            prev = state.get(lang)
            cur = grp[["doc_id", "es_key"]]
            merged = (
                pd.concat([prev, cur]) if prev is not None else cur
            )
            order = np.lexsort(
                (merged["doc_id"].values, -merged["es_key"].values)
            )[:_ES_STRAT_K]
            state[lang] = merged.iloc[order]
    for lang, grp in state.items():
        out = grp.copy()
        out.insert(0, "lang", lang)
        yield out


@_register(
    "docs_stratified_weighted_sample",
    f"""
    WITH keyed AS (
      SELECT lang, doc_id,
             ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) + 0.5) / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY es_key DESC, doc_id) AS rn
      FROM keyed
    )
    SELECT lang, doc_id FROM ranked WHERE rn <= {_ES_STRAT_K}
    ORDER BY lang, doc_id
    """,
)
def docs_stratified_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(float(2**32))
    keyed = docs.select(
        "lang",
        "doc_id",
        (F.log(u) / F.col("n_chars").cast("double")).alias("es_key"),
    )
    partials = keyed.mapInPandas(
        _es_partition_topk, "lang string, doc_id long, es_key double"
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.desc("es_key"), F.asc("doc_id")
        )
    )
    return (
        partials.withColumn("rn", rn)
        .filter(F.col("rn") <= _ES_STRAT_K)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (Achlioptas 2003 ±1 variant)
# — dimensionality reduction for embedding pipelines: project d=64 →
# k=16 with a FIXED ±1 sign matrix derived from md5 at module load
# (data-independent, reproducible forever), scaled by 1/√k = 1/4
# (a power of two — the scale divide is float-EXACT).
#
# Cross-engine determinism: the signs are Python-computed constants
# inlined as literals into BOTH plans, and each component is a
# SEQUENTIAL left fold in index order (Spark `aggregate` over
# zip_with; DuckDB `list_reduce`) — (0.0+x₁)+x₂+… equals x₁+x₂+…
# bit-for-bit, so both engines produce identical doubles and the
# micro-quantization can be hash-gated. JL distance preservation is
# property-tested (tests/test_analytics_props.py), not gated.
#
# Scale shape (100 TB): the fold runs inside the scan stage per row
# (zero shuffles before the output sort). The HOF fold is the
# oracle-pairing choice; a throughput deployment would swap in the
# Arrow-batched numpy matmul (operators/similarity.py pattern) whose
# pairwise-summation floats no SQL engine can reproduce exactly.
# ---------------------------------------------------------------------------
_JL_D, _JL_K = 64, 16


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1
            for i in range(_JL_D)
        ]
        for j in range(_JL_K)
    ]


_JL_S = _jl_signs()


def _jl_oracle() -> str:
    comps = ", ".join(
        "list_reduce([CAST(embedding[i] AS DOUBLE) * CAST(("
        + "[" + ",".join(str(x) for x in _JL_S[j]) + "]"
        + f")[i] AS DOUBLE) FOR i IN range(1, {_JL_D + 1})], "
        "(a, b) -> a + b) / 4.0"
        for j in range(_JL_K)
    )
    return f"""
    WITH proj AS (
      SELECT vec_id, [{comps}] AS p
      FROM embeddings WHERE vec_id % 7 = 0
    )
    SELECT vec_id, i - 1 AS dim_id,
           CAST(FLOOR(p[i] * 1000000 + 0.5) AS BIGINT) AS proj_micro
    FROM proj, range(1, {_JL_K + 1}) AS r(i)
    ORDER BY vec_id, dim_id
    """


@_register("embedding_jl_projection", _jl_oracle())
def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 7 == 0
    )
    v = to_double(F.col("embedding"))
    comps = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in _JL_S[j]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(4.0)
            for j in range(_JL_K)
        ]
    )
    return (
        emb.select("vec_id", F.posexplode(comps).alias("dim_id", "p"))
        .select(
            "vec_id",
            "dim_id",
            F.floor(F.col("p") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("proj_micro"),
        )
        .orderBy("vec_id", "dim_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter novelty check (Bloom 1970) — the "is this incoming doc
# probably already in the corpus?" membership gate of an incremental
# ingest, built from pure relational algebra so BOTH engines compute
# the identical filter: 4 md5-derived bit positions in an m=65536-bit
# space; the filter is the DISTINCT set-bit table (≤ m rows — always
# broadcastable, the relational form of "the bloom fits in L2"); a
# batch doc is flagged iff ALL its positions are set (anti-join on
# missing bits). The gated row certifies the no-false-negative
# property itself (every exact duplicate is flagged) plus the exact
# false-positive count; complements the runtime bloom-join test
# (test_plan_audit.py::test_runtime_bloom_filter_injection), which
# exercises Catalyst's own injected bloom at the scan.
#
# Scale shape (100 TB): building the set-bit table is one map-side-
# combined distinct over ≤ m values; probing is explode(4) + a
# broadcast anti-join — the batch never shuffles. OR-of-bits is
# order-independent, so the filter is deterministic under any
# partitioning.
# ---------------------------------------------------------------------------
_BLOOM_M = 65536
_BLOOM_HASHES = 4


def _bloom_pos_sql(h: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{h}:' || md5(text)), 1, 8)) AS BIGINT)"
        f" % {_BLOOM_M}"
    )


def _bloom_pos_col(h: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{h}:"), F.md5(F.col("text")))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _BLOOM_M
    )


@_register(
    "docs_bloom_novelty_check",
    f"""
    WITH hist AS (SELECT text FROM documents
                  WHERE doc_id % 3 <> 0 AND text IS NOT NULL),
    batch AS (SELECT doc_id, text FROM documents
              WHERE doc_id % 3 = 0 AND text IS NOT NULL),
    bits AS (
      SELECT DISTINCT unnest([{", ".join(_bloom_pos_sql(h) for h in range(1, _BLOOM_HASHES + 1))}]) AS pos
      FROM hist
    ),
    probe AS (
      SELECT doc_id, unnest([{", ".join(_bloom_pos_sql(h) for h in range(1, _BLOOM_HASHES + 1))}]) AS pos
      FROM batch
    ),
    missing AS (
      SELECT DISTINCT doc_id FROM probe
      WHERE pos NOT IN (SELECT pos FROM bits)
    ),
    flagged AS (
      SELECT doc_id FROM batch WHERE doc_id NOT IN (SELECT doc_id FROM missing)
    ),
    exact_dup AS (
      SELECT doc_id FROM batch WHERE text IN (SELECT DISTINCT text FROM hist)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM batch) AS n_batch,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM exact_dup) AS n_exact_dup,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM flagged) AS n_flagged,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM flagged)
             - (SELECT CAST(COUNT(*) AS BIGINT) FROM exact_dup)
             AS n_false_positives,
           (SELECT COUNT(*) FROM exact_dup e
            WHERE e.doc_id NOT IN (SELECT doc_id FROM flagged)) = 0
             AS no_false_negatives,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_set_bits
    """,
)
def docs_bloom_novelty_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text is excluded on BOTH engines up front: its hash
    # positions are NULL, and DuckDB's `pos NOT IN (...)` three-valued
    # logic would flag such a doc while Spark's null-safe anti-join
    # leaves it unflagged — an unprobeable doc has no place in a
    # membership check either way
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    pos_arr = F.array(
        *[_bloom_pos_col(h) for h in range(1, _BLOOM_HASHES + 1)]
    )
    bits = hist.select(F.explode(pos_arr).alias("pos")).distinct()
    probe = batch.select("doc_id", F.explode(pos_arr).alias("pos"))
    missing = (
        probe.join(F.broadcast(bits), "pos", "left_anti")
        .select("doc_id")
        .distinct()
    )
    flagged = batch.select("doc_id").join(missing, "doc_id", "left_anti")
    exact_dup = batch.join(
        hist.select("text").distinct(), "text", "left_semi"
    ).select("doc_id")
    exact_dup = exact_dup.localCheckpoint(eager=False)  # 2 consumers
    flagged = flagged.localCheckpoint(eager=False)  # 2 consumers
    n_batch = batch.agg(F.count(F.lit(1)).cast("long").alias("n_batch"))
    n_exact = exact_dup.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_dup")
    )
    n_flagged = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_flagged")
    )
    n_fn = (
        exact_dup.join(flagged, "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_set_bits"))
    return (
        n_batch.crossJoin(n_exact)
        .crossJoin(n_flagged)
        .crossJoin(n_fn)
        .crossJoin(n_bits)
        .select(
            "n_batch",
            "n_exact_dup",
            "n_flagged",
            (F.col("n_flagged") - F.col("n_exact_dup")).alias(
                "n_false_positives"
            ),
            (F.col("n_missed") == 0).alias("no_false_negatives"),
            "n_set_bits",
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala 2007)
# — the privacy-governance gate a dataset passes before leaving the
# warehouse: every quasi-identifier combination must be shared by ≥ k
# rows (re-identification resistance), and each such group must carry
# ≥ l distinct sensitive values (attribute-disclosure resistance).
# Quasi-identifiers here: (nation, market segment); sensitive
# attribute: the account-balance sign class.
#
# Scale shape (100 TB): ONE map-side-combined groupBy over the
# quasi-identifier pair (count + count distinct sensitive), then a
# group-grained rollup — the audit costs exactly one shuffle of
# |QI-combinations| rows regardless of table size.
# ---------------------------------------------------------------------------
_KANON_K = 5
_KANON_L = 2


@_register(
    "customers_k_anonymity_audit",
    f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS n,
             COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                 WHEN c_acctbal < 5000 THEN 'mid'
                                 ELSE 'high' END) AS l_div
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST({_KANON_K} AS BIGINT) AS k_threshold,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below_k,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_below_k,
           CAST(SUM(CASE WHEN l_div < {_KANON_L} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below_l,
           SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) = 0
             AND SUM(CASE WHEN l_div < {_KANON_L} THEN 1 ELSE 0 END) = 0
             AS anonymity_ok
    FROM g
    """,
)
def customers_k_anonymity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    sensitive = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive).alias("l_div"),
    )
    below_k = F.sum(F.when(F.col("n") < _KANON_K, 1).otherwise(0))
    below_l = F.sum(F.when(F.col("l_div") < _KANON_L, 1).otherwise(0))
    return g.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.lit(_KANON_K).cast("long").alias("k_threshold"),
        F.min("n").cast("long").alias("min_group_size"),
        below_k.cast("long").alias("n_groups_below_k"),
        F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_k"),
        below_l.cast("long").alias("n_groups_below_l"),
        ((below_k == 0) & (below_l == 0)).alias("anonymity_ok"),
    )


# ---------------------------------------------------------------------------
# Q30 FIXED-POINT NATURAL LOG — the engine-parity primitive for every
# log-scored operator (DSIR importance weights, JM-LM perplexities):
# both engines evaluate the IDENTICAL chain of BIGINT operations, so
# a per-doc score can never wobble by 1 ulp across partitions or
# engines and flip a FLOOR(x·1000+0.5) boundary. Defined here, above
# its first import-time use (the JM-LM oracle f-strings below).
# ---------------------------------------------------------------------------
_LNFP_ONE = 1 << 30  # Q30 fixed point
_LNFP_LN2 = 744261118  # round(ln(2) * 2^30) — engine-independent literal


def _lnfp_steps(p, x_sql, div, shl):
    """(name, sql) steps computing ln_fp(x) = round-down fixed-point
    natural log of a positive BIGINT, using ONLY integer ops both
    engines implement identically: x = m·2^e (e via length(bin(x)));
    ln m = 2·atanh((m−1)/(m+1)) truncated at u^11 (u ≤ 1/3 ⇒ series
    tail < 4e-8). ``div``/``shl`` inject each engine's integer-div and
    shift-left syntax; every operand is non-negative so truncating and
    floor division agree."""
    ONE = str(_LNFP_ONE)
    return [
        (f"{p}x", x_sql),
        (f"{p}e", f"CAST(length(bin({p}x)) - 1 AS BIGINT)"),
        (
            f"{p}z",
            f"CASE WHEN {p}e > 30 THEN {div(f'{p}x', shl(f'({p}e - 30)'))}"
            f" WHEN {p}e < 30 THEN {p}x * {shl(f'(30 - {p}e)')}"
            f" ELSE {p}x END",
        ),
        (f"{p}u", div(f"(({p}z - {ONE}) * {ONE})", f"({p}z + {ONE})")),
        (f"{p}u2", div(f"({p}u * {p}u)", ONE)),
        (f"{p}u3", div(f"({p}u2 * {p}u)", ONE)),
        (f"{p}u5", div(f"({p}u3 * {p}u2)", ONE)),
        (f"{p}u7", div(f"({p}u5 * {p}u2)", ONE)),
        (f"{p}u9", div(f"({p}u7 * {p}u2)", ONE)),
        (f"{p}u11", div(f"({p}u9 * {p}u2)", ONE)),
        (
            f"{p}ln",
            f"CAST({p}e * {_LNFP_LN2} + 2 * ({p}u"
            f" + {div(f'{p}u3', '3')} + {div(f'{p}u5', '5')}"
            f" + {div(f'{p}u7', '7')} + {div(f'{p}u9', '9')}"
            f" + {div(f'{p}u11', '11')}) AS BIGINT)",
        ),
    ]


def _lnfp_spark_div(a, b):
    return f"({a} div {b})"


def _lnfp_spark_shl(k):
    return f"shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT))"


def _lnfp_duck_div(a, b):
    return f"({a} // {b})"


def _lnfp_duck_shl(k):
    return f"(CAST(1 AS BIGINT) << {k})"


def _lnfp_duck_select(chains):
    """SELECT-list fragment evaluating several ln_fp chains via
    DuckDB's lateral column aliases; chains = [(prefix, x_sql), ...]."""
    cols = []
    for p, x_sql in chains:
        for name, sql in _lnfp_steps(p, x_sql, _lnfp_duck_div, _lnfp_duck_shl):
            cols.append(f"{sql} AS {name}")
    return ",\n             ".join(cols)


# ---------------------------------------------------------------------------
# Shared JM-LM Q30 scoring (round-10; closes the round-9 verdict's
# "order-dependent float reduction" item): the Jelinek-Mercer mixture
#   p(w2|w1) = 3/4·c12/ch + 1/4·c/n_uni
# is quantized ONCE PER DISTINCT BIGRAM TYPE to a Q30 fraction
#   pfp = (3·((c12<<30) div ch) + ((c<<30) div n_uni)) div 4   (≥ 1),
# and the per-transition information content becomes the INTEGER
#   term_q = 30·LN2_FP − ln_fp(pfp)      [Q30 nats, ≥ 0]
# (ln(pfp/2^30) = ln_fp(pfp) − 30·LN2_FP). Per-doc scores are exact
# BIGINT sums of term_q over transitions — partition-order-independent
# by construction — and millibit quantization is pure integer:
#   q = (2000·S + n·LN2_FP) div (2·n·LN2_FP)   [= round(S·1000/(n·ln2·2^30))]
# The (c12<<30) products use DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
# so the fractions stay exact for web-corpus counts past 2^33, where a
# raw BIGINT product would overflow; both engines' integral division
# agrees on non-negative operands (pinned by test_analytics_props).
# Computing terms on the DISTINCT pair table also keeps the ln chain
# off the fact-grained transition stream (the DSIR bucket-term shape).
# ---------------------------------------------------------------------------
def _jm_q30_spark_terms(joined):
    """Append term_q to a frame carrying c12, ch, c, n_uni (one row per
    distinct bigram type)."""
    df = (
        joined.withColumn(
            "f1",
            F.expr(
                "CAST((CAST(c12 AS DECIMAL(38,0)) * 1073741824)"
                " div ch AS BIGINT)"
            ),
        )
        .withColumn(
            "f2",
            F.expr(
                "CAST((CAST(c AS DECIMAL(38,0)) * 1073741824)"
                " div n_uni AS BIGINT)"
            ),
        )
        .withColumn(
            "pfp",
            F.expr("greatest((3 * f1 + f2) div 4, CAST(1 AS BIGINT))"),
        )
    )
    for name, sql in _lnfp_steps(
        "jm_", "pfp", _lnfp_spark_div, _lnfp_spark_shl
    ):
        df = df.withColumn(name, F.expr(sql))
    return df.withColumn(
        "term_q",
        F.expr(f"CAST({30 * _LNFP_LN2} - jm_ln AS BIGINT)"),
    )


def _jm_q30_spark_q():
    """Aggregate expression: per-doc millibits from summed term_q."""
    return F.expr(
        f"CAST((2000 * CAST(sum(term_q) AS DECIMAL(38,0))"
        f" + count(1) * {_LNFP_LN2})"
        f" div (2 * count(1) * {_LNFP_LN2}) AS BIGINT)"
    )


# Oracle-side fragments: `terms` expects CTEs pair(w1,w2,c12),
# head(w1,ch), uni(word,c), tot(n_uni) to be in scope.
_JM_Q30_DUCK_TERMS = f"""
      SELECT w1, w2, CAST({30 * _LNFP_LN2} - jm_ln AS BIGINT) AS term_q
      FROM (
        SELECT w1, w2,
             CAST((CAST(c12 AS HUGEINT) * 1073741824) // ch AS BIGINT) AS f1,
             CAST((CAST(u2.c AS HUGEINT) * 1073741824) // n_uni AS BIGINT) AS f2,
             greatest((3 * f1 + f2) // 4, CAST(1 AS BIGINT)) AS pfp,
             {_lnfp_duck_select([("jm_", "pfp")])}
        FROM pair JOIN head USING (w1) JOIN uni u2 ON pair.w2 = u2.word
        CROSS JOIN tot)
"""
_JM_Q30_DUCK_Q = (
    f"CAST((2000 * CAST(SUM(term_q) AS HUGEINT)"
    f" + COUNT(*) * {_LNFP_LN2})"
    f" // (2 * COUNT(*) * {_LNFP_LN2}) AS BIGINT)"
)


# ---------------------------------------------------------------------------
# Interpolated bigram-LM perplexity scoring — the second-order upgrade
# of docs_unigram_surprisal (Jelinek-Mercer interpolation, the classic
# smoothing for n-gram quality filters): fit corpus bigram + unigram
# tables, score every document's transitions by
#   p(w2|w1) = LAMBDA * c(w1 w2)/c(w1 ·) + (1-LAMBDA) * c(w2)/N,
# per-doc cross-entropy in millibits, aggregated per source. The
# conditional denominator is the BIGRAM-HEAD count (sum of c12 over
# w2), so the conditional component is a proper distribution.
#
# 100 TB shape: two map-side-combined groupBys fit the LM (word and
# word-pair); scoring joins the per-doc transitions to those tables by
# KEY EQUI-JOIN (the bigram table of a web corpus does NOT broadcast);
# only the scalar total crosses as a broadcast. Docs with <2 tokens
# have no transitions and are excluded (n_docs_scored says so).
# Scoring is the shared Q30 integer path above (LAMBDA = 3/4 is the
# dyadic literal inside _jm_q30_spark_terms) — per-doc scores are
# exact BIGINT sums, so quantization boundaries cannot flip with
# partitioning, scale, or engine.
# ---------------------------------------------------------------------------


@_register(
    "docs_bigram_lm_perplexity",
    f"""
    WITH docs2 AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ), bg AS (
      SELECT doc_id, source, u.p[1] AS w1, u.p[2] AS w2
      FROM (SELECT doc_id, source,
                   unnest(list_zip(ws[1:len(ws) - 1], ws[2:len(ws)])) AS p
            FROM docs2) u
      WHERE u.p[1] IS NOT NULL AND u.p[2] IS NOT NULL
    ), uni AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(ws) AS word FROM docs2) GROUP BY word
    ), tot AS (
      SELECT SUM(c) AS n_uni FROM uni
    ), pair AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg GROUP BY w1, w2
    ), head AS (
      SELECT w1, SUM(c12) AS ch FROM pair GROUP BY w1
    ), terms AS ({_JM_Q30_DUCK_TERMS}
    ), perdoc AS (
      SELECT doc_id, source, {_JM_Q30_DUCK_Q} AS q
      FROM bg JOIN terms USING (w1, w2)
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
           CAST(SUM(q) AS BIGINT) AS sum_millibits,
           CAST(MIN(q) AS BIGINT) AS min_millibits,
           CAST(MAX(q) AS BIGINT) AS max_millibits
    FROM perdoc GROUP BY source ORDER BY source
    """,
)
def docs_bigram_lm_perplexity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias(
            "ws"
        ),
    )
    docs = docs.localCheckpoint(eager=False)  # unigram + bigram consumers
    uni = (
        docs.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, greatest(size(ws) - 1, 0))"),
                    F.expr("slice(ws, 2, greatest(size(ws) - 1, 0))"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "source",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
        )
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    bg = bg.localCheckpoint(eager=False)  # LM fit + scoring consumers
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pair = pair.localCheckpoint(eager=False)  # head counts + scoring
    head = pair.groupBy("w1").agg(F.sum("c12").alias("ch"))
    tot = uni.agg(F.sum("c").alias("n_uni"))
    # Q30 integer terms per DISTINCT bigram type (vocab-bounded): the
    # ln chain never touches the transition-grained stream, and the
    # per-doc reduction is an exact BIGINT sum — no float anywhere
    terms = _jm_q30_spark_terms(
        pair.join(head, "w1")
        .join(uni.withColumnRenamed("word", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
    ).select("w1", "w2", "term_q")
    perdoc = (
        bg.join(terms, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(_jm_q30_spark_q().alias("q"))
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_scored"),
            F.sum("q").cast("long").alias("sum_millibits"),
            F.min("q").cast("long").alias("min_millibits"),
            F.max("q").cast("long").alias("max_millibits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM — the smoothing that actually
# wins LM evaluations (and the scorer KenLM-style quality filters
# use), next to the Jelinek-Mercer baseline above. The KN idea: the
# backoff weight of a word is NOT its frequency but its CONTINUATION
# diversity — how many distinct contexts it follows —
#
#   p_KN(w2|w1) = max(c12 − D, 0)/c(w1·)
#               + (D · N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··)
#
# with discount D = 3/4 (dyadic-exact literal), N1+(w1·) = distinct
# successors of w1, N1+(·w2) = distinct predecessors of w2, N1+(··) =
# total bigram types. All four statistics fall out of the SAME pair
# table the JM query builds — no extra corpus pass. Scoring covers
# observed transitions (as in JM); per-doc millibit quantization
# before cross-doc aggregation, identical expression trees both
# engines (the repo's cross-engine float rule; log2 precedent: the
# JM query above, green since r5).
#
# 100 TB shape: two map-side-combined groupBys fit every statistic;
# scoring is key equi-joins against the pair/head/continuation
# tables (a web-corpus bigram table does NOT broadcast); only the
# scalar type count crosses as a broadcast.
# ---------------------------------------------------------------------------
_KN_D = 0.75


@_register(
    "docs_kneser_ney_bigram",
    f"""
    WITH docs2 AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ), bg AS (
      SELECT doc_id, source, u.p[1] AS w1, u.p[2] AS w2
      FROM (SELECT doc_id, source,
                   unnest(list_zip(ws[1:len(ws) - 1], ws[2:len(ws)])) AS p
            FROM docs2) u
      WHERE u.p[1] IS NOT NULL AND u.p[2] IS NOT NULL
    ), pair AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg GROUP BY w1, w2
    ), head AS (
      SELECT w1, SUM(c12) AS ch, CAST(COUNT(*) AS BIGINT) AS n1f
      FROM pair GROUP BY w1
    ), cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM pair GROUP BY w2
    ), types AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pair
    ), perdoc AS (
      SELECT doc_id, source,
             CAST(FLOOR((-SUM(log2(
                 (GREATEST(CAST(c12 AS DOUBLE) - {_KN_D}, 0)
                  / CAST(ch AS DOUBLE))
                 + ({_KN_D} * CAST(n1f AS DOUBLE) / CAST(ch AS DOUBLE))
                   * (CAST(n1b AS DOUBLE) / CAST(t AS DOUBLE))))
               / COUNT(*)) * 1000 + 0.5) AS BIGINT) AS q
      FROM bg
      JOIN pair USING (w1, w2)
      JOIN head USING (w1)
      JOIN cont ON bg.w2 = cont.w2
      CROSS JOIN types
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
           CAST(SUM(q) AS BIGINT) AS sum_millibits,
           CAST(MIN(q) AS BIGINT) AS min_millibits,
           CAST(MAX(q) AS BIGINT) AS max_millibits
    FROM perdoc GROUP BY source ORDER BY source
    """,
)
def docs_kneser_ney_bigram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias(
            "ws"
        ),
    )
    bg = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, greatest(size(ws) - 1, 0))"),
                    F.expr("slice(ws, 2, greatest(size(ws) - 1, 0))"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "source",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
        )
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    bg = bg.localCheckpoint(eager=False)  # LM fit + scoring consumers
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pair = pair.localCheckpoint(eager=False)  # head/cont/types + scoring
    head = pair.groupBy("w1").agg(
        F.sum("c12").alias("ch"), F.count(F.lit(1)).alias("n1f")
    )
    cont = pair.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    types = pair.agg(F.count(F.lit(1)).alias("t"))
    p = (
        F.greatest(F.col("c12").cast("double") - _KN_D, F.lit(0.0))
        / F.col("ch").cast("double")
    ) + (
        F.lit(_KN_D) * F.col("n1f").cast("double")
        / F.col("ch").cast("double")
    ) * (
        F.col("n1b").cast("double") / F.col("t").cast("double")
    )
    perdoc = (
        bg.join(pair, ["w1", "w2"])
        .join(head, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id", "source")
        .agg(
            F.floor((-F.sum(F.log2(p)) / F.count(F.lit(1))) * 1000 + 0.5)
            .cast("long")
            .alias("q")
        )
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_scored"),
            F.sum("q").cast("long").alias("sum_millibits"),
            F.min("q").cast("long").alias("min_millibits"),
            F.max("q").cast("long").alias("max_millibits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (Agrawal-Srikant support/confidence/
# lift, 2-itemsets) — co-purchase mining over order baskets. The pair
# join is a self-equi-join on the basket id AFTER distinct(basket,
# item): per-basket item counts are bounded (~7 lines/order on TPC-H
# data), so candidate pairs grow LINEARLY in baskets, never
# quadratically in items. Counts are exact integers; confidence is an
# exact half-up ppm division; lift (which multiplies three counts and
# would overflow int64 at ~1e9 baskets) uses the fixed double shape +
# floor quantization. Deterministic top-20 by (lift, antecedent,
# consequent).
# ---------------------------------------------------------------------------
_BASKET_MIN_PAIR_SUPPORT = 3


@_register(
    "orders_market_basket_rules",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n_orders FROM items
    ), isup AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY item
    ), pairs AS (
      SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS c12
      FROM items a JOIN items b ON a.oid = b.oid AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {_BASKET_MIN_PAIR_SUPPORT}
    ), rules AS (
      SELECT ia AS antecedent, ib AS consequent, c12,
             sa.c AS ca, sb.c AS cb
      FROM pairs JOIN isup sa ON pairs.ia = sa.item
                 JOIN isup sb ON pairs.ib = sb.item
      UNION ALL
      SELECT ib, ia, c12, sb.c, sa.c
      FROM pairs JOIN isup sa ON pairs.ia = sa.item
                 JOIN isup sb ON pairs.ib = sb.item
    )
    SELECT antecedent, consequent, c12 AS pair_support,
           CAST((c12 * 1000000 + ca // 2) // ca AS BIGINT)
             AS confidence_ppm,
           CAST(FLOOR(CAST(c12 AS DOUBLE) * n_orders
                      / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS lift_ppm
    FROM rules CROSS JOIN n
    ORDER BY lift_ppm DESC, antecedent, consequent LIMIT 20
    """,
)
def orders_market_basket_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # ONE basket-building exchange: collect_set per order dedups the
    # (order, item) stream in the same aggregation (the old shape paid
    # a distinct exchange, TWO more exchanges re-keying the distinct
    # frame by oid for its self-join, and a distinct-oid exchange for
    # n_orders), and the in-row pair transform emits exactly the
    # k(k-1)/2 ordered pairs per basket instead of the join's k^2
    # rows. sort_array makes the set order deterministic, so ia < ib
    # holds by construction — identical pair multiset to the
    # self-join + filter.
    sets = (
        li.groupBy(F.col("l_orderkey").alias("oid"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
        .localCheckpoint(eager=False)  # n_orders + isup + pairs
    )
    n = sets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    isup = (
        sets.select(F.explode("arr").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    isup = isup.localCheckpoint(eager=False)  # both rule directions
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr)),"
                    " y -> struct(x AS ia, y AS ib))))"
                )
            ).alias("p")
        )
        .select("p.ia", "p.ib")
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= _BASKET_MIN_PAIR_SUPPORT)
    )
    joined = (
        pairs.join(
            isup.select(F.col("item").alias("ia"), F.col("c").alias("ca")),
            "ia",
        )
        .join(
            isup.select(F.col("item").alias("ib"), F.col("c").alias("cb")),
            "ib",
        )
    )
    fwd = joined.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "c12",
        "ca",
        "cb",
    )
    rev = joined.select(
        F.col("ib").alias("antecedent"),
        F.col("ia").alias("consequent"),
        "c12",
        F.col("cb").alias("ca"),
        F.col("ca").alias("cb"),
    )
    lift = (
        F.col("c12").cast("double")
        * F.col("n_orders")
        / (F.col("ca").cast("double") * F.col("cb").cast("double"))
    )
    return (
        fwd.unionAll(rev)
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("c12").alias("pair_support"),
            F.expr(
                "(c12 * CAST(1000000 AS BIGINT) + ca div 2) div ca"
            ).alias("confidence_ppm"),
            F.floor(lift * 1000000 + 0.5).cast("long").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "antecedent", "consequent")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over user event streams — the
# path-analysis primitive (what follows what, with what probability):
# per-user event sequences ordered by (ts, event_id), LEAD gives the
# successor (terminal events transition to 'END'), one groupBy yields
# the exact transition counts, and row-normalized probabilities are
# half-up ppm divisions of exact integers. The window partitions by
# user (fact-grained keyed window, the events_user_* shape) — never a
# global sort.
# ---------------------------------------------------------------------------
@_register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             COALESCE(LEAD(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id), 'END') AS nxt
      FROM events
    ), t AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq GROUP BY cur, nxt
    ), m AS (
      SELECT cur, SUM(c) AS tot FROM t GROUP BY cur
    )
    SELECT t.cur, t.nxt, t.c AS n_transitions,
           CAST((t.c * 1000000 + m.tot // 2) // m.tot AS BIGINT) AS p_ppm
    FROM t JOIN m USING (cur)
    ORDER BY t.cur, t.nxt
    """,
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.coalesce(F.lead("event_type").over(w), F.lit("END")).alias(
            "nxt"
        ),
    )
    t = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    t = t.localCheckpoint(eager=False)  # marginals + final
    m = t.groupBy("cur").agg(F.sum("c").alias("tot"))
    return (
        t.join(F.broadcast(m), "cur")
        .select(
            "cur",
            "nxt",
            F.col("c").alias("n_transitions"),
            F.expr(
                "(c * CAST(1000000 AS BIGINT) + tot div 2) div tot"
            ).alias("p_ppm"),
        )
        .orderBy("cur", "nxt")
    )


# ---------------------------------------------------------------------------
# ORC source round-trip — the columnar sibling of the JSONL round-trip
# above: write orders through Spark's native ORC sink, read it back
# with an EXPLICIT schema, and prove field pairing survived with the
# Σ key·cents cross-field checksum. ORC is the other columnar format a
# lakehouse ingests from (Hive-era estates); the oracle recomputes
# everything from the original parquet, so the hash match certifies
# the ORC writer+reader preserved every row and pairing bit-exactly.
# 100 TB: format round-trips are scan+write bound; nothing shuffles.
# ---------------------------------------------------------------------------
@_register(
    "orders_orc_roundtrip_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
           CAST(SUM(((o_orderkey % 1000000007)
                     * (CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        % 1000000007)) % 1000000007)
                AS BIGINT) AS pair_checksum,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    """,
)
def orders_orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write→read round-trip with a cross-field pairing checksum.

    Scratch-path contract: the round-trip directory resolves from the
    ``spark.epl.scratch.dir`` conf when set (on a real cluster point it
    at a shared filesystem URI — s3a://…/tmp, hdfs:///tmp — so every
    executor reads what every executor wrote); unset, it falls back to
    a driver-local ``tempfile.mkdtemp``, which is only correct on
    single-node ``local[*]`` deployments like this harness, where the
    driver and all executor threads share one filesystem.
    """
    import os as _os
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = spark.conf.get("spark.epl.scratch.dir", None)
    if scratch:
        tmp = scratch.rstrip("/") + "/orc_rt"
    else:
        tmp = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        out = _os.path.join(tmp, "orders_orc")
        orders.write.mode("overwrite").orc(out)
        back = spark.read.schema(
            "o_orderkey long, o_orderstatus string, o_totalprice double"
        ).orc(out)
        stats = back.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_orderkey"),
            # modular pairing checksum: the raw Σ key·cents overflows
            # int64 past ~sf0.5 (ANSI ArithmeticException; DuckDB's
            # HUGEINT sum masks it) — reduce each factor and the
            # product mod 1e9+7 so every intermediate stays < p²
            F.sum(
                (
                    (F.col("o_orderkey") % 1000000007)
                    * (
                        F.floor(F.col("o_totalprice") * 100 + 0.5).cast(
                            "long"
                        )
                        % 1000000007
                    )
                )
                % 1000000007
            )
            .cast("long")
            .alias("pair_checksum"),
            F.count_distinct("o_orderstatus")
            .cast("long")
            .alias("n_statuses"),
        )
        rows = stats.collect()
        schema = stats.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Schema-evolution read (mergeSchema) — the daily lake problem: a
# landing zone where early files lack a column later files carry.
# Two parquet parts are written with DIFFERENT but compatible schemas
# (the even-key half without o_orderpriority, the odd-key half with
# it), read back as ONE table via mergeSchema=true, and the merged
# frame's shape is gated: the late column must be NULL exactly on the
# early-file rows, totals must survive the roundtrip. The oracle
# derives the same answer from the orders table directly (the
# roundtrip is the thing under test, not the data).
#
# Scratch-path convention follows orders_orc_roundtrip_stats:
# ``spark.epl.scratch.dir`` (shared-FS URI on a real cluster) with a
# driver-local tempdir fallback that is correct on local[*] only.
# ---------------------------------------------------------------------------
@_register(
    "orders_schema_evolution_stats",
    """
    WITH o AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                  AS BIGINT) AS cents,
             o_orderpriority AS prio
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_prio,
           CAST(COUNT(DISTINCT CASE WHEN k % 2 = 1 THEN prio END)
                AS BIGINT) AS n_prio_values
    FROM o
    """,
)
def orders_schema_evolution_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os as _os
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.floor(F.col("o_totalprice").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
        F.col("o_orderpriority").alias("prio"),
    )
    scratch = spark.conf.get("spark.epl.scratch.dir", None)
    if scratch:
        tmp = scratch.rstrip("/") + "/schema_evo"
    else:
        tmp = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        zone = _os.path.join(tmp, "zone")
        # early files: no prio column yet
        orders.filter(F.col("k") % 2 == 0).select("k", "cents").write.mode(
            "overwrite"
        ).parquet(_os.path.join(zone, "gen=early"))
        # late files: schema grew a column
        orders.filter(F.col("k") % 2 == 1).select(
            "k", "cents", "prio"
        ).write.mode("overwrite").parquet(_os.path.join(zone, "gen=late"))
        merged = spark.read.option("mergeSchema", "true").parquet(
            _os.path.join(zone, "gen=early"), _os.path.join(zone, "gen=late")
        )
        result = merged.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum(F.col("prio").isNull().cast("long"))
            .cast("long")
            .alias("n_missing_prio"),
            F.count_distinct("prio").cast("long").alias("n_prio_values"),
        )
        rows = result.collect()
        schema = result.schema
    finally:
        if not scratch:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Error-tolerant CSV ingestion — the landing-zone reality check: a
# feed where some lines are corrupt (truncated fields, non-numeric
# garbage) must load WITHOUT dropping the batch. The file is written
# with deterministic corruption (every 13th order's amount column is
# replaced by 'CORRUPT<k>', every 29th line loses its last field),
# read back in PERMISSIVE mode with a _corrupt_record column, and the
# gated output certifies the triage: good rows keep exact totals,
# corrupt rows are COUNTED and quarantined, nothing vanishes. The
# oracle derives the same triage arithmetic from the orders table and
# the corruption rule (the roundtrip is the thing under test).
#
# 100 TB: CSV parsing is scan-stage work; PERMISSIVE mode costs one
# extra string column on failed rows only. Scratch path per the
# spark.epl.scratch.dir convention.
# ---------------------------------------------------------------------------
@_register(
    "orders_csv_malformed_stats",
    """
    WITH o AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                  AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN k % 13 = 0 OR k % 29 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN k % 13 <> 0 AND k % 29 <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN k % 13 <> 0 AND k % 29 <> 0
                         THEN cents ELSE 0 END) AS BIGINT)
             AS good_cents
    FROM o
    """,
)
def orders_csv_malformed_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os as _os
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.floor(F.col("o_totalprice").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    # render the feed: k,cents,tag — with deterministic corruption
    lines = orders.select(
        F.when(
            F.col("k") % 13 == 0,
            F.concat_ws(
                ",",
                F.col("k").cast("string"),
                F.concat(F.lit("CORRUPT"), F.col("k") % 7),
                F.lit("t"),
            ),
        )
        .when(
            F.col("k") % 29 == 0,
            # truncated line: last field missing
            F.concat_ws(",", F.col("k").cast("string")),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("k").cast("string"),
                F.col("cents").cast("string"),
                F.lit("t"),
            )
        )
        .alias("value")
    )
    scratch = spark.conf.get("spark.epl.scratch.dir", None)
    if scratch:
        tmp = scratch.rstrip("/") + "/csv_malformed"
    else:
        tmp = tempfile.mkdtemp(prefix="csv_malformed_")
    try:
        feed = _os.path.join(tmp, "feed")
        lines.write.mode("overwrite").text(feed)
        back = (
            spark.read.schema(
                "k long, cents long, tag string, _corrupt_record string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(feed)
        )
        # PERMISSIVE quirk: querying ONLY the corrupt column is
        # disallowed/unreliable — materialize the full frame first
        back = back.cache()
        result = back.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("_corrupt_record").isNotNull().cast("long"))
            .cast("long")
            .alias("n_corrupt"),
            F.sum(F.col("_corrupt_record").isNull().cast("long"))
            .cast("long")
            .alias("n_good"),
            F.sum(
                F.when(
                    F.col("_corrupt_record").isNull(), F.col("cents")
                ).otherwise(0)
            )
            .cast("long")
            .alias("good_cents"),
        )
        rows = result.collect()
        schema = result.schema
        back.unpersist()
    finally:
        if not scratch:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Small-file compaction audit — THE lake-ops maintenance job: a
# landing zone fragmented into tiny files (64 here, round-robin)
# murders scan throughput (one task + one footer per file); OPTIMIZE
# rewrites it into right-sized files. Deterministic by construction:
# round-robin repartition(64) fills every partition when n ≥ 64, and
# the compacted count is the exact ceil(n / ROWS_PER_FILE) — so file
# counts are ARITHMETIC both engines state, not filesystem accidents.
# The gated row certifies the whole maintenance cycle: fragment →
# compact → nothing lost (row count and exact cent totals survive
# both rewrites).
# ---------------------------------------------------------------------------
_COMPACT_ROWS_PER_FILE = 8192


@_register(
    "orders_compaction_stats",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(LEAST(64, COUNT(*)) AS BIGINT) AS n_files_small,
           CAST((COUNT(*) + {_COMPACT_ROWS_PER_FILE - 1})
                // {_COMPACT_ROWS_PER_FILE} AS BIGINT) AS n_files_compacted
    FROM orders
    """,
)
def orders_compaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import math as _math
    import os as _os
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.floor(F.col("o_totalprice").cast("double") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    scratch = spark.conf.get("spark.epl.scratch.dir", None)
    if scratch:
        tmp = scratch.rstrip("/") + "/compaction"
    else:
        tmp = tempfile.mkdtemp(prefix="compaction_")
    try:
        small = _os.path.join(tmp, "small")
        orders.repartition(64).write.mode("overwrite").parquet(small)
        n_small = len(_glob.glob(_os.path.join(small, "*.parquet")))
        frag = spark.read.parquet(small)
        n_rows = frag.count()
        n_target = _math.ceil(n_rows / _COMPACT_ROWS_PER_FILE)
        compacted = _os.path.join(tmp, "compacted")
        if n_target:
            frag.repartition(n_target).write.mode("overwrite").parquet(
                compacted
            )
        n_comp = (
            len(_glob.glob(_os.path.join(compacted, "*.parquet")))
            if n_target
            else 0
        )
        back = spark.read.parquet(compacted) if n_target else frag
        result = back.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.sum("cents"), F.lit(0))
            .cast("long")
            .alias("sum_cents"),
            F.lit(n_small).cast("long").alias("n_files_small"),
            F.lit(n_comp).cast("long").alias("n_files_compacted"),
        )
        rows = result.collect()
        schema = result.schema
    finally:
        if not scratch:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# TIME-BOUNDED strict funnel — the production funnel next to the
# unbounded one above: each step must happen within 1 h of the
# previous step's FIRST completion (signup → click ≤ 1 h → purchase
# ≤ 1 h after that click). The bound changes semantics materially: a
# user who clicks 2 h after signup is a step-1-only user here but
# converts in the unbounded funnel. Same per-user MIN-chain shape
# (groupBy + equi-join per step, no windows); the window predicate is
# exact integer µs.
# ---------------------------------------------------------------------------
_FUNNEL_BOUND_US = 3_600_000_000  # 1 hour


@_register(
    "events_bounded_funnel_conversion",
    f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND epoch_us(e.ts::TIMESTAMP) - epoch_us(s1.t1::TIMESTAMP)
              <= {_FUNNEL_BOUND_US}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND epoch_us(e.ts::TIMESTAMP) - epoch_us(s2.t2::TIMESTAMP)
              <= {_FUNNEL_BOUND_US}
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 'step1_signup' AS step, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM s1
      UNION ALL SELECT 'step2_click_1h', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL SELECT 'step3_purchase_1h', CAST(COUNT(*) AS BIGINT)
      FROM s3
    ) ORDER BY step
    """,
)
def events_bounded_funnel_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev = ev.localCheckpoint(eager=False)  # three step consumers
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )

    def _next_step(prev: DataFrame, prev_t: str, etype: str, out_t: str):
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_t))
                & (
                    F.unix_micros("ts") - F.unix_micros(prev_t)
                    <= _FUNNEL_BOUND_US
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    s2 = _next_step(s1, "t1", "click", "t2")
    s3 = _next_step(s2, "t2", "purchase", "t3")

    def _cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        ).select(F.lit(label).alias("step"), "n_users")

    return (
        _cnt(s1, "step1_signup")
        .unionByName(_cnt(s2, "step2_click_1h"))
        .unionByName(_cnt(s3, "step3_purchase_1h"))
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# Inter-event arrival-rate estimation — the point-process view of the
# event stream: per type, the MLE of an exponential inter-arrival
# rate is n_gaps / Σ gaps, computed here entirely in exact integer µs
# (gaps via a keyed lag window per (type, user) — a user's behavior
# is the process; cross-user gaps are meaningless). Output keeps the
# integer sufficient statistics AND the half-up events-per-hour rate,
# so downstream recomputation needs no floats.
# ---------------------------------------------------------------------------
@_register(
    "events_interarrival_rate",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts::TIMESTAMP)
               - lag(epoch_us(ts::TIMESTAMP)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST((COUNT(gap_us) * 3600000000 + SUM(gap_us) // 2)
                // SUM(gap_us) AS BIGINT) AS rate_per_hour_milli
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_interarrival_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "ts",
        "event_id",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    gaps = ev.select(
        "event_type",
        (F.col("us") - F.lag("us").over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
        )
        .select(
            "event_type",
            "n_gaps",
            "sum_gap_us",
            F.expr(
                "(n_gaps * CAST(3600000000 AS BIGINT)"
                " + sum_gap_us div 2) div sum_gap_us"
            ).alias("rate_per_hour_milli"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# PERSISTED-INDEX ANN SERVING (round-8; closes the round-7 verdict's
# "build-once/serve-many" gap): production ANN does NOT refit the
# index per query batch — one job writes the PQ codebook and the
# encoded corpus to versioned tables (sources/versioned.VersionedTable,
# the same snapshot-commit primitive the CDC/MERGE queries use), and
# every serving job reads ONLY those artifacts. Two gated queries:
#
#   * embedding_pq_index_build — pq_fit + pq_encode, both artifacts
#     committed as versioned snapshots under a root keyed by a
#     fingerprint of the embeddings parquet (a regeneration gets a NEW
#     root instead of silently serving a stale index). The gated row
#     certifies the artifact: row counts of both tables, plus a
#     read-back-vs-fresh-encode mismatch count (the persisted codes
#     must BE the index, not garbage that happens to have the right
#     cardinality).
#   * embedding_pq_index_serve — batch top-k via
#     operators/similarity.pq_adc_batch_serve reading the two
#     persisted frames; NO pq_fit/pq_encode in the serve path. The
#     gated row counts row-level mismatches against the existing
#     in-query path (fresh pq_fit + pq_adc_batch_topk on the same
#     snapshot) — serve-from-artifact must equal fit-in-query exactly.
#
# 100 TB: the codes table is ~m bytes/vector (the only corpus-wide
# serve-time scan); the codebook is m×k rows broadcast. Build cost is
# paid once per corpus version; vacuum(keep_last=2) bounds disk. The
# scratch root follows the spark.epl.scratch.dir convention with a
# stable host-tempdir fallback (stable ACROSS driver processes — the
# point is that a later session serves what an earlier one built).
# ---------------------------------------------------------------------------
_PQ_IDX = {"dim": 64, "m": 8, "k": 16, "iters": 2}


def _index_scratch_root(
    spark: SparkSession,
    sf_dir: str,
    source_table: str,
    prefix: str,
    cfg: dict,
    fallback: str,
) -> str:
    """Content-keyed scratch root for a persisted index family. The
    fingerprint covers the source parquet's path + size + mtime_ns AND
    the index config values, so BOTH a data regeneration (even to the
    same byte size) and an index-parameter change land at a NEW root —
    a stale or parameter-mismatched persisted artifact can never be
    silently served."""
    import glob as _glob
    import hashlib as _hashlib
    import json as _json
    import os as _os
    import tempfile as _tempfile

    h = _hashlib.sha256()
    for p in sorted(_glob.glob(_os.path.join(sf_dir, source_table + ".parquet"))):
        st = _os.stat(p)
        h.update(p.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    h.update(_json.dumps(cfg, sort_keys=True).encode())
    scratch = spark.conf.get("spark.epl.scratch.dir", None)
    base = (
        scratch.rstrip("/")
        if scratch
        else _os.path.join(_tempfile.gettempdir(), fallback)
    )
    return _os.path.join(
        base,
        f"{prefix}_{_os.path.basename(sf_dir.rstrip('/'))}_{h.hexdigest()[:12]}",
    )


def _pq_index_root(spark: SparkSession, sf_dir: str) -> str:
    return _index_scratch_root(
        spark, sf_dir, "embeddings", "pq", _PQ_IDX, "epl_pq_index"
    )


def _pq_index_tables(spark: SparkSession, sf_dir: str):
    import os as _os

    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    root = _pq_index_root(spark, sf_dir)
    return (
        VersionedTable(_os.path.join(root, "codebook")),
        VersionedTable(_os.path.join(root, "codes")),
    )


def _pq_index_build(spark: SparkSession, sf_dir: str):
    """Fit + encode + commit both artifacts; returns (cb_vt, codes_vt,
    codebooks). Deterministic: pq_fit's init and tie rules make the
    committed artifact a pure function of the embeddings table."""
    from epl_cas_etl_2026_spark.operators.similarity import pq_encode, pq_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cfg = _PQ_IDX
    codebooks = pq_fit(
        emb, dim=cfg["dim"], m=cfg["m"], k=cfg["k"], iters=cfg["iters"]
    )
    cb_vt, codes_vt = _pq_index_tables(spark, sf_dir)
    cbdf = spark.createDataFrame(
        [
            (s, j, [float(x) for x in codebooks[s][j]])
            for s in range(cfg["m"])
            for j in range(cfg["k"])
        ],
        "sub_id int, code int, centroid array<double>",
    )
    codes = pq_encode(emb, codebooks, dim=cfg["dim"], m=cfg["m"]).select(
        "vec_id", "sub_id", "code"
    )
    cb_vt.commit(cbdf)
    codes_vt.commit(codes)
    cb_vt.vacuum(keep_last=2)
    codes_vt.vacuum(keep_last=2)
    return cb_vt, codes_vt, codebooks


def _pq_index_ensure(spark: SparkSession, sf_dir: str):
    """Serve-side entry: reuse the committed artifacts when present
    (the build-once/serve-many path); build on first touch. The root
    is fingerprint-keyed, so 'present' implies 'built from THIS data'."""
    cb_vt, codes_vt = _pq_index_tables(spark, sf_dir)
    if cb_vt.latest_version() is None or codes_vt.latest_version() is None:
        return _pq_index_build(spark, sf_dir)[:2]
    return cb_vt, codes_vt


@_register(
    "embedding_pq_index_build",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(128 AS BIGINT) AS n_codebook_rows,
           CAST(COUNT(*) * 8 AS BIGINT) AS n_code_rows,
           CAST(0 AS BIGINT) AS reencode_mismatches,
           true AS committed_ok
    FROM embeddings
    """,
)
def embedding_pq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import pq_encode

    cfg = _PQ_IDX
    cb_vt, codes_vt, codebooks = _pq_index_build(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    cbdf = cb_vt.read(spark)
    codes_back = codes_vt.read(spark)
    # artifact certification: the READ-BACK codes must equal a fresh
    # encode under the READ-BACK codebook (collected driver-side —
    # m×k rows) — catches a torn/stale/reordered artifact, not just
    # wrong cardinality
    cb_rows = cbdf.collect()
    cb2 = [
        [None] * cfg["k"] for _ in range(cfg["m"])
    ]
    for r in cb_rows:
        cb2[r["sub_id"]][r["code"]] = list(r["centroid"])
    fresh = pq_encode(emb, cb2, dim=cfg["dim"], m=cfg["m"]).select(
        "vec_id", "sub_id", F.col("code").alias("code_fresh")
    )
    mism = (
        codes_back.join(fresh, ["vec_id", "sub_id"], "full_outer")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("code").isNull()
                        | F.col("code_fresh").isNull()
                        | (F.col("code") != F.col("code_fresh")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("reencode_mismatches")
        )
    )
    counts = codes_back.agg(
        F.count(F.lit(1)).cast("long").alias("n_code_rows")
    )
    cb_n = cbdf.agg(F.count(F.lit(1)).cast("long").alias("n_codebook_rows"))
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    committed = (
        cb_vt.latest_version() is not None
        and codes_vt.latest_version() is not None
    )
    return (
        n_pts.crossJoin(cb_n)
        .crossJoin(counts)
        .crossJoin(mism)
        .select(
            "n_points",
            "n_codebook_rows",
            "n_code_rows",
            "reencode_mismatches",
            F.lit(committed).alias("committed_ok"),
        )
    )


@_register(
    "embedding_pq_index_serve",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(LEAST(16, COUNT(*)) AS BIGINT) AS n_queries,
           CAST(LEAST(16, COUNT(*)) * LEAST(10, COUNT(*) - 1) AS BIGINT)
             AS n_rows,
           CAST(0 AS BIGINT) AS inquery_mismatches,
           CAST(0 AS BIGINT) AS self_violations,
           true AS served_from_index
    FROM embeddings
    """,
)
def embedding_pq_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        pq_adc_batch_serve,
        pq_adc_batch_topk,
        pq_fit,
    )

    cfg = _PQ_IDX
    shortlist, topk, n_q = 50, 10, 16
    emb = load_table(spark, sf_dir, "embeddings")
    cb_vt, codes_vt = _pq_index_ensure(spark, sf_dir)
    cbdf = cb_vt.read(spark)
    codes = codes_vt.read(spark)
    qids = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") < n_q)
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]
    served = pq_adc_batch_serve(
        emb, cbdf, codes, qids,
        dim=cfg["dim"], m=cfg["m"], shortlist=shortlist, topk=topk,
    ).localCheckpoint(eager=False)
    # the existing in-query path on the same snapshot: fresh fit (pq_fit
    # is deterministic) + inline encode — row-level equality required
    codebooks = pq_fit(
        emb, dim=cfg["dim"], m=cfg["m"], k=cfg["k"], iters=cfg["iters"]
    )
    inquery = pq_adc_batch_topk(
        emb, codebooks, qids,
        dim=cfg["dim"], m=cfg["m"], shortlist=shortlist, topk=topk,
    ).select(
        "q_id",
        F.col("vec_id").alias("vec_id_iq"),
        F.col("exact_dist").alias("exact_iq"),
        "rank",
    )
    mism = (
        served.join(inquery, ["q_id", "rank"], "full_outer")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("vec_id").isNull()
                        | F.col("vec_id_iq").isNull()
                        | (F.col("vec_id") != F.col("vec_id_iq"))
                        | (
                            F.abs(F.col("exact_dist") - F.col("exact_iq"))
                            > F.lit(1e-9)
                        ),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("inquery_mismatches")
        )
    )
    counts = served.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("q_id").cast("long").alias("n_queries"),
        F.coalesce(
            F.sum(F.when(F.col("q_id") == F.col("vec_id"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("self_violations"),
    )
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        n_pts.crossJoin(counts)
        .crossJoin(mism)
        .select(
            "n_points",
            "n_queries",
            "n_rows",
            "inquery_mismatches",
            "self_violations",
            F.lit(cb_vt.latest_version() is not None).alias(
                "served_from_index"
            ),
        )
    )


# ---------------------------------------------------------------------------
# EXACT SUBSTRING-LEVEL DEDUP (round-8; Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better" ExactSubstr / the
# RefinedWeb pipeline's exact-span removal): a character position is
# removed iff it lies inside some 50-char substring that occurs AGAIN
# anywhere in the corpus (other doc OR another position of the same
# doc). Equivalent formulation used here (and by the suffix-array
# implementations): mark every position s whose 50-gram has corpus
# frequency >= 2; the union of [s, s+50) intervals, merged per doc,
# is exactly the set of removed characters; docs are REWRITTEN by
# deleting the merged spans (a real rewrite via one JVM higher-order
# fold, not just counting).
#
# Plan shape / 100 TB: the gram explode stays in the scan stage (the
# per-row gram array is built once, then exploded — linear, never
# text x positions quadratic). Duplicate detection is TWO-PHASE
# LOSSLESS: frequencies are first counted on xxhash64(gram) (8-byte
# shuffle keys), only hash-duplicated candidates re-group on the gram
# STRING to confirm true frequency >= 2 — hash collisions can only ADD
# candidates, never drop a real duplicate, so the string shuffle
# carries candidates only. Span merge is the classic islands pattern
# (running-max window per doc); the rewrite folds the merged span
# array over the original text driver-free. The span checksum is
# exact-integer mod 1e9+7 — it pins the full (doc, start, end) span
# set, which together with the input text DETERMINES the rewritten
# corpus, so hashing spans is as strong as hashing the rewritten text;
# chars_kept is additionally measured from the ACTUAL rewritten
# strings (the oracle derives it arithmetically — any rewrite bug
# breaks the hash match).
# ---------------------------------------------------------------------------
@_register(
    "docs_exact_substring_dedup",
    """
    WITH pos AS (
      SELECT doc_id, source, len, s, substring(text, s, 50) AS gram
      FROM (SELECT doc_id, source, text, length(text) AS len,
                   unnest(range(1, greatest(length(text) - 49, 0) + 1)) AS s
            FROM documents)
    ),
    dup AS (SELECT gram FROM pos GROUP BY gram HAVING COUNT(*) >= 2),
    hits AS (SELECT doc_id, source, len, s FROM pos JOIN dup USING (gram)),
    ord AS (
      SELECT doc_id, source, len, s,
             MAX(s + 50) OVER (PARTITION BY doc_id ORDER BY s
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_end
      FROM hits
    ),
    isl AS (
      SELECT doc_id, source, len, s,
             SUM(CASE WHEN prev_end IS NULL OR s > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s) AS island
      FROM ord
    ),
    spans AS (
      SELECT doc_id, source, len, island,
             CAST(MIN(s) AS BIGINT) AS sp_s,
             CAST(MAX(s) + 50 AS BIGINT) AS sp_e
      FROM isl GROUP BY doc_id, source, len, island
    ),
    per_source AS (
      SELECT source,
             COUNT(DISTINCT doc_id) AS n_docs_affected,
             COUNT(*) AS n_spans,
             CAST(SUM(sp_e - sp_s) AS BIGINT) AS chars_removed,
             CAST(SUM((doc_id * 1000003 + sp_s * 1009 + sp_e)
                      % 1000000007) % 1000000007 AS BIGINT)
               AS span_checksum
      FROM spans GROUP BY source
    ),
    totals AS (
      SELECT source, CAST(SUM(length(text)) AS BIGINT) AS total_chars
      FROM documents GROUP BY source
    )
    SELECT p.source, n_docs_affected, n_spans, chars_removed,
           span_checksum,
           CAST(total_chars - chars_removed AS BIGINT) AS chars_kept
    FROM per_source p JOIN totals USING (source)
    ORDER BY p.source
    """,
)
def docs_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    L = 50
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("len")
    )
    # gram array built once per row (linear), exploded into slim rows;
    # sequence(1, 0) would count DOWN in Spark — guard short docs
    starts = F.when(
        F.col("len") >= L, F.sequence(F.lit(1), F.col("len") - (L - 1))
    ).otherwise(F.array().cast("array<int>"))
    # two-phase lossless duplicate detection on a SLIM gram stream:
    # the corpus-wide exchange carries (doc_id, s, h) — 20 bytes/row —
    # not the 50-char gram string (the r8 form shuffled every gram
    # string once, ~4× the bytes; guide §8: shuffle the lightweight
    # proxy, attach the payload once). The explicit repartition(h)
    # still makes the frequency count and the candidate probe consume
    # the SAME exchange; gram STRINGS are re-derived for hash-
    # duplicated candidates only, by joining the (small) candidate
    # frame back to the documents table on doc_id — one text-sized
    # shuffle of candidates' docs instead of a gram-sized shuffle of
    # the whole corpus. Hash collisions can only ADD candidates, never
    # drop a real duplicate, so the string-confirm set is unchanged.
    # r12 (verdict item 3): the gram explode+hash is the query's single
    # heaviest stage (phase-profiled at 2.1 s of the 4.5 s wall), and it
    # runs at SCAN parallelism — one split on a small local file, so
    # ~1.24M substr+xxhash64 ops serialized on one task. Spread ONLY
    # when the scan is under-parallel (the band_lsh_pairs /
    # minhash_signature_agg idiom): at scale the scan has plenty of
    # splits and no exchange happens. Interleaved A/B: hash stage
    # 2.11 → 0.42 s med; full query 4.70/4.86 → 3.17/3.60 s (min/med).
    docs_spread = spread_scan(docs)
    slim = docs_spread.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("s"),
                    F.xxhash64(
                        F.col("text").substr(i, F.lit(L))
                    ).alias("h"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.s", "g.h")
    shp = slim.repartition(F.col("h"))
    dup_h = (
        shp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    cand = shp.join(dup_h, "h")
    # candidates only: re-attach doc metadata + re-slice the gram text;
    # pinned so the string-confirm and hits joins below share one pass
    cand_g = (
        cand.join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "len",
            "s",
            F.col("text").substr(F.col("s"), F.lit(L)).alias("gram"),
        )
        .localCheckpoint(eager=False)
    )
    dup_gram = (
        cand_g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    hits = cand_g.join(dup_gram, "gram").select("doc_id", "source", "len", "s")
    # islands: running max of span ends per doc
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = hits.withColumn(
        "prev_end", F.max(F.col("s") + L).over(w_prev)
    ).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_end").isNull() | (F.col("s") > F.col("prev_end")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    spans = isl.groupBy("doc_id", "source", "len", "island").agg(
        F.min("s").cast("long").alias("sp_s"),
        (F.max("s") + L).cast("long").alias("sp_e"),
    # two consumers (per-source stats + the rewrite join) — pin the
    # tiny merged-span frame so the gram explode/dedup/window pipeline
    # runs once, not twice
    ).localCheckpoint(eager=False)
    per_source = spans.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs_affected"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("sp_e") - F.col("sp_s")).cast("long").alias(
            "chars_removed"
        ),
        (
            F.sum(
                (
                    F.col("doc_id") * F.lit(1000003)
                    + F.col("sp_s") * F.lit(1009)
                    + F.col("sp_e")
                )
                % F.lit(1000000007)
            )
            % F.lit(1000000007)
        )
        .cast("long")
        .alias("span_checksum"),
    )
    # the REAL rewrite: fold the sorted merged-span array over the
    # original text — kept text is the inter-span segments + tail
    span_arr = spans.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("sp_s", "sp_e"))).alias("spans")
    )
    st0 = F.struct(
        F.lit(1).cast("long").alias("pos"), F.lit("").alias("acc")
    )
    rewritten = (
        docs.join(span_arr, "doc_id", "left")
        .withColumn(
            "rewritten",
            F.when(F.col("spans").isNull(), F.col("text")).otherwise(
                F.aggregate(
                    "spans",
                    st0,
                    lambda st, sp: F.struct(
                        sp["sp_e"].alias("pos"),
                        F.concat(
                            st["acc"],
                            F.col("text").substr(
                                st["pos"].cast("int"),
                                (sp["sp_s"] - st["pos"]).cast("int"),
                            ),
                        ).alias("acc"),
                    ),
                    lambda st: F.concat(
                        st["acc"],
                        F.col("text").substr(
                            st["pos"].cast("int"),
                            (F.col("len") - st["pos"] + 1).cast("int"),
                        ),
                    ),
                )
            ),
        )
        .groupBy("source")
        .agg(F.sum(F.length("rewritten")).cast("long").alias("chars_kept"))
    )
    return (
        per_source.join(rewritten, "source")
        .select(
            "source",
            "n_docs_affected",
            "n_spans",
            "chars_removed",
            "span_checksum",
            "chars_kept",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# REAL-JPEG ROUND-TRIP under the hard gate (round-8; operators/jpeg.py):
# deterministic flat-color JPEGs are encoded in-plan (mapInPandas, one
# baseline-JFIF payload per doc: luma L = doc_id*37 % 256, dims
# 8+doc_id%9 × 8+doc_id%7 — non-MCU-multiple on purpose), then decoded
# by the REAL baseline decoder (Huffman → dequant → IDCT → luma
# stats). The oracle is EXACT arithmetic, not a re-implementation:
# a flat block quantizes to a DC-only spectrum, so the decoded value
# is v = clip(q00·round(8(L−128)/q00)/8 + 128, 0, 255) with q00 = 5 at
# quality 85 — SQL-computable per doc. Tie-safety: 8(L−128)/5 has
# fractional part in {0,±.2,±.4,±.6,±.8}, never .5, so numpy
# nearest-rounding and SQL ROUND agree for every L; v/255·1000 can
# never land exactly on a +0.5 floor boundary (v has 1/8 granularity;
# (102k+51)/400 is never ≡ 0 mod 50/400). The doc_id < 512 cap bounds
# fixture GENERATION (the decode itself is scan-stage parallel at any
# scale); padding is edge-replicate, so flat stays flat and the
# non-multiple dims still decode to the exact model value.
# ---------------------------------------------------------------------------
@_register(
    "docs_jpeg_roundtrip_stats",
    """
    WITH d AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(doc_id * 37 % 256 AS BIGINT) AS L,
             CAST(8 + doc_id % 9 AS BIGINT) AS w,
             CAST(8 + doc_id % 7 AS BIGINT) AS h
      FROM documents WHERE doc_id < 512
    ),
    v AS (
      SELECT doc_id, w, h,
             LEAST(GREATEST(
               5.0 * ROUND(8.0 * (L - 128) / 5.0, 0) / 8.0 + 128.0,
               0.0), 255.0) AS vv
      FROM d
    )
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS sum_width,
           CAST(SUM(h) AS BIGINT) AS sum_height,
           CAST(SUM(CAST(FLOOR(vv / 255.0 * 1000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_luma_milli,
           CAST(SUM(3) AS BIGINT) AS sum_components
    FROM v GROUP BY 1 ORDER BY 1
    """,
)
def docs_jpeg_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.jpeg import (
        decode_jpeg_real,
        encode_jpeg_baseline,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") < 512)
    )

    def enc(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                L = int(d) * 37 % 256
                w = 8 + int(d) % 9
                h = 8 + int(d) % 7
                img = _np.full((h, w, 3), float(L))
                payloads.append(
                    encode_jpeg_baseline(w, h, rgb_rows=img, quality=85)
                )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    enc_df = docs.mapInPandas(enc, "doc_id long, payload binary")
    dec = decode_jpeg_real(enc_df, id_col="doc_id", on_error="fail")
    return (
        dec.groupBy((F.col("id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum("mean_luma_milli").cast("long").alias("sum_luma_milli"),
            F.sum("n_components").cast("long").alias("sum_components"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# REAL-PNG ROUND-TRIP under the hard gate (round-8; operators/png.py):
# deterministic RGB gradient images — pixel (r, c) of doc d has
# s = (d*7 + r*3 + c*5) % 256, channels (s, s+85, s+170 mod 256),
# dims (5 + d%12) × (5 + d%11) — are encoded in-plan with ADAPTIVE
# per-row filter selection (gradients force Sub/Up/Paeth rows, so the
# gate exercises real filter reconstruction, not just filter 0) and
# Adam7 interlace on every doc_id % 3 == 0 (all seven passes
# reassembled in-gate). PNG is lossless, so the oracle is the
# generation arithmetic itself: DuckDB recomputes the per-pixel luma
# accumulator Σ(299R + 587G + 114B) over generate_series — EXACT
# integers end to end, no rounding anywhere, hence no tie-safety
# argument needed at all (the strongest oracle form a codec gate can
# have; the JPEG gate needs a quantization model, this needs none).
# doc_id < 512 bounds fixture GENERATION only — the decode itself is
# scan-stage parallel at any corpus size.
# ---------------------------------------------------------------------------
@_register(
    "docs_png_roundtrip_stats",
    """
    WITH d AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(5 + doc_id % 12 AS BIGINT) AS w,
             CAST(5 + doc_id % 11 AS BIGINT) AS h
      FROM documents WHERE doc_id < 512
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             (d.doc_id * 7 + r.r * 3 + c.c * 5) % 256 AS s
      FROM d
      JOIN generate_series(0, 14) AS r(r) ON r.r < d.h
      JOIN generate_series(0, 15) AS c(c) ON c.c < d.w
    ),
    per_doc AS (
      SELECT doc_id, w, h,
             SUM(299 * s + 587 * ((s + 85) % 256)
                 + 114 * ((s + 170) % 256)) AS luma_sum,
             COUNT(*) AS n_px
      FROM px GROUP BY doc_id, w, h
    )
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS sum_width,
           CAST(SUM(h) AS BIGINT) AS sum_height,
           CAST(SUM(luma_sum) AS BIGINT) AS sum_luma,
           CAST(SUM(n_px) AS BIGINT) AS sum_px
    FROM per_doc GROUP BY 1 ORDER BY 1
    """,
)
def docs_png_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.png import (
        decode_png_real,
        encode_png,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") < 512)
    )

    def enc(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 5 + d % 12, 5 + d % 11
                rr, cc = _np.mgrid[0:h, 0:w]
                s = (d * 7 + rr * 3 + cc * 5) % 256
                img = _np.stack(
                    [s, (s + 85) % 256, (s + 170) % 256], axis=-1
                ).astype(_np.uint8)
                payloads.append(
                    encode_png(
                        w, h, pixels=img, interlace=(d % 3 == 0),
                        filter_mode="adaptive",
                    )
                )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    enc_df = docs.mapInPandas(enc, "doc_id long, payload binary")
    dec = decode_png_real(enc_df, id_col="doc_id", on_error="fail")
    return (
        dec.groupBy((F.col("id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum("luma_sum").cast("long").alias("sum_luma"),
            F.sum("n_px").cast("long").alias("sum_px"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# DISTRIBUTED BPE TOKENIZER TRAINING (round-8). docs_bpe_merge_step
# gates ONE merge over the word stream; this is the real trainer
# shape: classic character-level BPE (Sennrich et al. 2016) over the
# DISTINCT-WORD frame, N full merge rounds, emitting the learned merge
# table plus the corpus token count after every round (the compression
# curve a tokenizer team actually reads).
#
# Scale design — why this is the canonical 100 TB tokenizer-training
# plan: the corpus is touched ONCE (word count); every training round
# then runs on the distinct-word frame, which is vocabulary-bounded
# (Heaps' law: ~millions of types regardless of corpus bytes), with
# pair counting as one map-side-combined groupBy per round and ONLY
# the argmax pair (plus one token-count scalar) reaching the driver —
# O(rounds) driver state, exactly the logreg-Newton iteration
# discipline. The segmentation fold (greedy_pair_merge) is the same
# JVM higher-order fold the merge-step query already gates.
#
# Determinism: pair argmax ties break (count DESC, lhs, rhs) — byte
# collation in both engines; token counts are exact integers. The
# oracle replays all N rounds as generated CTE chains sharing the
# list_reduce merge shape with docs_bpe_merge_step's oracle.
# ---------------------------------------------------------------------------
_BPE_TRAIN_ROUNDS = 8


def _bpe_cte_prefix(rounds: int) -> str:
    parts = [
        """
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS word
            FROM documents)
      GROUP BY word
    ),
    s0 AS (
      SELECT word, freq, regexp_extract_all(word, '(?s).') AS seg
      FROM w0
    ),
    m0 AS (SELECT CAST(SUM(freq * len(seg)) AS BIGINT) AS tokens_after
           FROM s0)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f""",
    p{k} AS (
      SELECT pr[1] AS w1, pr[2] AS w2, CAST(SUM(freq) AS BIGINT) AS c
      FROM (SELECT freq,
                   unnest(list_zip(seg[1:len(seg) - 1], seg[2:len(seg)]))
                     AS pr
            FROM s{p})
      GROUP BY 1, 2
    ),
    t{k} AS (SELECT w1, w2, c FROM p{k} ORDER BY c DESC, w1, w2 LIMIT 1),
    s{k} AS (
      SELECT word, freq,
             CASE WHEN len(seg) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE list_reduce(list_transform(seg, x -> [x]),
                    (acc, x) -> CASE WHEN len(acc) > 0
                                      AND acc[len(acc)] = t{k}.w1
                                      AND x[1] = t{k}.w2
                                THEN acc[1:len(acc) - 1]
                                     || [t{k}.w1 || t{k}.w2]
                                ELSE acc || x END)
             END AS seg
      FROM s{p} CROSS JOIN t{k}
    ),
    m{k} AS (SELECT CAST(SUM(freq * len(seg)) AS BIGINT) AS tokens_after
             FROM s{k})"""
        )
    return "".join(parts)


def _bpe_train_oracle(rounds: int) -> str:
    rows = [
        """
    SELECT CAST(0 AS BIGINT) AS merge_rank, '' AS lhs, '' AS rhs,
           CAST(0 AS BIGINT) AS pair_freq, m0.tokens_after
    FROM m0"""
    ]
    for k in range(1, rounds + 1):
        rows.append(
            f"""
    SELECT CAST({k} AS BIGINT), t{k}.w1, t{k}.w2, t{k}.c,
           m{k}.tokens_after
    FROM t{k}, m{k}"""
        )
    return (
        _bpe_cte_prefix(rounds)
        + "\n    UNION ALL".join(rows)
        + "\n    ORDER BY merge_rank"
    )


def _bpe_encode_oracle(rounds: int) -> str:
    return (
        _bpe_cte_prefix(rounds)
        + f""",
    doc_words AS (
      SELECT lang,
             unnest(list_filter(string_split(text, ' '),
                                x -> x <> '')) AS word
      FROM documents
    ),
    enc AS (
      SELECT dw.lang, dw.word, len(s{rounds}.seg) AS n_tok
      FROM doc_words dw JOIN s{rounds} ON dw.word = s{rounds}.word
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(length(word)) AS BIGINT) AS n_chars,
           CAST((SUM(n_tok) * 1000 + SUM(length(word)) // 2)
                // SUM(length(word)) AS BIGINT) AS tokens_per_kchar
    FROM enc GROUP BY lang ORDER BY lang
    """
    )


def _bpe_train_segs(spark: SparkSession, sf_dir: str):
    """Run the full training loop; returns (merge-table rows, final
    per-word segmentation frame with columns word/freq/seg). Shared
    by the trainer gate (emits the merge table) and the encode gate
    (joins the final segmentation back onto the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col("text"), " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # localCheckpoint (eager), NOT persist: a cached plan pins its
    # 200-partition shuffle output (AQE may not re-partition cached
    # plans under the default canChangeCachedPlanOutputPartitioning),
    # turning every one of the ~2·rounds tiny vocab jobs into a
    # 200-task reduce stage — measured 40.6 s → 7 s at sf0.01 from
    # this one change. Checkpointing materializes the frame AND keeps
    # every later round AQE-eligible, so the per-round shuffles
    # coalesce to a handful of tasks.
    segs = vocab.select(
        "word",
        "freq",
        F.expr("regexp_extract_all(word, '(?s).', 0)").alias("seg"),
    ).localCheckpoint()

    def pair_stats(frame: DataFrame):
        """ONE job per merge round (was three: top-pair, token-count,
        eager checkpoint): the adjacent-pair groupBy yields both the
        argmax pair — min_by over struct(-c, w1, w2) is exactly
        ORDER BY c DESC, w1, w2 LIMIT 1 — and Σc, which converts to
        the post-merge token count arithmetically: token_count =
        Σ freq·size(seg) = Σ freq·(pairs_per_word+1) = Σc + Σfreq,
        and Σfreq is merge-invariant (computed once below)."""
        pairs = frame.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.expr(
                        "slice(seg, 1, greatest(size(seg) - 1, 0))"
                    ).alias("a"),
                    F.expr(
                        "slice(seg, 2, greatest(size(seg) - 1, 0))"
                    ).alias("b"),
                )
            ).alias("p"),
        ).select(
            F.col("p.a").alias("w1"), F.col("p.b").alias("w2"), "freq"
        )
        row = (
            pairs.groupBy("w1", "w2")
            .agg(F.sum("freq").cast("long").alias("c"))
            .agg(
                F.sum("c").alias("pair_tok"),
                F.min_by(
                    F.struct("w1", "w2", "c"),
                    F.struct((-F.col("c")).alias("nc"), "w1", "w2"),
                ).alias("top"),
            )
            .collect()[0]
        )
        return row["pair_tok"], row["top"]

    base = segs.agg(
        F.sum(F.col("freq") * F.size("seg")).cast("long").alias("t0"),
        F.sum("freq").cast("long").alias("vt"),
    ).collect()[0]
    vocab_freq_total = base["vt"] or 0
    out = [(0, "", "", 0, base["t0"])]
    cur = segs
    _pair_tok, best = pair_stats(cur)
    for k in range(1, _BPE_TRAIN_ROUNDS + 1):
        if best is None:
            break
        merged = best["w1"] + best["w2"]
        cur = cur.select(
            "word",
            "freq",
            greedy_pair_merge(
                F.col("seg"),
                F.lit(best["w1"]),
                F.lit(best["w2"]),
                F.lit(merged),
            ).alias("seg"),
            # lazy checkpoint: the round's single stats job below both
            # materializes these partitions and reads them
        ).localCheckpoint(eager=False)
        pair_tok, nxt = pair_stats(cur)
        out.append(
            (
                k,
                best["w1"],
                best["w2"],
                best["c"],
                (pair_tok or 0) + vocab_freq_total,
            )
        )
        best = nxt
    return out, cur


@_register("docs_bpe_train_merges", _bpe_train_oracle(_BPE_TRAIN_ROUNDS))
def docs_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _segs = _bpe_train_segs(spark, sf_dir)
    return spark.createDataFrame(
        out,
        "merge_rank long, lhs string, rhs string, pair_freq long, "
        "tokens_after long",
    ).orderBy("merge_rank")


# ---------------------------------------------------------------------------
# BPE ENCODE (round-8 continuation): the serving half of the trainer
# pair — apply the learned segmentation to the WHOLE corpus and
# report the per-language compression curve endpoint (tokens, chars,
# tokens-per-kchar). Because BPE segments per WORD, "apply" is a join
# of the corpus word stream against the trained distinct-word
# segmentation frame — no per-document fold at all, which is exactly
# why word-level BPE serves cheaply at 100 TB: the encode pass is one
# corpus scan + one join against a vocab-bounded frame (broadcast
# when it fits, shuffle-on-word when it does not), never a Python
# tokenizer loop. Integer ratio via the half-up (a*1000 + b div 2)
# div b idiom. The oracle replays training via the shared CTE prefix
# and encodes with the same join.
# ---------------------------------------------------------------------------
@_register("docs_bpe_encode_stats", _bpe_encode_oracle(_BPE_TRAIN_ROUNDS))
def docs_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _out, segs = _bpe_train_segs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("word"),
    )
    enc = dw.join(
        segs.select("word", F.size("seg").alias("n_tok")), "word"
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            "n_chars",
            F.expr(
                "(n_tokens * CAST(1000 AS BIGINT) + n_chars div 2)"
                " div n_chars"
            ).alias("tokens_per_kchar"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# round-8): score every document by how much more likely its hashed
# unigram features are under a TARGET domain (here: the 'en' slice)
# than under the RAW corpus, then keep the top-K. This is the
# canonical pretraining-data selection operator the benchmark-
# decontamination / quality-resample family was still missing: those
# filter docs independently; DSIR ranks them against a target
# DISTRIBUTION. The published method resamples with Gumbel noise; the
# gate pins the deterministic core (exact importance weights +
# deterministic top-K) — seeded resampling over these weights is the
# docs_quality_resample_stats shape.
#
# Determinism (round-9 hardening): per-BUCKET log-ratio terms use a
# FIXED-POINT integer ln — ln_fp(n) = e·LN2_FP + 2·atanh-series in
# Q30 arithmetic, where e = bitlength(n)−1 via length(bin(n)) — so
# BOTH engines evaluate the identical chain of BIGINT ops and the
# r8 float surface (JVM Math.log vs DuckDB libm agreeing bit-for-bit
# at a FLOOR(1e6·x+0.5) boundary) is gone entirely. |ln_fp/2^30 −
# ln(n)| < 1.2e-7, and every intermediate stays under 2^62 for
# n ≤ 2^53. Per-doc weights are exact integer sums of bucket terms
# over gram OCCURRENCES, so ranking and hashing are tie-free by
# construction (ties broken by doc_id). The four-separate-ln
# formulation (ln(t+1) − ln(T+B) − ln(r+1) + ln(R+B)) is mirrored in
# both engines; all fixed-point divisions have non-negative operands
# so truncating vs floor division cannot diverge.
#
# 100 TB: one corpus pass builds the gram→bucket stream; bucket count
# tables are B-bounded (256 rows) and broadcast; per-doc weights are
# one map-side-combined groupBy(doc_id); selection is
# TakeOrderedAndProject (no global sort materialization).
# ---------------------------------------------------------------------------
_DSIR_BUCKETS = 256
_DSIR_K = 64


@_register(
    "docs_dsir_topk_select",
    f"""
    WITH grams AS (
      SELECT doc_id, lang, source,
             CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket
      FROM (SELECT doc_id, lang, source,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS word
            FROM documents)
    ),
    raw_b AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_b
      FROM grams GROUP BY bucket
    ),
    tgt_b AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_b
      FROM grams WHERE lang = 'en' GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS r_tot,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_tot
      FROM grams
    ),
    base AS (
      SELECT raw_b.bucket,
             CAST(COALESCE(t_b, 0) + 1 AS BIGINT) AS tb1,
             CAST(r_b + 1 AS BIGINT) AS rb1,
             CAST(t_tot + {_DSIR_BUCKETS} AS BIGINT) AS ttb,
             CAST(r_tot + {_DSIR_BUCKETS} AS BIGINT) AS rtb
      FROM raw_b LEFT JOIN tgt_b ON raw_b.bucket = tgt_b.bucket
      CROSS JOIN tot
    ),
    lncalc AS (
      SELECT bucket,
             {_lnfp_duck_select([("ta_", "tb1"), ("tt_", "ttb"),
                                 ("ra_", "rb1"), ("rt_", "rtb")])}
      FROM base
    ),
    terms AS (
      SELECT bucket,
             CAST(ta_ln - tt_ln - ra_ln + rt_ln AS BIGINT) AS term_q
      FROM lncalc
    ),
    doc_w AS (
      SELECT g.doc_id,
             MIN(g.lang) AS lang,
             MIN(g.source) AS source,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(term_q) AS BIGINT) AS weight_q
      FROM grams g JOIN terms ON g.bucket = terms.bucket
      GROUP BY g.doc_id
    )
    SELECT doc_id, lang, source, n_grams, weight_q
    FROM doc_w
    ORDER BY weight_q DESC, doc_id
    LIMIT {_DSIR_K}
    """,
)
def docs_dsir_topk_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_scan (r12): the md5-per-word explode otherwise runs on the
    # single scan split — interleaved A/B 1.77/2.18 → 1.47/2.05
    # (min/med); no-op at scale.
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("word"),
    )
    grams = words.select(
        "doc_id",
        "lang",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast(
                "long"
            )
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    # TWO explode + md5 passes (was FOUR: separate raw-bucket count,
    # en-bucket count, and corpus-totals scans each re-ran the word
    # explode and the md5-per-word hash; they fuse into ONE
    # conditional aggregation whose map-side combine still shuffles
    # only ~n_buckets rows per task, and the corpus totals follow
    # arithmetically from the bucket marginals — every gram carries
    # exactly one bucket). Interleaved A/B at sf0.1: wall-flat vs the
    # four-pass original locally (2.28 vs 2.33 s, same host window) —
    # the win is the halved scan/explode/hash work, which IS the
    # dominant cost once the scan is storage-bound at scale. A
    # single-pass per-(doc, bucket) variant was MEASURED AND
    # REVERTED: it replaces these collapsed shuffles with a full
    # gram-stream exchange (distinct (doc, bucket) ≈ gram count) and
    # measured no better (2.34 s, same window) while shuffling ~40×
    # the bytes — re-running md5 is cheaper than moving the stream.
    bstats = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("r_b"),
        F.count(F.when(F.col("lang") == "en", 1))
        .cast("long")
        .alias("t_b"),
    )
    tot = bstats.agg(
        F.sum("r_b").cast("long").alias("r_tot"),
        F.sum("t_b").cast("long").alias("t_tot"),
    )
    base = bstats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (F.col("t_b") + 1).cast("long").alias("tb1"),
        (F.col("r_b") + 1).cast("long").alias("rb1"),
        (F.col("t_tot") + _DSIR_BUCKETS).cast("long").alias("ttb"),
        (F.col("r_tot") + _DSIR_BUCKETS).cast("long").alias("rtb"),
    )
    for prefix, src in (
        ("ta_", "tb1"), ("tt_", "ttb"), ("ra_", "rb1"), ("rt_", "rtb")
    ):
        for name, sql in _lnfp_steps(
            prefix, src, _lnfp_spark_div, _lnfp_spark_shl
        ):
            base = base.withColumn(name, F.expr(sql))
    terms = base.select(
        "bucket",
        (
            F.col("ta_ln") - F.col("tt_ln") - F.col("ra_ln")
            + F.col("rt_ln")
        ).cast("long").alias("term_q"),
    )
    doc_w = (
        grams.join(F.broadcast(terms), "bucket")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.min("source").alias("source"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("term_q").cast("long").alias("weight_q"),
        )
    )
    return doc_w.select(
        "doc_id", "lang", "source", "n_grams", "weight_q"
    ).orderBy(F.desc("weight_q"), "doc_id").limit(_DSIR_K)


# ---------------------------------------------------------------------------
# REAL-ADPCM ROUND-TRIP under the hard gate (round-8;
# operators/adpcm.py): deterministic IMA-ADPCM WAV payloads are built
# in-plan DIRECTLY from nibble streams (nib_i = (d + 7i) % 16, i<64,
# predictor seed d*331 % 4096 − 2048, step-index seed d % 89 — every
# one of the 89 step-table rows is seeded by some doc), decoded by the
# REAL decoder (container parse → block header → nibble unpack →
# integer state machine), and compared against an oracle that REPLAYS
# THE STATE MACHINE ITSELF: the IMA recurrence is pure integer
# shifts/adds/clamps, so DuckDB runs it exactly as a list_reduce fold
# with the public step/index tables as literals. No rounding model,
# no float anywhere — the oracle is a genuine third implementation of
# the decoder, stronger than the JPEG gate's closed-form model. The
# ENCODER (sample→nibble quantizer) is validated in
# tests/test_adpcm_real.py via round-trip SNR + an independent
# reference implementation; the fixture-from-nibbles path keeps the
# GATE exact. doc_id < 512 bounds fixture generation only.
# ---------------------------------------------------------------------------
def _adpcm_oracle() -> str:
    from epl_cas_etl_2026_spark.operators.adpcm import (
        INDEX_TABLE,
        STEP_TABLE,
    )

    stv = "[" + ", ".join(str(v) for v in STEP_TABLE) + "]"
    itv = "[" + ", ".join(str(v) for v in INDEX_TABLE) + "]"
    # State rides a flat BIGINT list [idx, p0, p1, ..., pk] — NOT a
    # struct: DuckDB v1.0.0 misbinds struct-field accumulator
    # references inside list_reduce (each field expression sees a
    # different accumulator snapshot — probed, reproducible), while
    # flat-list accumulators fold correctly.
    step = "st.stv[acc[1] + 1]"
    diff = (
        f"({step} // 8"
        f" + CASE WHEN (x[1] & 4) <> 0 THEN {step} ELSE 0 END"
        f" + CASE WHEN (x[1] & 2) <> 0 THEN {step} // 2 ELSE 0 END"
        f" + CASE WHEN (x[1] & 1) <> 0 THEN {step} // 4 ELSE 0 END)"
    )
    p2 = (
        "LEAST(GREATEST(CASE WHEN (x[1] & 8) <> 0"
        f" THEN acc[len(acc)] - {diff}"
        f" ELSE acc[len(acc)] + {diff} END,"
        " -32768), 32767)"
    )
    i2 = "LEAST(GREATEST(acc[1] + st.itv[x[1] + 1], 0), 88)"
    return f"""
    WITH st AS (
      SELECT CAST({stv} AS BIGINT[]) AS stv,
             CAST({itv} AS BIGINT[]) AS itv
    ),
    d AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(doc_id * 331 % 4096 - 2048 AS BIGINT) AS pred0,
             CAST(doc_id % 89 AS BIGINT) AS idx0
      FROM documents WHERE doc_id < 512
    ),
    dec AS (
      SELECT doc_id,
             list_reduce(
               list_prepend([idx0, pred0],
                 list_transform(range(64),
                   i -> [(doc_id + 7 * i) % 16])),
               (acc, x) -> [{i2}] || acc[2:] || [{p2}]
             )[2:] AS seq
      FROM d CROSS JOIN st
    ),
    per_doc AS (
      SELECT doc_id,
             len(seq) AS n_samples,
             CAST(list_aggregate(seq, 'sum') AS BIGINT) AS sum_pred,
             CAST(list_aggregate(list_transform(seq, s -> abs(s)),
                                 'sum') AS BIGINT) AS sum_abs,
             CAST(list_aggregate(list_transform(seq, s -> s * s),
                                 'sum') AS BIGINT) AS energy
      FROM dec
    )
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_samples) AS BIGINT) AS sum_samples,
           CAST(SUM(sum_pred) AS BIGINT) AS sum_pred,
           CAST(SUM(sum_abs) AS BIGINT) AS sum_abs,
           CAST(SUM(energy) AS BIGINT) AS energy
    FROM per_doc GROUP BY 1 ORDER BY 1
    """


@_register("docs_adpcm_roundtrip_stats", _adpcm_oracle())
def docs_adpcm_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.adpcm import (
        adpcm_payload_from_nibbles,
        decode_adpcm_real,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") < 512)
    )

    def enc(it):
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(
                    adpcm_payload_from_nibbles(
                        [(d + 7 * i) % 16 for i in range(64)],
                        pred0=d * 331 % 4096 - 2048,
                        idx0=d % 89,
                    )
                )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    enc_df = docs.mapInPandas(enc, "doc_id long, payload binary")
    dec = decode_adpcm_real(enc_df, id_col="doc_id", on_error="fail")
    return (
        dec.groupBy((F.col("id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_samples").cast("long").alias("sum_samples"),
            F.sum("sum_pred").cast("long").alias("sum_pred"),
            F.sum("sum_abs").cast("long").alias("sum_abs"),
            F.sum("energy").cast("long").alias("energy"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# PII SCRUBBING (round-8 continuation): the redaction pass every
# pretraining pipeline runs before anything else — emails, phone
# numbers, IPv4 addresses replaced by typed tokens, with a per-source
# audit (match counts by type, chars removed) and an order-independent
# BIT_XOR checksum of the scrubbed corpus proving the REWRITE itself
# (not just the counts) is identical across engines.
#
# Deterministic fixtures: each doc gets a synthetic contact sentence
# appended in-plan (user<id>@example.com, a +1 (555) NNN-NNNN phone,
# a 192.168.x.y address — RFC-reserved/example values only), so every
# doc exercises all three patterns ON TOP of whatever digit runs the
# natural text contributes (both engines see the same text, so organic
# matches agree too).
#
# Cross-engine regex discipline: patterns restricted to the syntax
# subset where Java regex (Spark) and RE2 (DuckDB) agree — character
# classes, bounded/unbounded counted repetition, non-capturing groups,
# \b word boundaries; no lookaround, no backreferences. DuckDB's
# regexp_replace needs the explicit 'g' flag (it replaces FIRST match
# by default; Spark replaces all). Scrub order (email → phone → IP)
# is part of the spec and identical on both sides.
#
# 100 TB: pure scan-stage string work (whole-stage codegen, zero
# Python), one map-side-combined groupBy(source). The checksum uses
# BIT_XOR of md5-derived 60-bit values — order-independent and
# overflow-free at any row count (the SUM-of-hashes alternative
# overflows int64 at ~1e10 rows).
# ---------------------------------------------------------------------------
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
_PII_IP = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"


@_register(
    "docs_pii_scrub_stats",
    f"""
    WITH aug AS (
      SELECT doc_id, source,
             text || ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 (555) '
                  || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                  || CAST(1000 + doc_id % 9000 AS VARCHAR)
                  || ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST(doc_id % 250 AS VARCHAR) || '.'
               AS t
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, source, t,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                 '{_PII_PHONE}', '[PHONE]', 'g'),
               '{_PII_IP}', '[IP]', 'g') AS s,
             len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
             len(regexp_extract_all(
                 regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                 '{_PII_PHONE}')) AS n_phone,
             len(regexp_extract_all(
                 regexp_replace(
                   regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                   '{_PII_PHONE}', '[PHONE]', 'g'),
                 '{_PII_IP}')) AS n_ip
      FROM aug
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(n_ip) AS BIGINT) AS ips,
           CAST(SUM(length(t) - length(s)) AS BIGINT) AS chars_removed,
           CAST(BIT_XOR(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))
                AS BIGINT) AS scrub_xor
    FROM scrubbed GROUP BY source ORDER BY source
    """,
)
def docs_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) "),
        (F.lit(100) + F.col("doc_id") % 900).cast("string"),
        F.lit("-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" from 192.168."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
    )
    aug = docs.select("doc_id", "source", t.alias("t"))
    no_email = F.regexp_replace(F.col("t"), _PII_EMAIL, "[EMAIL]")
    no_phone = F.regexp_replace(no_email, _PII_PHONE, "[PHONE]")
    s = F.regexp_replace(no_phone, _PII_IP, "[IP]")
    scrubbed = aug.select(
        "source",
        "t",
        s.alias("s"),
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(no_email, F.lit(_PII_PHONE)).alias("n_phone"),
        F.regexp_count(no_phone, F.lit(_PII_IP)).alias("n_ip"),
    )
    h60 = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long")
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_email").cast("long").alias("emails"),
            F.sum("n_phone").cast("long").alias("phones"),
            F.sum("n_ip").cast("long").alias("ips"),
            F.sum(F.length("t") - F.length("s"))
            .cast("long")
            .alias("chars_removed"),
            F.bit_xor(h60).alias("scrub_xor"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# WARC INGESTION (round-8 continuation; sources/warc.py): pretraining
# corpora arrive as WARC (ISO 28500 / CommonCrawl) — this gates the
# REAL record parser end-to-end. Each doc becomes one in-plan WARC
# file holding a warcinfo + response + metadata record triplet
# (response body = the doc text's UTF-8 bytes, example.com target
# URIs, fixed WARC-Date), parsed back by the strict parser (version
# line, mandatory headers, byte-exact Content-Length framing, record
# separators — every byte of framing must be right or the gate
# fails). The oracle recomputes every per-type aggregate from the
# generation arithmetic: Content-Length sums via strlen (BYTES — the
# multi-byte zh/de text makes length() wrong here, a deliberate trap
# this oracle pins), and an order-independent BIT_XOR over
# md5-derived 60-bit body hashes proving the parser returned the
# exact body bytes (warcinfo's constant body folds to h·(n mod 2)).
# 100 TB: scan-stage parallel per WARC split, the CommonCrawl shape.
# ---------------------------------------------------------------------------
_WARCINFO_BODY = "software: epl-cas-etl-2026-spark\n"


@_register(
    "docs_warc_ingest_stats",
    f"""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5('{_WARCINFO_BODY[:-1]}' || chr(10)),
                   1, 15)) AS BIGINT) AS info_h,
             strlen('{_WARCINFO_BODY[:-1]}' || chr(10)) AS info_len
      ),
    base AS (SELECT doc_id, text, lang FROM documents)
    SELECT 'metadata' AS rec_type,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(strlen('lang=' || lang)) AS BIGINT) AS sum_len,
           CAST(BIT_XOR(CAST(('0x' || substr(md5('lang=' || lang), 1, 15))
                             AS BIGINT)) AS BIGINT) AS body_xor
    FROM base
    UNION ALL
    SELECT 'response',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(strlen(text)) AS BIGINT),
           CAST(BIT_XOR(CAST(('0x' || substr(md5(text), 1, 15))
                             AS BIGINT)) AS BIGINT)
    FROM base
    UNION ALL
    SELECT 'warcinfo',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) * (SELECT info_len FROM h) AS BIGINT),
           CAST(CASE WHEN COUNT(*) % 2 = 1
                     THEN (SELECT info_h FROM h) ELSE 0 END AS BIGINT)
    FROM base
    ORDER BY rec_type
    """,
)
def docs_warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.sources.warc import (
        build_warc_record,
        warc_records,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )

    def enc(it):
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d, text, lang in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"]
            ):
                d = int(d)
                common = {
                    "WARC-Date": "2026-01-01T00:00:00Z",
                }
                recs = [
                    build_warc_record(
                        {
                            "WARC-Type": "warcinfo",
                            "WARC-Record-ID": f"<urn:uuid:{3 * d:032x}>",
                            **common,
                        },
                        _WARCINFO_BODY.encode(),
                    ),
                    build_warc_record(
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:uuid:{3 * d + 1:032x}>",
                            "WARC-Target-URI": (
                                f"http://example.com/doc/{d}"
                            ),
                            **common,
                        },
                        str(text).encode("utf-8"),
                    ),
                    build_warc_record(
                        {
                            "WARC-Type": "metadata",
                            "WARC-Record-ID": f"<urn:uuid:{3 * d + 2:032x}>",
                            **common,
                        },
                        f"lang={lang}".encode(),
                    ),
                ]
                payloads.append(b"".join(recs))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    files = docs.mapInPandas(enc, "doc_id long, payload binary")
    recs = warc_records(files, id_col="doc_id", on_error="fail")
    return (
        recs.groupBy("rec_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum("content_length").cast("long").alias("sum_len"),
            F.bit_xor("body_h60").alias("body_xor"),
        )
        .orderBy("rec_type")
    )


# ---------------------------------------------------------------------------
# PERSISTED NSW-GRAPH SERVING (round-8 continuation): the PQ index
# pair (embedding_pq_index_build/serve) closed build-once/serve-many
# for the quantized family; this closes it for the GRAPH family — the
# last index the engine still rebuilt in-query per run. Same
# discipline end to end: the M-NN adjacency (banded-LSH candidates +
# connectivity ring, per-node top-M) is committed as a VersionedTable
# snapshot under a root keyed by a fingerprint of the embeddings
# parquet (regenerated data gets a NEW root — stale-index serving is
# structurally impossible), the build query certifies the READ-BACK
# artifact edge-for-edge against a fresh deterministic rebuild, and
# the serve query runs the batch beam search reading ONLY the
# persisted adjacency, gated on row-level agreement with the in-query
# fresh-build path. 100 TB: the adjacency is ~M rows/node (the only
# serve-time scan besides pruned id probes); build cost is paid once
# per corpus version; vacuum(keep_last=2) bounds disk.
# ---------------------------------------------------------------------------
_NSW_IDX = {"dim": 64, "m_neighbors": 8}


def _nsw_index_table(spark: SparkSession, sf_dir: str):
    import os as _os

    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    root = _index_scratch_root(
        spark, sf_dir, "embeddings", "nsw", _NSW_IDX, "epl_pq_index"
    )
    return VersionedTable(_os.path.join(root, "adjacency"))


def _nsw_index_build(spark: SparkSession, sf_dir: str):
    from epl_cas_etl_2026_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    graph = knn_graph(
        emb, dim=_NSW_IDX["dim"], m_neighbors=_NSW_IDX["m_neighbors"]
    )
    vt = _nsw_index_table(spark, sf_dir)
    vt.commit(graph)
    vt.vacuum(keep_last=2)
    return vt


def _nsw_index_ensure(spark: SparkSession, sf_dir: str):
    vt = _nsw_index_table(spark, sf_dir)
    if vt.latest_version() is None:
        return _nsw_index_build(spark, sf_dir)
    return vt


@_register(
    "embedding_nsw_index_build",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) AS BIGINT) AS n_adj_rows,
           CAST(0 AS BIGINT) AS readback_mismatches,
           CAST(0 AS BIGINT) AS degree_violations,
           true AS committed_ok
    FROM embeddings
    """,
)
def embedding_nsw_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    vt = _nsw_index_build(spark, sf_dir)
    back = vt.read(spark)

    def edge_list(g):
        return g.select(
            "vec_id", F.explode("neighbors").alias("e")
        ).select("vec_id", F.col("e.nb").alias("nb"), F.col("e.sim").alias("sim"))

    # artifact certification: the READ-BACK adjacency must equal a
    # fresh deterministic rebuild edge-for-edge (seeded LSH planes +
    # exact-cosine top-M with full tie rules make the graph a pure
    # function of the embeddings table)
    fresh = knn_graph(
        emb, dim=_NSW_IDX["dim"], m_neighbors=_NSW_IDX["m_neighbors"]
    )
    a = edge_list(back).withColumnRenamed("sim", "sim_a")
    b = edge_list(fresh).withColumnRenamed("sim", "sim_b")
    mism = a.join(b, ["vec_id", "nb"], "full_outer").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("sim_a").isNull()
                    | F.col("sim_b").isNull()
                    | (F.abs(F.col("sim_a") - F.col("sim_b")) > 1e-12),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("readback_mismatches")
    )
    deg = back.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.size("neighbors") > _NSW_IDX["m_neighbors"], 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("degree_violations"),
        F.count(F.lit(1)).cast("long").alias("n_adj_rows"),
    )
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    committed = vt.latest_version() is not None
    return (
        n_pts.crossJoin(deg)
        .crossJoin(mism)
        .select(
            "n_points",
            "n_adj_rows",
            "readback_mismatches",
            "degree_violations",
            F.lit(committed).alias("committed_ok"),
        )
    )


@_register(
    "embedding_nsw_index_serve",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(LEAST(16, COUNT(*)) AS BIGINT) AS n_queries,
           CAST(0 AS BIGINT) AS inquery_mismatches,
           CAST(0 AS BIGINT) AS self_violations,
           true AS all_returned_ok,
           true AS served_from_index
    FROM embeddings
    """,
)
def embedding_nsw_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.similarity import (
        graph_beam_search_batch,
        knn_graph,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    k, ef, max_hops, n_q = 10, 48, 8, 16
    vt = _nsw_index_ensure(spark, sf_dir)
    adjacency = vt.read(spark).localCheckpoint(eager=False)
    qrows = (
        emb.filter(F.col("vec_id") < n_q)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    if not qrows:
        raise ValueError(
            "nsw index serve needs query rows vec_id 0..15; none found"
        )
    qvecs = {r["vec_id"]: [float(x) for x in r["v"]] for r in qrows}
    # serve path: ONLY the persisted adjacency
    out, stats, _hops = graph_beam_search_batch(
        emb, adjacency, qvecs, k=k, ef=ef, max_hops=max_hops, entry_ids=(0,)
    )
    out = out.localCheckpoint(eager=False)
    # in-query reference path: fresh graph build + the same search
    fresh_graph = knn_graph(
        emb, dim=_NSW_IDX["dim"], m_neighbors=_NSW_IDX["m_neighbors"]
    ).localCheckpoint(eager=False)
    ref, ref_stats, _h2 = graph_beam_search_batch(
        emb, fresh_graph, qvecs, k=k, ef=ef, max_hops=max_hops,
        entry_ids=(0,),
    )
    mism = (
        out.select("q_id", "rank", "vec_id", "sim")
        .join(
            ref.select(
                "q_id",
                "rank",
                F.col("vec_id").alias("vec_id_ref"),
                F.col("sim").alias("sim_ref"),
            ),
            ["q_id", "rank"],
            "full_outer",
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("vec_id").isNull()
                        | F.col("vec_id_ref").isNull()
                        | (F.col("vec_id") != F.col("vec_id_ref"))
                        | (F.abs(F.col("sim") - F.col("sim_ref")) > 1e-12),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("inquery_mismatches")
        )
    )
    selfv = out.agg(
        F.coalesce(
            F.sum(F.when(F.col("q_id") == F.col("vec_id"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("self_violations")
    )
    returned = {
        r["q_id"]: r["n"]
        for r in out.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    all_ok = all(
        returned.get(q, 0)
        == min(k, s["n_visited"] - (1 if s["own_visited"] else 0))
        for q, s in stats.items()
    )
    n_pts = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        n_pts.crossJoin(mism)
        .crossJoin(selfv)
        .select(
            "n_points",
            F.lit(len(qvecs)).cast("long").alias("n_queries"),
            "inquery_mismatches",
            "self_violations",
            F.lit(bool(all_ok)).alias("all_returned_ok"),
            F.lit(vt.latest_version() is not None).alias(
                "served_from_index"
            ),
        )
    )


# ---------------------------------------------------------------------------
# REAL-GIF ROUND-TRIP under the hard gate (round-8 continuation;
# operators/gif.py): the fourth real image codec. Deterministic
# palette images (n_colors = 4 + d%13, palette channels and indices
# all closed-form in doc_id) are LZW-encoded in-plan — variable-width
# codes, CLEAR/EOI, sub-block framing — with 4-pass interlace on
# every doc_id % 4 == 0, then decoded by the real decoder. GIF is
# lossless on indexed pixels, so the oracle is the generation
# arithmetic itself (the PNG gate's strongest-form oracle): DuckDB
# recomputes Σ(299R + 587G + 114B) over generate_series from the same
# palette formulas. Exact integers end to end; no rounding model.
# doc_id < 512 bounds fixture generation only.
# ---------------------------------------------------------------------------
@_register(
    "docs_gif_roundtrip_stats",
    """
    WITH d AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(6 + doc_id % 11 AS BIGINT) AS w,
             CAST(6 + doc_id % 9 AS BIGINT) AS h,
             CAST(4 + doc_id % 13 AS BIGINT) AS nc
      FROM documents WHERE doc_id < 512
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h, d.nc,
             (d.doc_id + r.r * 5 + c.c * 3) % d.nc AS i
      FROM d
      JOIN generate_series(0, 13) AS r(r) ON r.r < d.h
      JOIN generate_series(0, 15) AS c(c) ON c.c < d.w
    ),
    per_doc AS (
      SELECT doc_id, w, h, nc,
             -- the decoder reports the GCT size, which the format
             -- pads to a power of two (4..16 -> 4/8/16)
             CASE WHEN nc <= 4 THEN 4
                  WHEN nc <= 8 THEN 8
                  ELSE 16 END AS nc_padded,
             SUM(299 * ((doc_id * 31 + i * 17) % 256)
                 + 587 * ((doc_id * 13 + i * 29) % 256)
                 + 114 * ((doc_id * 7 + i * 41) % 256)) AS luma_sum,
             COUNT(*) AS n_px
      FROM px GROUP BY doc_id, w, h, nc
    )
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS sum_width,
           CAST(SUM(h) AS BIGINT) AS sum_height,
           CAST(SUM(nc_padded) AS BIGINT) AS sum_colors,
           CAST(SUM(luma_sum) AS BIGINT) AS sum_luma,
           CAST(SUM(n_px) AS BIGINT) AS sum_px
    FROM per_doc GROUP BY 1 ORDER BY 1
    """,
)
def docs_gif_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.gif import (
        decode_gif_real,
        encode_gif,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") < 512)
    )

    def enc(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, nc = 6 + d % 11, 6 + d % 9, 4 + d % 13
                rr, cc = _np.mgrid[0:h, 0:w]
                idx = (d + rr * 5 + cc * 3) % nc
                pal = [
                    (
                        (d * 31 + i * 17) % 256,
                        (d * 13 + i * 29) % 256,
                        (d * 7 + i * 41) % 256,
                    )
                    for i in range(nc)
                ]
                payloads.append(
                    encode_gif(
                        w, h, indices=idx.astype(_np.uint8),
                        palette=pal, interlace=(d % 4 == 0),
                        comment="epl-cas-etl-2026-spark fixture",
                    )
                )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    enc_df = docs.mapInPandas(enc, "doc_id long, payload binary")
    dec = decode_gif_real(enc_df, id_col="doc_id", on_error="fail")
    return (
        dec.groupBy((F.col("id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum("n_colors").cast("long").alias("sum_colors"),
            F.sum("luma_sum").cast("long").alias("sum_luma"),
            F.sum("n_px").cast("long").alias("sum_px"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# ZIP INGESTION (round-8 continuation; sources/archive.py): the other
# container corpora arrive in, next to WARC — and unlike WARC the
# members are REALLY compressed (stdlib DEFLATE) and CRC-verified on
# read, so the gate proves decompression + integrity checking, not
# just framing. Each doc becomes an in-plan two-member archive
# (doc/<id>.txt = the text's UTF-8 bytes, meta/<id>.json = a lang
# record); the parser explodes members; aggregates group by the
# top-level directory. The oracle recomputes everything from
# generation arithmetic: byte sizes via strlen, plus the
# order-independent BIT_XOR over md5-derived 60-bit body hashes that
# pins the exact decompressed bytes. 100 TB: one archive per row,
# scan-stage parallel — the labeling-vendor-delivery shape.
# ---------------------------------------------------------------------------
@_register(
    "docs_zip_ingest_stats",
    """
    SELECT 'doc' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
           CAST(BIT_XOR(CAST(('0x' || substr(md5(text), 1, 15))
                             AS BIGINT)) AS BIGINT) AS body_xor
    FROM documents
    UNION ALL
    SELECT 'meta',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(strlen('{"lang":"' || lang || '"}')) AS BIGINT),
           CAST(BIT_XOR(CAST(('0x' || substr(
                 md5('{"lang":"' || lang || '"}'), 1, 15))
                             AS BIGINT)) AS BIGINT)
    FROM documents
    ORDER BY kind
    """,
)
def docs_zip_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.sources.archive import (
        build_zip,
        zip_members,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )

    def enc(it):
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d, text, lang in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"]
            ):
                d = int(d)
                payloads.append(
                    build_zip(
                        [
                            (f"doc/{d}.txt", str(text).encode("utf-8")),
                            (
                                f"meta/{d}.json",
                                ('{"lang":"' + str(lang) + '"}').encode(),
                            ),
                        ]
                    )
                )
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    files = docs.mapInPandas(enc, "doc_id long, payload binary")
    members = zip_members(files, id_col="doc_id", on_error="fail")
    return (
        members.groupBy(
            F.split(F.col("name"), "/").getItem(0).alias("kind")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("size").cast("long").alias("sum_bytes"),
            F.bit_xor("body_h60").alias("body_xor"),
        )
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# PERSISTED MINHASH DEDUP INDEX (round-9; closes the r8 verdict's last
# index-persistence asymmetry): the PQ and NSW ANN families got
# build-once/serve-many VersionedTable artifacts in round 8, but the
# text-dedup signature index — the artifact the daily-ingest dedup
# story at 100 TB actually revolves around — was still rebuilt
# in-query by docs_incremental_near_dup. Two gated queries close it:
#
#   * docs_dedup_index_build — minhash_signature_agg over the standing
#     corpus (doc_id % 10 <> 9, the same membership the incremental
#     gate uses) committed as a VersionedTable snapshot under a root
#     keyed by a fingerprint of documents.parquet (a regeneration gets
#     a NEW root instead of silently serving stale signatures). The
#     gated row certifies the ARTIFACT: indexed-corpus cardinality,
#     signature-row count read back from the snapshot, and a row-level
#     read-back-vs-fresh-recompute mismatch count across all 16 hash
#     columns (the persisted table must BE the signature index, not
#     plausible garbage).
#   * docs_dedup_index_serve — near_dup_pairs_incremental probing the
#     new batch (doc_id % 10 = 9) against ONLY the persisted
#     signatures; NO corpus re-shingling in the serve path. Gated
#     against the SAME SQL oracle as docs_incremental_near_dup, so
#     serve-from-artifact is pinned row-level equal to the in-query
#     path (both must hash-match the one spec).
#
# 100 TB: signatures are n_hashes longs (~128 B) per doc — the only
# corpus-wide serve-time scan; daily batches re-hash O(batch) text.
# Build cost is paid once per corpus version; vacuum(keep_last=2)
# bounds disk. Root follows the spark.epl.scratch.dir convention with
# the stable host-tempdir fallback (stable ACROSS driver processes —
# a later session serves what an earlier one built; cross-process
# reuse pinned by tests/test_dedup_index.py).
# ---------------------------------------------------------------------------
_DEDUP_IDX = {"n_hashes": 16, "band_size": 4, "shingle_n": 3, "threshold": 0.5}


def _dedup_index_root(spark: SparkSession, sf_dir: str) -> str:
    return _index_scratch_root(
        spark, sf_dir, "documents", "minhash", _DEDUP_IDX, "epl_dedup_index"
    )


def _dedup_index_table(spark: SparkSession, sf_dir: str):
    import os as _os

    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    return VersionedTable(
        _os.path.join(_dedup_index_root(spark, sf_dir), "signatures")
    )


def _dedup_corpus_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fresh signatures of the standing corpus — the build input and
    the certification comparand. Deterministic: md5-derived
    Kirsch-Mitzenmacher hashes, no seed state anywhere."""
    from epl_cas_etl_2026_spark.operators.dedup import minhash_signature_agg

    docs = load_table(spark, sf_dir, "documents")
    cfg = _DEDUP_IDX
    return minhash_signature_agg(
        docs.filter((F.col("doc_id") % 10) != 9),
        "doc_id",
        "text",
        cfg["n_hashes"],
        cfg["shingle_n"],
        use_md5=True,
    )


def _dedup_index_build(spark: SparkSession, sf_dir: str):
    vt = _dedup_index_table(spark, sf_dir)
    vt.commit(_dedup_corpus_sigs(spark, sf_dir))
    vt.vacuum(keep_last=2)
    return vt


def _dedup_index_ensure(spark: SparkSession, sf_dir: str):
    """Serve-side entry: reuse the committed artifact when present
    (build-once/serve-many); build on first touch. The root is
    fingerprint-keyed, so 'present' implies 'built from THIS data'."""
    vt = _dedup_index_table(spark, sf_dir)
    if vt.latest_version() is None:
        return _dedup_index_build(spark, sf_dir)
    return vt


@_register(
    "docs_dedup_index_build",
    """
    SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 10 <> 9) AS BIGINT)
             AS n_corpus_docs,
           CAST(COUNT(*) FILTER (
                  WHERE doc_id % 10 <> 9
                    AND len(string_split(text, ' ')) >= 3) AS BIGINT)
             AS n_sig_rows,
           CAST(0 AS BIGINT) AS reread_mismatches,
           true AS committed_ok
    FROM documents
    """,
)
def docs_dedup_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = _DEDUP_IDX
    vt = _dedup_index_build(spark, sf_dir)
    sigs_back = vt.read(spark)
    fresh = _dedup_corpus_sigs(spark, sf_dir)
    hcols = [f"h{j}" for j in range(cfg["n_hashes"])]
    fresh_r = fresh.select(
        "doc_id", *[F.col(h).alias(f"{h}_f") for h in hcols]
    )
    # artifact certification: the READ-BACK signatures must equal a
    # fresh recompute row-for-row across every hash column — catches a
    # torn/stale/reordered artifact, not just wrong cardinality
    diff = F.lit(False)
    for h in hcols:
        diff = (
            diff
            | F.col(h).isNull()
            | F.col(f"{h}_f").isNull()
            | (F.col(h) != F.col(f"{h}_f"))
        )
    mism = (
        sigs_back.join(fresh_r, "doc_id", "full_outer")
        .agg(
            F.coalesce(
                F.sum(F.when(diff, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("reread_mismatches")
        )
    )
    n_sig = sigs_back.agg(F.count(F.lit(1)).cast("long").alias("n_sig_rows"))
    n_corpus = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) != 9)
        .agg(F.count(F.lit(1)).cast("long").alias("n_corpus_docs"))
    )
    return (
        n_corpus.crossJoin(n_sig)
        .crossJoin(mism)
        .select(
            "n_corpus_docs",
            "n_sig_rows",
            "reread_mismatches",
            F.lit(vt.latest_version() is not None).alias("committed_ok"),
        )
    )


@_register("docs_dedup_index_serve", _NEARDUP_INCR_ORACLE)
def docs_dedup_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.dedup import (
        near_dup_pairs_incremental,
    )

    cfg = _DEDUP_IDX
    docs = load_table(spark, sf_dir, "documents")
    vt = _dedup_index_ensure(spark, sf_dir)
    # the serve path reads ONLY the persisted signature snapshot — the
    # standing corpus is never re-shingled here
    index_sigs = vt.read(spark)
    return near_dup_pairs_incremental(
        docs.filter((F.col("doc_id") % 10) == 9),
        index_sigs,
        docs,
        id_col="doc_id",
        text_col="text",
        threshold=cfg["threshold"],
        n_hashes=cfg["n_hashes"],
        band_size=cfg["band_size"],
        shingle_n=cfg["shingle_n"],
        use_md5=True,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# REAL MPEG-1 LAYER I SUBBAND DECODE under the hard gate (round-9;
# operators/mpeg1.py — the r8 codec-family pattern one format
# further): deterministic single-channel Layer I streams are built
# in-plan DIRECTLY from integer code streams (per doc d < 256, two
# frames; subband sb allocated iff (d+sb)%3 != 0 with nb = 2+((d+sb)%14)
# sample bits; scalefactor index 3*((d+7*sb+f)%11) — a multiple of 3,
# so sf = 2^(1-idx/3) is an exact power of two and the whole gate
# stays in integer arithmetic; codes (d*31+f*101+sb*12+j) % 2^nb),
# then decoded by the REAL decoder (syncword walk → header → bit
# allocation → scalefactors → nb-bit sample unpack → exact
# requantization numerators). The oracle REPLAYS THE FIXTURE FORMULAS
# AND THE REQUANTIZATION ARITHMETIC in SQL — every bit the decoder
# unpacks must reproduce the generating formula for the hash to
# match. sum_num_scaled = Σ sum_shift * 2^(13 - sfidx/3) is the
# requantized subband energy numerator at the common 2^12 scale
# (denominator 2^nb - 1 rides in the nb group key). PCM synthesis is
# HONESTLY STUBBED (the ISO Table 3-B.3 window is a printed normative
# table, unavailable here); decode is exact to the subband domain.
# doc_id < 256 bounds fixture generation only (sf-invariant gate,
# stays out of bench like the other codec fixtures).
# ---------------------------------------------------------------------------
@_register(
    "docs_mpeg1_subband_stats",
    """
    WITH d AS (
      SELECT CAST(doc_id AS BIGINT) AS d FROM documents WHERE doc_id < 256
    ),
    g AS (
      SELECT d, f.range AS f, sb.range AS sb,
             2 + ((d + sb.range) % 14) AS nb,
             3 * ((d + 7 * sb.range + f.range) % 11) AS sfidx
      FROM d, range(2) f, range(32) sb
      WHERE (d + sb.range) % 3 <> 0
    ),
    c AS (
      SELECT g.*,
             ((d * 31 + f * 101 + sb * 12 + j.range)
                % (CAST(1 AS BIGINT) << nb))
               - (CAST(1 AS BIGINT) << (nb - 1)) + 1 AS shift
      FROM g, range(12) j
    ),
    per AS (
      SELECT nb, d, f, sb, sfidx, CAST(SUM(shift) AS BIGINT) AS sum_shift
      FROM c GROUP BY nb, d, f, sb, sfidx
    )
    SELECT CAST(nb AS BIGINT) AS nb,
           CAST(COUNT(*) AS BIGINT) AS n_subband_frames,
           CAST(SUM(sum_shift) AS BIGINT) AS sum_shift_total,
           CAST(SUM(sum_shift * (CAST(1 AS BIGINT) << (13 - sfidx // 3)))
                AS BIGINT) AS sum_num_scaled
    FROM per GROUP BY nb ORDER BY nb
    """,
)
def docs_mpeg1_subband_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.mpeg1 import (
        decode_mpeg1_subbands_real,
        encode_mpeg1_l1,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") < 256)
    )

    def enc(it):
        import pandas as _pd

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for f in range(2):
                    alloc = [
                        0 if (d + sb) % 3 == 0 else 2 + ((d + sb) % 14)
                        for sb in range(32)
                    ]
                    sfidx = [
                        3 * ((d + 7 * sb + f) % 11) for sb in range(32)
                    ]
                    codes = [
                        [
                            (d * 31 + f * 101 + sb * 12 + j)
                            % (1 << alloc[sb])
                            if alloc[sb]
                            else 0
                            for j in range(12)
                        ]
                        for sb in range(32)
                    ]
                    frames.append(
                        {"alloc": alloc, "sfidx": sfidx, "codes": codes}
                    )
                payloads.append(encode_mpeg1_l1(frames))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    enc_df = docs.mapInPandas(enc, "doc_id long, payload binary")
    dec = decode_mpeg1_subbands_real(enc_df, id_col="doc_id", on_error="fail")
    return (
        dec.groupBy("nb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subband_frames"),
            F.sum("sum_shift").cast("long").alias("sum_shift_total"),
            F.sum(
                F.col("sum_shift")
                * F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(13 - (sfidx div 3) AS INT))"
                )
            )
            .cast("long")
            .alias("sum_num_scaled"),
        )
        .orderBy("nb")
    )


# ---------------------------------------------------------------------------
# DEDUP INDEX INCREMENTAL UPDATE (round-9, completes the daily-ingest
# loop): build → serve → FOLD THE BATCH IN. After a batch has been
# probed (docs_dedup_index_serve), production folds its signatures
# into the standing index so tomorrow's batch dedups against today's
# docs — an upsert of ~128 B/doc signature rows, never a corpus
# re-shingle. Here: the persisted corpus snapshot seeds a fresh
# working table (tempdir per run — version numbers stay a pure
# function of the inputs), the batch's signatures land via
# merge_commit, i.e. under the round-9 compare-and-swap commit (a
# concurrent writer would be rejected, not clobbered), and the gated
# row certifies the merged artifact against a FULL fresh recompute
# over corpus ∪ batch — row-level across all 16 hash columns.
# ---------------------------------------------------------------------------
@_register(
    "docs_dedup_index_update",
    """
    SELECT CAST(COUNT(*) FILTER (
             WHERE doc_id % 10 <> 9
               AND len(string_split(text, ' ')) >= 3) AS BIGINT)
             AS n_index_before,
           CAST(COUNT(*) FILTER (
             WHERE doc_id % 10 = 9
               AND len(string_split(text, ' ')) >= 3) AS BIGINT)
             AS n_batch_sigs,
           CAST(COUNT(*) FILTER (
             WHERE len(string_split(text, ' ')) >= 3) AS BIGINT)
             AS n_index_after,
           CAST(1 AS BIGINT) AS merged_version,
           CAST(0 AS BIGINT) AS recompute_mismatches
    FROM documents
    """,
)
def docs_dedup_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from epl_cas_etl_2026_spark.operators.dedup import minhash_signature_agg
    from epl_cas_etl_2026_spark.sources.versioned import VersionedTable

    cfg = _DEDUP_IDX
    docs = load_table(spark, sf_dir, "documents")
    base_vt = _dedup_index_ensure(spark, sf_dir)
    base = base_vt.read(spark)
    batch_sigs = minhash_signature_agg(
        docs.filter((F.col("doc_id") % 10) == 9),
        "doc_id",
        "text",
        cfg["n_hashes"],
        cfg["shingle_n"],
        use_md5=True,
    )
    tmp = _tempfile.mkdtemp(prefix="dedup_index_update_")
    try:
        work = VersionedTable(_os.path.join(tmp, "signatures"))
        work.commit(base, expected_version=-1)
        n_before = work.read(spark).count()
        merged_version = work.merge_commit(batch_sigs, "doc_id", spark)
        merged = work.read(spark)
        n_after = merged.count()
        n_batch = batch_sigs.count()
        # certification: the merged artifact must equal a FULL fresh
        # recompute over corpus ∪ batch, row-level, all hash columns
        fresh = minhash_signature_agg(
            docs, "doc_id", "text", cfg["n_hashes"], cfg["shingle_n"],
            use_md5=True,
        )
        hcols = [f"h{j}" for j in range(cfg["n_hashes"])]
        fresh_r = fresh.select(
            "doc_id", *[F.col(h).alias(f"{h}_f") for h in hcols]
        )
        diff = F.lit(False)
        for h in hcols:
            diff = (
                diff
                | F.col(h).isNull()
                | F.col(f"{h}_f").isNull()
                | (F.col(h) != F.col(f"{h}_f"))
            )
        mism = (
            merged.join(fresh_r, "doc_id", "full_outer")
            .agg(
                F.coalesce(F.sum(F.when(diff, 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias("m")
            )
            .collect()[0]["m"]
        )
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(n_before),
                int(n_batch),
                int(n_after),
                int(merged_version),
                int(mism),
            )
        ],
        "n_index_before long, n_batch_sigs long, n_index_after long, "
        "merged_version long, recompute_mismatches long",
    )


# ---------------------------------------------------------------------------
# GOPHER REPETITION FILTERS (round-9; Rae et al. 2021 "Scaling
# Language Models: ... Gopher", Table A1 — the published
# repetition-removal rules every large pretraining pipeline applies
# before training; public method). The corpus text is a single-line
# word stream, so the two n-gram rules apply (the line/paragraph
# variants are degenerate here): a document is flagged when
#
#   * top-2-gram coverage  — characters attributable to the MOST
#     FREQUENT word 2-gram, count * (len(w1)+len(w2)+1), as a
#     fraction of total word characters+joins — exceeds 0.20, or
#   * duplicate-5-gram coverage — characters of word positions lying
#     inside ANY 5-gram that occurs >= 2 times in the document
#     (position-union semantics, each character counted once) —
#     exceeds 0.15.
#
# Both coverages are exact integer millis ((1000*x) div chars), so
# the gate is float-free. Distributed shape: one explode to
# (doc, pos, word); 2-/5-grams via lead() over the doc-partitioned
# position window; gram counts via doc+gram-keyed groupBys; coverage
# union via sequence-explode + distinct — every shuffle is doc- or
# (doc,gram)-keyed, nothing all-pairs, nothing driver-side. The
# DuckDB oracle replays the identical definitions with list slicing
# + range joins.
# ---------------------------------------------------------------------------
@_register(
    "docs_gopher_repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang, w, len(w) AS nw,
             CAST(COALESCE(list_aggregate(
                    list_transform(w, x -> len(x)), 'sum'), 0) AS BIGINT)
               AS total_chars
      FROM toks
    ),
    g2 AS (
      SELECT doc_id, u.gram AS gram, u.glen AS glen FROM (
        SELECT doc_id,
               unnest([{'gram': w[i] || ' ' || w[i + 1],
                        'glen': len(w[i]) + len(w[i + 1]) + 1}
                       FOR i IN range(1, greatest(nw, 1))]) AS u
        FROM base)
    ),
    g2top AS (
      SELECT doc_id, cnt, glen FROM (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(MIN(glen) AS BIGINT) AS glen,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram ASC
               ) AS rn
        FROM g2 GROUP BY doc_id, gram
      ) WHERE rn = 1
    ),
    g5 AS (
      SELECT doc_id, u.p AS p, u.gram AS gram FROM (
        SELECT doc_id,
               unnest([{'p': i,
                        'gram': array_to_string(w[i : i + 4], ' ')}
                       FOR i IN range(1, greatest(nw - 3, 1))]) AS u
        FROM base)
    ),
    g5dup AS (
      SELECT doc_id, gram FROM g5
      GROUP BY doc_id, gram HAVING COUNT(*) >= 2
    ),
    cover AS (
      SELECT DISTINCT g5.doc_id, g5.p + o.range AS i
      FROM g5
      JOIN g5dup ON g5.doc_id = g5dup.doc_id AND g5.gram = g5dup.gram,
           range(5) o
    ),
    cov5 AS (
      SELECT b.doc_id,
             CAST(COALESCE(SUM(len(b.w[c.i])), 0) AS BIGINT)
               AS cov_chars
      FROM base b LEFT JOIN cover c ON b.doc_id = c.doc_id
      GROUP BY b.doc_id
    ),
    per_doc AS (
      SELECT b.lang,
             CASE WHEN t.doc_id IS NULL OR b.total_chars = 0 THEN 0
                  ELSE (1000 * t.cnt * t.glen) // b.total_chars
             END AS cov2_millis,
             CASE WHEN b.total_chars = 0 THEN 0
                  ELSE (1000 * c5.cov_chars) // b.total_chars
             END AS cov5_millis
      FROM base b
      LEFT JOIN g2top t ON b.doc_id = t.doc_id
      JOIN cov5 c5 ON b.doc_id = c5.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE cov2_millis > 200) AS BIGINT)
             AS flagged_top2gram,
           CAST(COUNT(*) FILTER (WHERE cov5_millis > 150) AS BIGINT)
             AS flagged_dup5gram,
           CAST(COUNT(*) FILTER (
                  WHERE cov2_millis > 200 OR cov5_millis > 150) AS BIGINT)
             AS n_removed,
           CAST(SUM(cov2_millis) AS BIGINT) AS sum_cov2_millis,
           CAST(SUM(cov5_millis) AS BIGINT) AS sum_cov5_millis
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def docs_gopher_repetition_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("pos", "word"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = tok.select(
        "doc_id",
        "pos",
        "word",
        *[F.lead("word", k).over(w).alias(f"w{k}") for k in range(1, 5)],
    )
    totals = tok.groupBy("doc_id").agg(
        F.sum(F.length("word")).cast("long").alias("total_chars")
    )
    g2 = leads.filter(F.col("w1").isNotNull()).select(
        "doc_id",
        F.concat_ws(" ", "word", "w1").alias("gram"),
        (F.length("word") + F.length("w1") + 1).alias("glen"),
    )
    g2top = (
        g2.groupBy("doc_id", "gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("glen").cast("long").alias("glen"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("cnt"), F.asc("gram")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "cnt", "glen")
    )
    g5 = leads.filter(F.col("w4").isNotNull()).select(
        "doc_id",
        F.col("pos").alias("p"),
        F.concat_ws(" ", "word", "w1", "w2", "w3", "w4").alias("gram"),
    )
    g5dup = (
        g5.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("doc_id", "gram")
    )
    cover = (
        g5.join(g5dup, ["doc_id", "gram"])
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("p"), F.col("p") + 4)).alias("i"),
        )
        .distinct()
    )
    cov5 = (
        cover.join(
            tok.select("doc_id", F.col("pos").alias("i"), "word"),
            ["doc_id", "i"],
        )
        .groupBy("doc_id")
        .agg(F.sum(F.length("word")).cast("long").alias("cov_chars"))
    )
    per_doc = (
        docs.select("doc_id", "lang")
        .join(totals, "doc_id", "left")
        .join(g2top, "doc_id", "left")
        .join(cov5, "doc_id", "left")
        .select(
            "lang",
            F.expr(
                "CASE WHEN cnt IS NULL OR total_chars IS NULL"
                " OR total_chars = 0 THEN CAST(0 AS BIGINT)"
                " ELSE (1000 * cnt * glen) div total_chars END"
            ).alias("cov2_millis"),
            F.expr(
                "CASE WHEN total_chars IS NULL OR total_chars = 0"
                " THEN CAST(0 AS BIGINT)"
                " ELSE (1000 * COALESCE(cov_chars, 0)) div total_chars END"
            ).alias("cov5_millis"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("cov2_millis") > 200, 1).otherwise(0))
            .cast("long")
            .alias("flagged_top2gram"),
            F.sum(F.when(F.col("cov5_millis") > 150, 1).otherwise(0))
            .cast("long")
            .alias("flagged_dup5gram"),
            F.sum(
                F.when(
                    (F.col("cov2_millis") > 200)
                    | (F.col("cov5_millis") > 150),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_removed"),
            F.sum("cov2_millis").cast("long").alias("sum_cov2_millis"),
            F.sum("cov5_millis").cast("long").alias("sum_cov5_millis"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# CCNET PERPLEXITY BUCKETS (round-9; Wenzek et al. 2020 "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data" —
# public method): per language, rank documents by LM perplexity and
# split into head / middle / tail terciles; pretraining pipelines keep
# head+middle or reweight by bucket. The LM is the repo's
# Jelinek-Mercer bigram (docs_bigram_lm_perplexity's scoring,
# identical formula and millibit quantization); bucket assignment is
# EXACT: per-lang row_number over (q, doc_id) — computed with
# operators/ranking.two_phase_grouped_row_number, NOT a per-lang
# window (few langs ⇒ a plain Window.partitionBy(lang) hands whole-
# corpus sorts to single reducers at 100 TB) — then
# bucket = (3·(rn−1)) div n, so terciles are integer-deterministic
# with doc_id tie-breaks. The oracle replays the LM and the ranking
# with window functions (DuckDB's engine can afford the plain window).
# ---------------------------------------------------------------------------
@_register(
    "docs_ccnet_perplexity_buckets",
    f"""
    WITH docs2 AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ), bg AS (
      SELECT doc_id, lang, u.p[1] AS w1, u.p[2] AS w2
      FROM (SELECT doc_id, lang,
                   unnest(list_zip(ws[1:len(ws) - 1], ws[2:len(ws)])) AS p
            FROM docs2) u
      WHERE u.p[1] IS NOT NULL AND u.p[2] IS NOT NULL
    ), uni AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(ws) AS word FROM docs2) GROUP BY word
    ), tot AS (
      SELECT SUM(c) AS n_uni FROM uni
    ), pair AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg GROUP BY w1, w2
    ), head AS (
      SELECT w1, SUM(c12) AS ch FROM pair GROUP BY w1
    ), terms AS ({_JM_Q30_DUCK_TERMS}
    ), perdoc AS (
      SELECT doc_id, lang, {_JM_Q30_DUCK_Q} AS q
      FROM bg JOIN terms USING (w1, w2)
      GROUP BY doc_id, lang
    ), ranked AS (
      SELECT lang, q,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM perdoc
    )
    SELECT lang,
           CASE (3 * (rn - 1)) // n WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q) AS BIGINT) AS sum_millibits,
           CAST(MIN(q) AS BIGINT) AS min_millibits,
           CAST(MAX(q) AS BIGINT) AS max_millibits
    FROM ranked GROUP BY lang, bucket ORDER BY lang, bucket
    """,
)
def docs_ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from epl_cas_etl_2026_spark.operators.ranking import (
        two_phase_grouped_row_number,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias(
            "ws"
        ),
    )
    docs = docs.localCheckpoint(eager=False)  # unigram + bigram consumers
    uni = (
        docs.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, greatest(size(ws) - 1, 0))"),
                    F.expr("slice(ws, 2, greatest(size(ws) - 1, 0))"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "lang",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
        )
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    bg = bg.localCheckpoint(eager=False)  # LM fit + scoring consumers
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pair = pair.localCheckpoint(eager=False)  # head counts + scoring
    head_t = pair.groupBy("w1").agg(F.sum("c12").alias("ch"))
    tot = uni.agg(F.sum("c").alias("n_uni"))
    # Q30 integer terms per DISTINCT bigram type; the per-doc score is
    # an exact BIGINT sum — partition-order-independent by construction
    # (round-9 verdict item 2: no float reduction ahead of the
    # millibit quantization boundary)
    terms = _jm_q30_spark_terms(
        pair.join(head_t, "w1")
        .join(uni.withColumnRenamed("word", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
    ).select("w1", "w2", "term_q")
    perdoc = (
        bg.join(terms, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(_jm_q30_spark_q().alias("q"))
    )
    # two consumers (ranker + per-lang counts): pin the scored frame so
    # the LM fit+score pipeline runs once, not twice
    perdoc = perdoc.localCheckpoint(eager=False)
    ranked = two_phase_grouped_row_number(
        perdoc, "lang", [F.col("q"), F.col("doc_id")], rn_col="rn"
    )
    n_per_lang = perdoc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        ranked.join(F.broadcast(n_per_lang), "lang")
        .withColumn(
            "bucket",
            F.expr(
                "CASE (3 * (rn - 1)) div n WHEN 0 THEN 'head'"
                " WHEN 1 THEN 'middle' ELSE 'tail' END"
            ),
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("q").cast("long").alias("sum_millibits"),
            F.min("q").cast("long").alias("min_millibits"),
            F.max("q").cast("long").alias("max_millibits"),
        )
        .orderBy("lang", "bucket")
    )
