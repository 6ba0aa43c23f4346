"""Text-retrieval query shapes over the documents corpus: BM25 ranked
search and inverted-index (posting-list) construction — the retrieval
side of a training-data pipeline (dedup against eval sets, RAG corpus
serving, quality-weighted sampling all start from these).

Scale shapes (100 TB):

- BM25: query terms are filtered from the token stream BEFORE any
  shuffle, so the per-(doc, term) aggregate only ever shuffles rows
  that mention a query term (~|q| × hit-rate of the corpus, not the
  corpus). Document length is a pure per-row expression on the scan
  (no tokenize-shuffle); corpus stats (N, avgdl) and per-term document
  frequencies are 1-row / |q|-row broadcasts. One real shuffle joins
  tf to dl on doc_id; the top-k is TakeOrderedAndProject.
- Inverted index: one groupBy(word) with map-side combine; posting
  lists stay bounded here by restricting to the rarest terms (a real
  index build would write every posting list to a sink instead of
  returning it).

Cross-engine determinism: BM25 scores mix ln() with float division,
so the emitted score is quantized to integer millis via
FLOOR(x*1000 + 0.5) (the repo-wide cross-engine float rule, see
docs_unigram_surprisal); every other output column is integer/string
exact. avgdl is computed as exact-integer SUM(dl)/COUNT so both
engines divide identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# the standing test query: three mid-frequency corpus words
_BM25_TERMS = ("hash", "merge", "batch")
_K1 = 1.2
_B = 0.75


# ---------------------------------------------------------------------------
# BM25 top-k ranked retrieval. tf and df run over the term-filtered
# token stream only; dl is a per-row expression; (N, avgdl) and df are
# broadcast scalars; score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
# with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), quantized to millis.
# ---------------------------------------------------------------------------
@_register(
    "docs_bm25_topk",
    """
    WITH dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w <> '')) AS BIGINT) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word IN ('hash', 'merge', 'batch')
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY word
    )
    SELECT tf.doc_id,
           CAST(FLOOR(SUM(
             ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * (1.2 + 1)
             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS score_millis
    FROM tf
    JOIN df USING (word)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY score_millis DESC, tf.doc_id
    LIMIT 10
    """,
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        )
        .cast("bigint")
        .alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        # tf feeds both df and the score join; without the persist,
        # Catalyst duplicates the subtree and tokenizes the corpus
        # TWICE — at scale tf is tiny (query-term hits only), so
        # persisting it is the correct trade
        .persist()
    )
    df = tf.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (
            F.col("tf")
            + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.floor(F.sum(term_score) * 1000 + 0.5)
            .cast("bigint")
            .alias("score_millis")
        )
        .orderBy(F.desc("score_millis"), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Inverted-index construction for the corpus's rarest terms: posting
# lists (sorted doc ids) per word. The full-index shape is one
# map-side-combined groupBy(word) writing lists to a sink; here the
# returned slice is bounded to the 5 rarest words (count, then word for
# a total order) so the result is driver-safe. Posting lists are
# emitted as comma-joined sorted ids — order pinned on both engines.
# ---------------------------------------------------------------------------
@_register(
    "docs_inverted_index_rarest",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ), ranked AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_docs,
             string_agg(CAST(doc_id AS VARCHAR), ','
                        ORDER BY doc_id) AS postings
      FROM toks WHERE word <> ''
      GROUP BY word
    )
    SELECT word, n_docs, postings
    FROM ranked
    ORDER BY n_docs, word
    LIMIT 5
    """,
)
def docs_inverted_index_rarest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    return (
        toks.groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("doc_id"))), ","
            ).alias("postings"),
        )
        .orderBy("n_docs", "word")
        .limit(5)
    )
