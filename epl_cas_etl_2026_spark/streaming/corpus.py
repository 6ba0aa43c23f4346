"""Incremental clean-corpus builder under Structured Streaming.

The batch capstone (`docs_clean_corpus_pipeline`) composed exact
dedup → quality gate → split as one lazy plan. This is its streaming
form: a file stream over a landing dir of JSONL docs; each micro-batch
runs the SAME batch transforms via ``foreachBatch`` and appends only
NEW, quality-passing docs to the corpus sink (anti-join against sink
fingerprints via ``append_idempotent``). The stream checkpoint makes
batch redelivery impossible; the fingerprint anti-join makes
cross-batch duplicates impossible — together, exactly-once corpus
growth over an ever-arriving feed.

At 100 TB: the landing stream partitions by file; each batch's work
is the batch pipeline's (one dedup groupBy + gate filter); sink
anti-join pruned by `prune_col` when the feed carries event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.etl.pipeline import append_idempotent
from epl_cas_etl_2026_spark.functions.text import fingerprint, quality_class

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def clean_batch(docs: DataFrame) -> DataFrame:
    """The per-batch transform: fingerprint, in-batch exact dedup
    (keep lowest doc_id), quality gate. Pure function of the batch —
    reused verbatim by tests and the stream."""
    from pyspark.sql import Window

    fp = docs.withColumn("fp", fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return deduped.filter(quality_class(F.col("text")) == "keep")


def incremental_corpus_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
):
    """readStream(json docs) → foreachBatch(clean_batch + idempotent
    append keyed on the fingerprint). AvailableNow trigger: drain
    what's there, then stop — the daily-cron shape (T5)."""
    raw = spark.readStream.schema(DOC_SCHEMA).json(landing_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = clean_batch(batch_df)
        append_idempotent(spark, cleaned, corpus_dir, "fp")

    return (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
