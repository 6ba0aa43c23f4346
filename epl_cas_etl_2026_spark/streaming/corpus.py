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


def incremental_near_dup_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
):
    """Streaming NEAR-dup corpus growth — the daily-ingest dedup loop
    as a Structured Stream: each micro-batch is MinHash-hashed once
    (O(batch)), banded against the PERSISTED signature index of
    everything kept so far (`near_dup_pairs_incremental`), and a new
    doc is dropped when it near-duplicates any lower-id doc (the
    greedy lowest-id-survivor rule of LSH dedup). Survivors append to
    the corpus AND their signatures append to the index — the index
    grows ~128 B/doc, so at 100 TB of text the per-batch corpus-side
    input is the slim signature table, never the corpus text.

    Exactly-once: the stream checkpoint prevents batch redelivery; the
    id-ordered drop rule makes reprocessing deterministic. Assumes
    ingest ids are monotonically increasing across batches (the normal
    ingest contract) — an out-of-order lower id would survive next to
    an already-kept higher near-duplicate.
    """
    import os

    from epl_cas_etl_2026_spark.operators.dedup import (
        minhash_signature_agg,
        near_dup_pairs_incremental,
    )

    raw = spark.readStream.schema(DOC_SCHEMA).json(landing_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        have_index = os.path.isdir(index_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_dir)
        )
        if have_index:
            index_sigs = spark.read.parquet(index_dir)
            texts = (
                spark.read.parquet(corpus_dir)
                .select("doc_id", "text")
                .unionByName(batch.select("doc_id", "text"))
            )
            pairs = near_dup_pairs_incremental(
                batch,
                index_sigs,
                texts,
                id_col="doc_id",
                text_col="text",
                threshold=threshold,
            )
            # drop a new doc iff something with a lower id is similar
            dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
            keep = batch.join(dropped, "doc_id", "left_anti")
        else:
            # first batch: in-batch near-dup via the same banding
            from epl_cas_etl_2026_spark.operators.dedup import near_dup_pairs

            pairs = near_dup_pairs(
                batch, "doc_id", "text", threshold=threshold
            )
            dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
            keep = batch.join(dropped, "doc_id", "left_anti")
        keep = keep.localCheckpoint(eager=True)
        keep.write.mode("append").parquet(corpus_dir)
        minhash_signature_agg(keep, "doc_id", "text").write.mode(
            "append"
        ).parquet(index_dir)

    return (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


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
