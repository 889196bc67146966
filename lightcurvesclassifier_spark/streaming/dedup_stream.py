"""Streaming exact deduplication — the ingest-time face of
``operators/dedup.exact_dedup``.

A training-data pipeline dedups *as documents arrive*, not in one batch
pass: the stream keeps per-fingerprint state and emits only the first
document bearing each fingerprint. Spark-first shape:
``withWatermark`` + ``dropDuplicatesWithinWatermark`` on the content
fingerprint — state is one entry per distinct fingerprint SEEN WITHIN
THE WATERMARK HORIZON and is evicted once the watermark passes it.
(Plain ``dropDuplicates`` on a subset that excludes the event-time
column never evicts: its state grows with every distinct fingerprint
for the life of the query — the opposite of the 100 TB contract.)
Duplicates separated by more than the horizon can re-emit; the at-rest
dedup pass remains the backstop, exactly how production pipelines
layer the two. No custom state code: the built-in deduplication
operator IS the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DOC_STREAM_SCHEMA = "doc_id long, text string, event_time timestamp"


def doc_stream(spark, docs_dir: str) -> DataFrame:
    """File-source stream of document batches (json lines with
    doc_id/text/event_time) — the enqueue side of an ingest feed."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(docs_dir)
    )


def dedup_docs_stream(
    docs: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Unbounded doc stream → first-seen docs only.

    Fingerprint = md5 of the case-folded, whitespace-collapsed text
    (the exact_dedup identity). ``dropDuplicatesWithinWatermark`` keys
    state on the fingerprint and EVICTS each entry once the watermark
    passes its event time — the 100 TB story is state ∝ distinct
    fingerprints inside the horizon, not stream length (which plain
    ``dropDuplicates(["fingerprint"])`` would silently violate)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    fingerprinted = docs.withColumn("fingerprint", F.md5(norm))
    return fingerprinted.withWatermark(
        "event_time", watermark
    ).dropDuplicatesWithinWatermark(["fingerprint"])
