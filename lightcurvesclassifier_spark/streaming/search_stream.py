"""Structured Streaming analog of the reference's distributed search.

The reference drains a long-running feed of queries through an rq/redis
work queue (lcc/systematic_search/stars_searcher.py:262-346,
systematic_search/worker.py:14-26), appending results to the status
ledger as workers finish. The reference defines no event-time semantics
— the stream is a work queue — so the natural Spark mapping is a
file-source stream of query batches drained by ``foreachBatch``
(SURVEY.md §2.6): each micro-batch runs the same declarative search
plan as the batch path (operators/searcher.py) and appends to the same
ledger, giving exactly-once per-batch semantics via the checkpoint
instead of redis bookkeeping.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from ..operators.searcher import QUERY_SCHEMA, run_search


def query_stream(spark: SparkSession, queries_dir: str) -> DataFrame:
    """File-source stream: each CSV dropped into ``queries_dir`` is a
    batch of (query_id, lo, hi) queries — the enqueue side of the
    reference's work queue."""
    return (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .csv(queries_dir)
    )


def start_search_stream(
    spark: SparkSession,
    queries_dir: str,
    features_fn: Callable[[], DataFrame],
    passed_ranges: Mapping[str, tuple[float | None, float | None]],
    ledger_path: str,
    checkpoint_dir: str,
):
    """Drain the query stream through the batch search plan.

    ``foreachBatch`` re-uses the exact batch pipeline — one code path for
    both execution modes; the checkpoint makes restarts resume from the
    last committed batch (the reference's redis status ledger role).

    Idempotent retries: each micro-batch OVERWRITES its own
    ``batch_id=N`` partition directory instead of appending — a batch
    replayed after a crash-before-checkpoint rewrites identical content
    rather than double-appending (plain append broke exactly-once).
    Read the ledger with ``spark.read.parquet(ledger_path)`` as before;
    batch_id surfaces as a partition column.
    """
    import os

    stream = query_stream(spark, queries_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ledger = run_search(features_fn(), batch_df, passed_ranges)
        ledger.write.mode("overwrite").parquet(
            os.path.join(ledger_path, f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
