"""Streaming session-concurrency — the ingest-time face of
``operators/rangejoin.session_concurrency_sweep``.

The batch sweep-line answers "how many observing sessions were active
each night" with ±1 boundary deltas and a running sum. As a stream the
same split falls out naturally:

- **unbounded side** (stateless + incremental): each arriving closed
  session explodes into its two boundary deltas (map-only, the SAME
  ceil-based rule as the batch operator), and a streaming aggregation
  folds them into per-day delta totals. State is one row per boundary
  DAY — survey-span-sized, not stream-sized — which is why
  ``complete`` output mode is honest here: the full aggregate table is
  bounded by the calendar, the classic bounded-cardinality streaming
  aggregate.
- **bounded side** (per micro-batch): the cumulative sum that turns
  deltas into concurrency runs inside ``foreachBatch`` over that
  bounded day table — densified to every night in the observed span so
  zero-coverage nights report 0 — and overwrites the serving copy.
  This is O(days) work per trigger, the same documented
  single-partition trade as the batch sweep's day-axis window.

Batch parity contract (tests/test_concurrency_stream.py): on a finite
stream the serving table equals ``session_concurrency_sweep`` on the
same sessions for every night both report, because the delta rule and
the running sum are the batch rule verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_STREAM_SCHEMA = "star_id long, t_start double, t_end double, n_obs long"


def session_stream(spark, sessions_dir: str) -> DataFrame:
    """File-source stream of closed observing sessions (json lines) —
    in production this is the output of ``sessionize_stream``."""
    return (
        spark.readStream.schema(SESSION_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(sessions_dir)
    )


def concurrency_deltas(sessions: DataFrame) -> DataFrame:
    """Map-only ±1 boundary explode — the batch sweep's exact rule:
    ``+1`` at ``ceil(t_start)`` (first covered integer night), ``-1``
    at ``ceil(t_end)`` (one past the last), sessions covering no
    integer night dropped up front. Stateless, so it runs identically
    on a stream or a batch frame."""
    d0 = F.ceil("t_start").cast("long")
    d1 = F.ceil("t_end").cast("long")
    return (
        sessions.filter(d0 < d1)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        d0.alias("day"),
                        F.lit(1).cast("long").alias("dn"),
                        F.col("n_obs").alias("dobs"),
                    ),
                    F.struct(
                        d1.alias("day"),
                        F.lit(-1).cast("long").alias("dn"),
                        (-F.col("n_obs")).alias("dobs"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
    )


def cumulate_deltas(day_deltas: DataFrame) -> DataFrame:
    """Bounded batch step: densify the per-day delta table to every
    night in its span and run the cumulative sum. Input cardinality is
    the day axis (survey-span), so the single-partition ordered window
    is bounded by the calendar — the same documented trade as the
    batch sweep."""
    span = day_deltas.select(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    grid = span.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
    )
    axis = (
        grid.join(day_deltas, "day", "left")
        .select(
            "day",
            F.coalesce("dn", F.lit(0)).cast("long").alias("dn"),
            F.coalesce("dobs", F.lit(0)).cast("long").alias("dobs"),
        )
    )
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return axis.select(
        "day",
        F.sum("dn").over(run).alias("n_active"),
        F.sum("dobs").over(run).alias("obs_in_flight"),
    )


def concurrency_query(
    spark, sessions_dir: str, out_dir: str, checkpoint_dir: str, **trigger
):
    """Wire the stream end-to-end: session files → boundary deltas →
    per-day streaming aggregate (complete mode, calendar-bounded
    state) → foreachBatch cumulative → parquet serving copy
    (snapshot, not a log), swapped in ATOMICALLY per trigger: the
    batch writes to a scratch path and a single os.replace-style
    rename publishes it, so a reader never observes a truncated table
    and a crash mid-write leaves the previous snapshot intact (r6
    advice item — overwrite-in-place had a visible partial-table
    window)."""
    deltas = concurrency_deltas(session_stream(spark, sessions_dir))
    agg = deltas.groupBy("day").agg(
        F.sum("dn").alias("dn"), F.sum("dobs").alias("dobs")
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        import os
        import shutil

        tmp = f"{out_dir.rstrip('/')}._staging_{_batch_id}"
        # crash-replay safety (r7 advice): if a previous attempt of
        # THIS batch id died mid-publish, its staging/old dirs may
        # still exist — `mode("overwrite")` rewrites the staging dir,
        # and the old dir must be cleared BEFORE the move-aside rename
        # (renaming onto a non-empty dir raises ENOTEMPTY and would
        # wedge the query until manual cleanup).
        cumulate_deltas(batch_df).write.mode("overwrite").parquet(tmp)
        old = f"{out_dir.rstrip('/')}._old_{_batch_id}"
        shutil.rmtree(old, ignore_errors=True)
        # publish: move the live dir aside (readers holding open file
        # handles keep a consistent view on POSIX), rename the staged
        # snapshot in, then drop the old copy.  Each step is a single
        # directory rename — a reader never observes a PARTIAL table,
        # though between the two renames there is a brief window where
        # the live path does not exist (a crash there leaves the
        # previous snapshot parked at the old path; the next replay of
        # the same batch id publishes a fresh snapshot, and the parked
        # copy is reaped by this batch's or a later batch's rmtree).
        # On local/HDFS-like stores rename is atomic; object stores
        # without atomic rename should version by batch id and flip a
        # pointer instead.
        if os.path.exists(out_dir):
            os.rename(out_dir, old)
        os.rename(tmp, out_dir)
        shutil.rmtree(old, ignore_errors=True)

    if not trigger:
        trigger = {"availableNow": True}
    return (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
