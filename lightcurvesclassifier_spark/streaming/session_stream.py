"""Streaming observing-run sessionization — the ingest-time face of
``operators/rollup.observing_sessions``.

Spark-first shape: the built-in ``session_window`` (dynamic-gap session
aggregation) with a watermark.  State per (star, open session) is one
window — merged when late events bridge two sessions, closed and
emitted once the watermark passes the gap — so an unbounded photometry
feed sessionizes with state ∝ open sessions, not stream length.

Batch parity contract (tests/test_session_stream.py): run on a finite
stream with ``availableNow``, the emitted (star, session) spans and
counts equal the batch gap-rule applied to the same events, because
``session_window``'s rule IS the batch rule — a session extends while
successive events arrive within ``gap`` of the previous one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENT_STREAM_SCHEMA = "star_id long, mag double, event_time timestamp"


def event_stream(spark, events_dir: str) -> DataFrame:
    """File-source stream of observation batches (json lines with
    star_id/mag/event_time)."""
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )


def sessionize_stream(
    events: DataFrame, gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Unbounded observation stream → closed observing sessions:
    (star_id, session start/end, n_obs, mean_mag).

    ``withWatermark`` bounds state and defines when a session is final
    (no event within ``gap`` can still arrive once the watermark passes
    its end); ``session_window`` merges events into gap-separated
    sessions per star — all built-in, no custom state code."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.col("star_id"),
            F.session_window("event_time", gap).alias("w"),
        )
        .agg(
            F.count("*").alias("n_obs"),
            F.round(F.avg("mag"), 6).alias("mean_mag"),
        )
        .select(
            "star_id",
            F.col("w.start").alias("t_start"),
            F.col("w.end").alias("t_end"),
            "n_obs",
            "mean_mag",
        )
    )
