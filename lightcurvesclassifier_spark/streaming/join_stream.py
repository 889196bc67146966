"""Watermarked stream-stream join — live observations enriched with
the calibration events that precede them.

The last Structured-Streaming surface the engine exposes: two unbounded
streams joined on key + event-time range. Spark buffers each side's
rows in state only until the other side's watermark passes the join
window, so state is bounded by (rate × window), not stream length —
the requirement for an unbounded ⋈ unbounded plan.

Semantics here mirror the batch as-of family (operators/asof.py) in
its windowed form: an observation picks up every calibration of its
star from the preceding ``tolerance`` — the downstream consumer
reduces to the latest one exactly as the batch as-of join does. Batch
parity (same join condition on the concatenated inputs) is pinned in
tests/test_join_stream.py — the join condition is pure key+timestamp
comparison, so stream and batch agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CALIB_STREAM_SCHEMA = "star_id long, gain double, calib_time timestamp"
OBS_JOIN_SCHEMA = "star_id long, mag double, event_time timestamp"


def calib_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CALIB_STREAM_SCHEMA).json(path)


def obs_join_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(OBS_JOIN_SCHEMA).json(path)


def _join_cond(tolerance_hours: int):
    return (
        (F.col("o.star_id") == F.col("c.star_id"))
        & (F.col("o.event_time") >= F.col("c.calib_time"))
        & (
            F.col("o.event_time")
            <= F.col("c.calib_time")
            + F.expr(f"INTERVAL {tolerance_hours} HOURS")
        )
    )


def enriched_obs(
    obs: DataFrame,
    calib: DataFrame,
    tolerance_hours: int = 6,
    watermark: str = "1 hour",
) -> DataFrame:
    """Each observation × every calibration of its star within the
    preceding ``tolerance_hours``. Works identically on static frames
    (the batch parity twin) and on watermarked streams, where the
    range condition lets Spark expire both sides' buffered state."""
    if obs.isStreaming:
        obs = obs.withWatermark("event_time", watermark)
    if calib.isStreaming:
        calib = calib.withWatermark("calib_time", watermark)
    j = obs.alias("o").join(calib.alias("c"), _join_cond(tolerance_hours))
    return j.select(
        F.col("o.star_id").alias("star_id"),
        F.col("o.event_time").alias("event_time"),
        F.col("o.mag").alias("mag"),
        F.col("c.calib_time").alias("calib_time"),
        F.col("c.gain").alias("gain"),
    )
