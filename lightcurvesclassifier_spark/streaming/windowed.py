"""Event-time windowed aggregation with watermark — late-data handling
for streaming photometry.

The reference has no event-time semantics (SURVEY.md §2.6); this is the
engine's forward-looking surface for live survey feeds: per-star
tumbling-window curve statistics over *observation time*, with a
watermark bounding how late a sample may arrive and still be folded in.
State is bounded by (#stars × #open windows); the watermark lets Spark
drop window state once no in-flight data can still reach it — the
requirement for unbounded-stream aggregation at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_curve_stats(
    obs_stream: DataFrame,
    window_days: int = 7,
    watermark_days: int = 2,
    ts_col: str = "obs_ts",
) -> DataFrame:
    """Obs stream with an event-time timestamp column → per-(star,
    window) n/mean/std magnitude. Samples later than the watermark are
    dropped (their window may already be finalized); everything else is
    folded into the correct event-time window regardless of arrival
    order."""
    return (
        obs_stream.withWatermark(ts_col, f"{watermark_days} days")
        .groupBy(
            F.window(F.col(ts_col), f"{window_days} days").alias("w"),
            "star_id",
        )
        .agg(
            F.count("mag").alias("n_obs"),
            F.avg("mag").alias("mean_mag"),
            F.stddev_pop("mag").alias("std_mag"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "star_id",
            "n_obs",
            "mean_mag",
            "std_mag",
        )
    )
