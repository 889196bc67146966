"""Time-series rollups over the observations stream: gap-based
sessionization (observing runs) and fixed-width time-bucket downsampling
(the hypertable/continuous-aggregate shape).

The reference's per-star processing always consumes whole curves
(lcc/entities/light_curve.py); these operators add the two rollups a
large time-series store runs *before* whole-curve work at 100 TB —
splitting a curve into observing nights and pre-aggregating onto a
coarse time grid — as single-shuffle window/aggregate plans.

Scale shape
-----------
Both operators shuffle once, on ``star_id``.  ``observing_sessions``
runs its two windows and the session aggregate under the same
``HashPartitioning(star_id)`` — the groupBy keys ``(star_id,
session_id)`` are clustered by the window partitioning, so Catalyst
inserts no second exchange.  ``downsample`` is a plain partial-agg →
final-agg on ``(star_id, band, bucket)`` with map-side combine.  No
Python anywhere; both plans are whole-stage-codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..sources import testdata


def observing_sessions(obs: DataFrame, gap_days: float = 1.0) -> DataFrame:
    """Split each star's time series into sessions separated by gaps
    longer than ``gap_days``; one row per (star, session) with its
    span and magnitude summary.

    The classic sessionization pair: a lag window marks session starts,
    a running sum numbers them, then a per-session aggregate.  Rows are
    ordered by ``(t, mag)`` within a star — the same deterministic
    tie-break as the detrend operator — so session boundaries are
    reproducible across engines and runs.
    """
    w = Window.partitionBy("star_id").orderBy("t", "mag")
    is_new = F.when(
        F.lag("t").over(w).isNull()
        | (F.col("t") - F.lag("t").over(w) > gap_days),
        1,
    ).otherwise(0)
    run = Window.partitionBy("star_id").orderBy("t", "mag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = obs.withColumn("session_id", F.sum(is_new).over(run))
    return (
        sess.groupBy("star_id", "session_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.round(F.min("t"), 6).alias("t_start"),
            F.round(F.max("t"), 6).alias("t_end"),
            F.round(F.avg("mag"), 6).alias("mean_mag"),
        )
    )


def observing_sessions_sql(gap_days: float = 1.0) -> str:
    """DuckDB mirror: same lag/running-sum windows, same (t, mag)
    tie-break, same rounding."""
    return f"""
WITH obs AS ({testdata.OBS_SQL}),
marked AS (
  SELECT star_id, t, mag,
         CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > {gap_days} THEN 1 ELSE 0 END AS is_new
  FROM obs
  WINDOW w AS (PARTITION BY star_id ORDER BY t, mag)
),
sessions AS (
  SELECT star_id, mag, t,
         sum(is_new) OVER (PARTITION BY star_id ORDER BY t, mag
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT star_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_obs,
       round(min(t), 6) AS t_start,
       round(max(t), 6) AS t_end,
       round(avg(mag), 6) AS mean_mag
FROM sessions GROUP BY star_id, session_id
"""


def downsample(obs: DataFrame, width_days: float = 10.0) -> DataFrame:
    """Fixed-width time-bucket rollup per (star, band): the continuous-
    aggregate / hypertable downsample.  ``bucket`` is the integer floor
    of ``t / width`` so bucket boundaries are engine-independent.

    At 100 TB this is the materialize-once rollup the interactive tier
    reads instead of raw points — a single partial+final aggregate,
    ~``width``× smaller output, partition-prunable if written with
    ``bucket`` as a partition column (operators/layout.py pattern).
    """
    bucket = F.floor(F.col("t") / F.lit(width_days)).cast("long")
    return (
        obs.groupBy("star_id", "band", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_obs"),
            F.round(F.avg("mag"), 6).alias("mean_mag"),
            F.round(F.min("mag"), 6).alias("min_mag"),
            F.round(F.max("mag"), 6).alias("max_mag"),
        )
    )


def downsample_sql(width_days: float = 10.0) -> str:
    """DuckDB mirror: same floor bucketing and rounding."""
    return f"""
WITH obs AS ({testdata.OBS_SQL})
SELECT star_id, band,
       CAST(floor(t / {width_days}) AS BIGINT) AS bucket,
       count(*) AS n_obs,
       round(avg(mag), 6) AS mean_mag,
       round(min(mag), 6) AS min_mag,
       round(max(mag), 6) AS max_mag
FROM obs GROUP BY star_id, band, bucket
"""
