"""Range (interval-stab) join — the no-equi-key join Spark lacks.

The reference processes whole curves per star and never joins a point
set against an interval set (its nearest analog is the per-star session
split, lcc/db_tier/stars_provider.py's whole-curve reads).  At 100 TB a
time-series store needs exactly this shape constantly: "which intervals
cover this instant" with NO shared key — naively a cartesian
`BroadcastNestedLoopJoin` evaluating |points|·|intervals| predicates,
which is the canonical scale-killer.

Two scalable formulations, value-checked equal against one oracle:

``stab_join_binned``
    The bin-bucketed range join (the same trick behind Databricks'
    range-join optimization): quantize time into fixed ``bin_width``
    bins, give each point its single bin, explode each interval into the
    ≤ ``len/bin_width + 1`` bins it covers, equi-join on the bin, then
    refine with the exact ``lo <= t < hi`` predicate.  The big
    (interval) side is touched map-only with bounded fan-out; the
    point side — a day/grid axis, bounded by the survey span, not the
    data volume — broadcasts.  Pick ``bin_width`` ≈ the typical
    interval length so fan-out stays ~2×.

``session_concurrency_sweep``
    The sweep-line rewrite for the aggregate-only question ("how MANY
    intervals cover each instant", not which): ±1 boundary deltas, one
    tiny per-day aggregate, a cumulative sum over the bounded day axis.
    No join at all — the answer at any instant is the running sum of
    boundaries before it.  The cumulative window runs on ONE partition
    of the day axis (bounded by the survey span — thousands of rows at
    any corpus size), the same documented trade as score_quantiles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..sources import testdata
from .rollup import observing_sessions, observing_sessions_sql


def stab_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float = 4.0,
    broadcast_points: bool = True,
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= t < hi`` — via a binned
    equi-join, never a nested-loop cartesian.

    Output: the point columns + the interval columns (names must not
    collide).  Intervals with ``lo > hi`` are dropped (Spark's
    ``sequence`` would silently count DOWN through descending bounds
    and fabricate bins); zero-length intervals (``lo == hi``) survive
    the bin step but can never satisfy the half-open refine.
    """
    w = float(bin_width)
    if w <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    clash = {"_bin"} & (set(points.columns) | set(intervals.columns))
    if clash:
        # same contract as asof_join's reserved-name guard: silently
        # overwriting (and then dropping) a caller's _bin corrupts data
        raise ValueError(
            "stab_join_binned reserves the column name '_bin'; rename it "
            "on the input"
        )
    pb = points.withColumn(
        "_bin", F.floor(F.col(t_col) / F.lit(w)).cast("long")
    )
    if broadcast_points:
        pb = F.broadcast(pb)
    ib = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
                )
            ),
        )
    )
    return (
        ib.join(pb, "_bin")
        .filter((F.col(lo_col) <= F.col(t_col)) & (F.col(t_col) < F.col(hi_col)))
        .drop("_bin")
    )


def _day_grid(obs: DataFrame) -> DataFrame:
    """The distinct integer observing nights — bounded by the survey
    SPAN (days), not the data volume, hence always broadcastable."""
    return obs.select(
        F.floor("t").cast("long").alias("day"),
        F.floor("t").cast("double").alias("day_d"),
    ).distinct()


def session_concurrency(
    obs: DataFrame, gap_days: float = 1.0, bin_width: float = 4.0
) -> DataFrame:
    """Telescope load curve: for each observing night ``d``, how many
    per-star observing sessions were active at instant ``d`` (session
    ``t_start <= d < t_end``) and how many observations those sessions
    hold.  Nights no session covers still appear, with zeros.

    Plan: one star_id shuffle for the sessions (the ``observing_
    sessions`` windows), a map-only ≤ ``len/bin + 1`` bin explode of
    the session side, a broadcast hash join against the day grid, one
    partial+final aggregate, and a broadcast left join back to the
    grid.  No nested loop anywhere (plan-pinned in tests).
    """
    sessions = observing_sessions(obs, gap_days)
    days = _day_grid(obs)
    hits = stab_join_binned(
        days, sessions, "day_d", "t_start", "t_end", bin_width
    )
    act = hits.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("n_obs").alias("obs_in_flight"),
    )
    return days.join(F.broadcast(act), "day", "left").select(
        "day",
        F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
        F.coalesce("obs_in_flight", F.lit(0)).cast("long").alias("obs_in_flight"),
    )


def session_concurrency_sweep(
    obs: DataFrame, gap_days: float = 1.0
) -> DataFrame:
    """Identical output to :func:`session_concurrency`, computed
    join-free by sweep-line: each session contributes ``+1`` at
    ``ceil(t_start)`` (its first covered integer night) and ``-1`` at
    ``ceil(t_end)`` (one past its last — for integer and non-integer
    ends alike), deltas aggregate per day, and a cumulative sum over
    the day axis is the concurrency.  Sessions covering no integer
    night (``ceil(t_start) == ceil(t_end)``, e.g. zero-length) cancel
    and are dropped up front.
    """
    sessions = observing_sessions(obs, gap_days)
    d0 = F.ceil("t_start").cast("long")
    d1 = F.ceil("t_end").cast("long")
    deltas = (
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
    # fold the observed-day grid into the axis with zero deltas so the
    # running sum is defined exactly at every night we must report
    days = _day_grid(obs).select("day")
    axis = (
        deltas.unionByName(
            days.select(
                "day",
                F.lit(0).cast("long").alias("dn"),
                F.lit(0).cast("long").alias("dobs"),
            )
        )
        .groupBy("day")
        .agg(F.sum("dn").alias("dn"), F.sum("dobs").alias("dobs"))
    )
    # bounded single-partition window: the axis is the day grid plus
    # session boundary days — survey-span-sized, not corpus-sized
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = axis.select(
        "day",
        F.sum("dn").over(run).alias("n_active"),
        F.sum("dobs").over(run).alias("obs_in_flight"),
    )
    # LEFT join + coalesce: a NULL-t observation puts a NULL day in the
    # grid, which both the binned variant and the oracle report as
    # (NULL, 0, 0) — an inner join's NULL key would silently drop it
    return days.join(F.broadcast(cum), "day", "left").select(
        "day",
        F.coalesce(F.col("n_active"), F.lit(0)).cast("long").alias("n_active"),
        F.coalesce(F.col("obs_in_flight"), F.lit(0))
        .cast("long")
        .alias("obs_in_flight"),
    )


def session_concurrency_sql(gap_days: float = 1.0) -> str:
    """DuckDB mirror — the PLAIN range-predicate join (DuckDB plans it
    as an IEJoin), aggregated and left-joined back to the night grid.
    One oracle for both Spark formulations: the binned join and the
    sweep-line must both reproduce it exactly."""
    return f"""
WITH sess AS ({observing_sessions_sql(gap_days)}),
obs AS ({testdata.OBS_SQL}),
days AS (
  SELECT DISTINCT CAST(floor(t) AS BIGINT) AS day,
         CAST(floor(t) AS DOUBLE) AS day_d
  FROM obs
),
act AS (
  SELECT d.day, count(*) AS n_active,
         CAST(sum(s.n_obs) AS BIGINT) AS obs_in_flight
  FROM days d
  JOIN sess s ON s.t_start <= d.day_d AND d.day_d < s.t_end
  GROUP BY d.day
)
SELECT days.day,
       CAST(coalesce(act.n_active, 0) AS BIGINT) AS n_active,
       CAST(coalesce(act.obs_in_flight, 0) AS BIGINT) AS obs_in_flight
FROM days LEFT JOIN act USING (day)
"""
