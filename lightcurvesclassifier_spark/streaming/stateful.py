"""Custom stateful streaming operator: incremental per-star curve stats.

The reference has no streaming semantics (SURVEY.md §2.6) — its closest
shape is the ever-growing status ledger. This operator is the engine's
forward-looking streaming surface: as observations arrive unbounded,
each star's running photometric state (count, mean/std via power sums,
latest timestamp, outlier count) is maintained with
``applyInPandasWithState`` and emitted per micro-batch — the building
block for online anomaly alerts (a new observation deviating > kσ from
the star's running mean) without recomputing history.

State is O(1) per star (five scalars) — the 100 TB story: state size
scales with #stars, not #observations, and Spark shards it by the
group key across executors with checkpointed fault tolerance.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, s1 double, s2 double, t_max double, outliers long"
OUTPUT_SCHEMA = (
    "star_id long, n_obs long, mean_mag double, std_mag double, "
    "t_max double, outliers long"
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold the batch into the running power sums; count k-sigma outliers
    against the state *as of the batch's start* — the mean/std snapshot is
    taken once before the chunk loop, so the count is deterministic no
    matter how Arrow splits the batch into pandas chunks."""
    if state.exists:
        n, s1, s2, t_max, outliers = state.get
    else:
        n, s1, s2, t_max, outliers = 0, 0.0, 0.0, float("-inf"), 0

    k_sigma = 3.0
    snap_mean = snap_std = None
    if n >= 2:
        snap_mean = s1 / n
        var = s2 / n - snap_mean * snap_mean
        snap_std = math.sqrt(var) if var > 0 else 0.0
    for pdf in pdfs:
        mags = pdf["mag"].to_numpy(dtype=float)
        ts = pdf["t"].to_numpy(dtype=float)
        # a null/NaN mag must not reach the fold: s1 += NaN would
        # poison the CHECKPOINTED state permanently (every later
        # micro-batch reports NaN mean/std) — batch aggregates skip
        # nulls, so the running state must too
        keep = ~pd.isna(mags)
        if not keep.all():
            mags, ts = mags[keep], ts[keep]
        if snap_std:
            outliers += int((abs(mags - snap_mean) > k_sigma * snap_std).sum())
        n += len(mags)
        s1 += float(mags.sum())
        s2 += float((mags * mags).sum())
        if len(ts):
            t_max = max(t_max, float(ts.max()))

    state.update((n, s1, s2, t_max, outliers))
    mean = s1 / n if n else float("nan")
    var = s2 / n - mean * mean if n else float("nan")
    std = math.sqrt(var) if n and var > 0 else 0.0
    yield pd.DataFrame(
        [
            {
                "star_id": key[0],
                "n_obs": n,
                "mean_mag": mean,
                "std_mag": std,
                "t_max": t_max,
                "outliers": outliers,
            }
        ]
    )


def running_curve_stats(obs_stream: DataFrame) -> DataFrame:
    """obs stream (star_id, t, mag, …) → per-star running stats, one
    updated row per star per micro-batch it appears in."""
    from pyspark.sql import functions as F

    # JVM-side null guard (same poison-pill class as packing_stream):
    # a null star_id would make key=(None,), a null t would NaN t_max
    clean = obs_stream.filter(
        F.col("star_id").isNotNull()
        & F.col("t").isNotNull()
        & F.col("mag").isNotNull()
    )
    return clean.groupBy("star_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
