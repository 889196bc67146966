"""Skew-resistant aggregation — explicit two-stage salting for hot keys.

SCOPE (important): for algebraic aggregates Spark's hash aggregate
already does map-side partial aggregation, so even a pathologically hot
key sends at most one partial row per map task to its reducer — the
direct one-shuffle plan is usually the right one, and this operator's
second Exchange is pure overhead there. The explicit salted layout
earns its keep in the cases partial aggregation does NOT cover:

- partial aggregation skipped or degraded (AQE's
  ``spark.sql.aggregate.partialAggregationSkipping`` on near-unique
  first stages; hash-map eviction under memory pressure emitting many
  partially-combined runs per key);
- per-key state too wide to carry through a map-side combine (sketches,
  large buffers) where stage-1 reduction must happen on reducers;
- as the deterministic two-stage template when the layout itself must
  be pinned (the regression-tested shape here).

Only algebraic aggregates (sum, count, min, max, and anything derivable
— mean, variance via power sums) can be salted this way. Results are
IDENTICAL to the direct aggregation (the tests pin this); only the
physical shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum_count(
    df: DataFrame,
    key: str,
    value: Column | str,
    n_salt: int = 16,
) -> DataFrame:
    """``groupBy(key).agg(sum(value), count(*))`` with a salted
    two-stage plan: stage 1 groups on (key, salt) — the hot key's rows
    spread over ``n_salt`` reducers — stage 2 merges the ≤``n_salt``
    partials per key. Returns (key, sum_v, n)."""
    v = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    partial = (
        df.select(F.col(key), v.alias("_v"), salt.alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_ps"), F.count("*").alias("_pn"))
    )
    return partial.groupBy(key).agg(
        F.sum("_ps").alias("sum_v"), F.sum("_pn").alias("n")
    )
