"""Skew-resistant aggregation — salting for hot keys.

AQE's skew-join splitter handles skewed *joins*, but a skewed
``groupBy`` still funnels every row of a hot key through one reducer.
The classic fix is salting: spread each key over ``n_salt`` sub-keys,
partially aggregate, then merge the partials — two small shuffles
instead of one pathological one. Only algebraic aggregates (sum, count,
min, max, and anything derivable from them — mean, variance via power
sums) can be salted this way; that is exactly the set the engine's
curve/text aggregations use.

Results are IDENTICAL to the direct aggregation (the tests pin this);
the only change is the physical shuffle layout, so the operator is a
drop-in for any hot-keyed rollup (per-shingle counts under stopword
runs, per-star counts under survey hot spots).
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
