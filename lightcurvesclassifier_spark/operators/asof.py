"""As-of (point-in-time) join — match each fact row to the most recent
dimension row at or before its timestamp.

The canonical time-series join (market data, sensor calibration,
slowly-changing dimensions). Spark has no native ASOF JOIN operator, and
the naive range join (``l.t >= r.t`` then argmax) explodes to
|L|×|epochs-per-key| intermediate rows. The scalable re-expression is
the union + last-value window:

    tag both sides → union → per-key window ordered by (ts, side)
      → last(value, ignorenulls) carries the dimension forward
      → keep fact rows

ONE shuffle, keyed by the join key; no range blowup; within each key
the window is a streaming carry-forward, so memory is O(1) per
partition. Ordering the tag so dimension rows sort *before* fact rows
at equal timestamps gives inclusive (``>=``) semantics — the same
contract as DuckDB's ``ASOF LEFT JOIN``, which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    latest ``right`` row with ``right_ts <= left_ts`` on the same key
    (null when no such row exists).

    The carried unit is the whole matched dimension ROW (one struct, one
    ``last(ignorenulls)``): per-column fills would skip a matched
    epoch's legitimate NULL and could tear different columns across
    different epochs — both diverging from ASOF JOIN semantics."""
    clash = (set(value_cols) | {"_ts", "_side", "_dim"}) & set(left.columns)
    if clash:
        raise ValueError(
            f"left side already has columns {sorted(clash)}; rename them "
            "or pick different value_cols — silently overwriting would "
            "corrupt the fill"
        )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    # ASOF equality never matches NULL: a NULL-key or NULL-timestamp
    # dimension row must match NOTHING — but Window.partitionBy groups
    # NULL keys together and ascending order sorts NULL _ts FIRST, so
    # unfiltered they would be carried into (and before) every fact row
    # of their partition, where the DuckDB oracle returns NULL
    r = (
        right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            on,
            F.col(right_ts).alias("_ts"),
            F.struct(*value_cols).alias("_dim"),
        )
        .withColumn("_side", F.lit(0))
    )
    # allowMissingColumns: left rows get a typed NULL _dim
    unioned = l.unionByName(r, allowMissingColumns=True)
    # duplicate (key, ts) epochs: the struct itself is the final sort
    # key, so the carried row is the column-wise greatest duplicate —
    # deterministic across runs and partitionings (an under-specified
    # order would hand back whichever duplicate sorted last that run;
    # DuckDB's ASOF makes an arbitrary pick, so exact-parity inputs
    # must be epoch-unique — documented here, determinism is ours)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_dim").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_dim", F.last("_dim", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_side") == 1)
        .select("*", *[F.col(f"_dim.{vc}").alias(vc) for vc in value_cols])
        .drop("_ts", "_side", "_dim")
    )
