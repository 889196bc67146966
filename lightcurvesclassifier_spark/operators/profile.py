"""Table profiling — the per-column data-quality sweep (count, nulls,
range, mean, quartiles) every ingestion pipeline runs before training.

One aggregation pass computes every statistic for every column (a
single scan, single reduce), then the wide row is exploded into the
long (column, stats) form. Quantiles here are EXACT (sort-based
``percentile``) so the DuckDB ``quantile_cont`` oracle can match
bit-for-bit; at 100 TB swap ``exact=False`` to use
``percentile_approx`` (t-digest sketch, mergeable, single pass,
bounded memory) — same schema, approximate values, no oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUARTILES = [0.25, 0.5, 0.75]


def numeric_profile(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Long-format profile: one row per column in ``cols``."""
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__n_null"),
            F.round(F.min(col), 6).alias(f"{c}__min"),
            F.round(F.max(col), 6).alias(f"{c}__max"),
            F.round(F.sum(col) / F.count(col), 6).alias(f"{c}__mean"),
            (
                F.percentile(col, F.lit(QUARTILES))
                if exact
                else F.percentile_approx(col, F.lit(QUARTILES))
            ).alias(f"{c}__q"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
                F.col(f"{c}__mean").alias("mean_v"),
                F.round(F.col(f"{c}__q")[0], 6).alias("p25"),
                F.round(F.col(f"{c}__q")[1], 6).alias("p50"),
                F.round(F.col(f"{c}__q")[2], 6).alias("p75"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def numeric_profile_sql(table_sql: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`numeric_profile` (exact quantiles)."""
    parts = [
        f"""
SELECT '{c}' AS col_name,
       count(*) AS n,
       count(*) - count({c}) AS n_null,
       round(min({c}), 6) AS min_v,
       round(max({c}), 6) AS max_v,
       round(sum({c}) / count({c}), 6) AS mean_v,
       round(quantile_cont({c}, 0.25e0), 6) AS p25,
       round(quantile_cont({c}, 0.5e0), 6) AS p50,
       round(quantile_cont({c}, 0.75e0), 6) AS p75
FROM t"""
        for c in cols
    ]
    return f"WITH t AS ({table_sql})" + " UNION ALL ".join(parts)
