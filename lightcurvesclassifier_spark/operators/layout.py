"""Physical-layout operators for 100 TB scale: bucketing and salting.

Nothing here exists in the reference (its data fits in Python lists —
SURVEY.md §6); these are the layout tools a cluster deployment of the
same workload needs:

- **Bucketed star tables**: `observations`/`stars` written bucketed and
  sorted by ``star_id`` join and aggregate WITHOUT a shuffle — the
  exchange happens once at write time and every downstream
  star-keyed operation (curve features, crossmatch ident side,
  searcher ledger) reuses it. This is the storage layout for the
  "repartition once, reuse across stages" rule.
- **Salted join**: when one join key dominates (a mega-star with 10⁸
  observations, a stopword shingle), AQE's skew split handles most
  cases; explicit salting is the deterministic fallback for the
  dimension-join shape — the big side's hot key is split across
  ``n_salts`` sub-keys, the small side is exploded to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "star_id",
    buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist a star-keyed table bucketed (and optionally sorted) by the
    key. Downstream equi-joins/aggregations on ``key`` between tables
    with the same bucket spec run shuffle-free (verified in
    tests/test_layout.py by asserting no Exchange in the join plan).

    ``path`` makes it an external table at that location (bucketing
    metadata requires the catalog, so this is ``saveAsTable``, not a
    bare parquet write)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant big ⋈ dim equi-join.

    The big side assigns each row a deterministic pseudo-random salt in
    [0, n_salts); the dim side is exploded n_salts× (dim is small by
    contract). The join key becomes (key, salt), splitting any hot key
    across ``n_salts`` reducers. Result rows are identical to the plain
    join — only the partitioning changes.
    """
    salt = F.pmod(
        F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")
