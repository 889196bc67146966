"""Blocked fuzzy record linkage: edit-distance name matching without
the all-pairs cross join.

The reference matches catalogs by exact ident name or sky position
(lcc/entities/star.py:61-74); real catalog idents carry typos and
format drift, which needs approximate string matching.  The classic
scalable shape is block → candidate equi-join → exact verify:

* **Blocking**: two keys per name — its first ``p`` characters and its
  last ``p`` characters.  Any single edit (substitution/insert/delete)
  touches one end of the string, so for names longer than ``2p`` a
  distance-1 pair ALWAYS shares at least one of the two blocks (and
  distance-k pairs share one unless edits hit both ends); recall for
  the planted single-typo workload is exactly 1, asserted in tests.
* **Candidate join**: an equi-join on the block key — shuffle keyed by
  block, candidate count ∝ block occupancy, never |A|·|B|.
* **Verify**: exact ``levenshtein`` (same DP, same integers, in both
  engines) with Spark's threshold form, which early-exits the DP once
  the bound is exceeded — the verify cost per candidate is O(k·n), not
  O(n²).

Everything is built-in JVM SQL; the DuckDB oracle mirrors block keys,
distance and tie rules exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_name_pairs(
    a: DataFrame,
    b: DataFrame,
    name_col: str = "name",
    id_col: str = "star_id",
    max_dist: int = 2,
    prefix: int = 4,
    max_block_occupancy: int = 64,
) -> DataFrame:
    """(id_a, id_b, dist) for every cross-catalog name pair with edit
    distance ≤ ``max_dist``, via frequency-pruned prefix+suffix
    blocking.

    ``max_block_occupancy`` is the standard record-linkage frequency
    prune: a block whose occupancy exceeds the cap on EITHER side is
    dropped entirely (a shared catalog prefix like 'Cust' is the
    stopword of blocking — it pairs everything with everything).  A
    pair is still found through its OTHER block; recall 1 for edits
    outside the discriminative window is asserted in tests.  The cap
    also bounds the join's worst-case fan-out to cap² per block — the
    skew ceiling at any scale."""
    def keyed(df: DataFrame, side: str) -> DataFrame:
        n = F.col(name_col)
        out = df.select(
            F.col(id_col).alias(f"id_{side}"),
            n.alias(f"name_{side}"),
        )
        head = F.substring(F.col(f"name_{side}"), 1, prefix)
        # suffix start clamped to 1 so names shorter than the prefix
        # yield the whole string on BOTH engines (negative-start
        # substring semantics differ between Spark and DuckDB)
        tail = F.expr(
            f"substring(name_{side}, "
            f"greatest(length(name_{side}) - {prefix - 1}, 1), {prefix})"
        )
        return out.select(
            "*", F.explode(F.array(head, tail)).alias("_block")
        )

    ka, kb = keyed(a, "a"), keyed(b, "b")
    cap = max_block_occupancy
    allowed = (
        ka.groupBy("_block")
        .agg(F.count("*").alias("_na"))
        .filter(F.col("_na") <= cap)
        .join(
            kb.groupBy("_block")
            .agg(F.count("*").alias("_nb"))
            .filter(F.col("_nb") <= cap),
            "_block",
        )
        .select("_block")
    )
    cand = (
        ka.join(F.broadcast(allowed), "_block")
        .join(kb, "_block")
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.levenshtein(
        F.col("name_a"), F.col("name_b"), max_dist + 1
    )
    return (
        cand.withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )


def fuzzy_name_pairs_sql(
    a_sql: str,
    b_sql: str,
    max_dist: int = 2,
    prefix: int = 4,
    max_block_occupancy: int = 64,
) -> str:
    """DuckDB mirror of :func:`fuzzy_name_pairs` (same blocks, same
    occupancy prune, same distance — ``a_sql``/``b_sql`` must yield
    (star_id, name))."""
    cap = max_block_occupancy
    return f"""
WITH a0 AS (SELECT star_id AS id_a, name AS name_a FROM ({a_sql})),
b0 AS (SELECT star_id AS id_b, name AS name_b FROM ({b_sql})),
ka AS (
  SELECT id_a, name_a, substring(name_a, 1, {prefix}) AS block FROM a0
  UNION ALL
  SELECT id_a, name_a,
         substring(name_a, greatest(length(name_a) - {prefix - 1}, 1),
                   {prefix}) FROM a0
),
kb AS (
  SELECT id_b, name_b, substring(name_b, 1, {prefix}) AS block FROM b0
  UNION ALL
  SELECT id_b, name_b,
         substring(name_b, greatest(length(name_b) - {prefix - 1}, 1),
                   {prefix}) FROM b0
),
allowed AS (
  SELECT block FROM
    (SELECT block, count(*) AS na FROM ka GROUP BY block) x
    JOIN (SELECT block, count(*) AS nb FROM kb GROUP BY block) y
    USING (block)
  WHERE na <= {cap} AND nb <= {cap}
),
cand AS (
  SELECT DISTINCT id_a, name_a, id_b, name_b
  FROM ka JOIN allowed USING (block) JOIN kb USING (block)
)
SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= {max_dist}
"""
