"""Cone search: box prefilter + exact great-circle refine (+ nearest-1).

Reference semantics (lcc/db_tier/base_query.py:38-91):

- the coarse *box* ``[ra±δ]×[dec±δ]`` is pushed to the source
  (``_getRanges``, base_query.py:85-91 — note: no cos(dec) widening,
  faithful to the reference);
- the exact refine keeps stars with ``separation(center) < delta_deg``
  (strict), stars with no coordinates pass with distance ∞;
- ``nearest=True`` returns only the argmin-separation star.

Spark-first: the box is a pair of BETWEEN predicates Catalyst pushes into
the parquet scan (partition/row-group pruning at scale); the refine is a
deterministic column expression; nearest is a global ``ORDER BY sep
LIMIT 1`` (TakeOrderedAndProject — no full sort at scale), with
``star_id`` as the tie-break (the reference's np.argmin first-index rule
is list-order-dependent; documented divergence for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sky import separation_deg, separation_sql


def cone_search(
    stars: DataFrame,
    ra: float,
    dec: float,
    delta_deg: float,
    nearest: bool = False,
    prefilter_box: bool = True,
) -> DataFrame:
    """Stars within ``delta_deg`` of (ra, dec), with a ``sep_deg`` column.

    Coordinate-less stars (null ra/dec) pass with null separation,
    mirroring the reference's dist=∞ passthrough (base_query.py:73-75) —
    and never win ``nearest``.
    """
    out = stars
    coordless = F.col("ra_deg").isNull() | F.col("dec_deg").isNull()
    if prefilter_box:
        box = (
            F.col("ra_deg").between(ra - delta_deg, ra + delta_deg)
            & F.col("dec_deg").between(dec - delta_deg, dec + delta_deg)
        )
        out = out.filter(coordless | box)
    sep = separation_deg(
        F.lit(float(ra)), F.lit(float(dec)), F.col("ra_deg"), F.col("dec_deg")
    )
    out = out.withColumn("sep_deg", F.when(coordless, F.lit(None)).otherwise(sep))
    out = out.filter(coordless | (F.col("sep_deg") < F.lit(float(delta_deg))))
    if nearest:
        out = out.filter(~coordless).orderBy("sep_deg", "star_id").limit(1)
    return out


def cone_search_sql(
    table_sql: str,
    ra: float,
    dec: float,
    delta_deg: float,
    nearest: bool = False,
    extra_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`cone_search` (non-null-coordinate path)."""
    sep = separation_sql(repr(float(ra)), repr(float(dec)), "ra_deg", "dec_deg")
    base = (
        f"SELECT {extra_cols}, {sep} AS sep_deg FROM ({table_sql}) "
        f"WHERE ra_deg BETWEEN {ra - delta_deg!r} AND {ra + delta_deg!r} "
        f"AND dec_deg BETWEEN {dec - delta_deg!r} AND {dec + delta_deg!r}"
    )
    q = f"SELECT * FROM ({base}) WHERE sep_deg < {float(delta_deg)!r}"
    if nearest:
        q += " ORDER BY sep_deg, star_id LIMIT 1"
    return q
