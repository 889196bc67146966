"""Cone search: box prefilter + exact great-circle refine (+ nearest-1).

Reference semantics (lcc/db_tier/base_query.py:38-91):

- the coarse *box* is pushed to the scan. DIVERGENCE from the
  reference's naive ``[ra±δ]×[dec±δ]`` (_getRanges, base_query.py:85-91):
  here the RA side is wrap-aware and widened to the exact spherical
  bound, because our prefilter is an internal optimization that must be
  a SUPERSET of the refine — the reference's box silently drops stars
  at the 0/360 seam and at high declination;
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

import math

from pyspark.sql import DataFrame, functions as F

from .sky import separation_deg, separation_sql


def _ra_box(ra: float, dec: float, delta_deg: float):
    """Driver-side RA prefilter interval(s), guaranteed a SUPERSET of
    the exact refine (the reference's naive ``ra±δ`` box is not: it
    misses the 0/360 wraparound seam and narrows with cos(dec), both of
    which would make ``prefilter_box`` change results). Returns a list
    of (lo, hi) BETWEEN bounds — one interval, or two when the band
    crosses the seam — so the predicate stays parquet-pushable; None
    means RA is unconstrained (band reaches a pole)."""
    half = math.radians(delta_deg) / 2.0
    max_abs_dec = min(abs(dec) + delta_deg, 90.0)
    cosm = math.cos(math.radians(max_abs_dec))
    if cosm <= math.sin(half):
        return None
    band = math.degrees(2.0 * math.asin(min(1.0, math.sin(half) / cosm)))
    if band >= 180.0:
        return None
    lo, hi = (ra - band) % 360.0, (ra + band) % 360.0
    if lo <= hi:
        return [(lo, hi)]
    return [(0.0, hi), (lo, 360.0)]


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
        box = F.col("dec_deg").between(dec - delta_deg, dec + delta_deg)
        ra_ranges = _ra_box(ra, dec, delta_deg)
        if ra_ranges is not None:
            ra_pred = None
            for lo, hi in ra_ranges:
                p = F.col("ra_deg").between(lo, hi)
                ra_pred = p if ra_pred is None else (ra_pred | p)
            box = box & ra_pred
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
    """DuckDB mirror of :func:`cone_search` (non-null-coordinate path) —
    identical driver-side box literals, so both engines prefilter the
    same superset."""
    sep = separation_sql(repr(float(ra)), repr(float(dec)), "ra_deg", "dec_deg")
    ra_ranges = _ra_box(ra, dec, delta_deg)
    if ra_ranges is None:
        ra_sql = "TRUE"
    else:
        ra_sql = " OR ".join(
            f"ra_deg BETWEEN {lo!r} AND {hi!r}" for lo, hi in ra_ranges
        )
    base = (
        f"SELECT {extra_cols}, {sep} AS sep_deg FROM ({table_sql}) "
        f"WHERE ({ra_sql}) "
        f"AND dec_deg BETWEEN {dec - delta_deg!r} AND {dec + delta_deg!r}"
    )
    q = f"SELECT * FROM ({base}) WHERE sep_deg < {float(delta_deg)!r}"
    if nearest:
        q += " ORDER BY sep_deg, star_id LIMIT 1"
    return q
