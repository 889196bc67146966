"""Crossmatch zone-join semantics, including the near-pole edge case."""

import math

from lightcurvesclassifier_spark.operators.crossmatch import crossmatch


def test_near_pole_pair_survives_ra_prefilter(spark):
    """At |dec| > 89.9 the RA spread of a genuinely matching pair can
    exceed eps/cos(89.9); the prefilter must not drop it (regression:
    the clamped cosine silently filtered such pairs)."""
    eps = 0.000138  # 0.5 arcsec, the reference's EPS
    dec = 89.99995
    # Two points on the 89.9999-deg parallel, 90 deg apart in RA:
    # true separation ≈ sqrt(2) * 0.0001 deg ≈ 0.5 arcsec < eps... compute:
    # sep = 2*asin(sin(45deg)*cos(dec)) ~ sqrt(2)/2 * 2 * (9e-5 rad-ish)
    sep = math.degrees(
        2
        * math.asin(
            math.sin(math.radians(45.0)) * math.cos(math.radians(dec))
        )
    )
    assert sep < eps  # sanity: this IS a genuine match
    left = spark.createDataFrame(
        [(1, 10.0, dec)], "star_id long, ra_deg double, dec_deg double"
    )
    right = spark.createDataFrame(
        [(2, 100.0, dec)], "star_id long, ra_deg double, dec_deg double"
    )
    out = crossmatch(left, right, eps_deg=eps).collect()
    assert len(out) == 1
    assert out[0]["l_star_id"] == 1 and out[0]["r_star_id"] == 2


def test_mid_latitude_prefilter_still_prunes(spark):
    """Away from the poles the RA band still rejects far pairs before the
    haversine refine (same final answer, fewer refined rows)."""
    eps = 0.000138
    left = spark.createDataFrame(
        [(1, 10.0, 45.0)], "star_id long, ra_deg double, dec_deg double"
    )
    right = spark.createDataFrame(
        [(2, 10.00005, 45.0), (3, 11.0, 45.0)],
        "star_id long, ra_deg double, dec_deg double",
    )
    out = crossmatch(left, right, eps_deg=eps).collect()
    assert [r["r_star_id"] for r in out] == [2]


def test_ra_band_exact_near_pole(spark):
    """The eps/cos(dec) band approximation undershot the true RA spread
    2·asin(sin(eps/2)/cos(dec)) and dropped genuine matches just inside
    eps at high dec; the exact band keeps them. Also covers the
    beyond-pole case (synthetic jitter can push |dec| past 90, where
    cos goes non-positive and the band must degenerate to unbounded)."""
    import math

    from lightcurvesclassifier_spark.operators.crossmatch import crossmatch
    from lightcurvesclassifier_spark.schemas import CROSSMATCH_EPS_DEG as EPS

    dec = 89.9
    # RA spread in the gap between the old approximate band and the
    # true bound: the pair is within eps, the old band would drop it
    old_band = EPS / math.cos(math.radians(dec))
    true_band = math.degrees(
        2 * math.asin(math.sin(math.radians(EPS) / 2) / math.cos(math.radians(dec)))
    )
    dra = (old_band + true_band) / 2
    assert dra > old_band
    # haversine separation of the pair really is below eps
    hav = math.cos(math.radians(dec)) ** 2 * math.sin(math.radians(dra) / 2) ** 2
    assert math.degrees(2 * math.asin(math.sqrt(hav))) < EPS
    left = spark.createDataFrame(
        [(1, 10.0, dec), (3, 50.0, -90.0)],
        "star_id long, ra_deg double, dec_deg double",
    )
    right = spark.createDataFrame(
        [(2, 10.0 + dra, dec), (4, 120.0, -90.00008)],
        "star_id long, ra_deg double, dec_deg double",
    )
    got = crossmatch(left, right, EPS).toPandas()
    pairs = set(map(tuple, got[["l_star_id", "r_star_id"]].to_numpy()))
    assert (1, 2) in pairs  # near-pole pair inside eps survives the band
    assert (3, 4) in pairs  # beyond-pole pair (cos <= 0) not prefiltered


def test_cone_prefilter_is_superset(spark):
    """The RA prefilter box must never drop a star the exact refine
    keeps: 0/360 seam wrap and high-declination widening (the
    reference's naive ra±δ box fails both)."""
    from lightcurvesclassifier_spark.operators.cone_search import cone_search

    stars = spark.createDataFrame(
        [(1, 359.5, 0.0), (2, 10.0, 85.0)],
        "star_id long, ra_deg double, dec_deg double",
    )
    # seam: center at ra=1, star at 359.5 → true sep 1.5° < 2°
    got = cone_search(stars, 1.0, 0.0, 2.0).toPandas()
    assert 1 in set(got.star_id)
    # high dec: center (6, 85), star (10, 85): dRA=4° but true sep
    # ≈ 4·cos(85°) ≈ 0.35° < 0.5° — the naive box (ra±0.5) missed it
    got2 = cone_search(stars, 6.0, 85.0, 0.5).toPandas()
    assert 2 in set(got2.star_id)
    # prefilter on/off agree
    got2b = cone_search(stars, 6.0, 85.0, 0.5, prefilter_box=False).toPandas()
    assert set(got2.star_id) == set(got2b.star_id)
