"""Stetson J/K variability indices (Stetson 1996, PASP 108, 851) —
the declarative window/aggregate surface must agree with a direct
numpy evaluation, and the indices must separate correlated variables
from pure noise the way the paper's Fig. 2 describes."""

import numpy as np

from lightcurvesclassifier_spark.functions.curves import stetson_jk


def _numpy_stetson(t, m):
    order = np.lexsort((m, t))
    m = np.asarray(m, dtype=float)[order]
    n = m.size
    mean = m.mean()
    std = np.sqrt(((m - mean) ** 2).mean())
    d = np.sqrt(n / (n - 1.0)) * (m - mean) / std
    p = d[1:] * d[:-1]
    j = (np.sign(p) * np.sqrt(np.abs(p))).sum() / p.size
    k = (np.abs(d).mean()) / np.sqrt((d * d).mean())
    return j, k


def _rows(star_id, t, m):
    return [(star_id, float(ti), float(mi)) for ti, mi in zip(t, m)]


def test_stetson_matches_numpy(spark):
    rng = np.random.default_rng(23)
    t1 = np.sort(rng.uniform(0, 30, 200))
    rows = _rows(1, t1, 12 + 0.5 * np.sin(2 * np.pi * t1 / 3.0)
                 + rng.normal(0, 0.02, 200))
    t2 = np.sort(rng.uniform(0, 30, 150))
    rows += _rows(2, t2, 13 + rng.normal(0, 0.1, 150))
    obs = spark.createDataFrame(rows, "star_id long, t double, mag double")
    got = stetson_jk(obs).toPandas().set_index("star_id")
    for sid, (t, m) in [(1, (t1, None)), (2, (t2, None))]:
        mags = [r[2] for r in rows if r[0] == sid]
        ts = [r[1] for r in rows if r[0] == sid]
        j, k = _numpy_stetson(np.array(ts), np.array(mags))
        assert got.stetson_j[sid] == round(j, 6) or abs(
            got.stetson_j[sid] - j
        ) < 2e-6
        assert abs(got.stetson_k[sid] - k) < 2e-6


def test_stetson_degenerate_stars_emit_null(spark):
    """n=1 (undefined n/(n-1)) and zero-variance (0/0 δ) stars emit
    NULL J/K rather than NaN/Inf — the CASE-guard regression for the
    r4 advice item; a healthy star in the same frame stays finite."""
    rows = (
        [(1, 3.0, 12.5)]                                # single obs
        + [(2, float(t), 11.0) for t in range(6)]       # zero variance
        + _rows(3, np.arange(8.0), 12 + np.sin(np.arange(8.0)))
        # constant star whose power sums cancel to a NEGATIVE variance
        # (12.3 × 14 → (s2 − s1²/n)/n ≈ −3e−14): the guard must test
        # the variance, not sqrt of it — sqrt(neg) passes Spark's
        # `NaN > 0` and RAISES in DuckDB
        + [(4, float(t), 12.3) for t in range(14)]
    )
    obs = spark.createDataFrame(rows, "star_id long, t double, mag double")
    got = stetson_jk(obs).toPandas().set_index("star_id")
    assert got.stetson_j.isna()[1] and got.stetson_k.isna()[1]
    assert got.stetson_j.isna()[2] and got.stetson_k.isna()[2]
    assert got.stetson_j.isna()[4] and got.stetson_k.isna()[4]
    assert np.isfinite(got.stetson_j[3]) and np.isfinite(got.stetson_k[3])


def test_stetson_sql_mirror_survives_negative_variance(spark, duck):
    """The DuckDB mirror must not RAISE on a cancellation-negative
    variance (sqrt of a negative) — it emits NULL like the Spark side."""
    import pandas as pd

    from lightcurvesclassifier_spark.functions.curves import stetson_jk_sql

    pdf = pd.DataFrame(
        {
            "star_id": [4] * 14 + [3] * 8,
            "t": list(range(14)) + list(range(8)),
            "mag": [12.3] * 14
            + list(12 + np.sin(np.arange(8.0))),
        }
    )
    duck.register("_stetson_neg", pdf)
    out = (
        duck.execute(stetson_jk_sql("SELECT * FROM _stetson_neg"))
        .df().set_index("star_id")
    )
    assert pd.isna(out.stetson_j[4]) and pd.isna(out.stetson_k[4])
    assert np.isfinite(out.stetson_j[3])


def test_stetson_separates_signal_from_noise(spark):
    """Smooth periodic variation → J well above 0 (adjacent residuals
    correlate); white noise → J near 0; Gaussian K ≈ 0.798."""
    rng = np.random.default_rng(29)
    n = 1000
    t = np.sort(rng.uniform(0, 50, n))
    sine = 12 + 0.8 * np.sin(2 * np.pi * t / 5.0) + rng.normal(0, 0.02, n)
    noise = 12 + rng.normal(0, 0.3, n)
    obs = spark.createDataFrame(
        _rows(1, t, sine) + _rows(2, t, noise),
        "star_id long, t double, mag double",
    )
    got = stetson_jk(obs).toPandas().set_index("star_id")
    assert got.stetson_j[1] > 0.5
    assert abs(got.stetson_j[2]) < 0.1
    assert abs(got.stetson_k[2] - 0.798) < 0.05
    # sinusoid K → 2√2/π ≈ 0.9003
    assert abs(got.stetson_k[1] - 0.9003) < 0.05


def test_robust_outliers_flags_flares_not_threshold_inflation(spark):
    """Planted flares are counted, and because MAD has 50% breakdown,
    heavy flares do NOT inflate the threshold enough to hide each
    other (the failure mode of a mean/std clip)."""
    from lightcurvesclassifier_spark.functions.curves import robust_outliers

    rng = np.random.default_rng(37)
    n = 500
    t = np.sort(rng.uniform(0, 50, n))
    m = 12.0 + rng.normal(0, 0.05, n)
    flare_idx = [50, 150, 250, 350, 450]
    m[flare_idx] += 3.0  # five strong flares
    obs = spark.createDataFrame(
        [(1, float(ti), float(mi)) for ti, mi in zip(t, m)],
        "star_id long, t double, mag double",
    )
    out = robust_outliers(obs).collect()[0]
    assert out.n_obs == n
    assert abs(out.median_mag - 12.0) < 0.02  # flares don't move the median
    assert out.n_outliers >= 5  # every flare flagged (plus noise tail)
    assert out.n_outliers < 30
    # MAD tracks the 0.05 noise scale, not the flare amplitude
    assert out.mad < 0.08


def test_lag_correlation_periodic_vs_noise(spark):
    """A period-4-day sinusoid's daily-mean ACF peaks at lag 4 and dips
    negative at lag 2; white noise stays near zero at every lag."""
    from lightcurvesclassifier_spark.functions.curves import lag_correlation

    rng = np.random.default_rng(41)
    rows = []
    for d in range(120):           # one sample per day, 120 days
        for frac in (0.2, 0.7):    # two obs a day
            t = d + frac
            rows.append((1, t, 12 + np.sin(2 * np.pi * t / 4.0)))
            rows.append((2, t, float(12 + rng.normal(0, 1.0))))
    obs = spark.createDataFrame(
        [(s, float(t), float(m)) for s, t, m in rows],
        "star_id long, t double, mag double",
    )
    acf = lag_correlation(obs).toPandas()
    sine = acf[acf.star_id == 1].set_index("lag").acf
    noise = acf[acf.star_id == 2].set_index("lag").acf
    assert sine[4] > 0.9 and sine[8] > 0.9   # period and harmonic
    assert sine[2] < -0.9                     # anti-phase
    assert noise.abs().max() < 0.35           # white noise ~ 0
    # pair counts shrink by exactly one day per lag
    n = acf[acf.star_id == 1].set_index("lag").n_pairs
    assert n[1] == 119 and n[10] == 110
