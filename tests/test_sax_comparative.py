"""SAX + comparative kernels: mirrors the reference's semantic-ordering
test (test/stars_processing/test_comp_descriptors.py:11-41 — a
similar-shaped star must score LOWER dissimilarity than a
different-shaped one) plus word/MINDIST unit checks."""

import numpy as np
import pytest

from lightcurvesclassifier_spark.functions import sax as S

RNG = np.random.default_rng(7)


def _sine_curve(n=400, phase=0.0, noise=0.02):
    t = np.linspace(0, 40, n)
    return t, np.sin(t / 3 + phase) + RNG.normal(scale=noise, size=n)


def _noise_curve(n=400):
    t = np.linspace(0, 40, n)
    return t, RNG.normal(size=n)


def test_sax_word_basic():
    x = np.concatenate([np.zeros(50) - 5, np.zeros(50) + 5])
    word, scale = S.sax_word(x, 4, 4)
    assert word == "aadd"
    assert np.isclose(scale, np.sqrt(100 / 4))


def test_sax_word_boundary_letter():
    # value exactly on a breakpoint goes to the upper letter (strict <)
    beta = S.BREAKPOINTS[4]  # [-0.67, 0, 0.67]
    letters = np.searchsorted(beta, [0.0], side="right")
    assert letters[0] == 2  # 'c', not 'b'


def test_mindist_adjacent_letters_zero():
    assert S.mindist("ab", "bc", 10, 1.0) == 0.0
    assert S.mindist("aa", "cc", 10, 1.0) > 0


def test_mindist_symmetry_and_scaling():
    a, b = "acegi", "igeca"
    d1 = S.mindist(a, b, 10, 1.0)
    d2 = S.mindist(b, a, 10, 1.0)
    assert np.isclose(d1, d2)
    assert np.isclose(S.mindist(a, b, 10, 2.5), 2.5 * d1)


@pytest.mark.parametrize("slide", [None, 0.25])
def test_curves_shape_ordering(slide):
    t1, m1 = _sine_curve(phase=0.0)
    t2, m2 = _sine_curve(phase=0.1)
    t3, m3 = _noise_curve()
    similar = S.compare_curves_sax(t1, m1, t2, m2, 2.0, 10, slide=slide)
    different = S.compare_curves_sax(t1, m1, t3, m3, 2.0, 10, slide=slide)
    assert similar < different


def test_hist_shape_ordering():
    t1, m1 = _sine_curve()
    t2, m2 = _sine_curve(phase=0.3)
    t3, m3 = _noise_curve()
    similar = S.compare_hists_sax(t1, m1, t2, m2, bins=10, alphabet_size=10)
    different = S.compare_hists_sax(t1, m1, t3, m3, bins=10, alphabet_size=10)
    assert similar < different


def test_variogram_shape_ordering():
    t1, m1 = _sine_curve(noise=0.05)
    t2, m2 = _sine_curve(phase=0.2, noise=0.05)
    t3, m3 = _noise_curve()
    similar = S.compare_variograms_sax(t1, m1, t2, m2, bins=10, alphabet_size=10)
    different = S.compare_variograms_sax(t1, m1, t3, m3, bins=10, alphabet_size=10)
    assert similar < different


def test_comparative_operator_spark(spark):
    """Broadcast comparative join end-to-end on the events curves."""
    from lightcurvesclassifier_spark.operators.comparative import (
        comparative_scores,
        reduce_scores,
    )
    from lightcurvesclassifier_spark.sources import testdata
    from tests.conftest import SF_ORACLE

    curves = testdata.curves(spark, SF_ORACLE)
    templates = curves.filter(F_col_in(curves, [0, 1, 2]))
    scores = comparative_scores(
        curves, templates, "curves_shape", days_per_bin=2.0, alphabet_size=10,
        slide=0.25,
    )
    feat = reduce_scores(scores, "average").toPandas()
    n_stars = curves.count()
    assert len(feat) == n_stars
    assert feat["feature"].notna().all()
    assert (feat["feature"] >= 0).all()
    # best-n reduce: mean of 2 smallest ≤ mean of all
    best2 = reduce_scores(scores, "best2").toPandas().set_index("star_id").sort_index()
    avg = feat.set_index("star_id").sort_index()
    assert (best2["feature"] <= avg["feature"] + 1e-12).all()


def F_col_in(df, values):
    from pyspark.sql import functions as F

    return F.col("star_id").isin(values)


def test_degenerate_curves_dropped_not_crashed(spark):
    """A zero-timespan star crashed the hist kernel (empty value set →
    vals.min() ValueError killing the whole job) and a 1-obs star's
    empty variogram word scored 0.0 = 'perfect match' vs every
    template. Both now emit NULL words and drop out of the scores —
    matching the SQL mirrors, which emit no row for them."""
    from pyspark.sql import functions as F

    from lightcurvesclassifier_spark.operators.comparative import (
        comparative_scores,
    )

    rows = [
        (1, [float(t) for t in range(40)],
         [float(np.sin(t / 3.0)) for t in range(40)]),
        (2, [5.0, 5.0, 5.0], [1.0, 2.0, 3.0]),   # zero timespan
        (3, [7.0], [1.0]),                        # single point
    ]
    curves = spark.createDataFrame(
        rows, "star_id long, time array<double>, mag array<double>"
    )
    templates = curves.filter(F.col("star_id") == 1)
    for kind in ("hist_shape", "variogram_shape"):
        got = comparative_scores(
            curves, templates, kind, bins=10, alphabet_size=10
        ).collect()
        ids = {r.star_id for r in got}
        assert 1 in ids, kind
        assert 3 not in ids, kind          # no word → no score
        if kind == "variogram_shape":
            assert 2 not in ids            # no pairs with positive lag?
        else:
            assert 2 not in ids            # zero span → dropped
        assert all(r.score is not None for r in got), kind


def test_degenerate_corpus_engine_oracle_exact(spark):
    """Engine and DuckDB mirror agree EXACTLY on a corpus containing a
    zero-span star and a single-point star: both drop the degenerate
    stars and score the healthy ones identically."""
    import duckdb

    from pyspark.sql import functions as F

    from lightcurvesclassifier_spark.operators import comparative as C

    rows = []
    for t in range(40):
        rows.append((1, float(t), float(np.sin(t / 3.0))))
    rows += [(2, 5.0, 1.0), (2, 5.0, 2.0), (2, 5.0, 3.0), (3, 7.0, 1.0)]
    for t in range(40):
        rows.append((4, float(t), float(np.cos(t / 5.0))))
    obs = spark.createDataFrame(rows, "star_id long, t double, mag double")
    curves = (
        obs.groupBy("star_id")
        .agg(F.array_sort(F.collect_list(F.struct("t", "mag"))).alias("p"))
        .select(
            "star_id", F.col("p.t").alias("time"), F.col("p.mag").alias("mag")
        )
    )
    templates = curves.filter(F.col("star_id") == 1)

    con = duckdb.connect()
    con.execute("CREATE TABLE planted(star_id BIGINT, t DOUBLE, mag DOUBLE)")
    con.executemany("INSERT INTO planted VALUES (?,?,?)", rows)
    obs_sql = "SELECT star_id, t, mag FROM planted"

    for kind, sqlf, meth in [
        ("hist_shape", C.comparative_hist_sql, "closest"),
        ("variogram_shape", C.comparative_variogram_sql, "best2"),
    ]:
        sc = C.comparative_scores(
            curves, templates, kind, bins=10, alphabet_size=10
        )
        eng = sorted(
            (r.star_id, round(r.feature, 6))
            for r in C.reduce_scores(sc, meth).collect()
        )
        ora = sorted(
            (int(s), round(float(f), 6))
            for s, f in con.execute(
                sqlf(obs_sql, [1], bins=10, alphabet_size=10, meth=meth)
            ).fetchall()
        )
        assert eng == ora, kind
        assert [s for s, _ in eng] == [1, 4], kind  # 2 & 3 dropped
