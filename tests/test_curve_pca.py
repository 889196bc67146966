"""CurveDescr red_dim (PCA) stage: stable dimensions, deterministic
outputs, decreasing explained variance — and independence from input
order (the statefulness fix vs the reference's fit-on-first-batch)."""

import numpy as np

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.ml.curve_pca import fit_curve_pca
from lightcurvesclassifier_spark.sources import testdata
from tests.conftest import SF_SMOKE


def test_curve_pca_shapes_and_variance(spark):
    curves = testdata.curves(spark, SF_SMOKE)
    model = fit_curve_pca(curves, bins=16, red_dim=3)
    out = model.transform(curves).collect()
    assert len(out) == curves.count()
    assert all(len(r["features"]) == 3 for r in out)
    ev = model.explained_variance
    assert len(ev) == 3 and all(ev[i] >= ev[i + 1] for i in range(2))


def test_curve_pca_order_independent(spark):
    curves = testdata.curves(spark, SF_SMOKE)
    m1 = fit_curve_pca(curves, bins=16, red_dim=2)
    m2 = fit_curve_pca(curves.orderBy(F.desc("star_id")), bins=16, red_dim=2)
    f1 = {r["star_id"]: r["features"] for r in m1.transform(curves).collect()}
    f2 = {r["star_id"]: r["features"] for r in m2.transform(curves).collect()}
    for sid in f1:
        np.testing.assert_allclose(f1[sid], f2[sid], atol=1e-8)
