"""CurveDescr's ``red_dim`` path: PAA curve vector → fitted PCA.

The reference fits a PCA on the FIRST batch of curves it sees and
reuses it silently for every later call
(lcc/stars_processing/descriptors/curve_descr.py:113-121) — hidden
state the survey flags as a hazard (SURVEY.md §4). Here the PCA is an
explicit fitted stage: ``fit_curve_pca`` returns a model object that is
applied with ``transform`` — same outputs, no order dependence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import kernels


def _paa_vector_udf(bins: int):
    """Per-star fixed-length CurveDescr vector: to_PAA to ``bins``, scale
    to unit range, mean-center (curve_descr.py:74-111); padded/truncated
    to exactly ``bins`` so the PCA input dimension is stable even for
    short curves (the reference would crash on those)."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def paa_vec(mag: pd.Series) -> pd.Series:
        out = []
        for arr in mag:
            v = kernels.to_paa(np.asarray(arr, dtype=float), bins)
            rng = v.max() - v.min()
            v = (v - v.min()) / rng if rng > 0 else np.zeros_like(v)
            v = v - v.mean()
            if len(v) < bins:
                v = np.pad(v, (0, bins - len(v)))
            out.append(v[:bins].tolist())
        return pd.Series(out)

    return paa_vec


class CurvePCAModel:
    """Fitted CurveDescr(red_dim) stage."""

    def __init__(self, pca_model, bins: int, red_dim: int):
        self.pca_model = pca_model
        self.bins = bins
        self.red_dim = red_dim

    @property
    def explained_variance(self) -> list[float]:
        return list(self.pca_model.explainedVariance)

    def transform(self, curves: DataFrame) -> DataFrame:
        """curves (star_id, time, mag) → (star_id, features array<double>
        of length red_dim)."""
        from pyspark.ml.functions import array_to_vector, vector_to_array

        vec = _paa_vector_udf(self.bins)
        with_vec = curves.select(
            "star_id", array_to_vector(vec(F.col("mag"))).alias("_paa")
        )
        reduced = self.pca_model.transform(with_vec)
        return reduced.select(
            "star_id", vector_to_array(F.col("_pca")).alias("features")
        )


def fit_curve_pca(curves: DataFrame, bins: int = 32, red_dim: int = 4) -> CurvePCAModel:
    """Fit the PCA on the full provided sample (one pass; MLlib computes
    the covariance eigendecomposition distributively)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    vec = _paa_vector_udf(bins)
    train = curves.select(array_to_vector(vec(F.col("mag"))).alias("_paa"))
    model = PCA(k=red_dim, inputCol="_paa", outputCol="_pca").fit(train)
    return CurvePCAModel(model, bins, red_dim)


# ---------------------------------------------------------------------------
# Fully-oracled d=3 red_dim path.
#
# PCA components carry a sign (and, on degenerate spectra, rotation)
# freedom, which is why the general path above is rows-only checked. For
# d=3 the eigen math has a closed form, so the basis can be pinned
# exactly on both engines: canonicalize each component's sign (the
# largest-|loading| coordinate made positive, first index on ties) and
# mirror the symmetric-3x3 trigonometric eigendecomposition in DuckDB
# SQL. MLlib's Breeze eigenvectors and the closed form agree to ~1e-14
# given a healthy eigen gap; outputs are rounded to 6 decimals.
#
# Projection follows MLlib PCA semantics: X · PC with NO mean centering
# of X at transform time (the covariance used for the basis is centered;
# the projection is not — same as pyspark.ml.feature.PCAModel.transform).


def _pivot3(cd: DataFrame) -> DataFrame:
    """curve_descr long format (star_id, bin, value) with bins=3 →
    one row per star with v0, v1, v2 (stars with <3 bins dropped)."""
    return (
        cd.groupBy("star_id")
        .agg(
            F.max(F.when(F.col("bin") == 0, F.col("value"))).alias("v0"),
            F.max(F.when(F.col("bin") == 1, F.col("value"))).alias("v1"),
            F.max(F.when(F.col("bin") == 2, F.col("value"))).alias("v2"),
            F.count("*").alias("_nb"),
        )
        .filter(F.col("_nb") == 3)
        .drop("_nb")
    )


def curve_pca3(curves: DataFrame) -> DataFrame:
    """CurveDescr red_dim with bins=3, k=2, exact-parity basis.

    Fit is MLlib PCA (distributed covariance eigendecomposition — the
    scan never leaves the cluster; only the 3x2 component matrix comes
    to the driver). The components are sign-canonicalized and the
    projection is emitted as a JVM-side expression, so scoring is pure
    whole-stage codegen."""
    import numpy as np
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    from ..functions.descriptors import curve_descr

    # the pivot subtree (collect_list sort + PAA windows + pivot
    # aggregate) feeds BOTH the PCA fit and the final projection scan;
    # lazy localCheckpoint materializes it once and — unlike cache(),
    # which pins blocks in the catalog until an explicit unpersist —
    # is released by the ContextCleaner when the DataFrame is GC'd
    piv = _pivot3(curve_descr(curves, bins=3)).localCheckpoint(eager=False)
    train = piv.select(array_to_vector(F.array("v0", "v1", "v2")).alias("_v"))
    model = PCA(k=2, inputCol="_v", outputCol="_p").fit(train)
    pc = np.array(model.pc.toArray())  # (3, 2), writable copy
    for k in range(2):
        j = int(np.argmax(np.abs(pc[:, k])))
        if pc[j, k] < 0:
            pc[:, k] = -pc[:, k]
    proj = [
        sum(F.col(f"v{i}") * F.lit(float(pc[i, k])) for i in range(3))
        for k in range(2)
    ]
    return piv.select(
        "star_id",
        F.round(proj[0], 6).alias("pc1"),
        F.round(proj[1], 6).alias("pc2"),
    )


def _eigvec3_sql(lam: str, out: str) -> str:
    """SQL computing the (normalized, sign-canonical) eigenvector of the
    covariance [c00 c01 c02; c01 c11 c12; c02 c12 c22] for eigenvalue
    column ``lam``: the largest-norm cross product of two rows of
    (C - λI) lies along the eigenvector; largest-|coordinate| positive
    (first index wins ties), matching numpy argmax order."""
    # rows of C - λI: r0=(a,b,c), r1=(d,e,f), r2=(g,h,i)
    defs = (
        f"c00 - {lam} AS a, c01 AS b, c02 AS c, "
        f"c01 AS d, c11 - {lam} AS e, c12 AS f, "
        f"c02 AS g, c12 AS h, c22 - {lam} AS i"
    )
    return f"""
{out}_rows AS (SELECT *, {defs} FROM lam),
{out}_cand AS (
  SELECT *,
    b*f - c*e AS x01, c*d - a*f AS y01, a*e - b*d AS z01,
    b*i - c*h AS x02, c*g - a*i AS y02, a*h - b*g AS z02,
    e*i - f*h AS x12, f*g - d*i AS y12, d*h - e*g AS z12
  FROM {out}_rows
),
{out}_pick AS (
  SELECT *,
    CASE
      WHEN x01*x01 + y01*y01 + z01*z01 >= x02*x02 + y02*y02 + z02*z02
       AND x01*x01 + y01*y01 + z01*z01 >= x12*x12 + y12*y12 + z12*z12
      THEN x01 WHEN x02*x02 + y02*y02 + z02*z02 >= x12*x12 + y12*y12 + z12*z12
      THEN x02 ELSE x12 END AS ux,
    CASE
      WHEN x01*x01 + y01*y01 + z01*z01 >= x02*x02 + y02*y02 + z02*z02
       AND x01*x01 + y01*y01 + z01*z01 >= x12*x12 + y12*y12 + z12*z12
      THEN y01 WHEN x02*x02 + y02*y02 + z02*z02 >= x12*x12 + y12*y12 + z12*z12
      THEN y02 ELSE y12 END AS uy,
    CASE
      WHEN x01*x01 + y01*y01 + z01*z01 >= x02*x02 + y02*y02 + z02*z02
       AND x01*x01 + y01*y01 + z01*z01 >= x12*x12 + y12*y12 + z12*z12
      THEN z01 WHEN x02*x02 + y02*y02 + z02*z02 >= x12*x12 + y12*y12 + z12*z12
      THEN z02 ELSE z12 END AS uz
  FROM {out}_cand
),
{out}_sgn AS (
  SELECT *,
    CASE
      WHEN abs(ux) >= abs(uy) AND abs(ux) >= abs(uz)
      THEN (CASE WHEN ux < 0 THEN -1.0 ELSE 1.0 END)
      WHEN abs(uy) >= abs(uz)
      THEN (CASE WHEN uy < 0 THEN -1.0 ELSE 1.0 END)
      ELSE (CASE WHEN uz < 0 THEN -1.0 ELSE 1.0 END)
    END / sqrt(ux*ux + uy*uy + uz*uz) AS scl
  FROM {out}_pick
),
{out} AS (
  SELECT star1 AS _one, ux * scl AS {out}x, uy * scl AS {out}y, uz * scl AS {out}z
  FROM {out}_sgn
)"""


def curve_pca3_oracle_sql(cd_sql: str) -> str:
    """DuckDB mirror of :func:`curve_pca3`: closed-form trigonometric
    eigendecomposition of the sample covariance of the (v0,v1,v2)
    CurveDescr vectors, then the same sign-canonical projection.
    ``cd_sql`` is the curve_descr(bins=3) long-format oracle."""
    return f"""
WITH cd AS ({cd_sql}),
v AS (
  SELECT star_id,
         max(CASE WHEN bin = 0 THEN value END) AS v0,
         max(CASE WHEN bin = 1 THEN value END) AS v1,
         max(CASE WHEN bin = 2 THEN value END) AS v2
  FROM cd GROUP BY star_id HAVING count(*) = 3
),
s AS (
  SELECT 1 AS star1, count(*) * 1.0 AS n,
         avg(v0) AS m0, avg(v1) AS m1, avg(v2) AS m2,
         sum(v0*v0) AS s00, sum(v0*v1) AS s01, sum(v0*v2) AS s02,
         sum(v1*v1) AS s11, sum(v1*v2) AS s12, sum(v2*v2) AS s22
  FROM v
),
c AS (
  SELECT star1,
         (s00 - n*m0*m0) / (n-1) AS c00, (s01 - n*m0*m1) / (n-1) AS c01,
         (s02 - n*m0*m2) / (n-1) AS c02, (s11 - n*m1*m1) / (n-1) AS c11,
         (s12 - n*m1*m2) / (n-1) AS c12, (s22 - n*m2*m2) / (n-1) AS c22
  FROM s
),
tq AS (SELECT *, (c00 + c11 + c22) / 3.0 AS qq FROM c),
tp AS (
  SELECT *,
    sqrt(((c00-qq)*(c00-qq) + (c11-qq)*(c11-qq) + (c22-qq)*(c22-qq)
          + 2.0*(c01*c01 + c02*c02 + c12*c12)) / 6.0) AS p
  FROM tq
),
tr AS (
  SELECT *,
    ((c00-qq) * ((c11-qq)*(c22-qq) - c12*c12)
     - c01 * (c01*(c22-qq) - c12*c02)
     + c02 * (c01*c12 - (c11-qq)*c02)) / (2.0*p*p*p) AS r
  FROM tp
),
tphi AS (SELECT *, acos(least(greatest(r, -1.0), 1.0)) / 3.0 AS phi FROM tr),
lam AS (
  SELECT *,
    qq + 2.0*p*cos(phi) AS l1,
    3.0*qq - (qq + 2.0*p*cos(phi)) - (qq + 2.0*p*cos(phi + 2.0943951023931953)) AS l2
  FROM tphi
),
{_eigvec3_sql("l1", "e1")},
{_eigvec3_sql("l2", "e2")}
SELECT v.star_id,
       round(v0*e1x + v1*e1y + v2*e1z, 6) AS pc1,
       round(v0*e2x + v1*e2y + v2*e2z, 6) AS pc2
FROM v, e1, e2
"""
