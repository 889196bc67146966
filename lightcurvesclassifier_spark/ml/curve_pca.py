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
