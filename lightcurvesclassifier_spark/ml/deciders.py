"""Deciders — the reference's classifier layer, Spark-first.

Reference contract (lcc/stars_processing/utilities/base_decider.py:13-131):
``learn(right_coords, wrong_coords)``, ``evaluate(coords) -> prob``, and a
``threshold`` attribute (default 0.8). The supervised base wraps sklearn
``fit``/``predict_proba[:, 1]`` with NaN probs → 0
(utilities/superv_base_decider.py:40-100).

Here a decider learns from two DataFrames of features and *scores
distributively*:

- **MLlib-backed** deciders (trees, forests, GBT, MLP, logistic) train on
  the assembled train set (small — the reference trains on tens-to-
  thousands of stars) and score via ``model.transform`` — JVM-side.
- **Closed-form Gaussian** deciders (LDA / QDA / GaussianNB) are fit
  driver-side with numpy on the collected train sample (tiny by
  contract) and score through a broadcast-parameter vectorized pandas
  UDF — the 100 TB path is the scoring scan, which is fully distributed.
  (The container has no sklearn; these are the textbook closed forms of
  the same estimators the reference uses —
  lcc/stars_processing/deciders/supervised_deciders.py:12-49.)
- **Exact boosting/bagging**: AdaBoostDec and ExtraTreesDec run the
  published algorithms themselves (SAMME.R over gini stumps; extremely
  randomized trees) fit driver-side — ``ml/boosting.py``.
- **Exact SVC and NN** (were surrogates until round 2): SVCDec is an
  SMO-trained RBF C-SVC with libsvm-style 5-fold Platt scaling
  (``ml/svc.py``); NeuronDecider is the reference's Keras 2-layer
  relu→sigmoid net trained with Adam in numpy (``ml/neural.py``) —
  supervised_deciders.py:52-75, deciders/neuron_decider.py:11-155.

Probabilities are NOT rounded here; the ensemble combine rounds to 2
decimals exactly where the reference does
(stars_filter.py:291-327).
"""

from __future__ import annotations

import abc

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

LABEL = "_label"
FEATURES = "_features"
DEFAULT_THRESHOLD = 0.8  # base_decider.py:28


def _assemble(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(
        inputCols=list(feature_cols), outputCol=FEATURES, handleInvalid="skip"
    ).transform(df)


def collect_features(df: DataFrame, feature_cols: list[str]) -> np.ndarray:
    """Driver-side train-sample collect shared by every numpy-fit
    decider: drop rows with missing features, densify. Raises on an
    empty sample — silently fitting on nothing yields an all-NaN model
    that scores every star 0.0 with no indication anything is wrong
    (superv_base_decider fails loudly there too)."""
    x = df.select(*feature_cols).na.drop().toPandas().to_numpy(dtype=float)
    if not len(x):
        raise ValueError("Decider can't be learned on an empty sample")
    return x


class BaseDecider(abc.ABC):
    """learn / evaluate / threshold — the reference's decider contract."""

    threshold: float = DEFAULT_THRESHOLD

    @abc.abstractmethod
    def learn(
        self, searched: DataFrame, others: DataFrame, feature_cols: list[str]
    ) -> "BaseDecider":
        ...

    @abc.abstractmethod
    def evaluate(
        self, df: DataFrame, feature_cols: list[str], out_col: str = "prob"
    ) -> DataFrame:
        """Append membership-probability column ``out_col``."""
        ...

    def name(self) -> str:
        return type(self).__name__


class MLlibDecider(BaseDecider):
    """Wraps any pyspark.ml probabilistic classifier.

    ``hard_predict=True`` mirrors TreeDec, whose ``evaluate`` returns the
    hard 0/1 prediction instead of a probability
    (supervised_deciders.py:102-116).
    """

    def __init__(self, estimator_factory, hard_predict: bool = False,
                 threshold: float = DEFAULT_THRESHOLD):
        self._factory = estimator_factory
        self.hard_predict = hard_predict
        self.threshold = threshold
        self.model = None

    def learn(self, searched, others, feature_cols):
        train = searched.withColumn(LABEL, F.lit(1.0)).unionByName(
            others.withColumn(LABEL, F.lit(0.0))
        )
        train = _assemble(train.na.drop(subset=feature_cols), feature_cols)
        est = self._factory()
        est.setFeaturesCol(FEATURES)
        est.setLabelCol(LABEL)
        self.model = est.fit(train)
        # Drop the training summary: it holds the fitting SparkSession,
        # which rides model.transform's prediction-UDF closure into
        # every scoring task — and a classic Spark 4.1 session whose
        # lazy `observationManager` has been initialized (ANY
        # DataFrame.observe / Observation use anywhere in the session,
        # e.g. an earlier run of this engine's CC-era plans or any user
        # query) is NOT serializable, failing the score job with `Task
        # not serializable`. The summary is training-time metadata this
        # decider never reads; shedding it keeps the scoring closure
        # free of the session no matter what ran before.
        try:
            self.model._call_java("setSummary", None)
        except Exception:
            pass  # older/newer MLlib without the setter: keep going
        return self

    def evaluate(self, df, feature_cols, out_col="prob"):
        # rows with a missing feature score 0 like every other decider
        # (superv_base_decider.py:93-100's NaN→0 rule) — the assembler's
        # handleInvalid='skip' would silently DROP them from the output
        valid_pred = F.lit(True)
        for c in feature_cols:
            valid_pred = valid_pred & F.col(c).isNotNull() & ~F.isnan(c)
        valid = df.filter(valid_pred)
        invalid = df.filter(~F.coalesce(valid_pred, F.lit(False)))
        assembled = _assemble(valid, feature_cols)
        scored = self.model.transform(assembled)
        if self.hard_predict or "probability" not in scored.columns:
            prob = F.col("prediction")
        else:
            from pyspark.ml.functions import vector_to_array

            prob = vector_to_array(F.col("probability")).getItem(1)
        # NaN probabilities → 0 (superv_base_decider.py:93-100)
        prob = F.coalesce(F.nanvl(prob, F.lit(0.0)), F.lit(0.0))
        keep = [c for c in df.columns]
        return scored.select(*keep, prob.alias(out_col)).unionByName(
            invalid.select(*keep, F.lit(0.0).alias(out_col))
        )


class GaussianDecider(BaseDecider):
    """Closed-form Gaussian discriminant deciders: 'lda' (shared
    covariance), 'qda' (per-class covariance), 'nb' (diagonal).

    Driver-side fit on the collected train sample; scoring is a
    broadcast-parameter pandas UDF over ``array(feature_cols)`` —
    Arrow-batched, no per-row Python.
    """

    def __init__(self, kind: str = "lda", threshold: float = DEFAULT_THRESHOLD,
                 reg: float = 1e-6):
        assert kind in ("lda", "qda", "nb")
        self.kind = kind
        self.threshold = threshold
        self.reg = reg
        self.params: dict | None = None

    def learn(self, searched, others, feature_cols):
        x1 = collect_features(searched, feature_cols)
        x0 = collect_features(others, feature_cols)
        n1, n0 = len(x1), len(x0)
        priors = np.array([n0, n1], dtype=float) / (n0 + n1)
        means = [x0.mean(axis=0), x1.mean(axis=0)]
        d = x1.shape[1]
        eye = np.eye(d)
        if self.kind == "nb":
            var = [x0.var(axis=0) + self.reg, x1.var(axis=0) + self.reg]
            covs = [np.diag(v) for v in var]
        elif self.kind == "qda":
            covs = [
                np.cov(x0, rowvar=False).reshape(d, d) + self.reg * eye,
                np.cov(x1, rowvar=False).reshape(d, d) + self.reg * eye,
            ]
        else:  # lda: pooled covariance
            c0 = (x0 - means[0]).T @ (x0 - means[0])
            c1 = (x1 - means[1]).T @ (x1 - means[1])
            pooled = (c0 + c1) / (n0 + n1 - 2) + self.reg * eye
            covs = [pooled, pooled]
        self.params = {
            "priors": priors,
            "means": np.array(means),
            "inv": np.array([np.linalg.inv(c) for c in covs]),
            "logdet": np.array([np.linalg.slogdet(c)[1] for c in covs]),
        }
        return self

    def evaluate(self, df, feature_cols, out_col="prob"):
        p = self.params
        priors, means, inv, logdet = p["priors"], p["means"], p["inv"], p["logdet"]

        @F.pandas_udf(T.DoubleType())
        def score(arr: pd.Series) -> pd.Series:
            x = np.vstack(arr.to_numpy())
            ll = np.empty((len(x), 2))
            for k in (0, 1):
                diff = x - means[k]
                maha = np.einsum("ij,jk,ik->i", diff, inv[k], diff)
                ll[:, k] = -0.5 * (maha + logdet[k]) + np.log(priors[k])
            m = ll.max(axis=1, keepdims=True)
            w = np.exp(ll - m)
            prob = w[:, 1] / w.sum(axis=1)
            return pd.Series(np.nan_to_num(prob, nan=0.0))

        # asNondeterministic: filter_stars filters on this column, and
        # the optimizer would otherwise push that filter below the
        # projection by DUPLICATING the ArrowEvalPython node (two score
        # evaluations per star — measured in stars_filter_pipeline's
        # plan). The function is pure; the marking only pins a single
        # evaluation.
        return df.withColumn(
            out_col, score.asNondeterministic()(F.array(*feature_cols))
        )


class MLPDecider(MLlibDecider):
    """MLlib MultilayerPerceptronClassifier wrapper — kept as the
    fully-JVM alternative for users who want an in-cluster NN fit; the
    ``NeuronDecider`` registry entry now maps to the exact numpy
    re-implementation of the reference's Keras net (``ml/neural.py``)."""

    def __init__(self, hidden: tuple = (8,), seed: int = 42, **kw):
        super().__init__(None, **kw)
        self.hidden = tuple(hidden)
        self.seed = seed

    def learn(self, searched, others, feature_cols):
        from pyspark.ml.classification import MultilayerPerceptronClassifier

        layers = [len(feature_cols), *self.hidden, 2]
        self._factory = lambda: MultilayerPerceptronClassifier(
            seed=self.seed, maxIter=150, layers=layers
        )
        return super().learn(searched, others, feature_cols)


class CustomDecider(BaseDecider):
    """Boundary ranges, no learning — probability is 1 inside the box,
    0 outside (deciders/custom_decider.py:43-108). threshold=0.5."""

    def __init__(self, ranges: dict, threshold: float = 0.5):
        self.ranges = ranges
        self.threshold = threshold

    def learn(self, searched, others, feature_cols):
        return self

    def evaluate(self, df, feature_cols, out_col="prob"):
        from ..plans.query_compiler import range_predicate

        return df.withColumn(
            out_col, F.when(range_predicate(self.ranges), 1.0).otherwise(0.0)
        )


class KMeansDecider(BaseDecider):
    """Unsupervised: MLlib KMeans; ``evaluate`` returns the cluster id as
    a float, mirroring k_means_decider.py:8-19 (not a probability)."""

    def __init__(self, k: int = 2, seed: int = 42):
        self.k = k
        self.seed = seed
        self.model = None

    def learn(self, searched, others, feature_cols):
        from pyspark.ml.clustering import KMeans

        train = searched.unionByName(others).na.drop(subset=feature_cols)
        train = _assemble(train, feature_cols)
        self.model = KMeans(k=self.k, seed=self.seed, featuresCol=FEATURES).fit(train)
        return self

    def evaluate(self, df, feature_cols, out_col="prob"):
        # rows with a missing feature keep their row but score NULL —
        # the assembler's handleInvalid='skip' would silently DROP them
        # (the MLlibDecider pitfall), and the supervised NaN→0 rule
        # cannot apply here because 0 is a real cluster id
        valid_pred = F.lit(True)
        for c in feature_cols:
            valid_pred = valid_pred & F.col(c).isNotNull() & ~F.isnan(c)
        valid = df.filter(valid_pred)
        invalid = df.filter(~F.coalesce(valid_pred, F.lit(False)))
        scored = self.model.transform(_assemble(valid, feature_cols))
        return scored.select(
            *df.columns, F.col("prediction").cast("double").alias(out_col)
        ).unionByName(
            invalid.select(
                *df.columns, F.lit(None).cast("double").alias(out_col)
            )
        )


def _boosting():
    from . import boosting

    return boosting


def _svc():
    from . import svc

    return svc


def _neural():
    from . import neural

    return neural


def make_decider(name: str, **kw) -> BaseDecider:
    """Registry keyed by the reference decider class names
    (lcc/stars_processing/deciders/__init__.py)."""
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        GBTClassifier,
        RandomForestClassifier,
    )

    seed = kw.pop("seed", 42)
    registry = {
        "LDADec": lambda: GaussianDecider("lda", **kw),
        "QDADec": lambda: GaussianDecider("qda", **kw),
        "GaussianNBDec": lambda: GaussianDecider("nb", **kw),
        "TreeDec": lambda: MLlibDecider(
            lambda: DecisionTreeClassifier(seed=seed), hard_predict=True, **kw
        ),
        "RandomForestDec": lambda: MLlibDecider(
            lambda: RandomForestClassifier(seed=seed), **kw
        ),
        "GradBoostDec": lambda: MLlibDecider(lambda: GBTClassifier(seed=seed), **kw),
        # exact published algorithms, driver-numpy fit like GaussianDecider
        # (ml/boosting.py — SAMME.R stumps / extremely randomized trees):
        "AdaBoostDec": lambda: _boosting().AdaBoostDecider(**kw),
        "ExtraTreesDec": lambda: _boosting().ExtraTreesDecider(seed=seed, **kw),
        # exact published algorithms (ml/svc.py, ml/neural.py):
        "SVCDec": lambda: _svc().SVCDecider(seed=seed, **kw),
        "NeuronDecider": lambda: _neural().NeuronDecider(seed=seed, **kw),
        "KMeansDecider": lambda: KMeansDecider(seed=seed, **kw),
        "CustomDecider": lambda: CustomDecider(**kw),
    }
    return registry[name]()
