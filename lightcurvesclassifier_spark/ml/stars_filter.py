"""StarsFilter — descriptors + deciders composed over DataFrames.

Reference (lcc/stars_processing/stars_filter.py:13-389): extract features
for searched/contamination samples, fit every decider, then filter stars
by ensemble probability against the mean decider threshold.

Spark shape: the feature DataFrame replaces the "space coordinates"
pandas frame; each decider appends one probability column in a single
pass over the data; combine/threshold/confusion stats are column
expressions and one aggregate — no driver-side loops over stars.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, functions as F

from .deciders import BaseDecider

# lcc/stars_processing/stars_filter.py:291-327: combine = mean/max/min of
# decider probabilities, ROUNDED TO 2 decimals.
_COMBINE = {
    "mean": lambda cols: sum(cols[1:], cols[0]) / len(cols),
    "highest": F.greatest,
    "lowest": F.least,
}
# filterStars pass_method → evaluateCoordinates meth (stars_filter.py:100-114)
_PASS_METHOD = {"all": "lowest", "mean": "mean", "one": "highest"}


def combine_probabilities(
    df: DataFrame, prob_cols: list[str], meth: str = "mean", out_col: str = "prob"
) -> DataFrame:
    cols = [F.col(c) for c in prob_cols]
    if meth == "highest" or meth == "lowest":
        combined = _COMBINE[meth](*cols) if len(cols) > 1 else cols[0]
    else:
        combined = _COMBINE["mean"](cols)
    return df.withColumn(out_col, F.round(combined, 2))


class StarsFilter:
    """Compose feature columns with a set of deciders.

    ``feature_cols`` play the role of descriptor outputs (already present
    on the DataFrame — the descriptor stage is the feature-extraction
    queries in ``functions/``/``operators/``).
    """

    def __init__(self, deciders: list[BaseDecider], feature_cols: list[str]):
        self.deciders = list(deciders)
        self.feature_cols = list(feature_cols)
        self.learned = False

    # stars_filter.py:119-168
    def learn(self, searched: DataFrame, others: DataFrame) -> "StarsFilter":
        searched = searched.na.drop(subset=self.feature_cols)
        others = others.na.drop(subset=self.feature_cols)
        for dec in self.deciders:
            dec.learn(searched, others, self.feature_cols)
        self.learned = True
        return self

    def _prob_col(self, dec: BaseDecider, i: int) -> str:
        return f"prob_{i}_{dec.name()}"

    def predictions(self, df: DataFrame) -> DataFrame:
        """One probability column per decider (getAllPredictions,
        stars_filter.py:264-288) — all appended in one scan."""
        df = df.na.drop(subset=self.feature_cols)
        for i, dec in enumerate(self.deciders):
            df = dec.evaluate(df, self.feature_cols, self._prob_col(dec, i))
        return df

    def all_predictions(self, df: DataFrame, check_passing: bool = True) -> DataFrame:
        out = self.predictions(df)
        if check_passing:
            passed_all = None
            for i, dec in enumerate(self.deciders):
                c = F.col(self._prob_col(dec, i)) > F.lit(dec.threshold)  # strict >
                out = out.withColumn(f"passed_{i}_{dec.name()}", c)
                passed_all = c if passed_all is None else (passed_all & c)
            out = out.withColumn("passed", passed_all)
        return out

    def mean_threshold(self) -> float:
        # stars_filter.py:103: threshold = mean of decider thresholds
        return float(sum(d.threshold for d in self.deciders) / len(self.deciders))

    def filter_stars(self, df: DataFrame, pass_method: str = "all") -> DataFrame:
        """stars_filter.py:78-117: combined probability >= mean threshold."""
        meth = _PASS_METHOD[pass_method]
        out = self.predictions(df)
        prob_cols = [self._prob_col(d, i) for i, d in enumerate(self.deciders)]
        out = combine_probabilities(out, prob_cols, meth)
        return out.filter(F.col("prob") >= F.lit(self.mean_threshold()))

    # base_decider.py:133-197 over the ensemble, one aggregate per call
    def statistics(
        self, searched: DataFrame, others: DataFrame, threshold: float | None = None
    ) -> OrderedDict:
        thr = threshold if threshold is not None else self.mean_threshold()
        prob_cols = [self._prob_col(d, i) for i, d in enumerate(self.deciders)]

        def _counts(df):
            out = combine_probabilities(self.predictions(df), prob_cols, "mean")
            row = out.agg(
                F.count("*").alias("n"),
                F.sum((F.col("prob") >= F.lit(thr)).cast("long")).alias("pos"),
            ).collect()[0]
            return row["n"], row["pos"]

        right_num, true_pos = _counts(searched)
        wrong_num, false_pos = _counts(others)
        true_neg = wrong_num - false_pos
        false_neg = right_num - true_pos
        precision = (
            round(true_pos / (true_pos + false_pos), 3) if true_pos + false_pos else 0
        )
        return OrderedDict(
            [
                ("precision", precision),
                ("accuracy", (true_pos + true_neg) / (right_num + wrong_num)),
                ("f1_score", 2 * true_pos / (2 * true_pos + false_pos + false_neg)),
                ("true_positive_rate", round(true_pos / right_num, 3)),
                ("true_negative_rate", round(true_neg / wrong_num, 3)),
                ("false_positive_rate", round(1 - true_neg / wrong_num, 3)),
                ("false_negative_rate", round(1 - true_pos / right_num, 3)),
            ]
        )

    def roc(
        self, searched: DataFrame, others: DataFrame, n_thresholds: int = 30
    ) -> list[tuple[float, float, float]]:
        """(threshold, FPR, TPR) sweep — stars_filter.py:370-376 uses 30
        thresholds in [0.01, 0.99]. Computed in ONE pass per sample via a
        threshold-array aggregate instead of 30 scans."""
        import numpy as np

        thresholds = np.linspace(0.01, 0.99, n_thresholds)
        prob_cols = [self._prob_col(d, i) for i, d in enumerate(self.deciders)]

        def _pos_counts(df):
            out = combine_probabilities(self.predictions(df), prob_cols, "mean")
            aggs = [F.count("*").alias("n")] + [
                F.sum((F.col("prob") >= F.lit(float(t))).cast("long")).alias(f"t{i}")
                for i, t in enumerate(thresholds)
            ]
            row = out.agg(*aggs).collect()[0]
            return row["n"], [row[f"t{i}"] for i in range(len(thresholds))]

        n_s, tp = _pos_counts(searched)
        n_c, fp = _pos_counts(others)
        return [
            (float(t), fp[i] / n_c, tp[i] / n_s) for i, t in enumerate(thresholds)
        ]
