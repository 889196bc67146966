"""ParamsEstimator — grid search over StarsFilter configurations.

Reference (lcc/stars_processing/tools/params_estim.py:15-326): shuffled
70/30 train/test split, one fresh StarsFilter per tuned-parameter combo,
fit + score on test, argmax of the score statistic (default precision).

Spark: seeded ``randomSplit`` replaces the unseeded shuffle (documented
divergence — the reference's split is nondeterministic,
params_estim.py:80-86); each combo's fit/score is itself distributed, so
the combo loop is the driver-side outer dimension exactly like the
reference's process pool, with Spark supplying the inner parallelism.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import DataFrame

from .stars_filter import StarsFilter


class ParamsEstimator:
    def __init__(
        self,
        searched: DataFrame,
        others: DataFrame,
        build: Callable[[Mapping[str, Any]], StarsFilter],
        combos: Sequence[Mapping[str, Any]],
        train_ratio: float = 0.7,
        seed: int = 42,
        score_key: str = "precision",
    ):
        self.searched = searched
        self.others = others
        self.build = build
        self.combos = list(combos)
        self.train_ratio = train_ratio
        self.seed = seed
        self.score_key = score_key

    def fit(self) -> tuple[StarsFilter, Mapping[str, Any], list[dict]]:
        """Returns (best_filter, best_combo, per-combo stats)."""
        s_train, s_test = self.searched.randomSplit(
            [self.train_ratio, 1 - self.train_ratio], seed=self.seed
        )
        o_train, o_test = self.others.randomSplit(
            [self.train_ratio, 1 - self.train_ratio], seed=self.seed
        )
        cached = (s_train, o_train, s_test, o_test)
        for df in cached:
            df.cache()

        try:
            results = []
            best = None
            for combo in self.combos:
                filt = self.build(combo)
                filt.learn(s_train, o_train)
                stats = dict(filt.statistics(s_test, o_test))
                stats["params"] = dict(combo)
                results.append(stats)
                # statistics() returns None for zero-denominator rates
                # (e.g. an empty test fold): rank those below every real
                # score instead of raising on `None > None`
                score = stats[self.score_key]
                score = float("-inf") if score is None else score
                if best is None or score > best[0]:
                    best = (score, filt, combo)
            return best[1], best[2], results
        finally:
            for df in cached:
                df.unpersist()
