"""CLI descriptor registry: class name → distributed feature extractor.

The reference resolves descriptor classes by name through PackageReader
(lcc/data_manager/package_reader.py) and evaluates one star at a time;
here each descriptor name maps to a DataFrame transformation producing
its feature column(s) for ALL stars in one pass, so the CLI's
make_filter/filter_stars stay fully distributed.

Registered names mirror lcc/stars_processing/descriptors/__init__.py
for the self-contained (no-template) descriptors; the comparative
family needs template stars and lives in operators/comparative.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import curve_udfs, curves as curve_fns


def _collect_curves(obs: DataFrame) -> DataFrame:
    pairs = F.array_sort(F.collect_list(F.struct(F.col("t"), F.col("mag"))))
    return obs.groupBy("star_id").agg(pairs.alias("pairs")).select(
        "star_id",
        F.col("pairs.t").alias("time"),
        F.col("pairs.mag").alias("mag"),
    )


def _abbe(obs: DataFrame, params: dict) -> DataFrame:
    return curve_fns.abbe_value(obs).select("star_id", "abbe")


def _curve_density(obs: DataFrame, params: dict) -> DataFrame:
    return curve_fns.curve_features(obs).select("star_id", "curve_density")


def _skewness(obs: DataFrame, params: dict) -> DataFrame:
    return curve_fns.skewness_kurtosis(obs).select("star_id", "skewness")


def _kurtosis(obs: DataFrame, params: dict) -> DataFrame:
    return curve_fns.skewness_kurtosis(obs).select("star_id", "kurtosis")


def _variogram_slope(obs: DataFrame, params: dict) -> DataFrame:
    bins = int(params.get("bins", 20))
    return curve_udfs.variogram_slope(_collect_curves(obs), bins=bins).select(
        "star_id", "variogram_slope"
    )


# name → (feature column(s), extractor(obs, params) -> DataFrame)
REGISTRY: dict[str, tuple[list[str], callable]] = {
    "AbbeValueDescr": (["abbe"], _abbe),
    "CurveDensityDescr": (["curve_density"], _curve_density),
    "SkewnessDescr": (["skewness"], _skewness),
    "KurtosisDescr": (["kurtosis"], _kurtosis),
    "VariogramSlopeDescr": (["variogram_slope"], _variogram_slope),
}


def featurize(
    obs: DataFrame, descriptors: list[str], params: dict | None = None
) -> tuple[DataFrame, list[str]]:
    """One feature row per star with every requested descriptor's
    column(s), joined on star_id. ``params`` maps descriptor name →
    {param: value} (the tuned-parameter combo)."""
    params = params or {}
    unknown = [d for d in descriptors if d not in REGISTRY]
    if unknown:
        raise KeyError(
            f"Unknown descriptors {unknown}. Available: {sorted(REGISTRY)}"
        )
    out = None
    feature_cols: list[str] = []
    for name in descriptors:
        cols, fn = REGISTRY[name]
        feats = fn(obs, params.get(name, {}))
        feature_cols += cols
        out = feats if out is None else out.join(feats, "star_id")
    return out, feature_cols
