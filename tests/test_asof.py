"""As-of join semantics: inclusive point-in-time matching, null when no
prior row, single-shuffle plan."""

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators.asof import asof_join


def test_asof_literal_semantics(spark):
    events = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 9.0, "b"), (1, 10.0, "c"), (2, 3.0, "d")],
        "k long, t double, v string",
    )
    dim = spark.createDataFrame(
        [(1, 4.0, 100), (1, 9.0, 200), (2, 99.0, 300)],
        "k long, ct double, g long",
    )
    out = (
        asof_join(events, dim, "k", "t", "ct", ["g"])
        .toPandas()
        .set_index("v")
    )
    assert out.loc["a", "g"] == 100        # latest epoch at t=4
    assert out.loc["b", "g"] == 200        # equal timestamps: inclusive
    assert out.loc["c", "g"] == 200
    assert out.loc["d", "g"] != out.loc["d", "g"]  # NaN: no prior epoch
    assert len(out) == 4                   # every left row survives


def test_asof_single_shuffle_no_python(spark):
    events = spark.createDataFrame(
        [(1, 5.0, 2.0)], "star_id long, t double, mag double"
    )
    dim = spark.createDataFrame(
        [(1, 4.0, 1.5)], "star_id long, calib_t double, gain double"
    )
    out = asof_join(events, dim, "star_id", "t", "calib_t", ["gain"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window: exactly one (hash) exchange on the key, no range
    # join, no Python
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_asof_carries_matched_epochs_null(spark):
    """ASOF semantics: the matched epoch's legitimate NULL value must be
    returned (per-column last(ignorenulls) skipped it and carried an
    OLDER epoch forward, and could tear columns across epochs)."""
    from lightcurvesclassifier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5.0)], "k long, t double")
    right = spark.createDataFrame(
        [(1, 2.0, 100.0, 1.0), (1, 4.0, None, 2.0)],
        "k long, ct double, g double, o double",
    )
    out = asof_join(left, right, "k", "t", "ct", ["g", "o"]).toPandas()
    assert len(out) == 1
    # the ct=4.0 epoch matched: g is ITS null, o is ITS 2.0 — no tearing
    assert out.g.isna().iloc[0]
    assert out.o.iloc[0] == 2.0


def test_asof_rejects_colliding_columns(spark):
    from lightcurvesclassifier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5.0, 9.0)], "k long, t double, g double")
    right = spark.createDataFrame([(1, 2.0, 1.0)], "k long, ct double, g double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already has columns"):
        asof_join(left, right, "k", "t", "ct", ["g"])


def test_asof_null_keys_and_timestamps_match_nothing(spark):
    """ASOF equality never matches NULL: a NULL-key fact row gets a NULL
    dim even when a NULL-key dimension row exists (Window.partitionBy
    groups NULLs together), and a NULL-timestamp dimension row must not
    be carried into every fact row (asc ordering sorts NULL first)."""
    left = spark.createDataFrame(
        [(None, 5.0), (1, 5.0)], "k long, t double"
    )
    right = spark.createDataFrame(
        [(None, 1.0, 9.9), (1, None, 8.8), (1, 2.0, 1.5)],
        "k long, ct double, g double",
    )
    out = {
        (r.k, r.t): r.g
        for r in asof_join(left, right, "k", "t", "ct", ["g"]).collect()
    }
    assert out[(None, 5.0)] is None  # NULL key never matches
    assert out[(1, 5.0)] == 1.5      # real epoch wins; NULL-ts row ignored


def test_asof_duplicate_epochs_deterministic(spark):
    """Two dimension rows on the same (key, ts): the carried row is the
    column-wise greatest — stable across runs and partitionings."""
    left = spark.createDataFrame([(1, 5.0)], "k long, t double")
    right = spark.createDataFrame(
        [(1, 3.0, 1.1), (1, 3.0, 2.2)], "k long, ct double, g double"
    )
    for _ in range(3):
        rows = asof_join(
            left.repartition(7), right.repartition(3), "k", "t", "ct", ["g"]
        ).collect()
        assert [r.g for r in rows] == [2.2]
