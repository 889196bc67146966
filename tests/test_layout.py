"""Physical layout: bucketed tables join without a shuffle; salted
joins return exactly the plain-join rows."""

import pytest

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators.layout import (
    read_table,
    salted_join,
    write_bucketed,
)
from lightcurvesclassifier_spark.sources import testdata
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    obs = testdata.observations(spark, SF_SMOKE)
    stars = testdata.stars(spark, SF_SMOKE).filter(F.col("star_id") < 15)
    write_bucketed(
        obs, "obs_b", buckets=8, sort_cols=["star_id", "t"], path=str(wh / "obs_b")
    )
    write_bucketed(stars, "stars_b", buckets=8, path=str(wh / "stars_b"))
    return "obs_b", "stars_b"


def test_bucketed_join_has_no_exchange(spark, bucketed):
    obs_t, stars_t = bucketed
    joined = read_table(spark, obs_t).join(
        read_table(spark, stars_t).hint("merge"), "star_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() > 0


def test_bucketed_aggregate_has_no_exchange(spark, bucketed):
    obs_t, _ = bucketed
    agg = read_table(spark, obs_t).groupBy("star_id").agg(F.avg("mag"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 15


def test_salted_join_matches_plain_join(spark):
    obs = testdata.observations(spark, SF_SMOKE)
    periods = testdata.periods(spark, SF_SMOKE)
    plain = obs.join(periods, "star_id").select("star_id", "t", "mag", "period")
    salted = salted_join(obs, periods, "star_id", n_salts=8).select(
        "star_id", "t", "mag", "period"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
