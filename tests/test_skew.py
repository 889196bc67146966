"""Salted aggregation: identical results to the direct plan, with the
two-stage (key, salt) → key shuffle layout visible in the physical
plan."""

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators.skew import salted_sum_count


def test_salted_agg_matches_direct(spark):
    # one pathological key (90% of rows) + a uniform tail
    rows = [(7, float(i % 13)) for i in range(9000)] + [
        (i % 50, float(i)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k long, v double")
    got = (
        salted_sum_count(df, "k", "v", n_salt=16)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    want = (
        df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count("*").alias("n"))
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert (got.n == want.n).all()
    assert abs(got.sum_v - want.sum_v).max() < 1e-6


def test_salted_agg_two_stage_plan(spark):
    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    plan = (
        salted_sum_count(df, "k", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two hash-aggregate pairs, two exchanges: (k, salt) then (k)
    assert plan.count("Exchange") == 2, plan
    assert "Python" not in plan
