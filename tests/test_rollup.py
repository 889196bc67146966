"""Sessionization + downsample rollups: boundary semantics on a
hand-built series, and the single-shuffle plan claims."""

import __spark_entry__ as em
from lightcurvesclassifier_spark.operators import rollup, text
from tests.conftest import SF_SMOKE


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "star_id long, band string, t double, mag double, err double"
    )


def test_sessions_split_on_gap(spark):
    rows = [
        # star 1: two sessions — 0.0-0.5 (3 obs) then 5.0-5.2 (2 obs)
        (1, "V", 0.0, 10.0, None),
        (1, "V", 0.4, 10.2, None),
        (1, "V", 0.5, 10.4, None),
        (1, "V", 5.0, 11.0, None),
        (1, "V", 5.2, 11.2, None),
        # star 2: one session; a gap of exactly 1.0 does NOT split
        (2, "V", 0.0, 9.0, None),
        (2, "V", 1.0, 9.5, None),
    ]
    out = {
        (r.star_id, r.session_id): r
        for r in rollup.observing_sessions(_obs(spark, rows), 1.0).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)].n_obs == 3 and out[(1, 1)].t_end == 0.5
    assert out[(1, 2)].n_obs == 2 and out[(1, 2)].t_start == 5.0
    assert out[(2, 1)].n_obs == 2
    assert abs(out[(1, 2)].mean_mag - 11.1) < 1e-9


def test_downsample_buckets_and_stats(spark):
    rows = [
        (1, "V", 0.0, 10.0, None),
        (1, "V", 9.9, 12.0, None),   # same bucket 0
        (1, "V", 10.0, 14.0, None),  # bucket 1 (floor boundary)
        (1, "B", 3.0, 8.0, None),    # separate band
        (2, "V", -0.1, 7.0, None),   # negative t → bucket -1
    ]
    out = {
        (r.star_id, r.band, r.bucket): r
        for r in rollup.downsample(_obs(spark, rows), 10.0).collect()
    }
    b0 = out[(1, "V", 0)]
    assert b0.n_obs == 2 and b0.mean_mag == 11.0
    assert b0.min_mag == 10.0 and b0.max_mag == 12.0
    assert out[(1, "V", 1)].n_obs == 1
    assert (1, "B", 0) in out
    assert (2, "V", -1) in out


def test_bigram_counts_pairs_and_ties(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),      # "a b" ×2, "b a" ×1
            (2, "a b"),          # "a b" ×1
            (3, "solo"),         # single token → no bigrams
            (4, "b a"),          # ties "b a" with... count 2
        ],
        "doc_id long, text string",
    )
    out = text.bigram_counts(docs, k=10).collect()
    got = {(r.bigram, r.cnt) for r in out}
    assert got == {("a b", 3), ("b a", 2)}
    # ordering: count desc, bigram asc
    assert [r.bigram for r in out] == ["a b", "b a"]


def _plan(spark, name):
    return (
        em.queries()[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_sessions_plan_single_shuffle(spark):
    # lag window + running-sum window + session aggregate all cluster by
    # star_id: exactly one Exchange, no Python
    plan = _plan(spark, "event_sessions")
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan


def test_downsample_plan_single_partial_final_agg(spark):
    plan = _plan(spark, "obs_downsample")
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "Python" not in plan


def test_bigram_plan_take_ordered_no_global_sort(spark):
    # the top-k must be TakeOrdered (per-partition top-k), not a global
    # Sort after the aggregate
    plan = _plan(spark, "bigram_counts")
    assert "TakeOrderedAndProject" in plan, plan
    # the count's shuffle only — plus, allowed, the r6 expansion-aware
    # spread of the single-partition local scan (no-op at scale)
    agg_ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(agg_ex) == 1, plan


def test_sessions_properties_random_series(spark):
    """Property: for random gap patterns, (1) session count per star =
    1 + #gaps exceeding the threshold, (2) n_obs sums to the series
    length, (3) session spans never overlap."""
    import random

    rng = random.Random(7)
    rows = []
    expected_sessions = {}
    for star in range(1, 8):
        t = 0.0
        n = rng.randint(1, 30)
        gaps_over = 0
        for i in range(n):
            if i:
                gap = rng.choice([0.1, 0.5, 0.9, 1.5, 3.0])
                if gap > 1.0:
                    gaps_over += 1
                t += gap
            rows.append((star, "V", round(t, 6), 10.0 + i * 0.01, None))
        expected_sessions[star] = (gaps_over + 1, n)
    out = rollup.observing_sessions(_obs(spark, rows), 1.0).collect()
    by_star = {}
    for r in out:
        by_star.setdefault(r.star_id, []).append(r)
    for star, (n_sess, n_obs) in expected_sessions.items():
        sess = sorted(by_star[star], key=lambda r: r.t_start)
        assert len(sess) == n_sess, (star, sess)
        assert sum(r.n_obs for r in sess) == n_obs
        for a, b in zip(sess, sess[1:]):
            assert a.t_end < b.t_start  # disjoint, ordered


def test_downsample_preserves_totals(spark):
    """Property: bucket counts sum to the input size and min <= mean <=
    max within every bucket."""
    import random

    rng = random.Random(11)
    rows = [
        (rng.randint(1, 5), rng.choice(["V", "B"]),
         rng.uniform(-30, 300), rng.uniform(8, 20), None)
        for _ in range(500)
    ]
    out = rollup.downsample(_obs(spark, rows), 10.0).collect()
    assert sum(r.n_obs for r in out) == len(rows)
    for r in out:
        assert r.min_mag <= r.mean_mag <= r.max_mag


def test_revenue_cube_grouping_sets_consistent(spark):
    """CUBE invariants: the grand total equals the sum of every level-0
    group; each one-dimension subtotal equals the sum of its children;
    grp_id encodes which keys are aggregated (returnflag = high bit)."""
    rows = [
        ("A", "F", 100.0, 0.0),
        ("A", "O", 50.0, 0.1),
        ("R", "F", 10.0, 0.5),
        ("A", "F", 1.0, 0.0),
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, "
        "l_extendedprice double, l_discount double"
    )
    out = {
        (r.returnflag, r.linestatus): r
        for r in rollup.revenue_cube(li).collect()
    }
    assert len(out) == 3 + 2 + 2 + 1  # cells + row subtotals + col + total
    assert out[("A", "F")].revenue_cents == 10100
    assert out[("A", "ALL")].revenue_cents == 10100 + 4500
    assert out[("ALL", "F")].revenue_cents == 10100 + 500
    assert out[("ALL", "ALL")].revenue_cents == 10100 + 4500 + 500
    assert out[("ALL", "ALL")].grp_id == 3
    assert out[("A", "ALL")].grp_id == 1  # linestatus aggregated → low bit
    assert out[("ALL", "F")].grp_id == 2
    assert out[("A", "F")].grp_id == 0
    assert out[("ALL", "ALL")].n_items == 4


def test_revenue_cube_single_aggregate_exchange(spark):
    plan = _plan_of(em.queries()["revenue_cube"], spark)
    # Expand replicates rows BEFORE one hash aggregate: 1 Exchange total
    assert "Expand" in plan
    assert plan.count("Exchange") == 1, plan


def test_moving_average_smooths_planted_flare(spark):
    """A single-epoch flare is preserved in resid but absent from the
    local mean; flat regions have ~zero residual; window counts follow
    the ±2-day RANGE frame over uneven sampling."""
    rows = []
    ts = [0.0, 1.0, 2.0, 3.0, 4.0, 10.0, 11.0]
    for t in ts:
        rows.append((1, t, 12.0 + (5.0 if t == 2.0 else 0.0)))
    obs = spark.createDataFrame(rows, "star_id long, t double, mag double")
    out = {r.t: r for r in rollup.moving_average(obs).collect()}
    # the 10/11-day pair is its own neighborhood (gap > frame)
    assert out[10.0].n_window == 2 and out[11.0].n_window == 2
    assert abs(out[10.0].resid) < 1e-9
    # frame at t=2 covers t∈[0,4]: mean = 12 + 5/5
    assert out[2.0].n_window == 5
    assert abs(out[2.0].mag_smooth - 13.0) < 1e-9
    assert abs(out[2.0].resid - 4.0) < 1e-9


def _plan_of(fn, spark):
    return (
        fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_incremental_merge_equals_one_shot(spark):
    """State merge invariant: splitting the input arbitrarily, folding
    the per-split power-sum states, and finalizing equals the one-shot
    aggregate (float association differs at the ulp level → approx)."""
    import numpy as np
    from lightcurvesclassifier_spark.functions.curves import lc_stats
    from lightcurvesclassifier_spark.sources import testdata as td

    obs = td.observations(spark, SF_SMOKE)
    day_par = em.F.floor("t").cast("long") % 2
    merged = rollup.finalize_lc_stats(
        rollup.merge_lc_states(
            rollup.lc_stats_state(obs.filter(day_par == 0)),
            rollup.lc_stats_state(obs.filter(day_par != 0)),
        )
    ).toPandas().sort_values("star_id").reset_index(drop=True)
    direct = lc_stats(obs).toPandas().sort_values("star_id").reset_index(drop=True)
    assert (merged.star_id == direct.star_id).all()
    assert (merged.n_obs == direct.n_obs).all()
    for col in ["mean_mag", "std_mag", "timespan", "curve_density"]:
        assert np.allclose(merged[col], direct[col], rtol=0, atol=2e-6), col


def test_merge_three_way_and_empty_split(spark):
    """Merging k>2 states works, and a split that leaves one state
    empty for a key still yields the correct totals."""
    rows = [(1, 0.5, 10.0), (1, 1.5, 12.0), (1, 2.5, 14.0), (2, 0.25, 9.0)]
    obs = spark.createDataFrame(rows, "star_id long, t double, mag double")
    s1 = rollup.lc_stats_state(obs.filter(em.F.col("t") < 1.0))
    s2 = rollup.lc_stats_state(
        obs.filter((em.F.col("t") >= 1.0) & (em.F.col("t") < 2.0))
    )
    s3 = rollup.lc_stats_state(obs.filter(em.F.col("t") >= 2.0))
    out = {
        r.star_id: r
        for r in rollup.finalize_lc_stats(
            rollup.merge_lc_states(s1, s2, s3)
        ).collect()
    }
    assert out[1].n_obs == 3 and out[1].mean_mag == 12.0
    assert out[1].timespan == 2.0
    assert out[2].n_obs == 1  # star 2 exists in only one state
    assert out[2].curve_density is None  # zero span → undefined, no crash
