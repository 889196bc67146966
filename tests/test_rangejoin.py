"""Range (interval-stab) join: binned equi-join vs sweep-line vs a
naive cross-product reference, plus plan shape and edge cases."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import rangejoin as rj
from lightcurvesclassifier_spark.sources import testdata

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def obs(spark):
    return testdata.observations(spark, SF)


def _naive_stab(spark, points, intervals, t_col, lo_col, hi_col):
    """Reference semantics: the cartesian predicate join."""
    return points.crossJoin(intervals).filter(
        (F.col(lo_col) <= F.col(t_col)) & (F.col(t_col) < F.col(hi_col))
    )


def test_stab_join_matches_naive(spark):
    """Binned result == cartesian result, including intervals that span
    many bins, sit exactly on bin edges, are zero-length, or inverted."""
    pts = spark.createDataFrame(
        [(float(x),) for x in
         [0.0, 0.5, 3.99, 4.0, 7.5, 8.0, 11.0, 16.0, -3.0, -0.1]],
        "t double",
    )
    iv = spark.createDataFrame(
        [
            (1, 0.0, 4.0),     # exactly one bin, edge-aligned
            (2, 0.0, 0.0),     # zero-length: never stabs
            (3, 3.5, 12.5),    # spans three bins
            (4, -4.0, 1.0),    # negative lo
            (5, 10.0, 2.0),    # inverted: dropped
            (6, 15.9, 16.1),   # straddles a bin edge
        ],
        "iv_id long, lo double, hi double",
    )
    got = {
        (r.t, r.iv_id)
        for r in rj.stab_join_binned(pts, iv, "t", "lo", "hi", 4.0).collect()
    }
    want = {
        (r.t, r.iv_id)
        for r in _naive_stab(spark, pts, iv, "t", "lo", "hi").collect()
    }
    assert got == want
    assert (0.0, 2) not in got            # zero-length never stabs
    assert not any(i == 5 for _, i in got)  # inverted dropped
    assert (4.0, 1) not in got            # half-open upper bound
    assert (16.0, 6) in got               # edge-straddling interval found


def test_stab_join_rejects_bad_width(spark):
    pts = spark.createDataFrame([(1.0,)], "t double")
    with pytest.raises(ValueError, match="bin_width"):
        rj.stab_join_binned(pts, pts, "t", "t", "t", 0.0)


def test_concurrency_variants_agree(spark, obs):
    """Binned range join and join-free sweep-line produce the identical
    frame — and a coarse/fine bin width cannot change the answer."""
    a = sorted(map(tuple, rj.session_concurrency(obs).collect()))
    b = sorted(map(tuple, rj.session_concurrency_sweep(obs).collect()))
    c = sorted(map(tuple, rj.session_concurrency(obs, bin_width=1.5).collect()))
    assert a == b
    assert a == c
    assert len(a) > 0
    assert all(n >= 0 and o >= 0 for _, n, o in a)


def test_concurrency_matches_duckdb(spark, obs):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(rj.session_concurrency_sql()).fetchall())
    )
    got = sorted(map(tuple, rj.session_concurrency(obs).collect()))
    assert got == want


def test_zero_coverage_day_reported(spark):
    """A night inside the grid that no session covers must appear with
    zeros (planted: two obs bursts with a quiet night between)."""
    rows = (
        [(1, "V", t, 10.0) for t in [0.5, 0.9, 1.2]]      # covers instant 1
        + [(3, "V", t, 12.0) for t in [3.8, 4.3]]          # covers instant 4
        + [(2, "V", 2.5, 11.0)]                            # zero-length
    )
    obs = spark.createDataFrame(rows, "star_id long, band string, t double, mag double")
    got = {r.day: (r.n_active, r.obs_in_flight)
           for r in rj.session_concurrency(obs).collect()}
    sweep = {r.day: (r.n_active, r.obs_in_flight)
             for r in rj.session_concurrency_sweep(obs).collect()}
    assert got == sweep
    assert got[1] == (1, 3)   # star 1's session is active at instant 1
    assert got[4] == (1, 2)   # star 3's session is active at instant 4
    assert got[0] == (0, 0)   # session starts after the instant
    assert got[2] == (0, 0)   # star 2's zero-length session stabs nothing
    assert got[3] == (0, 0)   # star 3's session starts at 3.8 > 3


def test_plan_shapes(spark, obs):
    """Neither formulation may fall back to a nested-loop cartesian;
    the stab join must be a broadcast hash join; the sweep's only
    single-partition stage is the bounded day-axis window."""
    p1 = (
        rj.session_concurrency(obs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    p2 = (
        rj.session_concurrency_sweep(obs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for p in (p1, p2):
        assert "NestedLoop" not in p
        assert "Cartesian" not in p
        assert "BroadcastHashJoin" in p
    assert "Exchange SinglePartition" not in p1


def test_null_timestamp_day_reported_by_both_variants(spark):
    """A NULL-t observation yields a NULL day-grid row: both variants
    (and the oracle's LEFT JOIN) must report it as (NULL, 0, 0) — the
    sweep's former inner join silently dropped the NULL key."""
    rows = [(1, "V", 0.5, 10.0), (1, "V", 0.9, 10.1), (2, "V", None, 9.0)]
    obs = spark.createDataFrame(
        rows, "star_id long, band string, t double, mag double"
    )
    a = sorted(
        ((r.day, r.n_active, r.obs_in_flight)
         for r in rj.session_concurrency(obs).collect()),
        key=lambda x: (x[0] is None, x),
    )
    b = sorted(
        ((r.day, r.n_active, r.obs_in_flight)
         for r in rj.session_concurrency_sweep(obs).collect()),
        key=lambda x: (x[0] is None, x),
    )
    assert a == b
    assert (None, 0, 0) in a


def test_stab_join_rejects_bin_column_clash(spark):
    pts = spark.createDataFrame([(1.0, 9)], "t double, _bin long")
    iv = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="_bin"):
        rj.stab_join_binned(pts, iv, "t", "lo", "hi", 1.0)
