"""Systematic search: ledger grain, append/resume semantics, and the
Structured Streaming work-queue analog (mirrors the reference's
integration test shape, test/intergation/test_searcher.py:13-40 —
N queries in, ledger rows per query out, passed stars > 0)."""

import time

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.functions.curves import curve_features
from lightcurvesclassifier_spark.operators import searcher
from lightcurvesclassifier_spark.sources import testdata
from lightcurvesclassifier_spark.streaming.search_stream import start_search_stream
from tests.conftest import SF_SMOKE

RANGES = {"abbe": (None, 0.95), "std_mag": (35.0, None)}


def _features(spark):
    return curve_features(testdata.observations(spark, SF_SMOKE))


def test_ledger_grain_and_flags(spark):
    qdf = searcher.queries_df(spark, [(0, 7), (5, 14)])
    ledger = searcher.run_search(_features(spark), qdf, RANGES)
    rows = ledger.collect()
    # overlap 5..7 matched by both queries → per-(query, star) grain
    per_star = {}
    for r in rows:
        per_star.setdefault(r["star_id"], set()).add(r["query_id"])
    for sid in (5, 6, 7):
        assert per_star[sid] == {0, 1}
    assert all(r["found"] for r in rows)
    assert any(r["passed"] for r in rows)
    assert not all(r["passed"] for r in rows)


def test_append_and_resume(spark, tmp_path):
    ledger_path = str(tmp_path / "ledger")
    passed_path = str(tmp_path / "passed")
    plan = searcher.queries_df(spark, [(0, 4), (5, 9), (10, 14)])

    n1 = searcher.search_and_resume(
        spark, lambda: _features(spark), plan, RANGES, ledger_path, passed_path
    )
    assert n1 == 3
    first = spark.read.parquet(ledger_path)
    assert first.select("query_id").distinct().count() == 3
    passed = spark.read.parquet(passed_path)
    assert passed.count() == first.filter(F.col("passed")).count() > 0

    # resume: same plan + one new query → only the new one runs
    plan2 = searcher.queries_df(spark, [(0, 4), (5, 9), (10, 14), (0, 14)]).withColumn(
        "query_id", F.col("query_id")
    )
    n2 = searcher.search_and_resume(
        spark, lambda: _features(spark), plan2, RANGES, ledger_path
    )
    assert n2 == 1
    after = spark.read.parquet(ledger_path)
    assert after.select("query_id").distinct().count() == 4
    # idempotent: running again does nothing
    n3 = searcher.search_and_resume(
        spark, lambda: _features(spark), plan2, RANGES, ledger_path
    )
    assert n3 == 0


def test_streaming_search(spark, tmp_path):
    qdir = tmp_path / "queries_in"
    qdir.mkdir()
    ledger_path = str(tmp_path / "stream_ledger")
    ckpt = str(tmp_path / "ckpt")

    (qdir / "batch1.csv").write_text("0,0,4\n1,5,9\n")
    (qdir / "batch2.csv").write_text("2,10,14\n")

    q = start_search_stream(
        spark,
        str(qdir),
        lambda: _features(spark),
        RANGES,
        ledger_path,
        ckpt,
    )
    q.awaitTermination(120)
    ledger = spark.read.parquet(ledger_path)
    assert ledger.select("query_id").distinct().count() == 3
    assert ledger.filter(F.col("passed")).count() > 0

    # restart with one more file: checkpoint resumes, old batches not rerun
    (qdir / "batch3.csv").write_text("3,0,14\n")
    q2 = start_search_stream(
        spark, str(qdir), lambda: _features(spark), RANGES, ledger_path, ckpt
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(ledger_path)
    assert after.select("query_id").distinct().count() == 4
    assert after.filter(F.col("query_id") == 0).count() == ledger.filter(
        F.col("query_id") == 0
    ).count()


def test_unsearched_queries_anti_join(spark):
    plan = searcher.queries_df(spark, [(0, 1), (2, 3), (4, 5)])
    done = plan.filter(F.col("query_id") < 2).select("query_id", "lo", "hi")
    todo = searcher.unsearched_queries(plan, done)
    assert [r["query_id"] for r in todo.collect()] == [2]


def test_zero_match_query_gets_ledger_row_and_resume_stops(spark, tmp_path):
    """A query matching no star must still log one found=false row so
    resume marks it done (it previously re-executed forever)."""
    from lightcurvesclassifier_spark.operators import searcher as s

    feats = spark.createDataFrame(
        [(1, 0.5), (2, 0.8)], "star_id long, abbe double"
    )
    plan = s.queries_df(spark, [(1, 2), (1000, 2000)])
    ledger_path = str(tmp_path / "ledger")
    n1 = s.search_and_resume(
        spark, lambda: feats, plan, {"abbe": (None, 0.9)}, ledger_path
    )
    assert n1 == 2
    got = spark.read.parquet(ledger_path).toPandas()
    empty_q = got[got.query_id == 1]
    assert len(empty_q) == 1
    assert not empty_q.found.iloc[0] and not empty_q.passed.iloc[0]
    assert empty_q.star_id.isna().all()
    # second run: nothing to do — including the zero-match query
    n2 = s.search_and_resume(
        spark, lambda: feats, plan, {"abbe": (None, 0.9)}, ledger_path
    )
    assert n2 == 0


def test_query_dsl_two_char_operators(spark):
    """'>=' / '<=' / '!=' parse as operators, not '>' with a string
    literal (which ANSI mode failed to cast at runtime)."""
    from lightcurvesclassifier_spark.plans.query_compiler import apply_queries

    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    assert apply_queries(df, [{"v": ">=7"}]).count() == 3
    assert apply_queries(df, [{"v": "<=2"}]).count() == 3
    assert apply_queries(df, [{"v": "!=5"}]).count() == 9
    # empty disjunction matches nothing (was: full table)
    assert apply_queries(df, []).count() == 0


def test_ledger_crash_replay_is_idempotent(spark, tmp_path):
    """r6 stretch #8: exactly-once under crash-replay.  A driver that
    crashes between write_results' append and its own bookkeeping will
    REPLAY the same batch — append the identical ledger batch twice and
    pin that (a) the resume filter still schedules nothing (no query
    re-executes, so the duplication cannot compound), and (b) the
    ledger's logical content — its distinct (query_id, star_id,
    found, passed) grain — is unchanged by the replay."""
    ledger_path = str(tmp_path / "ledger")
    plan = searcher.queries_df(spark, [(0, 4), (5, 9)])

    n1 = searcher.search_and_resume(
        spark, lambda: _features(spark), plan, RANGES, ledger_path
    )
    assert n1 == 2
    once = spark.read.parquet(ledger_path)
    grain_cols = ["query_id", "star_id", "found", "passed"]
    want = {tuple(r) for r in once.select(*grain_cols).collect()}

    # crash replay: the exact same batch is appended a second time
    batch = searcher.run_search(_features(spark), plan, RANGES)
    searcher.write_results(batch, ledger_path)
    replayed = spark.read.parquet(ledger_path)
    assert replayed.count() == 2 * once.count()  # physical dupes exist

    # (a) resume sees every planned query as done → zero re-runs
    n2 = searcher.search_and_resume(
        spark, lambda: _features(spark), plan, RANGES, ledger_path
    )
    assert n2 == 0
    # ...including for a superset plan: only the genuinely-new query runs
    plan2 = searcher.queries_df(spark, [(0, 4), (5, 9), (10, 14)])
    n3 = searcher.search_and_resume(
        spark, lambda: _features(spark), plan2, RANGES, ledger_path
    )
    assert n3 == 1

    # (b) the replay added no new logical fact for the replayed queries
    got = {
        tuple(r)
        for r in spark.read.parquet(ledger_path)
        .filter(F.col("query_id").isin(0, 1))
        .select(*grain_cols)
        .collect()
    }
    assert got == want
