"""Systematic search — the reference's StarsSearcher re-expressed as one
declarative plan plus append-mode sinks.

Reference (lcc/systematic_search/stars_searcher.py:18-346): for each
query dict — fetch stars, keep those with curves, run the filter's
getAllPredictions, persist passed stars, append one status-ledger row
per (query, star) with the features, per-decider probabilities and
passed flags; ``getUnsearchedQuery`` (lcc/data_manager/
status_resolver.py:257-264) resumes by subtracting logged queries.

Spark shape: the per-query Python loop becomes a single broadcast range
join of the (small) query table against the (huge) feature table — every
query is matched in one scan of the data, the ledger is the join output,
and the two sinks are append-mode writes. The rq/redis work queue of the
reference is replaced by partition parallelism (and by the Structured
Streaming wrapper in ``streaming/search_stream.py`` for the long-running
feed shape).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..plans.query_compiler import range_predicate

QUERY_SCHEMA = "query_id long, lo long, hi long"


def queries_df(
    spark: SparkSession, ranges: Sequence[tuple[int, int]]
) -> DataFrame:
    """Materialize [(lo, hi), …] id-range queries as a small dimension —
    the `list[dict]` query plan of the reference, tabular.

    CONTRACT: query_id is the list position, so a resumable plan must be
    APPEND-ONLY — inserting/reordering ranges renumbers them and the
    ledger's done-set silently mismatches (skipping new queries and
    re-running renumbered ones). Extend the list at the end, or supply
    your own stable query_id column instead of this helper."""
    return spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(ranges)], QUERY_SCHEMA
    )


def run_search(
    features: DataFrame,
    queries: DataFrame,
    passed_ranges: Mapping[str, tuple[float | None, float | None]],
    key: str = "star_id",
) -> DataFrame:
    """The search ledger: one row per (query, found star).

    ``features`` is the descriptor output (one row per star);
    ``queries`` the (query_id, lo, hi) dimension; ``passed_ranges`` the
    CustomDecider boundary predicate deciding ``passed``.

    The join is a broadcast theta join on the range condition — the big
    side streams through untouched (no shuffle); at 100 TB this is the
    only viable shape (queries are few, stars are not).
    """
    q = F.broadcast(queries)
    cond = (F.col(key) >= F.col("lo")) & (F.col(key) <= F.col("hi"))
    joined = features.join(q, cond, "inner")
    passed: Column = range_predicate(passed_ranges)
    matched = joined.select(
        "query_id",
        key,
        *[c for c in features.columns if c != key],
        F.lit(True).alias("found"),
        passed.alias("passed"),
    )
    # queries that matched NO star still get one found=false ledger row
    # (uploadStatus logs every query) — without it the resume anti-join
    # re-executes empty-result queries forever.
    #
    # The matched query ids are materialized EAGERLY (bounded by
    # |queries|, which is broadcast-small by the operator contract): an
    # anti-join against the lazy `matched` would re-execute the entire
    # feature scan + theta join a second time every time the ledger is
    # materialized — at 100 TB, two full passes where one suffices.
    matched_qids = [
        r[0] for r in matched.select("query_id").distinct().collect()
    ]
    no_match = (
        ~F.col("query_id").isin(matched_qids) if matched_qids else F.lit(True)
    )
    unmatched = (
        queries.filter(no_match)
        .select(
            "query_id",
            *[
                F.lit(None).cast(features.schema[c].dataType).alias(c)
                for c in ([key] + [c for c in features.columns if c != key])
            ],
            F.lit(False).alias("found"),
            F.lit(False).alias("passed"),
        )
    )
    return matched.unionByName(unmatched)


def write_results(
    ledger: DataFrame,
    ledger_path: str,
    passed_path: str | None = None,
) -> None:
    """Append-mode sinks: the status ledger (uploadStatus,
    stars_searcher.py:188-215) and the passed-star store (matchOccured,
    :46-61 — parquet instead of per-star FITS)."""
    if passed_path is None:
        ledger.write.mode("append").parquet(ledger_path)
        return
    # persist across the two actions: an unmaterialized plan would
    # recompute the whole search per sink (and could diverge between
    # them if the feature source moved)
    ledger.persist()
    try:
        ledger.write.mode("append").parquet(ledger_path)
        ledger.filter(F.col("passed")).write.mode("append").parquet(passed_path)
    finally:
        ledger.unpersist()


def unsearched_queries(plan: DataFrame, ledger: DataFrame) -> DataFrame:
    """Resume semantics: planned queries minus already-logged ones
    (getUnsearchedQuery, status_resolver.py:257-264) — a left-anti join
    on the query key."""
    done = ledger.select("query_id").distinct()
    return plan.join(done, "query_id", "left_anti")


def search_and_resume(
    spark: SparkSession,
    features_fn: Callable[[], DataFrame],
    plan: DataFrame,
    passed_ranges: Mapping[str, tuple[float | None, float | None]],
    ledger_path: str,
    passed_path: str | None = None,
) -> int:
    """End-to-end driver: resume-filter the plan, run, append. Returns the
    number of queries actually executed this run."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        existing = spark.read.parquet(ledger_path)
        todo = unsearched_queries(plan, existing)
    except AnalysisException as e:
        # ONLY the missing-path case means "first run"; any other read
        # failure (corrupt footer, permissions) must propagate — treating
        # it as first-run would re-run and double-append every query
        if "PATH_NOT_FOUND" not in str(e):
            raise
        todo = plan
    n = todo.count()
    if n == 0:
        return 0
    ledger = run_search(features_fn(), todo, passed_ranges)
    write_results(ledger, ledger_path, passed_path)
    return n
