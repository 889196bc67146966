"""Streaming HyperLogLog — ingest-time distinct counting.

The batch sketch (``operators/sketch.hll_registers``) is mergeable
state by construction: a register table folds with ``max`` per bucket.
That makes the streaming form a plain built-in streaming aggregation —
``groupBy(bucket).max(rank)`` in update mode — whose state is AT MOST
m = 256 rows *total*, forever, no watermark needed.  This is the
canonical "unbounded stream, bounded state" shape: a 100 TB/day feed's
distinct-n-gram tracker holds 256 longs of state per stream.

Parity contract (pinned in tests/test_sketch_stream.py): after
consuming the whole stream, the register table equals the batch
``hll_registers`` over the concatenated input exactly, so the estimate
(via the shared ``sketch.hll_estimate``) is bit-identical to batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.sketch import _hll_parts
from .dedup_stream import doc_stream  # noqa: F401  (shared source)


def hll_register_stream(docs: DataFrame, n: int = 3) -> DataFrame:
    """Unbounded doc stream → continuously-updated HLL register table
    over token ``n``-grams.

    The n-gram explode mirrors ``dedup._ngram_rows`` (same short-doc
    guard, same pre-materialized token split) but is written inline
    because streaming plans cannot reuse the batch helper's
    ``distinct`` path; here every occurrence may stream through — the
    ``max`` aggregate is idempotent to duplicates, which is exactly why
    HLL state composes on a stream."""
    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    terms = docs.withColumn("_toks", F.split(F.col("text"), " ")).select(
        F.explode(grams).alias("term")
    )
    bucket, rank = _hll_parts(F.col("term"))
    return (
        terms.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def cms_counter_stream(docs: DataFrame, n: int = 2) -> DataFrame:
    """Unbounded doc stream → continuously-updated count-min counter
    table over token ``n``-grams.

    Counters fold by SUM, which streaming aggregation state maintains
    natively; state is ≤ d·w rows total, forever.  Exact batch parity:
    after the whole stream, counters equal the batch
    ``sketch.cms_counters`` over the concatenated input (pinned in
    tests), so point estimates off either table agree."""
    from ..operators.sketch import CMS_D, _cms_col

    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    terms = docs.withColumn("_toks", F.split(F.col("text"), " ")).select(
        F.explode(grams).alias("term")
    )
    # one (row, col) coordinate pair per hash row, exploded in a single
    # pass (array of structs) so the stream is scanned once, not d times
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("row"),
                    _cms_col(F.col("term"), i).alias("col"),
                )
                for i in range(CMS_D)
            ]
        )
    ).alias("c")
    return (
        terms.select(coords)
        .select(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )
