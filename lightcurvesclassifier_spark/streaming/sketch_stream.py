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

from pyspark.sql import DataFrame

from ..operators import sketch
from .dedup_stream import doc_stream  # noqa: F401  (shared source)


def hll_register_stream(docs: DataFrame, n: int = 3) -> DataFrame:
    """Unbounded doc stream → continuously-updated HLL register table
    over token ``n``-grams.

    Delegates to the batch ``sketch.hll_registers`` verbatim — its plan
    (n-gram explode via ``dedup._ngram_rows`` + per-bucket ``max``) is
    pure deterministic column ops, which Structured Streaming runs as a
    stateful aggregation unchanged.  The ``max`` fold is idempotent to
    duplicate occurrences, which is exactly why HLL state composes on
    a stream."""
    return sketch.hll_registers(docs, text_col="text", n=n, id_col="doc_id")


def hll_grouped_register_stream(
    docs: DataFrame, group_col: str = "lang", n: int = 3
) -> DataFrame:
    """Unbounded doc stream → continuously-updated PER-GROUP HLL
    register tables (state ≤ m rows per group, forever) — the streaming
    form of the batch rollup (``sketch.hll_grouped``): the same
    (group, bucket)-keyed ``max`` aggregation, so registers — and hence
    every per-group estimate AND their max-merge up the hierarchy —
    are bit-identical to batch over the concatenated input (pinned in
    tests/test_sketch_stream.py)."""
    return sketch.hll_grouped_registers(docs, group_col, "text", n)


def cms_counter_stream(docs: DataFrame, n: int = 2) -> DataFrame:
    """Unbounded doc stream → continuously-updated count-min counter
    table over token ``n``-grams.

    Delegates to the batch ``sketch.cms_counters`` (single-pass
    coordinate explode + SUM aggregation, which streaming state
    maintains natively); state is ≤ d·w rows total, forever.  Exact
    batch parity is pinned in tests: after the whole stream, counters
    equal the batch sketch over the concatenated input, so point
    estimates off either table agree."""
    return sketch.cms_counters(docs, text_col="text", n=n, id_col="doc_id")


def bloom_bits_stream(docs: DataFrame, n: int = 5) -> DataFrame:
    """Unbounded doc stream → the Bloom filter's set bits, incrementally.

    OR-ing a Bloom filter is the distinct union of its bits, so the
    streaming form is ``dropDuplicates`` on the bit value: state is
    ≤ m rows forever, each bit is emitted exactly once (append
    semantics — a downstream consumer materializes the filter by
    unioning emitted bits).  Exact batch parity with
    ``sketch.bloom_bits`` over the concatenated stream is pinned in
    tests."""
    from ..operators.dedup import _ngram_rows
    from ..operators.sketch import _exploded_bits

    sh = _ngram_rows(
        docs, n, "text", "doc_id",
        key_fn=lambda s: s, empty_type="string", out_col="shingle",
        distinct=False,
    )
    return _exploded_bits(sh, "shingle", []).dropDuplicates(["bit"])


def bloom_probe_stream(
    docs: DataFrame, evals: DataFrame, n: int = 5
) -> DataFrame:
    """Streaming decontamination probe (r6 stretch #7 — the one sketch
    that had no streaming analog wired to a query): an unbounded train
    stream probed against the Bloom filter of a STATIC eval suite.

    Delegates to the batch ``sketch.bloom_probe_fast`` verbatim: the
    eval side collapses to the same ≤ m-bit plan literal (built once,
    at wiring time, from the static eval set — the 2-KiB-broadcast
    contract), and the probe itself is row-local higher-order column
    ops with no aggregate, so Structured Streaming runs it UNCHANGED in
    append mode with zero state.  This is the 100 TB ingest shape:
    every arriving document is scored against the benchmark suite
    before it ever lands in the corpus.  Exact batch parity over the
    concatenated stream is pinned in tests/test_sketch_stream.py.

    ``evals`` must be a static (batch) DataFrame — the filter is a plan
    constant, so eval-suite updates mean re-wiring the stream (exactly
    like redeploying with a new benchmark list)."""
    if evals.isStreaming:
        raise ValueError(
            "bloom_probe_stream builds the filter once from a STATIC "
            "eval set; got a streaming evals DataFrame"
        )
    return sketch.bloom_probe_fast(
        docs, evals, text_col="text", n=n, id_col="doc_id"
    )
