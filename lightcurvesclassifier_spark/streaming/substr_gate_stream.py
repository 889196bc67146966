"""Streaming ExactSubstr ingest gate — arrivals probed against the
AT-REST corpus's k-token span table (streaming suite #15, the
span-level sibling of the MinHash and SRP-embedding gates).

``operators/dedup.exact_substr_scrub`` is the nightly batch pass: it
removes every duplicated span occurrence except the globally first.  A
training-data feed also wants to know AT INGEST whether an arrival
repeats k-token spans already on disk — before it is appended and the
nightly pass has to cut it.  The 100 TB shape:

1. the arrival's span keys are ONE row expression (xxhash64 over
   space-joined k-slices — byte-identical to the batch operator's
   keys, so a gate hit means exactly "the combined-corpus scrub would
   see this span duplicated");  stateless, zero shuffle, no state
   store;
2. ``posexplode`` to (doc, pos, span) rows — occurrence-level, because
   the batch scrub marks token POSITIONS, and the gate reports how
   much of the arrival is at-rest-duplicated;
3. stream-static inner join against the at-rest DISTINCT span table
   (``span_table`` — regenerate it on each nightly scrub and the gate
   picks it up next micro-batch, no restart; ~8 bytes/span, broadcast
   for small corpora, shuffle join beyond).

The gate sees CROSS-BOUNDARY duplication only (within-arrival and
within-stream repeats are the batch pass's and ``neardup_stream``'s
job — same division of labor as the MinHash gate).  A flagged span
means one side of it will be scrubbed by the next batch pass; which
side depends on the global (doc_id, pos) order, which ingest order
cannot know — the gate's contract is collision, not verdict, exactly
like the band-collision contract of the MinHash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import SPAN_K, span_hash_grams


def span_table(
    corpus: DataFrame, k: int = SPAN_K,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """The AT-REST side: DISTINCT span hashes of the corpus — write to
    parquet on each nightly scrub pass and point the gate at it."""
    toks = corpus.withColumn("_toks", F.split(F.col(text_col), " "))
    return (
        toks.select(
            F.explode(span_hash_grams(F.col("_toks"), k)).alias("span")
        ).distinct()
    )


def substr_gate_stream(
    docs: DataFrame,
    rest_spans: DataFrame,
    k: int = SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unbounded doc stream → (doc_id, pos, span) candidate rows, one
    per arrival span occurrence whose span exists at rest.  Stateless
    stream-static inner join (static side re-read per micro-batch)."""
    toks = docs.withColumn("_toks", F.split(F.col(text_col), " "))
    spans = toks.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.posexplode(span_hash_grams(F.col("_toks"), k)).alias(
            "pos", "span"
        ),
    )
    return spans.join(rest_spans, "span").select(
        id_col, "n_tokens", "pos", "span"
    )


def gate_verdicts(
    candidates: DataFrame, k: int = SPAN_K, id_col: str = "doc_id"
) -> DataFrame:
    """Per micro-batch reduction for a foreachBatch sink: one row per
    flagged arrival — how many of its span positions are at-rest
    duplicates, and how many of its TOKENS the combined-corpus scrub
    would mark if the at-rest copies keep precedence (the merged
    interval length of the flagged spans)."""
    marked = (
        candidates.select(
            id_col,
            "n_tokens",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("idx"),
        )
        .groupBy(id_col)
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.size(F.collect_set("idx")).cast("long").alias("n_marked_tokens"),
        )
    )
    dup = candidates.groupBy(id_col).agg(
        F.count("*").alias("n_rest_dup_spans")
    )
    return dup.join(marked, id_col).select(
        id_col,
        "n_tokens",
        F.col("n_rest_dup_spans").cast("long").alias("n_rest_dup_spans"),
        "n_marked_tokens",
    )
