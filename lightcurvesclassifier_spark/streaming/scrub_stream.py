"""Streaming document scrub — the ingest-time face of the batch text
operators (`operators/text.py`): quality signals + PII redaction applied
to documents *as they arrive*.

The load-bearing property is that the scrub is STATELESS (pure
projection/filter), so the same column expressions the batch pipeline
uses compose onto ``readStream`` unchanged — no state store, no
watermark, unconditional exactly-once from the sink's idempotence.
At 100 TB/day this is the map-only stage fused into the source read;
throughput scales with input partitions alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lightcurvesclassifier_spark.operators.text import (
    pii_counts,
    pii_redacted_text,
    stopword_ratio,
    token_count,
)


def scrub_docs_stream(
    docs: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.8,
) -> DataFrame:
    """Doc stream → per-doc quality + PII columns + keep flag.

    Works identically on a batch DataFrame (the functions are plain
    column expressions); tests pin batch/stream agreement."""
    # the SAME column builders as the batch operators (text.py) — the
    # stream scrub can't silently diverge from the oracled batch path
    t = F.col("text")
    n_tokens = token_count(t)
    stop_ratio = stopword_ratio(t)
    n_em, n_ip, n_ph = pii_counts(t)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        (n_em + n_ip + n_ph).alias("n_pii"),
        F.md5(pii_redacted_text(t)).alias("redacted_md5"),
        (
            (n_tokens >= min_tokens) & (stop_ratio <= max_stopword_ratio)
        ).alias("keep"),
    )
