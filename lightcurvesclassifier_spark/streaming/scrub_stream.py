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
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    STOPWORDS,
)


def scrub_docs_stream(
    docs: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.8,
) -> DataFrame:
    """Doc stream → per-doc quality + PII columns + keep flag.

    Works identically on a batch DataFrame (the functions are plain
    column expressions); tests pin batch/stream agreement."""
    t = F.col("text")
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))) / n_tokens
    red = F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PII_IPV4_RE, "[IP]")
    red = F.regexp_replace(red, PII_PHONE_RE, "[PHONE]")
    n_pii = (
        F.regexp_count(t, F.lit(PII_EMAIL_RE))
        + F.regexp_count(t, F.lit(PII_IPV4_RE))
        + F.regexp_count(t, F.lit(PII_PHONE_RE))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        n_pii.alias("n_pii"),
        F.md5(red).alias("redacted_md5"),
        (
            (n_tokens >= min_tokens) & (stop_ratio <= max_stopword_ratio)
        ).alias("keep"),
    )
