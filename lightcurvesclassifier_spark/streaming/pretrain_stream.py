"""Composed streaming pre-training ingest — the four individually
parity-pinned gates chained into ONE streaming query, the deployment
shape of ``operators/pipelines.pretraining_corpus``.

A real ingest does not run four separate streams; it runs one:

1. **quality gate** — map-only token-count filter (the
   ``pretraining_corpus`` rule; the Gopher rule set of
   ``text.gopher_quality_filter`` is the drop-in alternative — both are
   pure projections and run unchanged on a stream, see
   ``tests/test_streaming_gopher`` for its parity pin),
2. **exact-hash first-seen dedup** — ``dropDuplicatesWithinWatermark``
   keyed on the content fingerprint (state ∝ distinct fingerprints
   inside the watermark horizon, the ``dedup_stream`` contract),
3. **MinHash band probe** against the nightly at-rest band table
   (``minhash_gate_stream``'s stream-static join),
4. **decontamination** — Bloom prefilter against the nightly eval-set
   bit table (sound: a truly shared shingle always probes positive),
   with the EXACT containment join (``contamination_pairs``) run only
   on the flagged docs — at 100 TB the exact join's input is bounded
   by the Bloom flag rate, not the stream rate.

Stages 1-2 run ON the stream (stateful dedup, map-only quality);
stages 3-4 are per-micro-batch reductions in a ``foreachBatch`` sink —
the established gate shape (their static sides are re-read per batch,
which is exactly the refresh semantics nightly-rebuilt artifacts want).

Keep-set contract (pinned in ``tests/test_pretrain_stream.py``): when
arrivals are fed in doc_id order, the surviving (keep=true) doc set
EQUALS ``pretraining_corpus``'s batch keep list on the concatenated
input — the quality and canonical rules are expression-identical, and
the Bloom prefilter + exact verify drops exactly the batch pipeline's
contaminated set (the prefilter is a pure no-false-negative speedup).
Out-of-order arrival changes WHICH duplicate represents a fingerprint
(first arrival vs min id), never the kept fingerprint set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.decontamination import contamination_pairs
from ..operators.dedup import SHINGLE_N
from ..operators.pipelines import CONTAM_THRESHOLD, MIN_TOKENS
from ..operators.sketch import bloom_probe_bits
from ..operators.text import token_count
from .minhash_gate_stream import with_minhash_bands

NUM_HASHES, BANDS = 16, 8


def pretrain_gate_stream(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-side stages: quality gate + first-seen exact dedup.

    Fingerprint = md5 of the RAW text — ``pretraining_corpus``'s
    identity (``dedup_stream`` uses the case-folded variant; the
    composed pipeline mirrors the batch pipeline it is the deployment
    of). Output carries (doc_id, text, event_time, n_tokens,
    fingerprint) for the micro-batch probes."""
    q = (
        docs.withColumn(
            "n_tokens", token_count(F.col("text")).cast("long")
        )
        .filter(F.col("n_tokens") >= min_tokens)
        .withColumn("fingerprint", F.md5(F.col("text")))
    )
    return q.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def pretrain_verdicts(
    batch_df: DataFrame,
    band_table: DataFrame,
    eval_bits: DataFrame,
    evals: DataFrame,
    threshold: float = CONTAM_THRESHOLD,
    n: int = SHINGLE_N,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    merges: list | None = None,
) -> DataFrame:
    """Per micro-batch probes + final verdict, for a ``foreachBatch``
    sink. One row per first-seen quality-passing arrival:

    (doc_id, n_tokens, fingerprint, n_band_matches, n_maybe_shingles,
    contaminated, keep) — ``keep`` = not contaminated (the
    ``pretraining_corpus`` keep rule; band matches ride as a signal
    column exactly like the standalone gate, since the batch pipeline
    does not near-dedup). ``contaminated`` is EXACT: the Bloom probe
    (vs the precomputed nightly ``eval_bits``) bounds the candidate
    set, then ``contamination_pairs`` verifies containment ≥ threshold
    against the real eval table — sound because a contaminated doc
    shares ≥ 1 shingle with some eval doc and Bloom has no false
    negatives.

    ``merges``: optional learned BPE merge list (``bpe.bpe_learn``
    output pairs) — when given, kept documents additionally carry
    training-ready ``tokens_str``/``n_bpe_tokens`` columns
    (``bpe.bpe_apply``'s map-only folds, running on the already-gated
    micro-batch rows), completing the ingest: quality → dedup →
    decontaminate → tokenize in ONE streaming query."""
    rows = num_hashes // bands
    band_cols = ["band_idx"] + [f"v{r}" for r in range(rows)]
    stream_bands = with_minhash_bands(
        batch_df, num_hashes, bands, SHINGLE_N
    )
    band_hits = (
        stream_bands.join(band_table, band_cols)
        .filter(F.col("doc_id") != F.col("at_rest_id"))
        .groupBy("doc_id")
        .agg(F.countDistinct("at_rest_id").alias("n_band_matches"))
    )
    probe = bloom_probe_bits(batch_df, eval_bits, n=n).select(
        "doc_id", F.col("n_maybe").alias("n_maybe_shingles")
    )
    flagged = batch_df.join(
        probe.filter(F.col("n_maybe_shingles") > 0).select("doc_id"),
        "doc_id",
    )
    contaminated = (
        contamination_pairs(
            flagged.select("doc_id", "text"), evals, n=n,
            threshold=threshold,
        )
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("_contam", F.lit(1))
    )
    base = batch_df.select("doc_id", "n_tokens", "fingerprint")
    tok_cols = []
    if merges is not None:
        from ..operators.bpe import bpe_apply

        toks = bpe_apply(batch_df, list(merges)).select(
            "doc_id",
            F.array_join("tokens", " ").alias("tokens_str"),
            F.col("n_tokens").alias("n_bpe_tokens"),
        )
        base = base.join(toks, "doc_id", "left")
        tok_cols = [
            F.coalesce("tokens_str", F.lit("")).alias("tokens_str"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
                "n_bpe_tokens"
            ),
        ]
    return (
        base.join(band_hits, "doc_id", "left")
        .join(probe, "doc_id", "left")
        .join(F.broadcast(contaminated), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "fingerprint",
            F.coalesce("n_band_matches", F.lit(0)).cast("long").alias(
                "n_band_matches"
            ),
            F.coalesce("n_maybe_shingles", F.lit(0)).cast("long").alias(
                "n_maybe_shingles"
            ),
            F.col("_contam").isNotNull().alias("contaminated"),
            F.col("_contam").isNull().alias("keep"),
            *tok_cols,
        )
    )
