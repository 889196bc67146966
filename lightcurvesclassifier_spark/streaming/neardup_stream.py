"""Streaming NEAR-duplicate suppression — the ingest-time face of
``operators/dedup.simhash_pairs``.

Exact dedup (dedup_stream.py) only catches byte-identical content; a
training-data feed also wants boilerplate variants dropped as they
arrive. Composition (same banding scheme as the batch operator, so
batch and stream agree on what counts as a near-dup):

1. Per-document 64-bit SimHash, computed as a pure row expression over
   the token array (one ``aggregate`` pass building the 64 bit-vote
   counters) — stateless, so it runs on an unbounded stream with no
   shuffle. Bit-for-bit identical to the batch ``dedup.simhash``
   lane-packed aggregate (pinned by test).
2. Explode into the 4×16-bit bands and key the state on
   ``(band_idx, band_val)`` — the streaming analog of the batch band
   self-join: hamming ≤ 3 guarantees a shared band (pigeonhole), so
   every true near-dup pair meets in at least one state group.
3. ``applyInPandasWithState``: each band group remembers the FIRST
   document that claimed it (id + full fingerprint). Later arrivals
   emit a candidate row carrying the owner's fingerprint; the exact
   hamming check is a plain column filter downstream — same
   candidates→verify split as the batch operator.

State is O(#distinct band values) with a 5-long payload — bounded by
corpus diversity, not stream length, and sharded by the band key
across executors. A duplicate document yields up to 4 candidate rows
(one per shared band); ``neardup_docs_stream`` reduces them per
micro-batch to one verdict row per document.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_CAND_SCHEMA = (
    "doc_id long, d0 long, d1 long, d2 long, d3 long, "
    "band_idx int, owner_id long, o0 long, o1 long, o2 long, o3 long"
)
_STATE_SCHEMA = "owner_id long, b0 long, b1 long, b2 long, b3 long"


def simhash_bands(text_col: str = "text") -> list[Column]:
    """Per-row 64-bit token SimHash as 4×16-bit band columns.

    Same bit rule as the batch aggregate (dedup.simhash: bit b set iff
    2·ones(b) > n_tokens) but computed with higher-order functions over
    the split array: one ``aggregate`` pass folds every token's hash
    into a 64-slot vote array. No groupBy → usable on a stream."""
    votes = F.expr(
        f"aggregate(split({text_col}, ' '), "
        "array_repeat(0L, 64), "
        "(acc, t) -> zip_with(acc, sequence(0, 63), "
        "  (a, b) -> a + (shiftright(xxhash64(t), b) & 1L)))"
    )
    n_tok = F.size(F.split(F.col(text_col), " "))
    out = []
    for band in range(4):
        expr = F.lit(0).cast("long")
        for i in range(16):
            b = band * 16 + i
            expr = expr + F.when(
                F.element_at(votes, b + 1) * 2 > n_tok, F.lit(1 << i)
            ).otherwise(0)
        out.append(expr.alias(f"band{band}"))
    return out


def _band_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First doc to claim the band owns it; later docs emit candidate
    rows carrying the owner's fingerprint for the hamming verify."""
    if state.exists:
        owner = tuple(state.get)
    else:
        owner = None
    rows = []
    for pdf in pdfs:
        for r in pdf.sort_values("doc_id").itertuples():
            if owner is None:
                owner = (int(r.doc_id), int(r.b0), int(r.b1), int(r.b2), int(r.b3))
            elif int(r.doc_id) != owner[0]:
                rows.append(
                    (
                        int(r.doc_id),
                        int(r.b0), int(r.b1), int(r.b2), int(r.b3),
                        int(key[0]),
                        owner[0], *owner[1:],
                    )
                )
    state.update(owner)
    yield pd.DataFrame(
        rows,
        columns=[
            "doc_id", "d0", "d1", "d2", "d3",
            "band_idx", "owner_id", "o0", "o1", "o2", "o3",
        ],
    )


def neardup_candidates_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc stream → candidate rows (doc, shared band, owner fingerprint).

    Apply the hamming filter + per-doc reduction downstream (the
    foreachBatch sink or :func:`neardup_verdicts`)."""
    fp = docs.select(F.col("doc_id"), *simhash_bands(text_col))
    long = fp.select(
        "doc_id",
        "band0",
        "band1",
        "band2",
        "band3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("band_idx"),
                        F.col(f"band{i}").alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(
        F.col("b.band_idx"),
        F.col("b.band_val"),
        "doc_id",
        F.col("band0").alias("b0"),
        F.col("band1").alias("b1"),
        F.col("band2").alias("b2"),
        F.col("band3").alias("b3"),
    )
    return long.groupBy("band_idx", "band_val").applyInPandasWithState(
        _band_state,
        outputStructType=_CAND_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def neardup_verdicts(candidates: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Per-micro-batch reduction (run inside foreachBatch): candidate
    rows → (doc_id, dup_of, hamming) with hamming ≤ ``max_hamming``,
    keeping the lowest owner id per doc — the batch operator's
    candidates→verify split, as plain column expressions."""
    ham = sum(
        F.bit_count(F.col(f"d{i}").bitwiseXOR(F.col(f"o{i}"))) for i in range(4)
    )
    verified = candidates.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    )
    return verified.groupBy("doc_id").agg(
        F.min(F.struct("owner_id", "hamming")).alias("m")
    ).select(
        "doc_id",
        F.col("m.owner_id").alias("dup_of"),
        F.col("m.hamming").alias("hamming"),
    )
