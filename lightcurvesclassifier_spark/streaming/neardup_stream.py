"""Streaming NEAR-duplicate suppression — the ingest-time face of
``operators/dedup.simhash_pairs``.

Exact dedup (dedup_stream.py) only catches byte-identical content; a
training-data feed also wants boilerplate variants dropped as they
arrive. Composition (same banding scheme as the batch operator, so
batch and stream agree on what counts as a near-dup):

1. Per-document 60-bit md5-keyed SimHash, computed as a pure row
   expression over the token array (one ``aggregate`` pass building the
   60 bit-vote counters) — stateless, so it runs on an unbounded stream
   with no shuffle. Bit-for-bit identical to the batch ``dedup.simhash``
   lane-packed aggregate (pinned by test).
2. Explode into the 4×15-bit bands and key the state on
   ``(band_idx, band_val)`` — the streaming analog of the batch band
   self-join: hamming ≤ 3 guarantees a shared band (pigeonhole), so
   every true near-dup pair meets in at least one state group.
3. ``applyInPandasWithState``: each band group keeps the fingerprints
   of up to ``_MAX_OWNERS`` mutually-distinct documents that claimed
   the band (a single 15-bit band collision does NOT imply near-dup, so
   one owner is not enough — two true near-dups arriving after an
   unrelated claimant must still meet). An arrival is compared against
   every owner; matches (hamming ≤ max) emit candidate rows, a
   non-match becomes a new owner while capacity lasts.

State is O(#distinct band values × _MAX_OWNERS) longs — bounded by
corpus diversity, not stream length, and sharded by the band key
across executors. The owner cap is the documented approximation (an
over-full band group stops tracking new distinct claimants; the
at-rest batch pass remains the backstop, exactly how production
pipelines layer the two). A duplicate document yields up to 4×owners
candidate rows; ``neardup_verdicts`` reduces them per micro-batch to
one verdict row per document.

POLICY — greedy leader clustering, deliberately weaker than the batch
transitive pass: a matched (suppressed) arrival does NOT claim an
owner slot, so arrivals are only ever compared against RETAINED
documents. A later doc that is hamming-close to a *suppressed* doc but
far from every leader is kept (it is genuinely not a near-dup of
anything retained) — the batch pass, clustering transitively, would
also fold it into the suppressed doc's cluster. This is the standard
streaming trade (owner slots hold distinct surviving content, not
duplicates); the batch backstop closes the transitive chains.

NOTE: the state layout changed from a single flat owner struct to the
array-per-field multi-owner form — a checkpoint written by the earlier
layout is not resumable (Spark rejects the state schema change); start
the query with a fresh checkpoint location.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_CAND_SCHEMA = (
    "doc_id long, d0 long, d1 long, d2 long, d3 long, "
    "band_idx int, owner_id long, o0 long, o1 long, o2 long, o3 long"
)
_STATE_SCHEMA = (
    "ids array<long>, f0 array<long>, f1 array<long>, "
    "f2 array<long>, f3 array<long>"
)
_MAX_OWNERS = 8


def with_simhash_bands(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``df`` + 4×15-bit band columns of the per-row 60-bit token
    SimHash.

    Same hash and bit rule as the batch aggregate (dedup.simhash: 60-bit
    md5-derived token hash, bit b set iff 2·ones(b) > n_tokens — the
    md5 scheme is what makes the batch path oracle-checkable, and the
    stream must stay bit-for-bit identical to it) but computed with
    higher-order functions over the split array: one ``aggregate`` pass
    folds every token's hash into a 60-slot vote array. No groupBy →
    usable on a stream.

    The vote array is STAGED as its own projection before the 60 bit
    tests reference it: the four band expressions hold 60 references to
    ``_votes``, which blocks CollapseProject from inlining the (non-
    cheap) aggregate — inlined, the fold ran ~3× slower per document
    (measured at 3.8s vs 1.3s on a 4000-doc batch, local[1])."""
    # tokens are hashed ONCE in the inner transform(); hashing inside
    # the per-bit zip_with lambda would re-run md5 60× per token (no
    # CSE inside lambdas — same pitfall as dedup.shingles)
    votes = F.expr(
        f"aggregate(transform(split({text_col}, ' '), "
        "  t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)), "
        "array_repeat(0L, 60), "
        "(acc, h) -> zip_with(acc, sequence(0, 59), "
        "  (a, b) -> a + (shiftright(h, b) & 1L)))"
    )
    n_tok = F.size(F.split(F.col(text_col), " "))
    staged = df.withColumn("_votes", votes).withColumn("_ntok", n_tok)
    bands = []
    for band in range(4):
        expr = F.lit(0).cast("long")
        for i in range(15):
            b = band * 15 + i
            expr = expr + F.when(
                F.element_at(F.col("_votes"), b + 1) * 2 > F.col("_ntok"),
                F.lit(1 << i),
            ).otherwise(0)
        bands.append(expr.alias(f"band{band}"))
    return staged.select(*df.columns, *bands)


def _make_band_state(max_hamming: int):
    def _band_state(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Compare each arrival against every tracked owner of the band;
        matches emit candidate rows, non-matches claim an owner slot."""
        if state.exists:
            ids, f0, f1, f2, f3 = state.get
            owners = [
                (int(ids[i]), int(f0[i]), int(f1[i]), int(f2[i]), int(f3[i]))
                for i in range(len(ids))
            ]
        else:
            owners = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = []
        if chunks:
            # ONE sort over the whole micro-batch group (Arrow may split
            # it into chunks; per-chunk sorting would make the owner —
            # and thus the emitted pairs — depend on chunk boundaries)
            batch = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            known = {o[0] for o in owners}
            for r in batch.itertuples():
                did = int(r.doc_id)
                if did in known:
                    continue
                fp = (int(r.b0), int(r.b1), int(r.b2), int(r.b3))
                matched = False
                for o in owners:
                    ham = sum(
                        bin(fp[i] ^ o[i + 1]).count("1") for i in range(4)
                    )
                    if ham <= max_hamming:
                        matched = True
                        rows.append((did, *fp, int(key[0]), o[0], *o[1:]))
                if not matched and len(owners) < _MAX_OWNERS:
                    owners.append((did, *fp))
                    known.add(did)
        state.update((
            [o[0] for o in owners],
            [o[1] for o in owners],
            [o[2] for o in owners],
            [o[3] for o in owners],
            [o[4] for o in owners],
        ))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "d0", "d1", "d2", "d3",
                "band_idx", "owner_id", "o0", "o1", "o2", "o3",
            ],
        )

    return _band_state


def neardup_candidates_stream(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """doc stream → candidate rows (doc, shared band, owner fingerprint).

    Apply the hamming filter + per-doc reduction downstream (the
    foreachBatch sink or :func:`neardup_verdicts`)."""
    fp = with_simhash_bands(docs.select("doc_id", text_col), text_col).drop(
        text_col
    )
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
        _make_band_state(max_hamming),
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
