"""Streaming MinHash near-dup gate — new arrivals probed against the
AT-REST corpus (the r7 verdict's ingest-time near-dup item).

``neardup_stream`` (SimHash + ``applyInPandasWithState``) catches
near-dups *within the stream*; a training-data feed also wants each
arrival checked against the corpus already on disk.  The 100 TB shape
for that is a STREAM-STATIC JOIN against the at-rest MinHash band
table (``minhash_band_rows`` — the exact banding
``operators/dedup.minhash_pairs`` uses, so gate flags and batch pairs
agree on what counts as a candidate):

1. the arrival's MinHash signature is computed as a pure ROW expression
   over its distinct-shingle key array (``array_min`` over a
   ``transform`` per hash function — stateless, zero shuffle, and
   value-identical to the batch explode+groupBy aggregate: pinned in
   tests);
2. the signature explodes into bands, and the band rows join the
   static band table on the full band tuple — Spark re-plans the
   static side per micro-batch, so a nightly-refreshed band table is
   picked up without restarting the query; the band table is ``bands``
   small-int rows per at-rest doc, broadcastable for corpora up to
   ~10⁸ docs and a plain shuffle join beyond;
3. every (arrival, at-rest doc) band collision emits a candidate row —
   the gate's contract is the LSH guarantee (every true near-dup pair
   collides in ≥1 band with the batch operator's probability), and the
   exact-verify stays in the at-rest batch pass, exactly how production
   pipelines layer ingest gates over nightly dedup.

``gate_verdicts`` reduces candidate rows per micro-batch to one row per
arrival (flag + matched at-rest ids) for a foreachBatch sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.dedup import (
    MINHASH_PRIME,
    SHINGLE_N,
    _md5_int60,
    _minhash_coeffs,
)


def _shingle_keys(text_col: str, n: int) -> Column:
    """Distinct 60-bit md5 shingle keys of a document as ONE row-level
    array expression (``operators/dedup.shingles_md5`` semantics —
    short-doc guard, map-side distinct — without the explode, so it
    runs on an unbounded stream with no shuffle)."""
    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: _md5_int60(F.array_join(F.slice(tk, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(grams)


def with_minhash_bands(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band_idx, v0..v{rows-1}) — one row per (document, band),
    computed entirely as row expressions (works identically on a static
    frame and a stream).  Docs with < ``n`` tokens have no shingles and
    emit no bands, matching the batch operator.

    The affine hash family, 28-bit key shift, band layout and
    ``MINHASH_PRIME`` are byte-identical to
    ``operators/dedup.minhash_pairs`` — signature parity with the
    explode+groupBy path is pinned in tests, so a gate flag means "the
    batch pass would have banded these together"."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}"
        )
    rows = num_hashes // bands
    coeffs = _minhash_coeffs(num_hashes)
    keyed = (
        df.withColumn("_toks", F.split(F.col(text_col), " "))
        .withColumn("_keys", _shingle_keys(text_col, n))
        .filter(F.size("_keys") > 0)
    )
    sigs = [
        F.array_min(
            F.transform(
                F.col("_keys"),
                lambda k: (F.lit(a) * F.shiftright(k, 32) + F.lit(b))
                % F.lit(MINHASH_PRIME),
            )
        ).alias(f"s{h}")
        for h, (a, b) in enumerate(coeffs)
    ]
    sig = keyed.select(F.col(id_col), *sigs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                *[
                    F.col(f"s{b * rows + r}").alias(f"v{r}")
                    for r in range(rows)
                ],
            )
            for b in range(bands)
        ]
    )
    band_cols = ["band_idx"] + [f"v{r}" for r in range(rows)]
    return sig.select(F.col(id_col), F.explode(band_structs).alias("_b")).select(
        id_col, *[F.col(f"_b.{c}").alias(c) for c in band_cols]
    )


def minhash_band_rows(
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The AT-REST side: the corpus's band table, renamed to
    (at_rest_id, band_idx, v0..) — write this to parquet on each
    nightly dedup pass and point the gate at it."""
    out = with_minhash_bands(corpus, num_hashes, bands, n, text_col, id_col)
    return out.withColumnRenamed(id_col, "at_rest_id")


def minhash_gate_stream(
    docs: DataFrame,
    band_table: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unbounded doc stream → (doc_id, at_rest_id, band_idx) candidate
    rows, one per band collision with the at-rest corpus.

    Stream-static inner join: stateless (no watermark needed — the
    static side is re-read per micro-batch, which is exactly the
    refresh semantics a nightly-rebuilt band table wants).  Arrivals
    whose id already exists at rest are not self-flagged."""
    rows = num_hashes // bands
    band_cols = ["band_idx"] + [f"v{r}" for r in range(rows)]
    stream_bands = with_minhash_bands(
        docs, num_hashes, bands, n, text_col, id_col
    )
    return (
        stream_bands.join(band_table, band_cols)
        .filter(F.col(id_col) != F.col("at_rest_id"))
        .select(id_col, "at_rest_id", "band_idx")
    )


def gate_verdicts(candidates: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per micro-batch reduction for a foreachBatch sink: one row per
    flagged arrival with the distinct at-rest docs it banded with."""
    return candidates.groupBy(id_col).agg(
        F.array_sort(F.collect_set("at_rest_id")).alias("matched_ids"),
        F.countDistinct("at_rest_id").alias("n_matches"),
    )
