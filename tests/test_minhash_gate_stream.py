"""MinHash ingest gate: row-expression signatures match the batch
explode+groupBy path bit-for-bit, and the stream-static band join flags
every pair the batch operator would verify across the at-rest boundary.
"""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import dedup
from lightcurvesclassifier_spark.sources import testdata
from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
from lightcurvesclassifier_spark.streaming.minhash_gate_stream import (
    gate_verdicts,
    minhash_band_rows,
    minhash_gate_stream,
    with_minhash_bands,
)
from tests.conftest import SF_ORACLE

NUM_HASHES, BANDS = 16, 8


def _batch_signatures(corpus):
    """The batch path's signature aggregate (minhash_pairs internals):
    explode to shingle keys, groupBy doc, H min-aggregates."""
    coeffs = dedup._minhash_coeffs(NUM_HASHES)
    sh = dedup.shingles_md5(corpus, dedup.SHINGLE_N)
    k28 = F.shiftright(F.col("key"), 32)
    return sh.withColumn("_k", k28).groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("_k") + F.lit(b))
                % F.lit(dedup.MINHASH_PRIME)
            ).alias(f"s{h}")
            for h, (a, b) in enumerate(coeffs)
        ]
    )


def test_row_expression_signature_matches_batch_aggregate(spark):
    """with_minhash_bands' array_min row expressions == the batch
    explode+groupBy signature, doc for doc, hash for hash — the pin
    that makes a gate flag mean 'the batch pass would band these'."""
    corpus = testdata.dedup_corpus(spark, SF_ORACLE)
    rows = NUM_HASHES // BANDS
    # reassemble signatures from the band rows
    bnd = with_minhash_bands(corpus, NUM_HASHES, BANDS).toPandas()
    got = {}
    for _, r in bnd.iterrows():
        sig = got.setdefault(r.doc_id, [None] * NUM_HASHES)
        for k in range(rows):
            sig[int(r.band_idx) * rows + k] = r[f"v{k}"]
    exp = {
        r.doc_id: [getattr(r, f"s{h}") for h in range(NUM_HASHES)]
        for r in _batch_signatures(corpus).toPandas().itertuples()
    }
    assert set(got) == set(exp)
    assert all(got[d] == exp[d] for d in exp)


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {
                    "doc_id": i,
                    "text": t,
                    "event_time": f"2026-01-01T00:{m:02d}:00.000Z",
                }
            )
            for i, t, m in rows
        )
    )


def test_gate_flags_every_batch_verified_cross_pair(spark, tmp_path):
    """End-to-end: at-rest = docs with doc_id < 1e6 of the dedup
    corpus; arrivals = the planted near/exact dups (id >= 1e6).  Every
    batch-verified minhash pair that crosses the boundary must be
    flagged by the gate (LSH collision is a precondition of the batch
    verify), and every flag must be a real band collision."""
    corpus = testdata.dedup_corpus(spark, SF_ORACLE).cache()
    at_rest = corpus.filter(F.col("doc_id") < 1_000_000)
    arrivals = corpus.filter(F.col("doc_id") >= 1_000_000).limit(60).toPandas()

    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    half = len(arrivals) // 2
    _write_batch(
        docs_dir, "b1.json",
        [(int(r.doc_id), r.text, 0) for r in arrivals.iloc[:half].itertuples()],
    )
    _write_batch(
        docs_dir, "b2.json",
        [(int(r.doc_id), r.text, 1) for r in arrivals.iloc[half:].itertuples()],
    )

    band_table = minhash_band_rows(at_rest, NUM_HASHES, BANDS)
    gate = minhash_gate_stream(
        doc_stream(spark, str(docs_dir)), band_table, NUM_HASHES, BANDS
    )
    out_dir = tmp_path / "out"

    def sink(batch_df, _batch_id):
        gate_verdicts(batch_df).write.mode("append").parquet(str(out_dir))

    q = (
        gate.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    verdicts = spark.read.parquet(str(out_dir)).toPandas()
    flagged = {
        (int(d), int(m))
        for d, ms in zip(verdicts.doc_id, verdicts.matched_ids)
        for m in ms
    }

    # batch ground truth: verified near-dup pairs crossing the boundary
    arrival_ids = {int(i) for i in arrivals.doc_id}
    batch_pairs = dedup.minhash_pairs(corpus, threshold=0.5).toPandas()
    cross = {
        (int(b), int(a))
        for a, b in zip(batch_pairs.id_a, batch_pairs.id_b)
        if int(b) in arrival_ids and int(a) < 1_000_000
    }
    assert cross, "fixture must contain cross-boundary near-dups"
    assert cross <= flagged  # no false negatives vs the batch verify

    # soundness: every flag is a genuine band collision
    arr_df = spark.createDataFrame(arrivals[["doc_id", "text"]])
    arr_bands = with_minhash_bands(arr_df, NUM_HASHES, BANDS)
    rows = NUM_HASHES // BANDS
    band_cols = ["band_idx"] + [f"v{r}" for r in range(rows)]
    coll = (
        arr_bands.join(band_table, band_cols)
        .select("doc_id", "at_rest_id")
        .distinct()
        .toPandas()
    )
    collisions = {(int(d), int(m)) for d, m in zip(coll.doc_id, coll.at_rest_id)}
    assert flagged <= collisions


def test_gate_short_doc_and_bad_bands(spark):
    """Docs with < SHINGLE_N tokens emit no bands (the batch contract),
    and a bands value that does not divide num_hashes fails loudly."""
    import pytest

    df = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    out = with_minhash_bands(df, NUM_HASHES, BANDS).toPandas()
    assert set(out.doc_id) == {2}
    assert len(out) == BANDS
    with pytest.raises(ValueError, match="must divide"):
        with_minhash_bands(df, 20, 8)
