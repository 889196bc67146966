"""ExactSubstr ingest gate (streaming suite #15): row-expression span
keys match the batch operator's, the stream-static join flags exactly
the cross-boundary span collisions, and flagged token counts agree
with a combined-corpus batch scrub when at-rest copies keep precedence.
"""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import dedup
from lightcurvesclassifier_spark.sources import testdata
from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
from lightcurvesclassifier_spark.streaming.substr_gate_stream import (
    gate_verdicts,
    span_table,
    substr_gate_stream,
)
from tests.conftest import SF_ORACLE

K = 12


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


def test_span_keys_match_batch_operator(spark):
    """span_table's row-expression keys == the batch explode keys
    (dedup._ngram_rows with xxhash64), span for span."""
    corpus = testdata.dedup_corpus(spark, SF_ORACLE)
    got = {r["span"] for r in span_table(corpus, K).collect()}
    exp = {
        r["span"]
        for r in dedup._ngram_rows(
            corpus, K, "text", "doc_id", F.xxhash64, "bigint", "span",
            distinct=False,
        )
        .select("span")
        .distinct()
        .collect()
    }
    assert got == exp and got


def test_gate_flags_exactly_cross_boundary_span_collisions(spark, tmp_path):
    """End-to-end over two micro-batches: at-rest = originals
    (doc_id < 1e6), arrivals = the planted exact/near twins.  The gate
    must flag exactly the arrival span positions whose span exists at
    rest, with verdict counts equal to a direct batch recomputation —
    and for arrivals that are pure exact copies, every token marked."""
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

    rest_spans = span_table(at_rest, K)
    gate = substr_gate_stream(
        doc_stream(spark, str(docs_dir)), rest_spans, K
    )
    out_dir = tmp_path / "out"

    def sink(batch_df, _batch_id):
        gate_verdicts(batch_df, K).write.mode("append").parquet(str(out_dir))

    q = (
        gate.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    verdicts = (
        spark.read.parquet(str(out_dir)).toPandas().set_index("doc_id")
    )

    # PURE-PYTHON ground truth on raw strings (independent of every
    # Spark expression in the gate, so it also covers the xxhash keys
    # end to end): the at-rest span STRING set, then a sliding window
    # over each arrival
    rest_strings = set()
    for r in at_rest.select("text").toPandas().itertuples():
        tk = r.text.split(" ")
        for p in range(len(tk) - K + 1):
            rest_strings.add(" ".join(tk[p : p + K]))

    flagged_expected = {}
    for r in arrivals.itertuples():
        toks = r.text.split(" ")
        marked = set()
        n_dup = 0
        for p in range(len(toks) - K + 1):
            if " ".join(toks[p : p + K]) in rest_strings:
                n_dup += 1
                marked.update(range(p, p + K))
        if n_dup:
            flagged_expected[int(r.doc_id)] = (len(toks), n_dup, len(marked))

    assert flagged_expected, "fixture must contain cross-boundary dups"
    assert set(verdicts.index) == set(flagged_expected)
    for d, (n_tok, n_dup, n_marked) in flagged_expected.items():
        row = verdicts.loc[d]
        assert row["n_tokens"] == n_tok, d
        assert row["n_rest_dup_spans"] == n_dup, d
        assert row["n_marked_tokens"] == n_marked, d

    # exact twins (+2000000): every span collides, every token marked
    exact_ids = [
        int(r.doc_id) for r in arrivals.itertuples()
        if int(r.doc_id) >= 2_000_000 and len(r.text.split(" ")) >= K
    ]
    assert exact_ids
    for d in exact_ids:
        row = verdicts.loc[d]
        assert row["n_marked_tokens"] == row["n_tokens"], d

    # consistency with the combined-corpus batch scrub: at-rest docs
    # sort first (smaller ids), so every gate-marked token IS removed
    # by exact_substr_scrub on rest + arrivals (the scrub can only mark
    # MORE - within-arrival repeats are its job, not the gate's)
    arrival_ids = [int(i) for i in arrivals.doc_id]
    combined = at_rest.unionByName(
        corpus.filter(F.col("doc_id").isin(arrival_ids))
    )
    scrub = (
        dedup.exact_substr_scrub(combined, k=K)
        .filter(F.col("doc_id").isin(list(flagged_expected)))
        .toPandas()
        .set_index("doc_id")
    )
    for d in flagged_expected:
        assert scrub.loc[d, "n_removed"] >= verdicts.loc[d, "n_marked_tokens"], d
