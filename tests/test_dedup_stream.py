"""Streaming exact dedup: first-seen docs survive, duplicates arriving
in the same or later micro-batches are dropped by fingerprint state."""

import json

from lightcurvesclassifier_spark.streaming.dedup_stream import (
    dedup_docs_stream,
    doc_stream,
)


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


def test_streaming_dedup_drops_later_duplicates(spark, tmp_path):
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    # batch 1: three docs, one internal duplicate pair (ids 1 and 2)
    _write_batch(
        docs_dir,
        "b1.json",
        [(1, "the quick brown fox", 0), (2, "THE  quick brown fox", 1),
         (3, "something else", 1)],
    )
    # batch 2: a cross-batch duplicate of doc 1 plus a fresh doc
    _write_batch(
        docs_dir,
        "b2.json",
        [(4, "the quick brown fox", 2), (5, "genuinely new", 3)],
    )
    out_dir = tmp_path / "out"
    deduped = dedup_docs_stream(doc_stream(spark, str(docs_dir)))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out_dir))

    q = (
        deduped.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir)).toPandas()
    # fingerprint normalization folds case/whitespace: 1≡2≡4
    assert set(got.doc_id) == {1, 3, 5} or set(got.doc_id) == {2, 3, 5}
    assert len(got) == 3
    assert got.fingerprint.is_unique
