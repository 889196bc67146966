"""Streaming scrub: same results as the batch projection, across
micro-batches, with PII redacted and low-quality docs flagged."""

import json

from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
from lightcurvesclassifier_spark.streaming.scrub_stream import scrub_docs_stream


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {"doc_id": i, "text": t,
                 "event_time": f"2026-01-01T00:{m:02d}:00.000Z"}
            )
            for i, t, m in rows
        )
    )


ROWS1 = [
    (1, "the quick brown fox jumps over the lazy dog", 0),
    (2, "mail me at spam@example.net for more", 0),
    (3, "short", 1),
]
ROWS2 = [
    (4, "the the the the the", 2),
    (5, "a normal document with enough tokens to keep around", 2),
]


def test_stream_matches_batch_and_flags(spark, tmp_path):
    docs_dir = tmp_path / "scrub_in"
    docs_dir.mkdir()
    _write_batch(docs_dir, "b1.json", ROWS1)
    _write_batch(docs_dir, "b2.json", ROWS2)

    q = (
        scrub_docs_stream(doc_stream(spark, str(docs_dir)))
        .writeStream.format("memory")
        .queryName("scrubbed")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM scrubbed").toPandas()
    finally:
        q.stop()

    assert len(got) == 5
    g = got.set_index("doc_id")
    assert bool(g.loc[3, "keep"]) is False          # too short
    assert bool(g.loc[4, "keep"]) is False          # all stopwords
    assert bool(g.loc[5, "keep"]) is True
    assert g.loc[2, "n_pii"] == 1

    # identical projection on a plain batch DataFrame
    batch = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS1 + ROWS2], "doc_id long, text string"
    )
    want = scrub_docs_stream(batch).toPandas().set_index("doc_id")
    for c in ["n_tokens", "stopword_ratio", "n_pii", "redacted_md5", "keep"]:
        assert (g[c].sort_index() == want[c].sort_index()).all(), c
