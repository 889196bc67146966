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


def test_gopher_filter_composes_onto_stream_with_batch_parity(
    spark, tmp_path
):
    """gopher_quality_filter is a map-only projection, so the SAME
    function must run unchanged on an unbounded stream — pinned by
    feeding the sf0.01 documents through a two-batch file stream and
    comparing verdicts row-for-row with the batch run."""
    import json as _json

    from pyspark.sql import functions as F

    from lightcurvesclassifier_spark.operators import text as text_ops
    from lightcurvesclassifier_spark.sources import testdata
    from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
    from tests.conftest import SF_ORACLE

    docs = (
        testdata.load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .limit(80)
        .toPandas()
    )
    d = tmp_path / "docs_in"
    d.mkdir()
    half = len(docs) // 2
    for name, part, m in (("b1.json", docs.iloc[:half], 0),
                          ("b2.json", docs.iloc[half:], 1)):
        (d / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "doc_id": int(r.doc_id),
                        "text": r.text,
                        "event_time": f"2026-01-01T00:{m:02d}:00.000Z",
                    }
                )
                for r in part.itertuples()
            )
        )
    out_dir = tmp_path / "out"
    q = (
        text_ops.gopher_quality_filter(doc_stream(spark, str(d)))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.read.parquet(str(out_dir))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = [int(i) for i in docs.doc_id]
    exp = (
        text_ops.gopher_quality_filter(
            testdata.load_table(spark, SF_ORACLE, "documents").filter(
                F.col("doc_id").isin(ids)
            )
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got[sorted(got.columns)].equals(exp[sorted(exp.columns)])
    assert got["keep"].any() and (~got["keep"]).any()


def test_c4_filter_composes_onto_stream_with_batch_parity(spark, tmp_path):
    """c4_filter is the same zero-shuffle projection shape as the
    gopher gate, so the SAME function must run unchanged on a stream —
    pinned by feeding the derived C4 corpus through a two-batch file
    stream and comparing row-for-row with the batch run (clean_text
    included, so line retention is byte-identical)."""
    import json as _json

    from pyspark.sql import functions as F

    from lightcurvesclassifier_spark.operators import text as text_ops
    from lightcurvesclassifier_spark.sources import testdata
    from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
    from tests.conftest import SF_ORACLE

    docs = testdata.c4_corpus(spark, SF_ORACLE).limit(80).toPandas()
    d = tmp_path / "docs_in"
    d.mkdir()
    half = len(docs) // 2
    for name, part, m in (("b1.json", docs.iloc[:half], 0),
                          ("b2.json", docs.iloc[half:], 1)):
        (d / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "doc_id": int(r.doc_id),
                        "text": r.text,
                        "event_time": f"2026-01-01T00:{m:02d}:00.000Z",
                    }
                )
                for r in part.itertuples()
            )
        )
    out_dir = tmp_path / "out"
    q = (
        text_ops.c4_filter(doc_stream(spark, str(d)))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.read.parquet(str(out_dir))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = [int(i) for i in docs.doc_id]
    exp = (
        text_ops.c4_filter(
            testdata.c4_corpus(spark, SF_ORACLE).filter(
                F.col("doc_id").isin(ids)
            )
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got[sorted(got.columns)].equals(exp[sorted(exp.columns)])
    assert got["keep"].any() and (~got["keep"]).any()
