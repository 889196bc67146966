"""Streaming sequence packing: cross-batch running offsets match the
batch operator when documents arrive in id order."""

import json

import pytest

from lightcurvesclassifier_spark.operators.corpus import pack_sequences
from lightcurvesclassifier_spark.streaming.packing_stream import packing_stream

SEQ_LEN = 16
N_SHARDS = 4


@pytest.fixture()
def doc_dir(tmp_path):
    d = tmp_path / "docs_in"
    d.mkdir()
    return d


def _write_batch(doc_dir, name, docs):
    (doc_dir / name).write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs)
    )


def _run_stream(spark, doc_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(doc_dir))
    )
    out = packing_stream(stream, seq_len=SEQ_LEN, n_shards=N_SHARDS)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out_dir))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(out_dir))


def test_streaming_packing_matches_batch(spark, doc_dir, tmp_path):
    docs1 = [(i, " ".join(f"w{j}" for j in range(3 + i % 5))) for i in range(20)]
    docs2 = [(i, " ".join(f"w{j}" for j in range(2 + i % 7))) for i in range(20, 40)]
    _write_batch(doc_dir, "b1.json", docs1)
    out_dir = tmp_path / "out"
    _run_stream(spark, doc_dir, tmp_path / "ck", out_dir)
    # second ingest continues each shard's offset from checkpointed state
    _write_batch(doc_dir, "b2.json", docs2)
    got = _run_stream(spark, doc_dir, tmp_path / "ck", out_dir)

    batch_df = spark.createDataFrame(docs1 + docs2, "doc_id long, text string")
    want = pack_sequences(batch_df, seq_len=SEQ_LEN, n_shards=N_SHARDS)
    cols = ["doc_id", "shard", "n_tokens", "start_tok", "first_chunk", "last_chunk"]
    got_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    want_rows = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert len(got_rows) == 40
    assert got_rows == want_rows


def test_streaming_packing_contiguous_out_of_order(spark, doc_dir, tmp_path):
    """Arrival order differing from id order still packs each shard
    contiguously: offsets tile the stream with no gaps or overlaps."""
    # ids arrive high-first within one batch; the operator sorts within
    # the batch, so contiguity must hold regardless
    docs = [(i, "a b c") for i in (8, 4, 0, 12, 16)]  # all shard 0
    _write_batch(doc_dir, "b1.json", docs)
    out_dir = tmp_path / "out"
    got = _run_stream(spark, doc_dir, tmp_path / "ck", out_dir)
    rows = sorted(
        (r["start_tok"], r["n_tokens"]) for r in got.collect()
    )
    expect_start = 0
    for start, n in rows:
        assert start == expect_start
        expect_start += n


def test_poison_pill_null_row_does_not_kill_stream(spark, doc_dir, tmp_path):
    """A malformed ingest line (all-null row from PERMISSIVE json
    parsing) must be dropped, not crash the stateful function — a
    crash is unrecoverable because the checkpoint replays the file."""
    (doc_dir / "b1.json").write_text(
        "\n".join(
            [
                json.dumps({"doc_id": 0, "text": "a b c"}),
                "{not valid json at all",
                json.dumps({"doc_id": 4, "text": None}),
                json.dumps({"doc_id": 8, "text": "d e"}),
            ]
        )
    )
    out_dir = tmp_path / "out"
    got = _run_stream(spark, doc_dir, tmp_path / "ck", out_dir).collect()
    assert {r.doc_id for r in got} == {0, 8}
    by_id = {r.doc_id: r for r in got}
    assert by_id[0].n_tokens == 3 and by_id[8].n_tokens == 2
