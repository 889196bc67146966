"""Streaming HLL: cross-batch register accumulation with bounded state,
exact parity with the batch sketch over the concatenated input."""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import sketch
from lightcurvesclassifier_spark.streaming.sketch_stream import (
    doc_stream,
    hll_register_stream,
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


def test_streaming_hll_matches_batch_registers(spark, tmp_path):
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    b1 = [(1, "alpha beta gamma delta epsilon zeta", 0),
          (2, "one two three four five six seven", 1)]
    b2 = [(3, "alpha beta gamma delta epsilon zeta", 2),  # pure dup
          (4, "eight nine ten eleven twelve thirteen", 3)]
    _write_batch(docs_dir, "b1.json", b1)
    _write_batch(docs_dir, "b2.json", b2)

    out_dir = tmp_path / "regs_out"
    regs = hll_register_stream(doc_stream(spark, str(docs_dir)), n=3)

    def sink(batch_df, batch_id):
        # update-mode deltas: overwrite per changed bucket is the
        # production shape; for the test, append and keep the last
        batch_df.withColumn("batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        regs.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir))
    w_latest = got.groupBy("bucket").agg(
        F.max_by("max_rank", "batch").alias("max_rank")
    )
    batch_docs = spark.createDataFrame(
        [(i, t) for i, t, _ in b1 + b2], "doc_id long, text string"
    )
    want = sketch.hll_registers(batch_docs, n=3)
    got_set = {(r.bucket, r.max_rank) for r in w_latest.collect()}
    want_set = {(r.bucket, r.max_rank) for r in want.collect()}
    assert got_set == want_set
    # state bound: never more rows than HLL_M registers
    assert len(got_set) <= sketch.HLL_M

    # the shared estimator reports identically off either table
    est_stream = sketch.hll_estimate(w_latest).collect()[0]
    est_batch = sketch.hll_estimate(want).collect()[0]
    assert est_stream == est_batch


def test_streaming_grouped_hll_matches_batch(spark, tmp_path):
    """Grouped streaming registers: (group, bucket)-keyed max state,
    bit-equal to the batch grouped sketch over the concatenated input;
    per-group state stays within m registers."""
    from lightcurvesclassifier_spark.streaming.sketch_stream import (
        hll_grouped_register_stream,
    )

    docs_dir = tmp_path / "docs_in_g"
    docs_dir.mkdir()
    b1 = [(1, "alpha beta gamma delta epsilon zeta", 0),
          (2, "one two three four five six seven", 1)]
    b2 = [(3, "alpha beta gamma delta epsilon zeta", 2),
          (4, "eight nine ten eleven twelve thirteen", 3)]
    _write_batch(docs_dir, "b1.json", b1)
    _write_batch(docs_dir, "b2.json", b2)

    group = F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    out_dir = tmp_path / "gregs_out"
    regs = hll_grouped_register_stream(
        doc_stream(spark, str(docs_dir)).withColumn("grp", group),
        group_col="grp", n=3,
    )

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        regs.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "gckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir))
    latest = got.groupBy("grp", "bucket").agg(
        F.max_by("max_rank", "batch").alias("max_rank")
    )
    batch_docs = spark.createDataFrame(
        [(i, t) for i, t, _ in b1 + b2], "doc_id long, text string"
    ).withColumn("grp", group)
    want = sketch.hll_grouped_registers(batch_docs, "grp", n=3)
    got_set = {(r.grp, r.bucket, r.max_rank) for r in latest.collect()}
    want_set = {(r.grp, r.bucket, r.max_rank) for r in want.collect()}
    assert got_set == want_set
    per_group = {}
    for g, _, _ in got_set:
        per_group[g] = per_group.get(g, 0) + 1
    assert all(v <= sketch.HLL_M for v in per_group.values())


def test_streaming_cms_matches_batch_counters(spark, tmp_path):
    from lightcurvesclassifier_spark.streaming.sketch_stream import (
        cms_counter_stream,
    )

    docs_dir = tmp_path / "cms_in"
    docs_dir.mkdir()
    b1 = [(1, "a b c d e", 0), (2, "a b x y z", 1)]
    b2 = [(3, "a b c d e", 2), (4, "p q r s", 3)]
    _write_batch(docs_dir, "b1.json", b1)
    _write_batch(docs_dir, "b2.json", b2)

    out_dir = tmp_path / "cms_out"
    counters = cms_counter_stream(doc_stream(spark, str(docs_dir)), n=2)

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        counters.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir))
    latest = got.groupBy("row", "col").agg(
        F.max_by("cnt", "batch").alias("cnt")
    )
    batch_docs = spark.createDataFrame(
        [(i, t) for i, t, _ in b1 + b2], "doc_id long, text string"
    )
    want = sketch.cms_counters(batch_docs, n=2)
    got_set = {(r.row, r.col, r.cnt) for r in latest.collect()}
    want_set = {(r.row, r.col, r.cnt) for r in want.collect()}
    assert got_set == want_set
    assert len(got_set) <= sketch.CMS_D * sketch.CMS_W


def test_streaming_bloom_bits_match_batch(spark, tmp_path):
    from lightcurvesclassifier_spark.streaming.sketch_stream import (
        bloom_bits_stream,
    )

    docs_dir = tmp_path / "bloom_in"
    docs_dir.mkdir()
    b1 = [(1, "alpha beta gamma delta epsilon zeta", 0)]
    b2 = [(2, "alpha beta gamma delta epsilon zeta", 1),  # dup content
          (3, "one two three four five six", 2)]
    _write_batch(docs_dir, "b1.json", b1)
    _write_batch(docs_dir, "b2.json", b2)

    out_dir = tmp_path / "bloom_out"
    bits = bloom_bits_stream(doc_stream(spark, str(docs_dir)), n=5)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out_dir))

    q = (
        bits.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir))
    batch_docs = spark.createDataFrame(
        [(i, t) for i, t, _ in b1 + b2], "doc_id long, text string"
    )
    want = sketch.bloom_bits(batch_docs, n=5)
    got_bits = [r.bit for r in got.collect()]
    assert sorted(got_bits) == sorted(r.bit for r in want.collect())
    # each bit emitted exactly once across batches (dedup state works)
    assert len(got_bits) == len(set(got_bits))


def test_streaming_bloom_probe_matches_batch(spark, tmp_path):
    """r6 stretch #7: the streaming decontamination probe (map-only,
    zero state, append mode) must emit per-document rows identical to
    BOTH batch formulations over the concatenated stream."""
    from lightcurvesclassifier_spark.streaming.sketch_stream import (
        bloom_probe_stream,
    )

    docs_dir = tmp_path / "bprobe_in"
    docs_dir.mkdir()
    ev_rows = [(900, "alpha beta gamma delta epsilon zeta eta theta")]
    b1 = [(1, "alpha beta gamma delta epsilon zeta eta theta iota", 0),
          (2, "one two three four five six seven eight nine ten", 1)]
    b2 = [(3, "alpha beta gamma delta epsilon kappa mu nu xi", 2)]
    _write_batch(docs_dir, "b1.json", b1)
    _write_batch(docs_dir, "b2.json", b2)
    evals = spark.createDataFrame(ev_rows, "doc_id long, text string")

    out_dir = tmp_path / "bprobe_out"
    probe = bloom_probe_stream(doc_stream(spark, str(docs_dir)), evals, n=5)
    q = (
        probe.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "bprobe_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir)).toPandas()
    batch_docs = spark.createDataFrame(
        [(i, t) for i, t, _ in b1 + b2], "doc_id long, text string"
    )
    for batch_fn in (sketch.bloom_probe_fast, sketch.bloom_probe):
        want = batch_fn(batch_docs, evals, n=5).toPandas()
        g = got.sort_values("doc_id").reset_index(drop=True)
        w = want[got.columns].sort_values("doc_id").reset_index(drop=True)
        assert g.equals(w), batch_fn.__name__

    # static-evals contract is enforced loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="STATIC"):
        bloom_probe_stream(
            doc_stream(spark, str(docs_dir)),
            doc_stream(spark, str(docs_dir)),
        )
