"""Streaming DSIR gate (ingest-gate matrix entry #5): the plan-literal
ratio fold must score a stream exactly like itself on a batch frame,
and match the batch ``dsir_weights`` scorer up to one rounding ULP
(same double multiset, different addition order)."""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import corpus
from lightcurvesclassifier_spark.sources import testdata
from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
from lightcurvesclassifier_spark.streaming.dsir_gate_stream import dsir_gate
from tests.conftest import SF_ORACLE

N_BUCKETS = 128


def _artifact(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    ratio = corpus.dsir_ratio(
        docs.select("doc_id", "text"),
        docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        n_buckets=N_BUCKETS,
    )
    return docs, {int(r.bucket): float(r.llr) for r in ratio.collect()}


def test_gate_matches_batch_scorer_within_rounding(spark):
    docs, llr = _artifact(spark)
    gated = (
        dsir_gate(docs.select("doc_id", "text"), llr, N_BUCKETS)
        .toPandas()
        .set_index("doc_id")
    )
    batch = (
        corpus.dsir_weights(
            docs.select("doc_id", "text"),
            docs.filter(F.col("lang") == "en").select("doc_id", "text"),
            n_buckets=N_BUCKETS,
            k=50,
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert set(gated.index) == set(batch.index)
    for d in batch.index:
        assert gated.loc[d, "n_feats"] == batch.loc[d, "n_feats"]
        assert abs(gated.loc[d, "dsir_weight"] - batch.loc[d, "weight"]) < 2e-6


def test_gate_runs_unchanged_on_stream(spark, tmp_path):
    docs, llr = _artifact(spark)
    pdf = docs.select("doc_id", "text").limit(60).toPandas()
    d = tmp_path / "docs_in"
    d.mkdir()
    half = len(pdf) // 2
    for name, part, m in (("b1.json", pdf.iloc[:half], 0),
                          ("b2.json", pdf.iloc[half:], 1)):
        (d / name).write_text(
            "\n".join(
                json.dumps(
                    {
                        "doc_id": int(r.doc_id),
                        "text": r.text,
                        "event_time": f"2026-01-01T00:{m:02d}:00.000Z",
                    }
                )
                for r in part.itertuples()
            )
        )
    q = (
        dsir_gate(doc_stream(spark, str(d)), llr, N_BUCKETS)
        .writeStream.format("memory")
        .queryName("dsir_gated")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql(
                "SELECT doc_id, n_feats, dsir_weight, keep FROM dsir_gated"
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        q.stop()
    ids = [int(i) for i in pdf.doc_id]
    exp = (
        dsir_gate(
            docs.select("doc_id", "text").filter(
                F.col("doc_id").isin(ids)
            ),
            llr,
            N_BUCKETS,
        )
        .select("doc_id", "n_feats", "dsir_weight", "keep")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    assert got.keep.any() and (~got.keep).any()
