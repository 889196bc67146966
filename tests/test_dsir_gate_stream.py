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


def test_gate_matches_batch_on_doubled_spaces_and_short_docs(spark):
    """r9 advice: the gate's bigram multiset must equal the batch
    scorer's ``_ngram_rows`` n=2 multiset on pathological text —
    doubled spaces produce empty tokens (and bigrams containing them)
    on BOTH sides; a < 2-token doc has no bigram rows, so the batch
    scorer omits it while the gate emits n_feats=0 / weight=0."""
    from lightcurvesclassifier_spark.operators.corpus import _dsir_bucket
    from lightcurvesclassifier_spark.operators.dedup import _ngram_rows

    _, llr = _artifact(spark)
    weird = spark.createDataFrame(
        [
            (900001, "the  quick  brown fox"),   # doubled spaces
            (900002, "word"),                     # 1 token: no bigrams
            (900003, ""),                          # split('') = ['']
            (900004, "  "),                        # 3 empty tokens
            (900005, "alpha beta gamma delta"),   # clean control
        ],
        "doc_id long, text string",
    )
    gated = (
        dsir_gate(weird, llr, N_BUCKETS).toPandas().set_index("doc_id")
    )
    # the batch scorer's exact feature rows, scored against the SAME
    # nightly llr artifact the gate carries
    rf = _ngram_rows(
        weird, 2, "text", "doc_id",
        key_fn=_dsir_bucket(N_BUCKETS), empty_type="long",
        out_col="bucket", distinct=False,
    ).toPandas()
    batch = (
        rf.assign(llr=[llr[int(b)] for b in rf.bucket])
        .groupby("doc_id")
        .agg(n_feats=("bucket", "size"), weight=("llr", "sum"))
    )
    # batch omits the <2-token docs ('' splits to the 1-token ['']);
    # everything else scores on both sides
    assert set(batch.index) == {900001, 900004, 900005}
    assert set(gated.index) == {900001, 900002, 900003, 900004, 900005}
    for d in batch.index:
        assert gated.loc[d, "n_feats"] == batch.loc[d, "n_feats"], d
        assert (
            abs(gated.loc[d, "dsir_weight"] - round(batch.loc[d, "weight"], 6))
            < 2e-6
        ), d
    for d in (900002, 900003):
        assert gated.loc[d, "n_feats"] == 0
        assert gated.loc[d, "dsir_weight"] == 0.0
