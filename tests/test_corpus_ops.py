"""Corpus-assembly semantics: stratified balance, packing contiguity,
TF-IDF ordering."""

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import corpus, text
from lightcurvesclassifier_spark.sources import testdata
from tests.conftest import SF_ORACLE


def test_stratified_sample_balanced_and_deterministic(spark):
    docs = testdata.load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "lang"
    )
    out = corpus.stratified_sample(docs, "lang", "doc_id", 10).toPandas()
    per = out.groupby("lang").size()
    full = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, n in per.items():
        assert n == min(10, full[lang])  # capped at stratum size
    # deterministic: same rows on re-run
    again = corpus.stratified_sample(docs, "lang", "doc_id", 10).toPandas()
    assert set(out.doc_id) == set(again.doc_id)


def test_pack_sequences_contiguous_stream(spark):
    """Within each shard the doc offsets tile the token stream exactly:
    sorted by id, each doc starts where the previous ended, and chunk
    spans cover [start, start+n) with seq_len blocks."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text"
    )
    out = corpus.pack_sequences(docs, seq_len=128, n_shards=4).toPandas()
    assert (out.shard == out.doc_id % 4).all()
    for shard, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        expect = 0
        for _, r in g.iterrows():
            assert r.start_tok == expect
            assert r.first_chunk == r.start_tok // 128
            assert r.last_chunk == (r.start_tok + r.n_tokens - 1) // 128
            expect += r.n_tokens


def test_tfidf_rare_term_outranks_stopword(spark):
    rows = [
        (1, "the the the the zebra"),
        (2, "the quick brown fox"),
        (3, "the lazy dog sleeps"),
        (4, "the cat naps"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.tfidf_top_terms(docs, k=2).toPandas()
    d1 = out[out.doc_id == 1].sort_values("term_rank")
    # 'the' has tf=4 but df=4 (idf=1 exactly); 'zebra' tf=1 df=1.
    # the: 4 * (ln(5/5)+1) = 4.0 ; zebra: 1 * (ln(5/2)+1) ≈ 1.916
    assert list(d1.term) == ["the", "zebra"]
    # but in a doc where 'the' appears once, the rare term wins
    d2 = out[out.doc_id == 2].sort_values("term_rank")
    assert d2.iloc[0].term != "the"
    # every doc has exactly min(k, n_distinct_terms) rows
    assert (out.groupby("doc_id").size() <= 2).all()
    assert (out[out.doc_id == 1].tfidf.round(6) == out[out.doc_id == 1].tfidf).all()
