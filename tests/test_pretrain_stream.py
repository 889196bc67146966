"""Composed streaming pre-training ingest (streaming suite #17): the
four individually-pinned gates chained into ONE streaming query must
reproduce ``pretraining_corpus``'s batch keep list on the concatenated
input — quality gate, first-seen dedup, Bloom-prefiltered exact
decontamination — with the MinHash band probe riding as a signal
column.
"""

import json

import pytest
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators.bpe import bpe_apply, bpe_learn
from lightcurvesclassifier_spark.operators.dedup import SHINGLE_N
from lightcurvesclassifier_spark.operators.pipelines import (
    MIN_TOKENS,
    pretraining_corpus,
)
from lightcurvesclassifier_spark.operators.sketch import bloom_bits
from lightcurvesclassifier_spark.sources import testdata
from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
from lightcurvesclassifier_spark.streaming.minhash_gate_stream import (
    minhash_band_rows,
)
from lightcurvesclassifier_spark.streaming.pretrain_stream import (
    pretrain_gate_stream,
    pretrain_verdicts,
)
from tests.conftest import SF_ORACLE

# quality-gate exercise: the parquet fixture has no sub-MIN_TOKENS docs
SHORT_DOCS = [(9_000_001, "tiny doc"), (9_000_002, "one two three four")]


def _write_batch(d, name, rows, minute):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {
                    "doc_id": i,
                    "text": t,
                    "event_time": f"2026-01-01T00:{minute:02d}:00.000Z",
                }
            )
            for i, t in rows
        )
    )


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pretrain_stream")
    corpus_pd = (
        testdata.dedup_corpus(spark, SF_ORACLE)
        .toPandas()
        .sort_values("doc_id")
    )
    rows = [(int(r.doc_id), r.text) for r in corpus_pd.itertuples()]
    rows += SHORT_DOCS
    # batch 1 = base docs (+ the short docs), batch 2 = the planted
    # +1M/+2M duplicates — base texts are pairwise distinct, so no
    # fingerprint collides WITHIN a micro-batch and first-seen ==
    # min-doc_id canonical (the parity precondition the module
    # documents: arrivals in doc_id order)
    b1 = [(i, t) for i, t in rows if i < 1_000_000 or i >= 9_000_000]
    b2 = [(i, t) for i, t in rows if 1_000_000 <= i < 9_000_000]
    assert b1 and b2
    docs_dir = tmp / "docs_in"
    docs_dir.mkdir()
    _write_batch(docs_dir, "b1.json", b1, 0)
    _write_batch(docs_dir, "b2.json", b2, 1)

    evals = testdata.contamination_eval(spark, SF_ORACLE).cache()
    # the nightly artifacts: eval-set Bloom bits + at-rest band table,
    # round-tripped through parquet exactly as a refresh job would
    bloom_bits(evals, n=SHINGLE_N).write.mode("overwrite").parquet(
        str(tmp / "eval_bits")
    )
    at_rest = testdata.dedup_corpus(spark, SF_ORACLE).filter(
        F.col("doc_id") < 1_000_000
    )
    minhash_band_rows(at_rest).write.mode("overwrite").parquet(
        str(tmp / "band_table")
    )
    eval_bits = spark.read.parquet(str(tmp / "eval_bits"))
    band_table = spark.read.parquet(str(tmp / "band_table"))
    # the nightly tokenizer artifact: merges learned from the at-rest
    # corpus, shipped into the ingest as plan literals
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_learn(at_rest, n_merges=6)
        .orderBy("merge_idx")
        .collect()
    ]
    assert merges

    out_dir = tmp / "out"

    def sink(batch_df, _batch_id):
        pretrain_verdicts(
            batch_df, band_table, eval_bits, evals, merges=merges
        ).write.mode("append").parquet(str(out_dir))

    q = (
        pretrain_gate_stream(doc_stream(spark, str(docs_dir)))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    verdicts = spark.read.parquet(str(out_dir)).toPandas()

    full = spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, text string"
    )
    expected = pretraining_corpus(full, evals).toPandas()
    return rows, verdicts, expected, full, merges


def test_keep_set_equals_batch_pipeline(run):
    """The headline pin: keep=true doc ids == pretraining_corpus's
    batch keep list on the concatenated input, and the carried
    n_tokens/fingerprint match per doc."""
    _, verdicts, expected, _, _ = run
    kept = verdicts[verdicts.keep].set_index("doc_id")
    exp = expected.set_index("doc_id")
    assert set(kept.index) == set(exp.index)
    for d in exp.index:
        assert kept.loc[d, "n_tokens"] == exp.loc[d, "n_tokens"]
        assert kept.loc[d, "fingerprint"] == exp.loc[d, "fingerprint"]


def test_verdict_rows_are_quality_canonical_survivors(run):
    """One verdict row per quality-passing first-seen doc: the doc set
    equals the batch pipeline's quality+canonical stage (keep list ∪
    contaminated), short docs never appear, and every planted exact
    duplicate is absent (its canonical base survived)."""
    rows, verdicts, *_ = run
    import hashlib

    canon = {}
    for i, t in sorted(rows):
        if len(t.split(" ")) < MIN_TOKENS:
            continue
        fp = hashlib.md5(t.encode()).hexdigest()
        canon.setdefault(fp, i)
    assert set(verdicts.doc_id) == set(canon.values())
    assert not {i for i, _ in SHORT_DOCS} & set(verdicts.doc_id)


def test_contaminated_set_is_exact(run):
    """contaminated == (quality+canonical survivors) − (batch keep):
    the Bloom prefilter + exact verify reproduces the batch pipeline's
    contaminated set exactly, and every contaminated doc was
    Bloom-flagged first (soundness: no contamination without a shared
    shingle)."""
    _, verdicts, expected, _, _ = run
    survivors = set(verdicts.doc_id)
    batch_keep = set(expected.doc_id)
    assert set(verdicts[verdicts.contaminated].doc_id) == survivors - batch_keep
    assert survivors - batch_keep, "fixture must contain contamination"
    flagged = verdicts[verdicts.contaminated]
    assert (flagged.n_maybe_shingles > 0).all()


def test_band_matches_flag_planted_near_dups(run):
    """The MinHash signal column fires: the planted +1M near-duplicates
    (distinct fingerprints, ' zz' suffix) band-collide with their
    at-rest bases."""
    _, verdicts, *_ = run
    near = verdicts[
        (verdicts.doc_id >= 1_000_000) & (verdicts.doc_id < 2_000_000)
    ]
    assert len(near) > 0
    assert (near.n_band_matches > 0).any()
    # and the at-rest side never self-flags: base docs whose only twin
    # is their own id are not counted
    base = verdicts[verdicts.doc_id < 1_000_000]
    assert (base.n_band_matches >= 0).all()


def test_tokenize_stage_matches_batch_bpe_apply(run):
    """The training-ready output: every verdict row carries
    tokens_str/n_bpe_tokens equal to batch ``bpe_apply`` with the same
    merge list on the same text — the tokenizer stage composes onto the
    gated stream without changing a single token."""
    _, verdicts, _, full, merges = run
    exp = {
        r["doc_id"]: (r["tstr"], r["nt"])
        for r in bpe_apply(full, merges)
        .select(
            "doc_id",
            F.array_join("tokens", " ").alias("tstr"),
            F.col("n_tokens").alias("nt"),
        )
        .collect()
    }
    assert "tokens_str" in verdicts.columns
    for r in verdicts.itertuples():
        tstr, nt = exp[r.doc_id]
        assert r.tokens_str == tstr
        assert r.n_bpe_tokens == nt
        assert nt == len(tstr.split(" "))
