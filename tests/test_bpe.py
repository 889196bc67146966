"""Distributed BPE training/application vs a pure-Python reference
implementation of Sennrich et al.'s algorithm (greedy left-to-right
single-pass merges, count-desc/lexicographic tie rule)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import bpe
from lightcurvesclassifier_spark.sources import testdata
from tests.conftest import SF_ORACLE, SF_SMOKE


def _ref_learn(word_counts, n):
    spell = {w: list(w) for w in word_counts}
    merges = []
    for r in range(n):
        counts = {}
        for w, c in word_counts.items():
            s = spell[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, c))
        for w in spell:
            spell[w] = _ref_apply_one(spell[w], a, b)
    return merges, spell


def _ref_apply_one(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_learn_matches_reference_on_planted_corpus(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
        "low new wide slow slower",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        bpe.bpe_learn(docs, n_merges=10)
        .orderBy("merge_idx")
        .collect()
    )
    exp, _ = _ref_learn(_word_counts(texts), 10)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (g["merge_idx"], g["lhs"], g["rhs"], g["merged"],
                g["pair_count"]) == e


def test_bpe_learn_on_fixture_matches_reference(spark):
    docs = testdata.load_table(spark, SF_SMOKE, "documents")
    got = bpe.bpe_learn(docs, n_merges=6).orderBy("merge_idx").collect()
    texts = [r["text"] for r in docs.select("text").collect()]
    exp, _ = _ref_learn(_word_counts(texts), 6)
    assert [
        (g["merge_idx"], g["lhs"], g["rhs"], g["merged"], g["pair_count"])
        for g in got
    ] == exp


def test_bpe_greedy_fold_edge_cases(spark):
    """'a a a' under merge (a,a) -> ['aa','a'] (non-overlapping greedy);
    merged symbols do not cascade within the same pass."""
    docs = spark.createDataFrame(
        [(1, "aaa aaaa baab")], "doc_id long, text string"
    )
    out = (
        bpe.bpe_apply(docs, [("a", "a")])
        .collect()[0]
    )
    assert out["tokens"] == ["aa", "a", "aa", "aa", "b", "aa", "b"]
    assert out["n_tokens"] == 7


@pytest.mark.parametrize("seed", [0, 5])
def test_bpe_apply_matches_reference(spark, seed):
    rng = np.random.default_rng(seed)
    vocab = list("abcd")
    texts = [
        " ".join(
            "".join(rng.choice(vocab, int(rng.integers(1, 8))))
            for _ in range(int(rng.integers(1, 12)))
        )
        for _ in range(25)
    ]
    merges, _ = _ref_learn(_word_counts(texts), 6)
    pairs = [(a, b) for _, a, b, _, _ in merges]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe.bpe_apply(docs, pairs).collect()
    }
    for i, t in enumerate(texts):
        exp_toks = []
        for w in t.split(" "):
            s = list(w)
            for a, b in pairs:
                s = _ref_apply_one(s, a, b)
            exp_toks.extend(s)
        assert got[i] == exp_toks, i


def test_bpe_tokenize_keeps_null_and_empty_text_docs(spark):
    """The r10 shape relied on split(text) yielding >= 1 position row,
    but split(NULL) is NULL and posexplode(NULL) emits ZERO rows — a
    NULL-text doc silently vanished (r10 verdict item #1).  The oracle's
    trailing corpus LEFT JOIN re-emits such docs as (id, 0, ''), so the
    engine must return every input doc: NULL text, empty text, and
    whitespace-only text all come back with 0 tokens."""
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, ""), (4, "  "), (5, "low")],
        "doc_id long, text string",
    )
    merges = [("l", "o"), ("lo", "w")]
    rows = {
        r["doc_id"]: (r["n_tokens"], r["tokens_str"])
        for r in bpe.bpe_tokenize(docs, merges).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5}, "every input doc must be present"
    assert rows[2] == (0, "")
    assert rows[3] == (0, "")
    assert rows[4] == (0, "")
    assert rows[1] == (4, "low low e r")
    assert rows[5] == (1, "low")


def test_bpe_learn_stops_when_pairs_run_dry(spark):
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    out = bpe.bpe_learn(docs, n_merges=5).collect()
    assert out == []  # every word is a single symbol: zero pairs


def test_bpe_apply_composes_onto_stream_with_batch_parity(spark, tmp_path):
    """bpe_apply is map-only (chained array folds), so the SAME function
    with the same learned merges must run unchanged on an unbounded
    stream — the ingest-time tokenizer. Pinned by feeding fixture docs
    through a two-batch file stream and comparing tokenizations
    row-for-row with the batch run."""
    import json as _json

    from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream

    docs = (
        testdata.load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .limit(40)
        .toPandas()
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe.bpe_learn(
            testdata.load_table(spark, SF_SMOKE, "documents"), n_merges=4
        ).collect()
    ]
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
        bpe.bpe_apply(doc_stream(spark, str(d)), merges)
        .withColumn("tokens_str", F.array_join("tokens", " "))
        .drop("tokens")
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
    batch_docs = spark.createDataFrame(
        [(int(r.doc_id), r.text) for r in docs.itertuples()],
        "doc_id long, text string",
    )
    exp = (
        bpe.bpe_apply(batch_docs, merges)
        .withColumn("tokens_str", F.array_join("tokens", " "))
        .drop("tokens")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == len(docs)
    assert (got["doc_id"] == exp["doc_id"]).all()
    assert (got["n_tokens"] == exp["n_tokens"]).all()
    assert (got["tokens_str"] == exp["tokens_str"]).all()


def test_merge_table_round_trips_as_parquet_artifact(spark, tmp_path):
    """The tokenizer's deployment contract: the learned merge table is
    a nightly parquet artifact — write, re-read, re-order by merge_idx,
    and the re-loaded merges must tokenize identically to the in-memory
    list (order matters: merges apply in training order)."""
    docs = testdata.load_table(spark, SF_ORACLE, "documents")
    learned = bpe.bpe_learn(docs, n_merges=8)
    learned.write.mode("overwrite").parquet(str(tmp_path / "merges"))
    reloaded = (
        spark.read.parquet(str(tmp_path / "merges"))
        .orderBy("merge_idx")
        .collect()
    )
    m1 = [(r["lhs"], r["rhs"]) for r in learned.orderBy("merge_idx").collect()]
    m2 = [(r["lhs"], r["rhs"]) for r in reloaded]
    assert m1 == m2 and len(m1) == 8
    t1 = bpe.bpe_apply(docs, m1).orderBy("doc_id").toPandas()
    t2 = bpe.bpe_apply(docs, m2).orderBy("doc_id").toPandas()
    assert t1.equals(t2)


@pytest.mark.parametrize("m", [2, 4, 8, 16])
def test_batched_learn_identical_to_sequential_on_conflict_rich_vocab(
    spark, m
):
    """r9 directive #3: batched rounds (top-M provably-disjoint merges
    per pass) must be VALUE-IDENTICAL to one-merge-per-round training.
    A 3-letter alphabet makes nearly every candidate pair share a
    symbol, so the batch selector's conflict stop + strict-count trim
    are exercised hard (most rounds collapse to 1-2 merges)."""
    rng = np.random.default_rng(1234 + m)
    texts = [
        " ".join(
            "".join(rng.choice(list("aab"), size=rng.integers(1, 7)))
            for _ in range(rng.integers(3, 12))
        )
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_idx"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe.bpe_learn(docs, n_merges=16, batch_merges=m)
        .orderBy("merge_idx")
        .collect()
    ]
    exp, _ = _ref_learn(_word_counts(texts), 16)
    assert got == exp


def test_batched_learn_identical_on_wide_vocab(spark):
    """The opposite regime: a wide alphabet where many merges ARE
    disjoint, so batches actually fill up — still byte-identical to the
    sequential reference, including tie handling (every count is a
    small integer, so ties are common)."""
    rng = np.random.default_rng(99)
    alpha = list("abcdefghijklmnop")
    texts = [
        " ".join(
            "".join(rng.choice(alpha, size=rng.integers(2, 9)))
            for _ in range(rng.integers(4, 15))
        )
        for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_idx"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe.bpe_learn(docs, n_merges=24, batch_merges=8)
        .orderBy("merge_idx")
        .collect()
    ]
    exp, _ = _ref_learn(_word_counts(texts), 24)
    assert got == exp


def test_batched_learn_auto_matches_sequential_on_fixture(spark):
    """batch_merges='auto' at n_merges=32 (auto batch of 4) on the real
    fixture corpus == the pure-Python sequential reference."""
    docs = testdata.load_table(spark, SF_SMOKE, "documents")
    got = [
        (r["merge_idx"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe.bpe_learn(docs, n_merges=32)
        .orderBy("merge_idx")
        .collect()
    ]
    texts = [r["text"] for r in docs.select("text").collect()]
    exp, _ = _ref_learn(_word_counts(texts), 32)
    assert got == exp
