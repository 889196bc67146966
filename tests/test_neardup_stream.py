"""Streaming near-dup suppression: a later micro-batch's boilerplate
variant of an earlier doc is flagged against the original (cross-batch
state), unrelated docs pass; the per-row simhash expression is
bit-identical to the batch aggregate (operators/dedup.simhash)."""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import dedup
from lightcurvesclassifier_spark.streaming.dedup_stream import doc_stream
from lightcurvesclassifier_spark.streaming.neardup_stream import (
    neardup_candidates_stream,
    neardup_verdicts,
    with_simhash_bands,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronomers watch variable stars through a cold telescope on the "
    "high dry mountain ridge past midnight"
)


def test_simhash_expr_matches_batch_aggregate(spark):
    docs = spark.createDataFrame(
        [(1, BASE), (2, BASE + " zz"), (3, "completely different words here")],
        "doc_id long, text string",
    )
    expr = with_simhash_bands(docs, "text").drop("text").toPandas()
    agg = dedup.simhash(docs).toPandas()
    e = expr.sort_values("doc_id").reset_index(drop=True)
    a = agg.sort_values("doc_id").reset_index(drop=True)
    for i in range(4):
        assert (e[f"band{i}"].to_numpy() == a[f"band{i}"].to_numpy()).all(), i


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {"doc_id": i, "text": t, "event_time": "2026-01-01T00:00:00.000Z"}
            )
            for i, t in rows
        )
    )


def test_streaming_neardup_cross_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    # batch 1: the original + an unrelated doc
    _write_batch(docs_dir, "b1.json", [(1, BASE), (2, "totally unrelated text")])
    # batch 2: a near-dup of doc 1 (one token appended) + a fresh doc
    _write_batch(
        docs_dir,
        "b2.json",
        [(3, BASE + " watch"), (4, "another genuinely novel document body")],
    )
    out_dir = tmp_path / "out"
    cands = neardup_candidates_stream(doc_stream(spark, str(docs_dir)))

    def sink(batch_df, batch_id):
        neardup_verdicts(batch_df).write.mode("append").parquet(str(out_dir))

    q = (
        cands.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir)).toPandas()
    # sanity: the near-dup pair really is within the banding guarantee
    pair_ham = (
        dedup.simhash(
            spark.createDataFrame(
                [(1, BASE), (3, BASE + " watch")], "doc_id long, text string"
            )
        )
        .toPandas()
        .sort_values("doc_id")
    )
    import numpy as np

    ham = sum(
        bin(int(pair_ham[f"band{i}"].iloc[0]) ^ int(pair_ham[f"band{i}"].iloc[1])).count("1")
        for i in range(4)
    )
    assert ham <= 3, f"fixture not a near-dup (hamming {ham}) — adjust BASE"
    # doc 3 flagged against doc 1, cross-batch; nothing else flagged
    assert set(got.doc_id) == {3}
    assert got.set_index("doc_id").loc[3, "dup_of"] == 1
    assert got.set_index("doc_id").loc[3, "hamming"] == ham


def test_band_state_multi_owner_unit():
    """An unrelated first claimant must not mask a later true near-dup
    pair sharing the same band (the single-owner failure mode): the
    state keeps multiple owners, so A (no match vs C) becomes an owner
    and B is then flagged against A."""
    import pandas as pd

    from lightcurvesclassifier_spark.streaming.neardup_stream import (
        _make_band_state,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _make_band_state(3)
    state = FakeState()
    far = 0xFFFF  # hamming 16 from 0 in one band
    batch1 = pd.DataFrame(
        [{"doc_id": 99, "b0": far, "b1": far, "b2": far, "b3": far}]
    )
    out1 = pd.concat(list(fn((0, 123), iter([batch1]), state)))
    assert out1.empty  # C claims the band, nothing to compare
    # A and B: mutual hamming 1, both hamming >3 vs C
    batch2 = pd.DataFrame(
        [
            {"doc_id": 1, "b0": 0, "b1": 0, "b2": 0, "b3": 0},
            {"doc_id": 2, "b0": 1, "b1": 0, "b2": 0, "b3": 0},
        ]
    )
    out2 = pd.concat(list(fn((0, 123), iter([batch2]), state)))
    # A matched nothing (became an owner); B matched A only
    assert list(out2.doc_id) == [2]
    assert list(out2.owner_id) == [1]
    # state now tracks C, A (B matched, so it is not an owner)
    assert sorted(state.get[0]) == [1, 99]


def test_band_state_chunk_order_deterministic():
    """The owner must not depend on Arrow chunk boundaries: the group is
    sorted as a whole, so {5,7}+{2} behaves like {2,5,7}."""
    import pandas as pd

    from lightcurvesclassifier_spark.streaming.neardup_stream import (
        _make_band_state,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def run(chunks):
        fn = _make_band_state(3)
        state = FakeState()
        out = pd.concat(list(fn((1, 7), iter(chunks), state)))
        return sorted(map(tuple, out[["doc_id", "owner_id"]].to_numpy())), sorted(
            state.get[0]
        )

    rows = [
        {"doc_id": d, "b0": b, "b1": 0, "b2": 0, "b3": 0}
        for d, b in ((5, 0), (7, 1), (2, 2))
    ]
    one = run([pd.DataFrame(rows)])
    split = run([pd.DataFrame(rows[:2]), pd.DataFrame(rows[2:])])
    assert one == split
    # doc 2 is the smallest id → the owner; 5 and 7 flagged against it
    assert one[0] == [(5, 2), (7, 2)]
