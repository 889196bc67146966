"""Embedding ingest gate: streaming flags equal the batch
bucket-collision-then-verify pair set exactly (same deterministic
hyperplanes), every flag is a true cosine near-dup, and exact
duplicates always collide."""

import json

import numpy as np
from pyspark.sql import functions as F

from lightcurvesclassifier_spark.sources import testdata
from lightcurvesclassifier_spark.streaming.embedding_gate_stream import (
    embedding_gate_stream,
    gate_verdicts,
    srp_bucket_table,
    vec_stream,
    with_srp_buckets,
)
from tests.conftest import SF_ORACLE

THR = 0.9


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {
                    "vec_id": int(i),
                    "embedding": [float(x) for x in v],
                    "event_time": f"2026-01-01T00:{m:02d}:00.000Z",
                }
            )
            for i, v, m in rows
        )
    )


def test_gate_matches_batch_collision_verify_exactly(spark, tmp_path):
    """Split the embeddings table: at-rest = vec_id < 400, arrivals =
    the rest plus one planted exact duplicate of an at-rest vector.
    The streamed verdicts must equal the batch (collide in >=1 table)
    AND (cos >= THR) pair set, and the planted duplicate must be
    flagged with cos == 1."""
    emb = testdata.load_table(spark, SF_ORACLE, "embeddings").cache()
    at_rest = emb.filter(F.col("vec_id") < 400)
    arrivals = emb.filter(F.col("vec_id") >= 400).toPandas()
    dup_src = at_rest.filter(F.col("vec_id") == 7).toPandas()
    assert len(dup_src) == 1

    vecs_dir = tmp_path / "vecs_in"
    vecs_dir.mkdir()
    half = len(arrivals) // 2
    _write_batch(
        vecs_dir, "b1.json",
        [(r.vec_id, r.embedding, 0) for r in arrivals.iloc[:half].itertuples()]
        + [(900_007, dup_src.embedding.iloc[0], 0)],
    )
    _write_batch(
        vecs_dir, "b2.json",
        [(r.vec_id, r.embedding, 1) for r in arrivals.iloc[half:].itertuples()],
    )

    bucket_tbl = srp_bucket_table(at_rest)
    gate = embedding_gate_stream(
        vec_stream(spark, str(vecs_dir)), bucket_tbl, at_rest, threshold=THR
    )
    out_dir = tmp_path / "out"

    def sink(batch_df, _batch_id):
        gate_verdicts(batch_df).write.mode("append").parquet(str(out_dir))

    q = (
        gate.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(out_dir)).toPandas()
    flagged = {(int(a), int(b)) for a, b in zip(got.vec_id, got.at_rest_id)}

    # planted exact duplicate: always collides, cos rounds to 1.0
    assert (900_007, 7) in flagged
    assert float(got[got.vec_id == 900_007].cos.iloc[0]) == 1.0

    # batch ground truth with the SAME deterministic hyperplanes
    arr_df = spark.createDataFrame(
        [(900_007, [float(x) for x in dup_src.embedding.iloc[0]])],
        "vec_id long, embedding array<double>",
    ).unionByName(
        spark.createDataFrame(
            [
                (int(r.vec_id), [float(x) for x in r.embedding])
                for r in arrivals.itertuples()
            ],
            "vec_id long, embedding array<double>",
        )
    )
    coll = (
        with_srp_buckets(arr_df)
        .join(bucket_tbl, ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("at_rest_id"))
        .select("vec_id", "at_rest_id")
        .distinct()
        .toPandas()
    )
    rest_pd = at_rest.toPandas().set_index("vec_id")
    arr_pd = {int(r.vec_id): np.array(r.embedding) for r in arr_df.toPandas().itertuples()}
    expected = set()
    for a, b in zip(coll.vec_id, coll.at_rest_id):
        va, vb = arr_pd[int(a)], np.array(rest_pd.loc[int(b)].embedding)
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        if round(cos, 6) >= THR:
            expected.add((int(a), int(b)))
    assert flagged == expected
    # soundness double-check: every flag really is a cosine near-dup
    for a, b in flagged:
        va, vb = arr_pd[a], np.array(rest_pd.loc[b].embedding)
        assert va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= THR - 1e-6


def test_bucket_rows_scale_invariant_and_shapes(spark):
    """SRP signs are scale-invariant (sign of the projection does not
    change under positive scaling), and each vector emits exactly one
    row per table."""
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 2.0, 0.25] * 16), (2, [5.0, -10.0, 20.0, 2.5] * 16)],
        "vec_id long, embedding array<double>",
    )
    from lightcurvesclassifier_spark.operators.similarity import LSH_TABLES

    out = with_srp_buckets(df).toPandas()
    assert len(out) == 2 * LSH_TABLES
    b1 = out[out.vec_id == 1].sort_values("t").bucket.tolist()
    b2 = out[out.vec_id == 2].sort_values("t").bucket.tolist()
    assert b1 == b2
