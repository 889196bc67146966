"""Streaming session-concurrency: the ±1-delta streaming aggregate plus
the foreachBatch cumulative reproduce the batch sweep-line exactly, and
the serving table updates incrementally across micro-batches."""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import rangejoin, rollup
from lightcurvesclassifier_spark.streaming import concurrency_stream as cs


def _write_sessions(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {"star_id": s, "t_start": a, "t_end": b, "n_obs": n}
            )
            for s, a, b, n in rows
        )
    )


def test_streaming_concurrency_matches_batch_sweep(spark, tmp_path):
    """End-to-end parity: batch obs → sessions → (stream of session
    rows) equals session_concurrency_sweep on the same obs for every
    night both report (the stream densifies the full span; the batch
    reports observed nights)."""
    rows = []
    # star 1: two sessions (nights 0-2 and 6-7); star 2: one long
    # session (nights 1-5); star 3: a same-night session that covers
    # no integer boundary beyond its start
    for t in (0.1, 0.6, 1.3, 2.2):
        rows.append((1, "V", t, 10.0, None))
    for t in (6.1, 6.9):
        rows.append((1, "V", t, 10.5, None))
    for t in (1.1, 2.0, 2.9, 3.8, 4.7):
        rows.append((2, "V", t, 9.0, None))
    rows.append((3, "V", 2.4, 8.0, None))
    obs = spark.createDataFrame(
        rows, "star_id long, band string, t double, mag double, err double"
    )
    want = (
        rangejoin.session_concurrency_sweep(obs, gap_days=1.0)
        .toPandas()
        .set_index("day")
        .sort_index()
    )

    sessions = rollup.observing_sessions(obs, gap_days=1.0).collect()
    sess_rows = [
        (r["star_id"], float(r["t_start"]), float(r["t_end"]), int(r["n_obs"]))
        for r in sessions
    ]
    in_dir = tmp_path / "sessions_in"
    in_dir.mkdir()
    # two micro-batches so the streaming aggregate must merge state
    import time

    _write_sessions(in_dir, "b1.json", sess_rows[: len(sess_rows) // 2])
    time.sleep(1.1)
    _write_sessions(in_dir, "b2.json", sess_rows[len(sess_rows) // 2 :])

    out_dir = tmp_path / "serve"
    q = cs.concurrency_query(
        spark, str(in_dir), str(out_dir), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(180), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir)).toPandas().set_index("day").sort_index()
    # every night BOTH report must match exactly; nights only the batch
    # grid has (observed before the first session boundary) are zeros
    # there by construction — the stream's axis is the boundary span
    overlap = 0
    for day, row in want.iterrows():
        if day in got.index:
            assert got.n_active[day] == row.n_active, (day, got.to_string())
            assert got.obs_in_flight[day] == row.obs_in_flight, day
            overlap += 1
        else:
            assert row.n_active == 0 and row.obs_in_flight == 0, day
    assert overlap >= 4  # the comparison actually exercised real nights
    # densification: concurrency ≥ 0 everywhere and the final boundary
    # day nets back to zero
    assert (got.n_active >= 0).all()
    assert got.n_active[got.index.max()] == 0


def test_concurrency_deltas_rule_matches_batch(spark):
    """The delta explode is the batch rule verbatim: +1 at
    ceil(t_start), −1 at ceil(t_end), no-covered-night sessions
    dropped."""
    sess = spark.createDataFrame(
        [
            (1, 0.5, 2.5, 4),   # covers nights 1, 2
            (2, 3.0, 3.7, 2),   # ceil 3 < ceil 4: covers night 3
            (3, 2.1, 2.9, 9),   # ceil 3 == ceil 3: covers nothing
        ],
        cs.SESSION_STREAM_SCHEMA,
    )
    got = sorted(
        (r["day"], r["dn"], r["dobs"])
        for r in cs.concurrency_deltas(sess).collect()
    )
    assert got == [(1, 1, 4), (3, -1, -4), (3, 1, 2), (4, -1, -2)]


def test_cumulate_densifies_gap_nights(spark):
    """Nights between boundaries with no deltas still appear, carrying
    the running level through the gap."""
    deltas = spark.createDataFrame(
        [(0, 2, 10), (5, -2, -10)], "day long, dn long, dobs long"
    )
    got = (
        cs.cumulate_deltas(deltas)
        .orderBy("day")
        .collect()
    )
    assert [(r["day"], r["n_active"], r["obs_in_flight"]) for r in got] == [
        (0, 2, 10), (1, 2, 10), (2, 2, 10), (3, 2, 10), (4, 2, 10),
        (5, 0, 0),
    ]
