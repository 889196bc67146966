"""Streaming session_window sessionization: gap rule matches the batch
operator, cross-batch merge works, append-mode emits closed sessions."""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators import rollup
from lightcurvesclassifier_spark.streaming.session_stream import (
    event_stream,
    sessionize_stream,
)


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {
                    "star_id": s,
                    "mag": m,
                    "event_time": f"2026-01-01T{hh:02d}:{mm:02d}:00.000Z",
                }
            )
            for s, m, hh, mm in rows
        )
    )


def test_streaming_sessions_match_batch_gap_rule(spark, tmp_path):
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    # star 1: 00:00, 00:30 (one session), then 03:00 (new session — gap
    # 2.5h > 1h). The 00:30 point arrives in batch 2 while the session
    # opened in batch 1 is still in state: the windows must MERGE
    # across micro-batches (within the 2h watermark slack). star 2:
    # single point.
    import time

    _write_batch(
        events_dir, "b1.json", [(1, 10.0, 0, 0), (2, 9.0, 1, 0)]
    )
    time.sleep(1.1)  # distinct mtimes: the file source orders by them
    _write_batch(
        events_dir, "b2.json", [(1, 10.5, 0, 30), (1, 11.0, 3, 0)]
    )
    time.sleep(1.1)
    # watermark-advancing batches so every session closes and emits
    # (watermark updates take effect at the NEXT trigger, so the last
    # session needs one more batch after the big time jump)
    _write_batch(events_dir, "b3.json", [(3, 8.0, 12, 0)])
    time.sleep(1.1)
    _write_batch(events_dir, "b4.json", [(3, 8.5, 23, 0)])

    out_dir = tmp_path / "sessions_out"
    sess = sessionize_stream(
        event_stream(spark, str(events_dir)), gap="1 hour",
        watermark="2 hours",
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out_dir))

    q = (
        sess.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir)).toPandas()
    by_star = got.sort_values(["star_id", "t_start"]).reset_index(drop=True)
    # star 1: two sessions — (00:00-00:30, 2 obs) and (03:00, 1 obs)
    s1 = by_star[by_star.star_id == 1]
    assert list(s1.n_obs) == [2, 1], by_star.to_string()
    assert abs(s1.iloc[0].mean_mag - 10.25) < 1e-9
    # star 2: one session, one obs
    assert list(by_star[by_star.star_id == 2].n_obs) == [1]

    # batch parity: the same events through the batch gap rule (gap =
    # 1h = 1/24 day on the t-in-days axis) give the same (star,
    # n_obs, mean_mag) multiset for the closed sessions
    rows = [
        (1, "V", 0.0, 10.0, None),
        (1, "V", 0.5 / 24, 10.5, None),
        (1, "V", 3.0 / 24, 11.0, None),
        (2, "V", 1.0 / 24, 9.0, None),
    ]
    obs = spark.createDataFrame(
        rows, "star_id long, band string, t double, mag double, err double"
    )
    batch = rollup.observing_sessions(obs, gap_days=1.0 / 24).toPandas()
    want = sorted(
        (r.star_id, r.n_obs, r.mean_mag) for _, r in batch.iterrows()
    )
    got_t = sorted(
        (r.star_id, r.n_obs, r.mean_mag)
        for _, r in by_star[by_star.star_id.isin([1, 2])].iterrows()
    )
    assert got_t == want
