"""Watermarked stream-stream join: cross-micro-batch matches, bounded
buffered state via the event-time range, EXACT row parity with the
batch join over the concatenated inputs (pure key+timestamp condition —
no float drift possible)."""

import json

from lightcurvesclassifier_spark.streaming.join_stream import (
    calib_stream,
    enriched_obs,
    obs_join_stream,
)


def _write(d, name, rows, fields):
    (d / name).write_text(
        "\n".join(json.dumps(dict(zip(fields, r))) for r in rows)
    )


def test_stream_stream_join_matches_batch(spark, tmp_path):
    obs_dir = tmp_path / "obs"
    cal_dir = tmp_path / "cal"
    obs_dir.mkdir()
    cal_dir.mkdir()
    # calibrations arrive in batch 1; matching obs arrive in batch 2 —
    # the join must match ACROSS micro-batches via buffered state
    cal_b1 = [
        (1, 1.01, "2026-01-01T00:00:00.000Z"),
        (1, 1.02, "2026-01-01T05:00:00.000Z"),
        (2, 0.99, "2026-01-01T00:30:00.000Z"),
    ]
    obs_b1 = [(1, 12.5, "2026-01-01T01:00:00.000Z")]
    obs_b2 = [
        (1, 12.6, "2026-01-01T05:30:00.000Z"),  # matches both star-1 cals
        (2, 9.1, "2026-01-01T02:00:00.000Z"),   # matches star-2 cal
        (2, 9.2, "2026-01-02T00:00:00.000Z"),   # > 6h after → no match
    ]
    _write(cal_dir, "c1.json", cal_b1, ["star_id", "gain", "calib_time"])
    _write(obs_dir, "o1.json", obs_b1, ["star_id", "mag", "event_time"])
    _write(obs_dir, "o2.json", obs_b2, ["star_id", "mag", "event_time"])

    out_dir = tmp_path / "joined"
    q = (
        enriched_obs(
            obs_join_stream(spark, str(obs_dir)),
            calib_stream(spark, str(cal_dir)),
        )
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = {
        (r.star_id, str(r.event_time), str(r.calib_time), r.gain, r.mag)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # batch parity twin: same condition on static concatenated inputs
    obs_static = spark.createDataFrame(
        [(s, m, t) for s, m, t in obs_b1 + obs_b2],
        "star_id long, mag double, event_time_s string",
    ).selectExpr(
        "star_id", "mag", "CAST(event_time_s AS TIMESTAMP) AS event_time"
    )
    cal_static = spark.createDataFrame(
        cal_b1, "star_id long, gain double, calib_time_s string"
    ).selectExpr(
        "star_id", "gain", "CAST(calib_time_s AS TIMESTAMP) AS calib_time"
    )
    want = {
        (r.star_id, str(r.event_time), str(r.calib_time), r.gain, r.mag)
        for r in enriched_obs(obs_static, cal_static).collect()
    }
    assert got == want
    # the semantic content: obs at 05:30 matched BOTH star-1 cals, the
    # day-later obs matched nothing
    assert len([g for g in got if g[4] == 12.6]) == 2
    assert not [g for g in got if g[4] == 9.2]
