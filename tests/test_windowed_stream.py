"""Watermarked event-time windows: out-of-order samples land in the
right window; samples later than the watermark are dropped once the
watermark has advanced past their window."""

from datetime import datetime

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.streaming.windowed import windowed_curve_stats


def _run(spark, obs_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema("star_id long, obs_ts timestamp, mag double")
        .option("maxFilesPerTrigger", 1)
        .csv(str(obs_dir))
    )
    out = windowed_curve_stats(stream, window_days=7, watermark_days=2)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out_dir))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(out_dir))


def test_out_of_order_and_late_rows(spark, tmp_path):
    obs = tmp_path / "obs"
    obs.mkdir()
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    # batch 1: two windows' worth of data, out of order within the file
    (obs / "b1.csv").write_text(
        "1,2024-01-08 12:00:00,10.0\n"
        "1,2024-01-02 00:00:00,12.0\n"
        "1,2024-01-03 00:00:00,14.0\n"
    )
    res1 = _run(spark, obs, ckpt, out_dir)
    rows1 = {
        (r["window_start"].day, r["star_id"]): r for r in res1.collect()
    }
    # 7-day tumbling windows align to the Unix epoch: Dec 28–Jan 4
    # (holds Jan 2 + Jan 3) and Jan 4–11 (holds Jan 8)
    assert rows1[(28, 1)]["n_obs"] == 2  # the two out-of-order early rows
    assert rows1[(4, 1)]["n_obs"] == 1

    # batch 2: watermark from batch 1 max (Jan 8 12:00) - 2d = Jan 6
    # 12:00, past the Dec 28–Jan 4 window's end → its state is gone and
    # a Jan 2 straggler is dropped; a Jan 9 row folds into the still-
    # open Jan 4–11 window.
    (obs / "b2.csv").write_text(
        "1,2024-01-02 06:00:00,99.0\n"
        "1,2024-01-09 00:00:00,11.0\n"
    )
    res2 = _run(spark, obs, ckpt, out_dir)
    latest = (
        res2.groupBy("window_start", "star_id")
        .agg(F.max("n_obs").alias("n"))
        .collect()
    )
    by_day = {r["window_start"].day: r["n"] for r in latest}
    assert by_day[4] == 2  # Jan 9 row folded in
    assert by_day[28] == 2  # late Jan 2 row dropped — count unchanged
    # the dropped row's magnitude never appears
    assert res2.filter(F.col("mean_mag") > 50).count() == 0
