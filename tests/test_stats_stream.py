"""Streaming curve-stats state: cross-micro-batch accumulation with
one-row-per-star bounded state, EXACT parity with the batch fold over
the concatenated input (integer micro-mag sums are associative, so no
float drift between arrival orders)."""

import json

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.streaming.stats_stream import (
    finalize_um_state,
    obs_stream,
    um_stats_state,
)


def _write_batch(d, name, rows):
    (d / name).write_text(
        "\n".join(
            json.dumps(
                {
                    "star_id": s,
                    "t": t,
                    "mag": m,
                    "event_time": "2026-01-01T00:00:00.000Z",
                }
            )
            for s, t, m in rows
        )
    )


def test_streaming_state_matches_batch_fold_exactly(spark, tmp_path):
    obs_dir = tmp_path / "obs_in"
    obs_dir.mkdir()
    b1 = [(1, 0.5, 12.125), (1, 1.5, 12.375), (2, 0.25, 9.0625)]
    b2 = [(1, 2.5, 11.875), (2, 7.75, 9.1875), (3, 3.0, 15.5)]
    _write_batch(obs_dir, "b1.json", b1)
    _write_batch(obs_dir, "b2.json", b2)

    out_dir = tmp_path / "state_out"
    state = um_stats_state(obs_stream(spark, str(obs_dir)))

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        state.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = spark.read.parquet(str(out_dir))
    latest = got.groupBy("star_id").agg(
        F.max_by("n", "batch").alias("n"),
        F.max_by("s1_um", "batch").alias("s1_um"),
        F.max_by("s2_um", "batch").alias("s2_um"),
        F.max_by("tmin", "batch").alias("tmin"),
        F.max_by("tmax", "batch").alias("tmax"),
    )
    batch_obs = spark.createDataFrame(
        b1 + b2, "star_id long, t double, mag double"
    )
    want = um_stats_state(batch_obs)
    got_rows = {tuple(r) for r in latest.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows  # EXACT, including the decimal Σum²

    # state bound: one row per star, forever
    assert latest.count() == 3

    # the derived surface agrees off either table
    via_stream = {
        tuple(r) for r in finalize_um_state(latest).collect()
    }
    via_batch = {tuple(r) for r in finalize_um_state(want).collect()}
    assert via_stream == via_batch


def test_finalize_matches_lc_stats_to_micromag_precision(spark):
    """The integer-state surface equals the float lc_stats surface to
    the micro-mag quantization (≤1e-6 on means, ≤2e-6 on std)."""
    import numpy as np
    from lightcurvesclassifier_spark.functions.curves import lc_stats
    from lightcurvesclassifier_spark.sources import testdata as td
    from tests.conftest import SF_SMOKE

    obs = td.observations(spark, SF_SMOKE)
    a = (
        finalize_um_state(um_stats_state(obs))
        .toPandas()
        .sort_values("star_id")
        .reset_index(drop=True)
    )
    b = lc_stats(obs).toPandas().sort_values("star_id").reset_index(drop=True)
    assert (a.n_obs == b.n_obs).all()
    assert np.allclose(a.mean_mag, b.mean_mag, atol=2e-6)
    assert np.allclose(a.std_mag, b.std_mag, atol=2e-6)
    assert np.allclose(a.timespan, b.timespan, atol=0)


def test_degenerate_constant_star_yields_zero_std_not_nan(spark):
    """Float cancellation can make ss = s2 - s1²/n a tiny NEGATIVE
    number for a constant-magnitude star; the unguarded sqrt was a NaN
    on Spark and a raise on DuckDB. All three stats surfaces must emit
    std 0.0 (and the single-point star NULL density, not a crash)."""
    import math

    from lightcurvesclassifier_spark.functions.curves import lc_stats
    from lightcurvesclassifier_spark.operators.rollup import (
        finalize_lc_stats, lc_stats_state,
    )

    rows = (
        [(1, "V", float(t), 17.000001) for t in range(5)]  # constant mag
        + [(2, "V", 0.0, 9.5)]                             # single point
    )
    obs = spark.createDataFrame(
        rows, "star_id long, band string, t double, mag double"
    )
    for name, out in [
        ("lc_stats", lc_stats(obs)),
        ("rollup", finalize_lc_stats(lc_stats_state(obs))),
        ("stream_state", finalize_um_state(um_stats_state(obs))),
    ]:
        got = {r.star_id: r for r in out.collect()}
        # cancellation residue may leave a tiny positive ss; the
        # contract is no NaN and no engine raise, not exact zero
        assert not math.isnan(got[1].std_mag), (name, got[1])
        assert 0.0 <= got[1].std_mag < 1e-5, (name, got[1])
        assert not math.isnan(got[2].std_mag), (name, got[2])
        assert got[2].std_mag == 0.0, (name, got[2])


def test_all_null_mag_star_yields_null_stats_not_crash(spark):
    """n = count(mag) = 0: greatest(NULL_ss, 0) is 0.0, so the
    unguarded std was 0.0/0 — an ANSI DIVIDE_BY_ZERO that aborted the
    whole job (while DuckDB's double 0/0 is NULL)."""
    from lightcurvesclassifier_spark.functions.curves import lc_stats
    from lightcurvesclassifier_spark.operators.rollup import (
        finalize_lc_stats, lc_stats_state,
    )

    rows = [(1, "V", 0.0, 10.0), (1, "V", 1.0, 12.0), (2, "V", 2.5, None)]
    obs = spark.createDataFrame(
        rows, "star_id long, band string, t double, mag double"
    )
    for name, out in [
        ("lc_stats", lc_stats(obs)),
        ("rollup", finalize_lc_stats(lc_stats_state(obs))),
    ]:
        got = {r.star_id: r for r in out.collect()}
        assert got[2].n_obs == 0 and got[2].std_mag is None, (name, got[2])
        assert got[1].std_mag is not None, name
